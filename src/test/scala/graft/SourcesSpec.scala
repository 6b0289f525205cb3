package graft

class SchemaEvolutionSpec extends SparkSuite {
  test("mergeSchema unifies generations; old files null-fill the new column") {
    val rows = operators.Scans.srcSchemaEvolution.run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n1, null1) = rows(1)
    val (n2, null2) = rows(2)
    assert(n1 > 0 && n2 > 0)
    assert(null1 == n1, "every gen=1 row must null-fill the evolved column")
    assert(null2 == 0L, "gen=2 rows all carry the evolved column")
  }
}

class BadRecordsSpec extends SparkSuite {
  test("permissive CSV ingest quarantines malformed lines without losing good rows") {
    val rows = operators.Scans.srcCsvBadRecords.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.getOrElse("good", 0L) == 25L, s"expected 25 good nation rows: $rows")
    assert(rows.getOrElse("corrupt", 0L) >= 1L, s"expected quarantined corrupt rows: $rows")
  }
}

import org.apache.spark.sql.functions._

/** The DataSource V2 connector: pushdown must reach the source, not
  * just the plan text — the reader ranges themselves narrow.
  */
class SourcesSpec extends SparkSuite {

  private def synth(rows: Int, parts: Int) =
    spark.read
      .format("graft.sources.SyntheticSource")
      .option("rows", rows)
      .option("partitions", parts)
      .load()

  test("generates the requested rows across the requested partitions") {
    val df = synth(10000, 8)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(col("id")).distinct().count() == 10000)
  }

  test("range filters are absorbed by the source (narrowed reader range in the scan)") {
    val df = synth(10000, 4).filter(col("id") >= 2500 && col("id") < 9000)
    assert(df.count() == 6500)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[2500,9000)"), p.take(2000))
  }

  test("runtime filtering narrows the generated range from a join-side filter") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import spark.implicits._
    // dim filtered on a NON-join column so only a runtime filter (the
    // DSv2 analog of dynamic partition pruning) can narrow the scan
    val dim = Seq((30000L, "keep"), (30500L, "keep"), (31000L, "keep"), (5L, "drop"))
      .toDF("id", "tag")
    val fact = synth(100000, 8)
    val joined = fact.join(dim.filter(col("tag") === "keep"), Seq("id"))
    assert(joined.count() == 3)
    val top = joined.queryExecution.executedPlan
    val finalPlan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect {
      case b: BatchScanExec if b.scan.getClass.getName.contains("SyntheticScan") => b
    }
    assert(scans.nonEmpty, "synthetic BatchScan not found in final plan")
    // without runtime filtering the scan emits 100000 rows; with it,
    // only the [min, max+1) hull of the broadcast join keys
    val emitted = scans.map(_.metrics("numOutputRows").value).sum
    assert(emitted <= 1001, s"runtime filter did not narrow the scan: emitted $emitted rows")
  }

  test("column pruning reaches the source") {
    val df = synth(1000, 2).select(col("word"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<word:string>"), p.take(2000))
  }

  test("DSv2 write commit protocol: round-trip, append, overwrite") {
    import org.apache.spark.sql.SaveMode
    sources.MemoryTableStore.clear("t_rt")
    val nation = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    def readBack = spark.read.format("graft.sources.MemoryTableSink").option("name", "t_rt").load()

    nation.write.format("graft.sources.MemoryTableSink").option("name", "t_rt")
      .mode(SaveMode.Append).save()
    assert(readBack.collect().map(_.toSeq).toSet == nation.collect().map(_.toSeq).toSet)

    nation.write.format("graft.sources.MemoryTableSink").option("name", "t_rt")
      .mode(SaveMode.Append).save()
    assert(readBack.count() == 2 * nation.count(), "append did not accumulate")

    nation.limit(5).write.format("graft.sources.MemoryTableSink").option("name", "t_rt")
      .mode(SaveMode.Overwrite).save()
    assert(readBack.count() == 5, "overwrite did not truncate")
    sources.MemoryTableStore.clear("t_rt")
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered in closed form by the source") {
    val df = synth(100000, 8)
      .filter(col("id") >= 25000)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val row = df.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (75000L, 25000L, 99999L))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SyntheticAggScan"), p.take(2000))
    assert(p.contains("pushedAgg=[count, min, max]"), p.take(2000))
  }

  test("micro-batch streaming read delivers every id exactly once across triggers") {
    val q = spark.readStream
      .format("graft.sources.SyntheticSource")
      .option("rows", 1000)
      .option("rowsPerTrigger", 300) // 4 batches: 300+300+300+100
      .load()
      .writeStream
      .format("memory")
      .queryName("t_synth_stream")
      .outputMode("append")
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("t_synth_stream").count() < 1000 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
      }
    } finally q.stop()
    val got = spark.table("t_synth_stream")
    assert(got.count() == 1000, s"got ${got.count()} rows")
    assert(got.select(col("id")).distinct().count() == 1000, "duplicate or missing ids")
  }

  test("micro-batch restart from a checkpoint delivers every id exactly once") {
    // Exercises the restart path fixed in round 5: on resume the
    // stream's visible-offset advance clamps to the engine-reported
    // progress, so the first post-restart batch range must not invert
    // or replay. The parquet file sink + checkpoint is the
    // exactly-once contract across a restart.
    //
    // Determinism note (hardened in round 6): the first run's source is
    // CAPPED at 900 rows, so the sink cannot overshoot no matter how
    // fast batches complete — the earlier formulation stopped a
    // 2000-row stream mid-flight and raced q1.stop() against the
    // remaining batches (flaked once under full-suite load when all
    // batches finished before the stop landed). The restart then raises
    // the cap on the SAME checkpoint, resuming from the committed
    // offset 900.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_restart_out").toString
    def written(): Long =
      try spark.read.parquet(out).count()
      catch { case _: Throwable => 0L } // sink dir empty until first commit
    def start(rows: Int) = spark.readStream
      .format("graft.sources.SyntheticSource")
      .option("rows", rows)
      .option("rowsPerTrigger", 300)
      .load()
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start(900)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (written() < 900 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally q1.stop()
    val mid = written()
    assert(mid == 900, s"expected the capped first run to commit exactly 900 rows, got $mid")
    val q2 = start(2000)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (written() < 2000 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 2000, s"got ${got.count()} rows after restart")
    assert(got.select(col("id")).distinct().count() == 2000, "replayed or missing ids across restart")
  }

  test("batch reads are columnar (vectorized generation + ColumnarToRow)") {
    val df = synth(10000, 4).filter(col("id") >= 100)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ColumnarToRow"), p.take(2000))
    // and the vectorized path produces the same rows as the row path
    val row42 = synth(100, 1).filter(col("id") === 42).collect().head
    assert(row42.getDouble(row42.fieldIndex("v")) == sources.SyntheticSource.valueOf(42))
  }

  test("row content is the documented pure function of id") {
    val row = synth(100, 1).filter(col("id") === 42).collect().head
    assert(row.getDouble(row.fieldIndex("v")) == sources.SyntheticSource.valueOf(42))
    assert(row.getString(row.fieldIndex("word")) == sources.SyntheticSource.wordOf(42))
  }
}
