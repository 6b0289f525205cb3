package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful streaming semantics: re-delivered events are dropped
  * exactly-once by the watermarked dedup, and the
  * flatMapGroupsWithState machine converges to batch ground truth.
  */
class StatefulSpec extends SparkSuite {

  private def chunkedEvents(tmp: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables
      .events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"), col("value"))
    // write the SAME data twice — an at-least-once source re-delivering
    ev.coalesce(1).write.mode("overwrite").parquet(tmp)
    ev.coalesce(1).write.mode("append").parquet(tmp)
    spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(tmp)
  }

  test("watermarked dropDuplicates makes re-delivery exactly-once") {
    val tmp = Files.createTempDirectory("graft_dedup_stream").toString + "/in"
    val stream = streaming.StatefulDemos.dedupEvents(chunkedEvents(tmp))
    val q = stream.writeStream
      .format("memory")
      .queryName("t_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("t_dedup").count()
    val distinct = Tables.events(spark, sf).select(col("event_id")).distinct().count()
    assert(got == distinct, s"deduped stream rows $got vs distinct ids $distinct")
  }

  test("streaming EWMA state machine equals the batch fold bit-for-bit") {
    val tmp = Files.createTempDirectory("graft_ewma_stream").toString + "/in"
    val ev = Tables
      .events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"), col("value"))
    ev.coalesce(1).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(tmp)
    val q = streaming.StatefulDemos
      .userEwma(spark, stream)
      .writeStream
      .format("memory")
      .queryName("t_ewma")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // last emission per user (highest n) vs the batch fold, after the
    // same trunc-rounding the batch query applies
    val got = spark.table("t_ewma").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val last = rows.maxBy(_.getLong(1))
        u -> (last.getLong(1), math.floor(last.getDouble(2) * 1e6 + 0.5) / 1e6)
      }
    val exp = operators.TimeSeries.tsEwma.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size == exp.size, s"user count ${got.size} vs ${exp.size}")
    for ((u, (n, e)) <- got) {
      assert(exp(u) == ((n, e)), s"user $u: streamed ($n, $e) vs batch ${exp(u)}")
    }
  }

  test("flatMapGroupsWithState totals converge to batch ground truth") {
    val tmp = Files.createTempDirectory("graft_state_stream").toString + "/in"
    val ev = Tables
      .events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"), col("value"))
    ev.coalesce(2).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(tmp)
    val q = streaming.StatefulDemos
      .userTotals(spark, stream)
      .writeStream
      .format("memory")
      .queryName("t_state")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // in update mode the memory sink accumulates every emission; the
    // LAST emission per user must equal the batch totals
    val finalPerUser = spark
      .table("t_state")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val batch = Tables
      .events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(finalPerUser == batch)
  }
}
