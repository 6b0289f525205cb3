package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans / sources / sinks (SURVEY §2.1).
  *
  * 100 TB notes: these queries exist to prove the scan path is efficient —
  * `src_scan_pushdown`'s plan must show `PushedFilters: [GT(p_size,25)]`
  * and a 3-column `ReadSchema` (asserted in PlanShapeSpec), so at scale the
  * parquet reader skips row groups and never materializes unused columns.
  */
object Scans {

  val scanPart: Q = Q(
    "src_scan_part",
    Some("SELECT * FROM part ORDER BY p_partkey"),
    (spark, dir) => Tables.part(spark, dir).orderBy(col("p_partkey"))
  )

  /** Filter + projection pushdown into the parquet scan. */
  val scanPushdown: Q = Q(
    "src_scan_pushdown",
    Some(
      "SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 25 ORDER BY p_partkey"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(col("p_partkey"), col("p_name"), col("p_size"))
        .filter(col("p_size") > 25)
        .orderBy(col("p_partkey"))
  )

  /** The TIMESTAMP(NANOS) ingest path (SURVEY §1.3): Spark reads nanos as
    * long and truncates to µs, exactly like DuckDB's automatic ns→µs
    * truncation, so both engines see identical microsecond timestamps.
    */
  val scanEventsNs: Q = Q(
    "src_scan_events_ns",
    Some("SELECT event_id, ts FROM events ORDER BY event_id"),
    (spark, dir) =>
      Tables.events(spark, dir).select(col("event_id"), col("ts")).orderBy(col("event_id"))
  )

  /** CSV + JSON round-trip sink demo (no oracle — side-effecting).
    * Writes `nation` to both formats under java.io.tmpdir, reads each back
    * with an explicit schema (schema-on-read; csv/json carry no types),
    * and joins them to prove the round-trip is lossless. Distributed
    * writers at scale: each task writes its own file — no driver funnel.
    */
  val snkCsvJson: Q = Q(
    "snk_csv_json",
    // oracle = the parquet original: the text round-trips must be
    // lossless (ints + strings only; the read schema pins INTEGER, so
    // the oracle casts to int32 to match)
    Some(
      "SELECT cast(n_nationkey as integer) AS n_nationkey, n_name, n_name AS j_name, " +
        "cast(n_regionkey as integer) AS n_regionkey FROM nation ORDER BY n_nationkey"
    ),
    (spark, dir) => {
      val base = graft.Staging.dir("graft_snk")
      val n = Tables.nation(spark, dir)
      n.write.mode("overwrite").option("header", "true").csv(s"$base/nation_csv")
      n.write.mode("overwrite").json(s"$base/nation_json")
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)
      ))
      val fromCsv = spark.read.schema(schema).option("header", "true").csv(s"$base/nation_csv")
      val fromJson = spark.read.schema(schema).json(s"$base/nation_json")
      fromCsv
        .join(
          fromJson.select(col("n_nationkey"), col("n_name").as("j_name")),
          Seq("n_nationkey")
        )
        .select(col("n_nationkey"), col("n_name"), col("j_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }
  )

  /** ORC round-trip: the third columnar-format lane next to parquet and
    * the text formats. ORC is written with the same per-task parallel
    * writer and read back through Spark's vectorized ORC reader with
    * predicate pushdown; the query proves write → read → filter on the
    * supplier table and is oracle-checked against the parquet original
    * (the round-trip must be lossless, so DuckDB on parquet IS the
    * oracle for the ORC copy). */
  val snkOrc: Q = Q(
    "snk_orc",
    Some(
      "SELECT s_suppkey, s_name, s_nationkey, " + graft.Det.oR2("s_acctbal") + " AS bal " +
        "FROM supplier WHERE s_acctbal > 0 ORDER BY s_suppkey"
    ),
    (spark, dir) => {
      val base = graft.Staging.dir("graft_snk/supplier_orc")
      Tables.supplier(spark, dir).write.mode("overwrite").orc(base)
      spark.read
        .orc(base)
        .filter(col("s_acctbal") > 0)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), graft.Det.r2(col("s_acctbal")).as("bal"))
        .orderBy(col("s_suppkey"))
    }
  )

  /** Round-trip through the engine's DSv2 WRITE connector
    * (graft.sources.MemoryTableSink): task-buffered DataWriters,
    * commit-message assembly on the driver, truncate-on-overwrite —
    * then read back through its DSv2 read path and aggregate.
    * Oracle: DuckDB on the parquet original (lossless round-trip). */
  val snkDsv2Mem: Q = Q(
    "snk_dsv2_mem",
    Some(
      "SELECT p_brand, count(*) AS n, cast(sum(p_size) as bigint) AS total_size " +
        "FROM part WHERE p_size > 10 GROUP BY p_brand ORDER BY p_brand"
    ),
    (spark, dir) => {
      val table = "snk_dsv2_mem_rt"
      Tables
        .part(spark, dir)
        .filter(col("p_size") > 10)
        .select(col("p_brand"), col("p_size"))
        .write
        .format("graft.sources.MemoryTableSink")
        .option("name", table)
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .save()
      spark.read
        .format("graft.sources.MemoryTableSink")
        .option("name", table)
        .load()
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("p_size")).cast("long").as("total_size"))
        .orderBy(col("p_brand"))
    }
  )

  /** Read through the engine's DataSource V2 connector
    * (graft.sources.SyntheticSource): range filters are absorbed by
    * the SOURCE (the readers generate only [25000, 90000)), columns
    * are pruned at the source, and the 8 input partitions generate
    * independently. Oracle twin: the same pure-function-of-id table
    * via DuckDB range(). SourcesSpec asserts the pushdown reached the
    * scan; this query proves the source end-to-end. */
  val srcDsv2: Q = Q(
    "src_dsv2_synthetic",
    Some(
      "SELECT CASE i % 5 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta' WHEN 2 THEN 'gamma' " +
        "WHEN 3 THEN 'delta' ELSE 'epsilon' END AS word, count(*) AS n, " +
        graft.Det.oRN(graft.Det.oSum("((i * 2654435761) % 1000003) / 1000003.0"), 6) + " AS sum_v " +
        "FROM range(0, 100000) t(i) WHERE i >= 25000 AND i < 90000 " +
        "GROUP BY 1 ORDER BY word"
    ),
    (spark, dir) =>
      spark.read
        .format("graft.sources.SyntheticSource")
        .option("rows", 100000)
        .option("partitions", 8)
        .load()
        .filter(col("id") >= 25000 && col("id") < 90000)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), graft.Det.rN(graft.Det.dsum(col("v")), 6).as("sum_v"))
        .orderBy(col("word"))
  )

  /** Aggregate pushdown through the DSv2 connector: COUNT/MIN/MAX over
    * the filtered id range are answered by the SOURCE in closed form —
    * the plan contains a one-row SyntheticAggScan and no aggregation
    * over generated rows (asserted in SourcesSpec). */
  val srcDsv2Agg: Q = Q(
    "src_dsv2_agg",
    Some(
      "SELECT count(*) AS n, min(i) AS lo, max(i) AS hi " +
        "FROM range(0, 100000) t(i) WHERE i >= 25000"
    ),
    (spark, dir) =>
      spark.read
        .format("graft.sources.SyntheticSource")
        .option("rows", 100000)
        .option("partitions", 8)
        .load()
        .filter(col("id") >= 25000)
        .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
  )

  /** Dirty-ingest accounting: PERMISSIVE CSV read over a staged mix of
    * well-formed rows and deliberately malformed lines, with the
    * corrupt raw text captured in a `_corrupt` column instead of
    * failing the job — the quarantine pattern a 100 TB ingest needs
    * (one bad line in a billion must not kill the pipeline; it must be
    * COUNTED and inspectable). Emits the good/corrupt row accounting.
    *
    * Oracle (since r10): the accounting is fully deterministic — the
    * query itself stages EXACTLY two corrupt lines (wrong types; wrong
    * arity) next to a clean dump of nation, so `corrupt` must read 2
    * and `good` must equal |nation|. DuckDB recomputes the good count
    * from the nation table; the corrupt constant is the staged shard's
    * line count. This checks end-to-end that PERMISSIVE parsing
    * quarantines precisely the corrupt shard and loses no good row —
    * formerly a no-oracle row covered only by SourcesSpec. */
  val srcCsvBadRecords: Q = Q(
    "src_csv_badrecords",
    Some(
      "SELECT 'corrupt' AS kind, 2::BIGINT AS n " +
        "UNION ALL SELECT 'good', cast(count(*) as bigint) FROM nation ORDER BY kind"
    ),
    (spark, dir) => {
      val base = graft.Staging.dir("graft_badcsv/data")
      Tables
        .nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .coalesce(1)
        .write.mode("overwrite").csv(base)
      // a deterministic corrupt shard: wrong types and wrong arity
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(base, "zz_corrupt.csv"),
        "oops,not_a_number,NaNkey\nanother;bad;line;entirely\n"
      )
      val schema = StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType),
        StructField("n_regionkey", LongType),
        StructField("_corrupt", StringType)
      ))
      val read = spark.read
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(base)
        // cache: Spark refuses a query that filters ONLY the internal
        // corrupt column of a raw CSV scan; materializing first is the
        // documented pattern
        .cache()
      read
        .select(when(col("_corrupt").isNotNull, "corrupt").otherwise("good").as("kind"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("kind"))
    }
  )

  /** Schema evolution on read: two generations of the same table — v2
    * adds a column v1 never wrote — unified by `mergeSchema`, with the
    * missing column null-filled for old files. This is how a 100 TB
    * dataset evolves IN PLACE: no rewrite of historical partitions,
    * new readers see the superset schema, per-generation accounting
    * stays queryable. Emits rows-per-generation with null accounting
    * for the evolved column. */
  val srcSchemaEvolution: Q = Q(
    "src_schema_evolution",
    // oracle recomputes the generation split from orders: gen 1 (even
    // keys) predates the o_bucket column, so every row reads it as
    // NULL under mergeSchema; gen 2 fills it
    Some(
      "SELECT gen, cast(count(*) as bigint) AS n_rows, " +
        "cast(sum(CASE WHEN gen = 1 THEN 1 ELSE 0 END) as bigint) AS n_null_bucket " +
        "FROM (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS gen FROM orders) " +
        "GROUP BY gen ORDER BY gen"
    ),
    (spark, dir) => {
      val base = graft.Staging.dir("graft_schema_evo")
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/gen=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_bucket", (col("o_totalprice") / 100000.0).cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$base/gen=2")
      spark.read
        .option("mergeSchema", "true")
        .parquet(base)
        .groupBy(col("gen"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("o_bucket").isNull, 1L).otherwise(0L)).as("n_null_bucket")
        )
        .orderBy(col("gen"))
    }
  )

  def qs: Seq[Q] = Seq(scanPart, scanPushdown, scanEventsNs, snkCsvJson, snkOrc, snkDsv2Mem,
    srcDsv2, srcDsv2Agg, srcCsvBadRecords, srcSchemaEvolution)
}
