package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the 10 driver-provided parquet tables (FIXTURES.md).
  *
  * Scale notes (100 TB design): every loader is a plain columnar parquet
  * scan — Catalyst pushes filters/projections into the scan, so callers
  * should `.select`/`.filter` as early as possible and let pushdown do the
  * rest. No caching/collect here: loaders stay lazy so the same code runs
  * unchanged on a 1000-executor cluster where each table is a partitioned
  * directory rather than a single file.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** events.ts has shipped in two physical encodings across driver
    * testdata generations: parquet TIMESTAMP(NANOS,false) — which Spark
    * 4.x cannot read natively (PARQUET_TYPE_ILLEGAL), so with
    * `nanosAsLong` it surfaces as a BIGINT of epoch-nanos — and plain
    * TIMESTAMP(MICROS). The loader adapts on the read schema instead of
    * assuming one generation: a long column gets the verified ns→µs
    * truncating division (matching DuckDB's own ns→µs truncation); a
    * native timestamp column is only normalized to TIMESTAMP_NTZ so
    * parquet output round-trips as naive timestamps in both engines.
    * The conf is set inside the loader because the driver's Verify/Bench
    * sessions do not set it; it is a dynamic SQLConf and only affects
    * NANOS columns, so setting it repeatedly is safe.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    // NTZ is always CONSTRUCTED as the UTC rendering of the stored
    // instant via naive timestampadd (TZ-invariant — probed, see
    // Det.ntzMicros), never via a cast through TIMESTAMP, which would
    // bake the session time zone into the loaded values. Each accepted
    // encoding is matched explicitly; a new testdata generation with an
    // unexpected ts type must fail loudly here, not silently coerce.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // parquet TIMESTAMP(NANOS) surfaced as epoch-ns long
        raw.withColumn(
          "ts",
          expr("timestampadd(MICROSECOND, ts div 1000, cast('1970-01-01 00:00:00' as timestamp_ntz))")
        )
      case TimestampType => // instant micros; unix_micros is TZ-independent
        raw.withColumn(
          "ts",
          expr("timestampadd(MICROSECOND, unix_micros(ts), cast('1970-01-01 00:00:00' as timestamp_ntz))")
        )
      case TimestampNTZType =>
        raw
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unexpected parquet type $other — expected INT64 epoch-nanos " +
            "(nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ; refusing to coerce silently"
        )
    }
  }
}
