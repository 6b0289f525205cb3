package graft

import org.apache.spark.sql.functions._

/** The driver's testdata has shipped events.ts in two physical
  * encodings (FIXTURES.md ⚠): TIMESTAMP(NANOS,false) — readable only
  * as epoch-nanos LongType under `nanosAsLong` — and, since the
  * 2026-08-13 regeneration, plain TIMESTAMP(MICROS) NTZ. The loader
  * adapts on the read schema; both generations must surface the SAME
  * TIMESTAMP_NTZ values or every events-derived oracle hash breaks.
  */
class EventsLoaderSpec extends SparkSuite {
  test("ns-long and µs-native events files load to identical TIMESTAMP_NTZ values") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_events_gen").toString
    val nsDir = s"$base/ns"
    val usDir = s"$base/us"
    // 3 instants incl. a sub-µs remainder that ns→µs truncation drops
    val nanos = Seq(1704067200123456789L, 1704067200000000999L, 1706655432194062000L)
    nanos.zipWithIndex
      .map { case (n, i) => (i.toLong, n, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nsDir/events.parquet")
    // µs generation: the truncated instants written as native NTZ micros
    nanos.zipWithIndex
      .map { case (n, i) => (i.toLong, n / 1000L, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")

    val fromNs = Tables.events(spark, nsDir)
    val fromUs = Tables.events(spark, usDir)
    assert(fromNs.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(fromUs.schema("ts").dataType.typeName == "timestamp_ntz")
    val a = fromNs.orderBy("event_id").select("event_id", "ts").collect().toSeq
    val b = fromUs.orderBy("event_id").select("event_id", "ts").collect().toSeq
    assert(a == b, s"generations diverged: $a vs $b")
  }

  test("the real testdata loads with a timestamp_ntz ts whichever generation is on disk") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(ev.limit(1).count() == 1L)
  }

  test("an unexpected ts encoding fails loudly instead of coercing (ADVICE r7)") {
    import spark.implicits._
    val badDir = java.nio.file.Files.createTempDirectory("graft_badts").toString
    Seq((1L, "2024-01-01 00:00:00")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$badDir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, badDir))
    assert(e.getMessage.contains("unexpected parquet type"), e.getMessage)
  }
}
