package graft

/** Session-time-zone robustness (ADVICE r7, extended registry-wide in
  * r9): every shipped entry point pins UTC, but a library caller
  * building their own session must get the oracle-pinned values in ANY
  * zone. The events loader constructs NTZ via naive `timestampadd`
  * (never a cast through TIMESTAMP) and epoch/bucket arithmetic in the
  * PROBED set goes through [[Det.ntzMicros]]/`ntzTrunc*` (naive field
  * extraction) — so time-bucketed and duration outputs must be
  * bit-identical under a DST-shifting session zone. The probe set is
  * every `ts_*`/`events_*` registry row (derived from the registry, so
  * new rows are auto-covered) plus each remaining query whose plan
  * touches timestamps or dates. America/New_York is the probe zone: a
  * 5/4-hour shift plus a spring-forward gap, either of which would
  * move midnight-adjacent events across day/hour/week buckets under
  * the cast-based spellings this suite has caught (date_trunc on NTZ,
  * DATE→TIMESTAMP casts, unix_micros(cast(..))).
  */
class TzRobustnessSpec extends SparkSuite {

  // The WHOLE ts_/events_ registry family, derived from the registry so a
  // new time-series row is auto-probed, plus every other query whose plan
  // touches timestamps/dates (date_trunc, casts through DATE, as-of /
  // interval joins, date-keyed windows). VERDICT r8 #5: 16 hand-picked
  // probes → the full family.
  private val probes: Seq[String] = {
    val family = Registry.all.map(_.name).filter(n => n.startsWith("ts_") || n.startsWith("events_"))
    val extras = Seq(
      "agg_cohort_retention", "fn_date", "win_range_frame", "win_lag_lead",
      "win_gaps_islands", "win_pattern_3seq", "join_asof", "join_asof_native",
      "join_theta_range", "join_interval_overlap", "sql_recursive"
    )
    (family ++ extras).distinct
  }

  test("NtzEpochMicros reinterpret equals naive field arithmetic, in any session zone") {
    import org.apache.spark.sql.functions._
    val key  = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    try {
      for (tz <- Seq("UTC", "America/New_York")) {
        spark.conf.set(key, tz)
        val bad = Tables
          .events(spark, sf)
          .select(
            (Det.ntzMicros(col("ts")) =!= Det.ntzMicrosFields(col("ts"))).as("m"),
            (Det.ntzTruncHour(col("ts")) =!=
              org.apache.spark.sql.graftx.NtzReinterpret
                .ntz(Det.ntzMicrosFields(col("ts")) - pmod(Det.ntzMicrosFields(col("ts")), lit(3600000000L)))).as("h")
          )
          .agg(sum(when(col("m") || col("h"), 1).otherwise(0)).as("bad"))
          .collect()(0)
          .getLong(0)
        assert(bad == 0L, s"$tz: reinterpret diverges from field arithmetic on $bad rows")
      }
    } finally spark.conf.set(key, prev)
  }

  test("time-bucketed queries are identical under UTC and America/New_York sessions") {
    val key  = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    def run(name: String): Seq[String] =
      Registry.byName(name).run(spark, sf).collect().map(_.toString).toSeq
    try {
      val bad = probes.flatMap { name =>
        spark.conf.set(key, "UTC")
        val utc = run(name)
        spark.conf.set(key, "America/New_York")
        val ny = run(name)
        assert(utc.nonEmpty, s"$name returned no rows")
        if (utc == ny) None
        else {
          val i = utc.zip(ny).indexWhere { case (a, b) => a != b }
          Some(s"$name (first diff row $i: ${utc.lift(i)} vs ${ny.lift(i)})")
        }
      }
      assert(bad.isEmpty, s"${bad.size} queries diverge with the session time zone:\n${bad.mkString("\n")}")
    } finally spark.conf.set(key, prev)
  }
}
