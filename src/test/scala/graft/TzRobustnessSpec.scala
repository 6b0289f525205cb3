package graft

/** Session-time-zone robustness (ADVICE r7): every shipped entry point
  * pins UTC, but a library caller building their own session must get
  * the oracle-pinned values in ANY zone. The events loader constructs
  * NTZ via naive `timestampadd` (never a cast through TIMESTAMP) and
  * all epoch/bucket arithmetic goes through [[Det.ntzMicros]] (naive
  * field extraction) — so time-bucketed and duration outputs must be
  * bit-identical under a DST-shifting session zone. America/New_York is
  * the probe: a 5/4-hour shift plus a spring-forward gap, either of
  * which would move midnight-adjacent events across day/hour buckets
  * under the old cast-based spellings.
  */
class TzRobustnessSpec extends SparkSuite {

  private val probes = Seq(
    "events_dau_wau", "ts_periodogram", "ts_resample_hourly", "ts_fill_forward",
    "join_interval_overlap", "ts_tumbling_1h", "ts_sliding_15m5m", "ts_session_30m",
    "ts_downsample_m4", "ts_seasonal_profile", "ts_cross_correlation", "win_lag_lead",
    "win_gaps_islands", "win_pattern_3seq", "join_asof", "events_markov_transition"
  )

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
      for (name <- probes) {
        spark.conf.set(key, "UTC")
        val utc = run(name)
        spark.conf.set(key, "America/New_York")
        val ny = run(name)
        assert(utc == ny, s"$name diverges with the session time zone")
        assert(utc.nonEmpty)
      }
    } finally spark.conf.set(key, prev)
  }
}
