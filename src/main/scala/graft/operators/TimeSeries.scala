package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series operators (SURVEY §2.7): tumbling windows, sliding
  * windows, sessionization. These are the oracle-checked twins of the
  * Structured Streaming demos in [[graft.streaming.StreamDemos]] — same
  * semantics, batch execution.
  *
  * 100 TB notes: all three are single-shuffle shapes. Tumbling/sliding
  * group on a derived bucket key (map-side partial agg applies);
  * sessionization shuffles once on user_id and then runs pure window
  * functions inside each user partition — the classic
  * lag→flag→running-sum pattern parallelizes per-user with no global
  * ordering. Sliding windows expand each event into windows/slide rows
  * BEFORE the shuffle (3× here), the standard streaming-engine trick —
  * identical integer bucket arithmetic in both engines.
  */
object TimeSeries {

  /** Hourly tumbling rollup per event_type: count, deterministic avg
    * value, sum of the JSON payload key. */
  val tsTumbling1h: Q = Q(
    "ts_tumbling_1h",
    Some(
      "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, " +
        Det.oRN(Det.oAvg("value"), 6) + " AS avg_value, " +
        "cast(sum(json_extract(props, '$.k')::INT) as bigint) AS sum_k " +
        "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"
    ),
    (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type")
        )
        .agg(
          count(lit(1)).as("n"),
          Det.rN(Det.davg(col("value")), 6).as("avg_value"),
          sum(get_json_object(col("props"), "$.k").cast("int")).as("sum_k")
        )
        .orderBy(col("hour"), col("event_type"))
  )

  /** 15-minute windows sliding every 5 minutes. Each event belongs to 3
    * windows whose starts are the aligned 5-min bucket minus k*300s for
    * k in 0..2 — the same integer formula on both engines, so parity is
    * exact. Window start emitted as epoch seconds (BIGINT). */
  val tsSliding15m5m: Q = Q(
    "ts_sliding_15m5m",
    Some(
      "SELECT (epoch_us(ts) // 1000000 // 300) * 300 - k * 300 AS win_start_sec, " +
        "count(*) AS n, " + Det.oRN(Det.oSum("value"), 6) + " AS sum_value " +
        "FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) " +
        "GROUP BY 1 ORDER BY win_start_sec"
    ),
    (spark, dir) =>
      Tables
        .events(spark, dir)
        .select(col("ts").cast("timestamp").cast("long").as("sec"), col("value"))
        .withColumn("k", explode(array(lit(0), lit(1), lit(2))))
        .groupBy((expr("sec div 300") * 300 - col("k") * 300).as("win_start_sec"))
        .agg(
          count(lit(1)).as("n"),
          Det.rN(Det.dsum(col("value")), 6).as("sum_value")
        )
        .orderBy(col("win_start_sec"))
  )

  /** Batch sessionization: per user, a new session starts after a
    * ≥30-min silence. lag → boundary flag → running sum = session id,
    * then one aggregate per (user, session). Pure window SQL, identical
    * in both engines. */
  val tsSession30m: Q = Q(
    "ts_session_30m",
    Some(
      "WITH flagged AS (SELECT user_id, ts, event_id, value, " +
        "CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts) IS NULL " +
        "OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "sess AS (SELECT *, cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id FROM flagged) " +
        "SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events, " + Det.oRN(Det.oSum("value"), 6) + " AS sum_value " +
        "FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables
        .events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn(
          "gap_us",
          expr("timestampdiff(MICROSECOND, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)")
        )
        .withColumn(
          "new_sess",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0)
        )
        .withColumn("session_id", sum(col("new_sess")).over(run).cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          Det.rN(Det.dsum(col("value")), 6).as("sum_value")
        )
        .orderBy(col("user_id"), col("session_id"))
    }
  )

  /** The native session_window operator in BATCH mode — same 30-min-gap
    * semantics as the hand-rolled lag/flag/running-sum twin above
    * (session start = first event, so the oracle is the same
    * sessionization SQL projected to (user, start, n)). */
  val tsSessionWindowBatch: Q = Q(
    "ts_session_window_batch",
    Some(
      "WITH flagged AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts) IS NULL " +
        "OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flagged) " +
        "SELECT user_id, min(ts) AS session_start, count(*) AS n_events " +
        "FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"
    ),
    (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          col("w.start").cast("timestamp_ntz").as("session_start"),
          col("n_events")
        )
        .orderBy(col("user_id"), col("session_start"))
  )

  def qs: Seq[Q] = Seq(tsTumbling1h, tsSliding15m5m, tsSession30m, tsSessionWindowBatch)
}
