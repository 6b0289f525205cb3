package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
          Det.ntzTruncHour(col("ts")).as("hour"),
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
        .select(floor(Det.ntzMicros(col("ts")) / 1000000L).cast("long").as("sec"), col("value"))
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
          Det.ntzMicros(col("ts")) - Det.ntzMicros(lag(col("ts"), 1).over(w))
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

  /** Forward-fill (LOCF): carry each user's last observed value over
    * the gaps — the standard repair for sparse sensor/metric streams.
    * Nulls are synthesized deterministically (value < 20 → ~33% null),
    * then `last(v, ignoreNulls)` over an unbounded-preceding row frame
    * fills them. One shuffle on user_id; the frame is computed in a
    * single pass per user partition.
    */
  val tsFillForward: Q = Q(
    "ts_fill_forward",
    Some(
      "SELECT event_id, user_id, ts, " +
        "CASE WHEN value < 20 THEN NULL ELSE value END AS v, " +
        "last_value(CASE WHEN value < 20 THEN NULL ELSE value END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled " +
        "FROM events ORDER BY event_id"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables
        .events(spark, dir)
        .withColumn("v", when(col("value") < 20, lit(null)).otherwise(col("value")))
        .select(
          col("event_id"),
          col("user_id"),
          col("ts"),
          col("v"),
          last(col("v"), ignoreNulls = true).over(w).as("filled")
        )
        .orderBy(col("event_id"))
    }
  )

  /** Resample to a regular hourly grid per user (first 10 users):
    * per-user hourly sums where events exist, an explicit
    * `sequence(t0, t1, 1 hour)` grid for the hours where they don't,
    * and forward-fill across the gaps — the canonical
    * resample-then-LOCF time-series pipeline.
    *
    * 100 TB notes: the grid generates |users| × |hours| rows — at
    * scale that product is the operator's real output size and is
    * generated distributed (explode of per-user sequences after a
    * tiny span aggregate), never on the driver. One shuffle for the
    * hourly aggregate, one for the user-partitioned fill window.
    */
  val tsResampleHourly: Q = Q(
    "ts_resample_hourly",
    Some(
      "WITH base AS (SELECT user_id, date_trunc('hour', ts) AS h, value " +
        "FROM events WHERE user_id < 10), " +
        "spans AS (SELECT user_id, min(h) AS t0, max(h) AS t1 FROM base GROUP BY 1), " +
        "grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h FROM spans), " +
        "hourly AS (SELECT user_id, h, " + Det.oRN(Det.oSum("value"), 6) + " AS hv " +
        "FROM base GROUP BY 1, 2) " +
        "SELECT g.user_id, g.h, hv, " +
        "last_value(hv IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled " +
        "FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h " +
        "ORDER BY g.user_id, g.h"
    ),
    (spark, dir) => {
      val base = Tables
        .events(spark, dir)
        .filter(col("user_id") < 10)
        .select(col("user_id"), Det.ntzTruncHour(col("ts")).as("h"), col("value"))
      val spans = base.groupBy(col("user_id")).agg(min(col("h")).as("t0"), max(col("h")).as("t1"))
      val grid = spans.select(
        col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("h")
      )
      val hourly = base
        .groupBy(col("user_id"), col("h"))
        .agg(Det.rN(Det.dsum(col("value")), 6).as("hv"))
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .join(hourly, Seq("user_id", "h"), "left")
        .select(
          col("user_id"),
          col("h"),
          col("hv"),
          last(col("hv"), ignoreNulls = true).over(w).as("filled")
        )
        .orderBy(col("user_id"), col("h"))
    }
  )

  /** Exponentially-weighted moving average per user (α = 0.2) — the
    * smoothing primitive window frames cannot express (each output
    * depends on the PREVIOUS output, not a fixed frame). Realized as a
    * deterministic sequential fold: collect each user's values in
    * (ts, event_id) order and left-fold 0.8·acc + 0.2·x from a zero
    * init — both engines run the identical op sequence, so the doubles
    * agree bit-for-bit. State per user is its event list; at 100 TB
    * the same fold runs incrementally as stateful streaming
    * (mapGroupsWithState carrying acc) instead of a collect_list. */
  val tsEwma: Q = Q(
    "ts_ewma",
    Some(
      "SELECT user_id, count(*)::BIGINT AS n, " +
        Det.oRN(
          "list_reduce(list_prepend(0.0::DOUBLE, list(value::DOUBLE ORDER BY ts, event_id)), " +
            "(acc, x) -> 0.8::DOUBLE * acc + 0.2::DOUBLE * x)",
          6
        ) + " AS ewma " +
        "FROM events WHERE value IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    (spark, dir) =>
      Tables
        .events(spark, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq")
        )
        .select(
          col("user_id"),
          col("n"),
          Det.rN(
            aggregate(
              transform(col("seq"), s => s.getField("value")),
              lit(0.0),
              (acc, x) => lit(0.8) * acc + lit(0.2) * x
            ),
            6
          ).as("ewma")
        )
        .orderBy(col("user_id")),
  )

  /** Linear gap interpolation — the numeric sibling of
    * [[tsFillForward]]'s LOCF: a masked reading is reconstructed from
    * its nearest known neighbors on the SAME user's timeline, weighted
    * by where its timestamp falls between theirs. Edges degrade
    * gracefully (leading gap → backfill, trailing gap → carry
    * forward). All four neighbor lookups are IGNORE NULLS window
    * functions over ONE user-hash shuffle (two frame directions share
    * the partitioning, so Catalyst reuses the exchange) — linear and
    * partition-parallel at 100 TB, no self-join. Determinism: the
    * interpolation fraction divides identical epoch-µs longs (both
    * engines truncate the parquet NANOS column ns→µs, SURVEY §1.3),
    * and the arithmetic is pure IEEE on identical doubles, rounded at
    * 6 dp for the usual half-point safety.
    */
  val tsInterpolate: Q = Q(
    "ts_interpolate",
    Some(
      "WITH m AS (SELECT event_id, user_id, ts, epoch_us(ts) AS tu, " +
        "CASE WHEN value < 20 THEN NULL ELSE value END AS v FROM events), " +
        "w AS (SELECT event_id, user_id, ts, tu, v, " +
        "last_value(v IGNORE NULLS) OVER pb AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN tu END IGNORE NULLS) OVER pb AS pt, " +
        "first_value(v IGNORE NULLS) OVER fb AS nv, " +
        "first_value(CASE WHEN v IS NOT NULL THEN tu END IGNORE NULLS) OVER fb AS nt " +
        "FROM m WINDOW " +
        "pb AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "fb AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT event_id, user_id, ts, v, " +
        Det.oRN(
          "CASE WHEN v IS NOT NULL THEN v " +
            "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN " +
            "pv + (nv - pv) * ((tu - pt)::DOUBLE / (nt - pt)::DOUBLE) " +
            "WHEN pv IS NOT NULL THEN pv ELSE nv END",
          6
        ) + " AS vi FROM w ORDER BY event_id"
    ),
    (spark, dir) => {
      val pb = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fb = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables
        .events(spark, dir)
        .withColumn("v", when(col("value") < 20, lit(null)).otherwise(col("value")))
        .withColumn("tu", Det.ntzMicros(col("ts")))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(pb))
        .withColumn("pt", last(when(col("v").isNotNull, col("tu")), ignoreNulls = true).over(pb))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(fb))
        .withColumn("nt", first(when(col("v").isNotNull, col("tu")), ignoreNulls = true).over(fb))
        .select(
          col("event_id"),
          col("user_id"),
          col("ts"),
          col("v"),
          Det.rN(
            when(col("v").isNotNull, col("v"))
              .when(
                col("pv").isNotNull && col("nv").isNotNull,
                col("pv") + (col("nv") - col("pv")) *
                  ((col("tu") - col("pt")).cast("double") / (col("nt") - col("pt")).cast("double"))
              )
              .when(col("pv").isNotNull, col("pv"))
              .otherwise(col("nv")),
            6
          ).as("vi")
        )
        .orderBy(col("event_id"))
    }
  )

  /** Last-touch attribution in ONE pass over the interleaved event
    * stream: each purchase is attributed to the same user's most
    * recent preceding view via a conditional IGNORE NULLS window —
    * no purchases×views self-join, no as-of join, just one user-hash
    * shuffle and a per-user sort, then a 4-row bucket report
    * (conversion-lag histogram + mean minutes-to-convert). This is
    * the shape that survives 100 TB of events: the window state is
    * one timestamp per user, and attribution for EVERY funnel stage
    * could share the same single pass (one conditional last() per
    * stage). Determinism: both engines sort on the identical
    * truncated epoch-µs key, lags are exact long differences, and the
    * mean goes through the decimal-sum rule.
    */
  val tsAttribution: Q = Q(
    "ts_attribution",
    Some(
      "WITH m AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events), " +
        "w AS (SELECT *, last_value(CASE WHEN event_type = 'view' THEN tu END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY tu, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv FROM m), " +
        "p AS (SELECT tu - lv AS lag_us FROM w WHERE event_type = 'purchase') " +
        "SELECT CASE WHEN lag_us IS NULL THEN 'unattributed' " +
        "WHEN lag_us <= 3600000000 THEN 'within_1h' " +
        "WHEN lag_us <= 86400000000 THEN 'within_24h' " +
        "ELSE 'older' END AS bucket, count(*) AS n_purchases, " +
        Det.oRN(s"${Det.oSum("lag_us / 60000000.0")} / count(*)", 4) + " AS avg_minutes " +
        "FROM p GROUP BY bucket ORDER BY bucket"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("tu"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables
        .events(spark, dir)
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          Det.ntzMicros(col("ts")).as("tu")
        )
        .withColumn(
          "lv",
          last(when(col("event_type") === "view", col("tu")), ignoreNulls = true).over(w)
        )
        .filter(col("event_type") === "purchase")
        .withColumn("lag_us", col("tu") - col("lv"))
        .withColumn(
          "bucket",
          when(col("lag_us").isNull, "unattributed")
            .when(col("lag_us") <= 3600000000L, "within_1h")
            .when(col("lag_us") <= 86400000000L, "within_24h")
            .otherwise("older")
        )
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_purchases"),
          Det.rN(Det.dsum(col("lag_us") / 60000000.0) / count(lit(1)), 4).as("avg_minutes")
        )
        .orderBy(col("bucket"))
    }
  )

  /** Per-user lag-1 autocorrelation of the event value series — the
    * "is this signal trending or noise" screen run before any
    * heavier-weight time-series modeling. One lag window over the
    * (user, time) partitioning forms the (xₜ, xₜ₊₁) pairs, then
    * Pearson r comes from the same exact decimal moment sums as
    * `agg_corr` (order-free, mergeable partials). Window order is
    * (ts, event_id) — event_id breaks µs-timestamp ties so the pairing
    * is cross-engine unambiguous. Users need ≥ 10 pairs and non-zero
    * variance on both legs (moment comparisons on identical doubles
    * select identical rows).
    */
  val tsAutocorr: Q = Q(
    "ts_autocorr",
    Some(
      "WITH p AS (SELECT user_id, lag(value) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS x, value AS y FROM events), " +
        "m AS (SELECT user_id, count(*)::DOUBLE AS n, " +
        s"${Det.oSum("x")} AS sx, ${Det.oSum("y")} AS sy, ${Det.oSum("x * y")} AS sxy, " +
        s"${Det.oSum("x * x")} AS sxx, ${Det.oSum("y * y")} AS syy " +
        "FROM p WHERE x IS NOT NULL GROUP BY 1) " +
        "SELECT user_id, cast(n as bigint) AS n_pairs, " +
        Det.oRN(
          "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))",
          6
        ) + " AS autocorr FROM m " +
        "WHERE n >= 10 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 " +
        "ORDER BY user_id"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val m = Tables
        .events(spark, dir)
        .select(col("user_id"), lag(col("value"), 1).over(w).as("x"), col("value").as("y"))
        .filter(col("x").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.dsum(col("x")).as("sx"),
          Det.dsum(col("y")).as("sy"),
          Det.dsum(col("x") * col("y")).as("sxy"),
          Det.dsum(col("x") * col("x")).as("sxx"),
          Det.dsum(col("y") * col("y")).as("syy")
        )
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      m.filter(col("n") >= 10 && vx > 0 && vy > 0)
        .select(
          col("user_id"),
          col("n").cast("long").as("n_pairs"),
          Det.rN((col("n") * col("sxy") - col("sx") * col("sy")) / sqrt(vx * vy), 6)
            .as("autocorr")
        )
        .orderBy(col("user_id"))
    }
  )

  /** CUSUM change-point screen per user: cumulative sum of deviations
    * from the user mean, reported as the walk's range (max−min, the
    * CUSUM statistic) and the timestamp where the walk peaks — the
    * standard "did this series shift level, and when" detector.
    *
    * Determinism is the interesting part. The naive S_k = Σ(x − μ)
    * double fold is NOT portable twice over: engines bracket window
    * sums differently (DuckDB segment trees vs Spark's running fold),
    * and even casting x − μ to decimal per-row straddles rounding
    * boundaries an ulp apart (measured: one flipped 6-dp digit at
    * sf0.01). So the walk is computed EXACTLY, scaled by n:
    * n·S_k = n·P_k − k·T with P_k the decimal prefix sum, T the decimal
    * total, k the row index — every term an exact decimal, no double
    * enters until ONE division by n at the output. The peak row
    * tie-breaks on (ts, event_id). Two window passes over one
    * (user, time) partitioning; linear at any scale. Decimal widths are
    * sized for |Σx| ≤ 10¹² per entity — far beyond the fixture and
    * still exact at cluster scale.
    */
  val tsChangepoint: Q = Q(
    "ts_changepoint",
    Some(
      "WITH s AS (SELECT user_id, ts, event_id, " +
        "cast(sum(cast(value as decimal(20,8))) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as decimal(20,8)) AS p, " +
        "cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) as decimal(10,0)) AS k, " +
        "cast(sum(cast(value as decimal(20,8))) OVER (PARTITION BY user_id) as decimal(20,8)) AS t, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events FROM events), " +
        "w AS (SELECT user_id, ts, event_id, n_events, " +
        "p * cast(n_events as decimal(10,0)) - k * t AS ns FROM s), " +
        "r AS (SELECT user_id, ts, n_events, " +
        "max(ns) OVER (PARTITION BY user_id) AS nmax, " +
        "min(ns) OVER (PARTITION BY user_id) AS nmin, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ns DESC, ts, event_id) AS rk " +
        "FROM w) " +
        "SELECT user_id, n_events, " +
        Det.oRN("cast(nmax - nmin as double) / n_events", 6) + " AS cusum_range, " +
        "ts AS peak_ts FROM r WHERE rk = 1 ORDER BY user_id"
    ),
    (spark, dir) => {
      val byUser  = Window.partitionBy(col("user_id"))
      val order   = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ordered = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dx      = col("value").cast(DecimalType(20, 8))
      val s = Tables
        .events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("p", sum(dx).over(ordered).cast(DecimalType(20, 8)))
        .withColumn("k", row_number().over(order).cast(DecimalType(10, 0)))
        .withColumn("t", sum(dx).over(byUser).cast(DecimalType(20, 8)))
        .withColumn("n_events", count(lit(1)).over(byUser))
        .withColumn(
          "ns",
          col("p") * col("n_events").cast(DecimalType(10, 0)) - col("k") * col("t")
        )
      val rk = Window.partitionBy(col("user_id")).orderBy(col("ns").desc, col("ts"), col("event_id"))
      s.withColumn("nmax", max(col("ns")).over(byUser))
        .withColumn("nmin", min(col("ns")).over(byUser))
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") === 1)
        .select(
          col("user_id"),
          col("n_events"),
          Det.rN((col("nmax") - col("nmin")).cast("double") / col("n_events"), 6)
            .as("cusum_range"),
          col("ts").as("peak_ts")
        )
        .orderBy(col("user_id"))
    }
  )

  /** Hour-of-day seasonal profile per event type: event share and mean
    * value for each of the 24 clock hours — the "when does this signal
    * happen" profile computed before any anomaly threshold is set (a
    * spike at 3am matters; the same count at noon is baseline). One
    * groupBy on a derived (type, hour) key — map-side combinable,
    * embarrassingly parallel; the share denominator comes from a
    * window over the 120-row aggregate, not a second scan.
    */
  val tsSeasonalProfile: Q = Q(
    "ts_seasonal_profile",
    Some(
      "WITH h AS (SELECT event_type, hour(ts) AS hr, count(*) AS n_events, " +
        s"${Det.oSum("value")} AS sv FROM events GROUP BY 1, 2) " +
        "SELECT event_type, hr, n_events, " +
        Det.oRN("sv / n_events", 6) + " AS avg_value, " +
        Det.oRN("n_events::DOUBLE / sum(n_events) OVER (PARTITION BY event_type)", 6) +
        " AS share FROM h ORDER BY event_type, hr"
    ),
    (spark, dir) => {
      val byType = Window.partitionBy(col("event_type"))
      Tables
        .events(spark, dir)
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sv"))
        .select(
          col("event_type"),
          col("hr"),
          col("n_events"),
          Det.rN(col("sv") / col("n_events"), 6).as("avg_value"),
          Det.rN(col("n_events").cast("double") / sum(col("n_events")).over(byType), 6)
            .as("share")
        )
        .orderBy(col("event_type"), col("hr"))
    }
  )

  /** M4 downsampling — the published min/max/first/last-per-bucket
    * reduction that visualization and monitoring pipelines use to
    * shrink a series while preserving its rendered envelope exactly.
    * Per (event_type, hour) bucket: the first and last values in time
    * order plus the bucket extremes. First/last are selected by
    * row_number over the (ts, event_id) order (event_id breaks µs
    * ties; DuckDB 1.0's arg_min/arg_max cannot take a composite key),
    * then folded in the same aggregate as min/max — one window pass +
    * one groupBy, linear at any scale.
    */
  val tsDownsampleM4: Q = Q(
    "ts_downsample_m4",
    Some(
      "WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket, value, " +
        "row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts) " +
        "ORDER BY ts, event_id) AS rn, " +
        "row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts) " +
        "ORDER BY ts DESC, event_id DESC) AS rnd FROM events) " +
        "SELECT event_type, bucket, count(*) AS n_points, " +
        "max(CASE WHEN rn = 1 THEN value END) AS v_first, " +
        "max(CASE WHEN rnd = 1 THEN value END) AS v_last, " +
        "min(value) AS v_min, max(value) AS v_max " +
        "FROM b GROUP BY 1, 2 ORDER BY event_type, bucket"
    ),
    (spark, dir) => {
      val bucket = Det.ntzTruncHour(col("ts"))
      val asc = Window
        .partitionBy(col("event_type"), bucket)
        .orderBy(col("ts"), col("event_id"))
      val desc = Window
        .partitionBy(col("event_type"), bucket)
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables
        .events(spark, dir)
        .select(col("event_type"), bucket.as("bucket"), col("value"),
          row_number().over(asc).as("rn"), row_number().over(desc).as("rnd"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(
          count(lit(1)).as("n_points"),
          max(when(col("rn") === 1, col("value"))).as("v_first"),
          max(when(col("rnd") === 1, col("value"))).as("v_last"),
          min(col("value")).as("v_min"),
          max(col("value")).as("v_max")
        )
        .orderBy(col("event_type"), col("bucket"))
    }
  )

  /** Robust anomaly screen: flag events whose |value − median| exceeds
    * 3× the median-absolute-deviation of their event_type. Median/MAD
    * are the robust location/scale pair — unlike mean ± 3σ they don't
    * let the outliers being hunted inflate the threshold that should
    * catch them.
    *
    * Determinism: both engines linear-interpolate exact percentiles
    * over identical doubles (the agg_percentile parity result); the
    * flag compares 6-dp trunc-ROUNDED deviation against the 6-dp
    * trunc-rounded threshold so a last-ulp interpolation wobble cannot
    * flip a row.
    *
    * 100 TB: two grouped exact percentiles (event_type keyed — low
    * cardinality, and exact percentile shuffles only (type, value)
    * pairs) with the tiny per-type tables broadcast back across the
    * event stream; the flagging pass is map-side. At petabyte row
    * counts the exact percentile is swapped for a t-digest/KLL sketch
    * (mergeable, bounded memory) — same plan shape, sketch agg. */
  val tsAnomalyMad: Q = Q(
    "ts_anomaly_mad",
    Some(
      "WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type), " +
        "dev AS (SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS dev " +
        "FROM events e JOIN med m USING (event_type)), " +
        "mads AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type) " +
        "SELECT d.event_id, d.event_type, " +
        Det.oRS("d.value", 6) + " AS value, " + Det.oRN("d.dev", 6) + " AS dev " +
        "FROM dev d JOIN mads m USING (event_type) " +
        "WHERE " + Det.oRN("d.dev", 6) + " > " + Det.oRN("3.0 * m.mad", 6) + " " +
        "ORDER BY d.event_id"
    ),
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"), col("value"))
      val med = ev
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev
        .join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val mads = dev
        .groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev
        .join(broadcast(mads), Seq("event_type"))
        .filter(Det.rN(col("dev"), 6) > Det.rN(lit(3.0) * col("mad"), 6))
        .select(
          col("event_id"),
          col("event_type"),
          Det.rS(col("value"), 6).as("value"),
          Det.rN(col("dev"), 6).as("dev")
        )
        .orderBy(col("event_id"))
    }
  )

  /** Holt's linear (double-exponential) smoothing per user: level +
    * trend state folded over the time-ordered value sequence
    * (α = 0.5, β = 0.3; l₀ = first value, b₀ = 0), reporting the final
    * state and the one-step-ahead forecast l + b — [[tsEwma]]'s
    * two-state sibling, and the standard short-horizon forecaster a
    * monitoring pipeline runs per entity.
    *
    * Determinism: the fold is inherently ordered, so both engines
    * materialize the per-user sequence sorted by (ts, event_id) and
    * reduce with an IDENTICAL chain of IEEE ops (the level update is
    * spelled twice inside the trend update in BOTH spellings — neither
    * engine's lambda has a let-binding, and keeping the double
    * computation keeps the op chains identical); trunc-rounded signed
    * at 6 dp (trend goes negative).
    *
    * 100 TB: one shuffle on user_id; per-user state is O(1) and the
    * sequence fold is linear — the same shape Structured Streaming's
    * mapGroupsWithState runs incrementally (StatefulDemos.userEwma is
    * the single-state streaming twin). */
  val tsHolt: Q = Q(
    "ts_holt",
    Some(
      // NOT list_reduce: DuckDB 1.0 mis-evaluates multi-field struct
      // accumulators in list_reduce lambdas (measured: fold of
      // (acc,s)->{'l':acc.l+s.l,'b':acc.b+acc.l} over 4 elements gives
      // b=9 where the left fold is 4) — the recursive CTE carries the
      // two-field state correctly, one recursion level per sequence
      // position.
      "WITH RECURSIVE s AS (SELECT user_id, list(value::DOUBLE ORDER BY ts, event_id) AS vs " +
        "FROM events WHERE value IS NOT NULL GROUP BY user_id), " +
        "r AS (SELECT user_id, 1 AS i, vs[1] AS l, 0.0::DOUBLE AS b FROM s " +
        "UNION ALL SELECT r.user_id, r.i + 1, " +
        "0.5*s.vs[r.i+1] + 0.5*(r.l + r.b), " +
        "0.3*((0.5*s.vs[r.i+1] + 0.5*(r.l + r.b)) - r.l) + 0.7*r.b " +
        "FROM r JOIN s USING (user_id) WHERE r.i < len(s.vs)) " +
        "SELECT r.user_id, r.i::BIGINT AS n, " +
        Det.oRS("r.l", 6) + " AS level, " +
        Det.oRS("r.b", 6) + " AS trend, " +
        Det.oRS("r.l + r.b", 6) + " AS forecast " +
        "FROM r JOIN s USING (user_id) WHERE r.i = len(s.vs) ORDER BY r.user_id"
    ),
    (spark, dir) => {
      val lvl = (acc: Column, x: Column) =>
        lit(0.5) * x + lit(0.5) * (acc.getField("l") + acc.getField("b"))
      Tables
        .events(spark, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq")
        )
        .select(
          col("user_id"),
          col("n"),
          aggregate(
            transform(col("seq"), s => s.getField("value")),
            struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0).as("i")),
            (acc, x) =>
              when(acc.getField("i") === 0, struct(x.as("l"), lit(0.0).as("b"), lit(1).as("i")))
                .otherwise(
                  struct(
                    lvl(acc, x).as("l"),
                    (lit(0.3) * (lvl(acc, x) - acc.getField("l")) + lit(0.7) * acc.getField("b")).as("b"),
                    lit(1).as("i")
                  )
                )
          ).as("st")
        )
        .select(
          col("user_id"),
          col("n"),
          Det.rS(col("st.l"), 6).as("level"),
          Det.rS(col("st.b"), 6).as("trend"),
          Det.rS(col("st.l") + col("st.b"), 6).as("forecast")
        )
        .orderBy(col("user_id"))
    }
  )

  /** Lagged cross-correlation between the hourly view and purchase
    * series: Pearson r between views(t) and purchases(t+k) for
    * k = 0..6 hours — the lead–lag screen that answers "does view
    * traffic predict purchases, and at what delay" before anyone
    * fits a forecasting model on the pair.
    *
    * Determinism (§2.9 playbook): per-hour counts are exact longs; all
    * five moment sums (Σx, Σy, Σxy, Σx², Σy²) are exact integer sums;
    * the Pearson numerator n·Σxy − Σx·Σy is exact integer algebra; the
    * two variance terms are cast to double only for the final
    * multiply/sqrt/divide (their product can exceed 2⁶³, and doubles
    * are exact below 2⁵³ where the terms live) — a fixed three-op IEEE
    * chain, identical in both engines, trunc-rounded 6 dp.
    *
    * 100 TB: one hour-keyed count aggregate (partial map-side), a
    * 7-lag self-join on the tiny hourly grid, and a 7-group moment
    * aggregate — everything after the first count is grid-sized. */
  val tsCrossCorrelation: Q = Q(
    "ts_cross_correlation",
    Some(
      "WITH h AS (SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS t, " +
        "cast(count(*) FILTER (event_type = 'view') as bigint) AS x, " +
        "cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y " +
        "FROM events GROUP BY 1), " +
        "lg AS (SELECT unnest(range(0, 7)) AS lag), " +
        "p AS (SELECT lg.lag, a.x, b.y FROM lg, h a " +
        "JOIN h b ON b.t = a.t + lg.lag), " +
        "m AS (SELECT lag, cast(count(*) as bigint) AS n, " +
        "cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy, " +
        "cast(sum(x * y) as bigint) AS sxy, " +
        "cast(sum(x * x) as bigint) AS sxx, cast(sum(y * y) as bigint) AS syy " +
        "FROM p GROUP BY lag) " +
        "SELECT lag, n, CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 " +
        "THEN NULL ELSE " +
        Det.oRS(
          "(n * sxy - sx * sy)::DOUBLE / " +
            "sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE)",
          6
        ) + " END AS r FROM m ORDER BY lag"
    ),
    (spark, dir) => {
      val h = Tables
        .events(spark, dir)
        .groupBy(floor(Det.ntzMicros(col("ts")) / 3600000000L).cast("long").as("t"))
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y")
        )
      val lags = spark.range(0, 7).select(col("id").as("lag"))
      val pairs = lags
        .crossJoin(broadcast(h.select(col("t"), col("x"))))
        .join(
          h.select(col("t").as("tb"), col("y")),
          col("tb") === col("t") + col("lag"),
          "inner"
        )
      val m = pairs
        .groupBy(col("lag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy")
        )
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      m.select(
        col("lag"),
        col("n"),
        when(vx === 0 || vy === 0, lit(null))
          .otherwise(
            Det.rS(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt(vx.cast("double") * vy.cast("double")),
              6
            )
          )
          .as("r")
      ).orderBy(col("lag"))
    }
  )

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current), from lead() pairs on the
    * (ts, event_id) total order — the behavioral n-gram model behind
    * next-action prediction and funnel diagnosis ([[graft.operators
    * .Advanced.funnelVcp]] measures one path; this measures them all).
    *
    * Determinism: pair counts and row totals are exact; p is ONE
    * division trunc-rounded 6 dp; output ordered (cur, next).
    *
    * 100 TB: one shuffle on user_id for the lead window, then a
    * |types|²-bounded aggregate — the transition table is tiny at any
    * scale. */
  val eventsMarkovTransition: Q = Q(
    "events_markov_transition",
    Some(
      "WITH s AS (SELECT user_id, event_type AS cur, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), " +
        "c AS (SELECT cur, nxt, cast(count(*) as bigint) AS n FROM s WHERE nxt IS NOT NULL " +
        "GROUP BY cur, nxt), " +
        "t AS (SELECT cur, cast(sum(n) as bigint) AS tot FROM c GROUP BY cur) " +
        "SELECT c.cur, c.nxt, c.n, " + Det.oRN("c.n::DOUBLE / t.tot", 6) + " AS p " +
        "FROM c JOIN t USING (cur) ORDER BY c.cur, c.nxt"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val c = Tables
        .events(spark, dir)
        .select(col("user_id"), col("event_type").as("cur"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("cur")).agg(sum(col("n")).as("tot"))
      c.join(broadcast(t), Seq("cur"))
        .select(col("cur"), col("nxt"), col("n"), Det.rN(col("n").cast("double") / col("tot"), 6).as("p"))
        .orderBy(col("cur"), col("nxt"))
    }
  )

  /** STL-lite decomposition of the per-type hourly event series into
    * trend + seasonal + residual: trend = centered 25-hour moving
    * average (defined only where the window is full), seasonal = the
    * hour-of-day mean of the detrended series, residual = what's left.
    * The decomposition monitoring pipelines run before alerting on a
    * series — [[tsAnomalyMad]] on the RESIDUAL finds outliers the raw
    * series hides inside daily rhythm.
    *
    * Determinism: hourly counts are exact longs; trend is one IEEE
    * division of an exact window sum by 25; the hour-of-day mean is a
    * decimal-cast window sum (order-independent, §2.9) over identical
    * detrended doubles divided by an exact non-null count; residual is
    * one IEEE subtraction. Partial windows yield NULL trend/seasonal/
    * residual rather than a biased estimate.
    *
    * 100 TB: the series table is |types|×|hours| — already tiny
    * relative to the events it aggregates (one partial-agg shuffle);
    * both windows run inside per-type (or per-type×24) partitions, so
    * no global single-partition window exists. The MA is over the
    * OBSERVED hourly grid; a gappy series should be run through
    * [[tsResampleHourly]] first. */
  val tsStlDecompose: Q = Q(
    "ts_stl_decompose",
    Some(
      "WITH hh AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
        "cast(count(*) as bigint) AS y FROM events GROUP BY 1, 2), " +
        "t AS (SELECT event_type, h, y, " +
        "CASE WHEN count(*) OVER w = 25 THEN cast(sum(y) OVER w as bigint)::DOUBLE / 25 " +
        "ELSE NULL END AS trend FROM hh " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)), " +
        "d AS (SELECT event_type, h, y, trend, y::DOUBLE - trend AS det FROM t), " +
        "s AS (SELECT event_type, h, y, trend, det, " +
        "CASE WHEN det IS NULL THEN NULL ELSE " +
        "cast(sum(cast(det as decimal(30,8))) OVER p as double) / count(det) OVER p END AS seasonal " +
        "FROM d WINDOW p AS (PARTITION BY event_type, hour(h))) " +
        "SELECT event_type, h, y, " + Det.oRN("trend", 6) + " AS trend, " +
        Det.oRS("seasonal", 6) + " AS seasonal, " +
        Det.oRS("det - seasonal", 6) + " AS residual " +
        "FROM s ORDER BY event_type, h"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("h")).rowsBetween(-12, 12)
      val p = Window.partitionBy(col("event_type"), hour(col("h")))
      Tables
        .events(spark, dir)
        .groupBy(col("event_type"), Det.ntzTruncHour(col("ts")).as("h"))
        .agg(count(lit(1)).as("y"))
        .withColumn(
          "trend",
          when(count(lit(1)).over(w) === 25, sum(col("y")).over(w).cast("double") / 25)
        )
        .withColumn("det", col("y").cast("double") - col("trend"))
        .withColumn(
          "seasonal",
          when(
            col("det").isNotNull,
            sum(col("det").cast(DecimalType(30, 8))).over(p).cast("double") /
              count(col("det")).over(p)
          )
        )
        .select(
          col("event_type"),
          col("h"),
          col("y"),
          Det.rN(col("trend"), 6).as("trend"),
          Det.rS(col("seasonal"), 6).as("seasonal"),
          Det.rS(col("det") - col("seasonal"), 6).as("residual")
        )
        .orderBy(col("event_type"), col("h"))
    }
  )

  /** DFT periodogram of the hourly event-count series at the first 12
    * harmonics — the spectral dominant-cycle detector ([[tsSeasonalProfile]]
    * shows the daily shape; this ranks ALL cycle lengths by power, so a
    * weekly or half-day rhythm shows up without being guessed first).
    * Emits per-harmonic period length, spectral power, and power share.
    *
    * Determinism: the hour index and counts are exact integers; each
    * cos/sin term is an identical IEEE chain on identical inputs (π is
    * the same double in both engines); the a/b component sums and the
    * total-power window sum go through the order-independent decimal
    * sum — trunc-rounded outputs.
    *
    * 100 TB: one shuffle builds the hourly-count table (hours, not
    * events — tiny); the 12-harmonic grid cross joins THAT table, so
    * the trig work is |hours|·12 rows regardless of event volume, and
    * the final window runs over 12 rows. */
  val tsPeriodogram: Q = Q(
    "ts_periodogram",
    Some(
      "WITH h AS (SELECT cast(epoch(date_trunc('hour', ts)) as bigint) // 3600 AS eh, " +
        "count(*) AS x FROM events GROUP BY 1), " +
        "s AS (SELECT min(eh) AS h0, max(eh) - min(eh) + 1 AS nn, " +
        "cast(sum(x) as bigint) AS tx FROM h), " +
        "k AS (SELECT unnest(generate_series(1, 12)) AS k), " +
        "terms AS (SELECT k, " +
        "(x::DOUBLE - tx::DOUBLE / nn) * cos(2.0 * pi() * k * (eh - h0) / nn) AS c, " +
        "(x::DOUBLE - tx::DOUBLE / nn) * sin(2.0 * pi() * k * (eh - h0) / nn) AS sn " +
        "FROM h CROSS JOIN s CROSS JOIN k), " +
        "ab AS (SELECT k, " + Det.oSum("c") + " AS a, " + Det.oSum("sn") + " AS b " +
        "FROM terms GROUP BY k) " +
        "SELECT k, " + Det.oRN("nn::DOUBLE / k", 4) + " AS period_hours, " +
        Det.oRN("a * a + b * b", 6) + " AS power, " +
        Det.oRN(
          "(a * a + b * b) / cast(sum(cast(a * a + b * b as decimal(30,8))) OVER () as double)",
          6
        ) + " AS share " +
        "FROM ab CROSS JOIN s ORDER BY k"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val h = Tables
        .events(spark, dir)
        .groupBy(floor(Det.ntzMicros(col("ts")) / 3600000000L).cast("long").as("eh"))
        .agg(count(lit(1)).as("x"))
      val s = h.agg(
        min(col("eh")).as("h0"),
        (max(col("eh")) - min(col("eh")) + 1).as("nn"),
        sum(col("x")).cast("long").as("tx")
      )
      val ks = spark.range(1, 13).select(col("id").as("k"))
      val ang = lit(2.0) * lit(math.Pi) * col("k") * (col("eh") - col("h0")) / col("nn")
      val dev = col("x").cast("double") - col("tx").cast("double") / col("nn")
      val ab = h
        .crossJoin(broadcast(s))
        .crossJoin(broadcast(ks))
        .select(col("k"), (dev * cos(ang)).as("c"), (dev * sin(ang)).as("sn"))
        .groupBy(col("k"))
        .agg(Det.dsum(col("c")).as("a"), Det.dsum(col("sn")).as("b"))
      val pw = col("a") * col("a") + col("b") * col("b")
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(Det.onePart(col("k")))
      ab.crossJoin(broadcast(s))
        .select(
          col("k"),
          Det.rN(col("nn").cast("double") / col("k"), 4).as("period_hours"),
          Det.rN(pw, 6).as("power"),
          Det.rN(pw / sum(pw.cast(DecimalType(30, 8))).over(wAll).cast("double"), 6).as("share")
        )
        .orderBy(col("k"))
    }
  )

  /** DAU / WAU / stickiness per day — the engagement triple every
    * product-analytics deployment computes. WAU(d) = distinct users
    * active in [d−6, d], computed by the scale-standard trick: the
    * deduped (user, day) table explodes each row into its 7 trailing
    * target days MAP-SIDE, then one distinct + count per target day —
    * never a 7-way self-join of the fact table and never a
    * rolling-set window.
    *
    * Determinism: day truncation and all counts are exact;
    * stickiness is one IEEE division of exact integers, trunc-rounded.
    *
    * 100 TB: the first distinct reduces events to |users|×|days| rows
    * (the only event-volume shuffle); the ×7 expansion runs on THAT
    * table into a partial-aggregated distinct. Everything downstream
    * is |days|-sized. */
  val eventsDauWau: Q = Q(
    "events_dau_wau",
    Some(
      "WITH ud AS (SELECT DISTINCT user_id, cast(ts as date) AS d FROM events), " +
        "t AS (SELECT DISTINCT user_id, d + o::INT AS td FROM ud " +
        "CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)), " +
        "wau AS (SELECT td, count(*)::BIGINT AS wau FROM t GROUP BY td), " +
        "dau AS (SELECT d, count(*)::BIGINT AS dau FROM ud GROUP BY d) " +
        "SELECT d AS day, dau, wau, " + Det.oRN("dau::DOUBLE / wau", 6) + " AS stickiness " +
        "FROM dau JOIN wau ON td = d ORDER BY day"
    ),
    (spark, dir) => {
      val ud = Tables
        .events(spark, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val t = ud
        .crossJoin(broadcast(spark.range(0, 7).select(col("id").cast("int").as("o"))))
        .select(col("user_id"), date_add(col("d"), col("o")).as("td"))
        .distinct()
      val wau = t.groupBy(col("td")).agg(count(lit(1)).as("wau"))
      val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      dau
        .join(wau, dau("d") === wau("td"))
        .select(
          col("d").as("day"),
          col("dau"),
          col("wau"),
          Det.rN(col("dau").cast("double") / col("wau"), 6).as("stickiness")
        )
        .orderBy(col("day"))
    }
  )

  /** Rolling one-step-ahead forecast backtest over the hourly series
    * per event type: three zero-parameter forecasters — naive
    * (last hour), seasonal-naive (same hour yesterday), 6-hour moving
    * average — scored by MAE on every hour that has full history.
    * This is the eval loop that decides which forecaster guards an
    * alerting pipeline ([[tsHolt]] produces the forecasts; this ranks
    * them against the baselines every forecasting methodology demands
    * you beat first).
    *
    * Determinism: naive/seasonal diffs are exact integers, so their
    * MAEs are one division each; the MA6 prediction is an exact
    * integer sum over a 6-row frame divided by 6, and its |error| sum
    * goes through the decimal sum — trunc-rounded 4 dp.
    *
    * 100 TB: events collapse to the |types|×|hours| count table in
    * one partial-aggregated shuffle; the lag/frame windows and the
    * final per-type aggregate run inside per-type partitions of that
    * tiny table. */
  val tsBacktestNaive: Q = Q(
    "ts_backtest_naive",
    Some(
      "WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*)::BIGINT AS n " +
        "FROM events GROUP BY 1, 2), " +
        "f AS (SELECT event_type, hr, n, " +
        "lag(n, 1) OVER w AS p_naive, lag(n, 24) OVER w AS p_snaive, " +
        "sum(n) OVER (PARTITION BY event_type ORDER BY hr ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS s6, " +
        "row_number() OVER w AS rn " +
        "FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)) " +
        "SELECT event_type, count(*)::BIGINT AS n_evals, " +
        Det.oRN("cast(sum(abs(n - p_naive)) as bigint)::DOUBLE / count(*)", 4) + " AS mae_naive, " +
        Det.oRN("cast(sum(abs(n - p_snaive)) as bigint)::DOUBLE / count(*)", 4) + " AS mae_snaive, " +
        Det.oRN(s"${Det.oSum("abs(n::DOUBLE - s6::DOUBLE / 6)")} / count(*)", 4) + " AS mae_ma6 " +
        "FROM f WHERE rn > 24 GROUP BY event_type ORDER BY event_type"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      val frame6 = w.rowsBetween(-6, -1)
      val f = Tables
        .events(spark, dir)
        .groupBy(col("event_type"), Det.ntzTruncHour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .select(
          col("event_type"),
          col("n"),
          lag(col("n"), 1).over(w).as("p_naive"),
          lag(col("n"), 24).over(w).as("p_snaive"),
          sum(col("n")).over(frame6).as("s6"),
          row_number().over(w).as("rn")
        )
        .filter(col("rn") > 24)
      f.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_evals"),
          Det.rN(
            sum(abs(col("n") - col("p_naive"))).cast("long").cast("double") / count(lit(1)),
            4
          ).as("mae_naive"),
          Det.rN(
            sum(abs(col("n") - col("p_snaive"))).cast("long").cast("double") / count(lit(1)),
            4
          ).as("mae_snaive"),
          Det.rN(
            Det.dsum(abs(col("n").cast("double") - col("s6").cast("double") / 6)) / count(lit(1)),
            4
          ).as("mae_ma6")
        )
        .orderBy(col("event_type"))
    }
  )

  def qs: Seq[Q] = Seq(tsTumbling1h, tsSliding15m5m, tsSession30m, tsSessionWindowBatch,
    tsFillForward, tsResampleHourly, tsEwma, tsInterpolate, tsAttribution, tsAutocorr,
    tsChangepoint, tsSeasonalProfile, tsDownsampleM4, tsAnomalyMad, tsHolt,
    tsCrossCorrelation, eventsMarkovTransition, tsStlDecompose, tsPeriodogram,
    eventsDauWau, tsBacktestNaive)
}
