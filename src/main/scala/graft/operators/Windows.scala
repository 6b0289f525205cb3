package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function operators (SURVEY §2.5).
  *
  * Every window partitions on a high-cardinality key (customer, user),
  * so at 100 TB each WindowExec task sorts only its own key group after
  * a single hash shuffle — no global sort, no skew concentration.
  * Ranking windows that intentionally contain ties (to exercise
  * rank/dense_rank semantics) are paired with a fully-ordered sibling
  * window for row_number/ntile, keeping every emitted value
  * deterministic (SURVEY §2.9.6).
  */
object Windows {

  /** row_number/rank/dense_rank/ntile/percent_rank. Ties come from a
    * 50k-wide price bucket; rank-family functions use the tied ordering,
    * row_number/ntile use the tie-broken one.
    */
  val winRanking: Q = Q(
    "win_ranking",
    Some(
      "WITH j AS (SELECT c_mktsegment, o_orderkey, " +
        "cast(floor(o_totalprice / 50000) as bigint) AS price_bucket " +
        "FROM orders JOIN customer ON o_custkey = c_custkey) " +
        "SELECT c_mktsegment, o_orderkey, price_bucket, " +
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY price_bucket DESC, o_orderkey) AS rn, " +
        "rank() OVER (PARTITION BY c_mktsegment ORDER BY price_bucket DESC) AS rnk, " +
        "dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY price_bucket DESC) AS drnk, " +
        "ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY price_bucket DESC, o_orderkey) AS nt, " +
        "round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY price_bucket DESC), 6) AS pr " +
        "FROM j ORDER BY c_mktsegment, rn"
    ),
    (spark, dir) => {
      val j = Tables
        .orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_mktsegment"),
          col("o_orderkey"),
          floor(col("o_totalprice") / 50000).cast("long").as("price_bucket")
        )
      val tied = Window.partitionBy(col("c_mktsegment")).orderBy(col("price_bucket").desc)
      val total = Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(col("price_bucket").desc, col("o_orderkey"))
      j.select(
        col("c_mktsegment"),
        col("o_orderkey"),
        col("price_bucket"),
        row_number().over(total).cast("long").as("rn"),
        rank().over(tied).cast("long").as("rnk"),
        dense_rank().over(tied).cast("long").as("drnk"),
        ntile(4).over(total).cast("long").as("nt"),
        round(percent_rank().over(tied), 6).as("pr")
      ).orderBy(col("c_mktsegment"), col("rn"))
    }
  )

  /** Top-3 orders per customer — the groupwise-top-k pattern: one
    * shuffle on the partition key, per-group sort, early filter. At
    * scale this beats a global sort by orders of magnitude.
    */
  val winTop3PerGroup: Q = Q(
    "win_top3_per_group",
    Some(
      "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables
        .orders(spark, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          row_number().over(w).cast("long").as("rn")
        )
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }
  )

  /** Top-3 orders per customer AGAIN, but through the engine's custom
    * Catalyst operator (graftx.TopKPerGroup: LogicalPlan + Strategy +
    * two-phase SparkPlan) instead of a window. Same oracle as
    * win_top3_per_group — the two formulations must agree bit-for-bit.
    * The custom plan prunes map-side: each scan partition forwards at
    * most 3 rows per customer into the shuffle, where the window
    * formulation shuffles and sorts every order. Same answer, a
    * shuffle that is |groups|·k instead of |orders|.
    */
  val winTop3TopK: Q = Q(
    "win_top3_topk",
    Some(
      "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"
    ),
    (spark, dir) => {
      val base = Tables
        .orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      org.apache.spark.sql.graftx
        .TopKPerGroup(base, Seq("o_custkey"), Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
        .orderBy(col("o_custkey"), col("rn"))
    }
  )

  /** lag/lead over each user's event stream + µs since previous event.
    * Microsecond diffs (not seconds) because engines disagree on
    * boundary-vs-elapsed second counting; µs-aligned timestamps make the
    * µs diff exact in both.
    */
  val winLagLead: Q = Q(
    "win_lag_lead",
    Some(
      "SELECT event_id, user_id, value, " +
        "lag(value) OVER w AS prev_value, lead(value) OVER w AS next_value, " +
        "date_diff('microsecond', lag(ts) OVER w, ts) AS us_since_prev " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, ts, event_id"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables
        .events(spark, dir)
        .select(
          col("event_id"),
          col("user_id"),
          col("value"),
          col("ts"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          (Det.ntzMicros(col("ts")) - Det.ntzMicros(lag(col("ts"), 1).over(w)))
            .as("us_since_prev")
        )
        .drop("ts")
        .orderBy(col("user_id"), col("event_id"))
    }
  )

  /** Running revenue per customer: unbounded-preceding frame over an
    * exact decimal accumulator (order-independent parity, §2.9.2).
    */
  val winRunningSum: Q = Q(
    "win_running_sum",
    Some(
      "SELECT o_custkey, o_orderkey, " +
        "round(cast(sum(cast(o_totalprice as decimal(30,8))) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double), 2) AS running_rev " +
        "FROM orders ORDER BY o_custkey, o_orderkey"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables
        .orders(spark, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          round(sum(col("o_totalprice").cast(DecimalType(30, 8))).over(w).cast("double"), 2)
            .as("running_rev")
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  )

  /** 7-day moving order count per customer via an integer RANGE frame
    * over epoch seconds — the same frame arithmetic on both engines
    * (interval RANGE frames have engine-specific inclusivity rules;
    * integers don't).
    */
  val winRangeFrame: Q = Q(
    "win_range_frame",
    Some(
      "SELECT o_custkey, o_orderkey, ord_sec, " +
        "count(*) OVER (PARTITION BY o_custkey ORDER BY ord_sec " +
        "RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_7d " +
        "FROM (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) // 1000000 AS ord_sec FROM orders) " +
        "ORDER BY o_custkey, o_orderkey"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("ord_sec"))
        .rangeBetween(-604800L, 0L)
      Tables
        .orders(spark, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          // naive-micros reinterpret ÷ 1e6 — field arithmetic, never a
          // cast through TIMESTAMP (which lands on the SESSION zone's
          // midnight instant: ord_sec would shift by the zone offset
          // and 7-day windows would wobble across DST transitions).
          // Matches the oracle's epoch_us(o_orderdate)//1e6 in every
          // session zone; the division is exact (midnight NTZ micros
          // are whole multiples of 1e6).
          (Det.ntzMicros(col("o_orderdate")) / 1000000L).cast("long").as("ord_sec")
        )
        .withColumn("n_7d", count(lit(1)).over(w))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  )

  /** first/last/nth_value with an explicit full-partition frame — the
    * default frame (unbounded-preceding → current-row) makes last_value
    * a foot-gun, so the frame is always stated.
    */
  val winFirstLast: Q = Q(
    "win_first_last",
    Some(
      "SELECT o_custkey, o_orderkey, " +
        "first_value(o_orderkey) OVER w AS first_ok, " +
        "last_value(o_orderkey) OVER w AS last_ok, " +
        "nth_value(o_orderkey, 2) OVER w AS second_ok " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables
        .orders(spark, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok")
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  )

  /** Gaps-and-islands: runs of CONSECUTIVE active days per user (first
    * 100 users) via the classic rn-difference trick — day minus
    * row_number is constant within a consecutive run, so it groups the
    * island. Window + aggregate only, identical in both engines; the
    * island key itself is never emitted (its type differs across
    * engines), only run boundaries and lengths. */
  val winGapsIslands: Q = Q(
    "win_gaps_islands",
    Some(
      "WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day " +
        "FROM events WHERE user_id < 100), " +
        "r AS (SELECT user_id, day, row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d), " +
        "i AS (SELECT user_id, day, day - rn * INTERVAL 1 DAY AS grp FROM r) " +
        "SELECT user_id, min(day) AS run_start, max(day) AS run_end, count(*) AS run_days " +
        "FROM i GROUP BY user_id, grp ORDER BY user_id, run_start"
    ),
    (spark, dir) => {
      val d = Tables
        .events(spark, dir)
        .filter(col("user_id") < 100)
        .select(col("user_id"), Det.ntzTruncDay(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      d.withColumn("rn", row_number().over(w))
        .withColumn("grp", date_sub(col("day").cast("date"), col("rn")))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("day")).as("run_start"), max(col("day")).as("run_end"), count(lit(1)).as("run_days"))
        .select(col("user_id"), col("run_start"), col("run_end"), col("run_days"))
        .orderBy(col("user_id"), col("run_start"))
    }
  )

  /** cume_dist over order values per segment — the remaining ranking
    * function the win_ranking family doesn't cover. Ordering includes
    * the unique key so ties cannot shift the distribution. */
  val winCumeDist: Q = Q(
    "win_cume_dist",
    Some(
      "SELECT o_orderkey, o_orderstatus, " +
        "round(cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey), 6) AS cd " +
        "FROM orders ORDER BY o_orderstatus, o_orderkey"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_orderstatus"),
          round(cume_dist().over(w), 6).as("cd")
        )
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    }
  )

  /** Moving median over a bounded row frame — an operator Spark's
    * window library lacks (median is not a built-in window function),
    * composed from built-ins instead of a UDF: collect the ≤4-row frame
    * into an array, sort it, index the middle (averaging the two
    * middles on even counts). The frame bound caps per-row state at 4
    * values, so the WindowExec stays O(frame) per row — at 100 TB the
    * cost is one user-hash shuffle + per-partition sort, same as any
    * window. Determinism: odd medians are raw input doubles; even
    * medians are one IEEE add + a halving; 6-dp rounding absorbs the
    * engines' interpolation-formula ulp (DuckDB interpolates, we
    * average).
    */
  val winMovingMedian: Q = Q(
    "win_moving_median",
    Some(
      "SELECT o_custkey, o_orderkey, o_totalprice, " +
        Det.oRN(
          "median(o_totalprice) OVER (PARTITION BY o_custkey " +
            "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)",
          6
        ) + " AS moving_median " +
        "FROM orders ORDER BY o_custkey, o_orderkey"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
      val a = sort_array(collect_list(col("o_totalprice")).over(w))
      val n = size(a)
      // Column `/` is float division — cast back for the array index
      val med = when(n % 2 === 1, element_at(a, ((n + 1) / 2).cast("int")))
        .otherwise(
          (element_at(a, (n / 2).cast("int")) + element_at(a, (n / 2).cast("int") + 1)) / 2.0
        )
      Tables
        .orders(spark, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          Det.rN(med, 6).as("moving_median")
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  )

  /** Rolling DISTINCT count over a bounded frame — Spark rejects
    * `count(DISTINCT …) OVER`, so the portable composition is
    * collect_list over the frame → array_distinct → size (exact
    * because the frame bounds the state at 5 values; an unbounded
    * frame would instead call for the running-set pattern or a sketch).
    * DuckDB supports the native spelling, so the oracle uses it — the
    * hash match proves the composition IS windowed distinct-count.
    * Rolling distinct suppliers over a customer's last 5 line items:
    * a repeat-supplier concentration signal.
    */
  val winRollingDistinct: Q = Q(
    "win_rolling_distinct",
    Some(
      "SELECT o_custkey, l_orderkey, l_linenumber, " +
        "count(DISTINCT l_suppkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY l_orderkey, l_linenumber, l_suppkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) " +
        "AS distinct_supps " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_custkey < 500 ORDER BY o_custkey, l_orderkey, l_linenumber"
    ),
    (spark, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic
        // lineitem (118k dup pairs at sf0.1); l_suppkey completes a
        // total-enough order: rows still tied are identical in every
        // frame-relevant column, so the suppkey sequence — and every
        // frame's distinct count — is uniquely determined.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
        .rowsBetween(-4, Window.currentRow)
      Tables
        .lineitem(spark, dir)
        .join(
          broadcast(Tables.orders(spark, dir).filter(col("o_custkey") < 500)),
          col("l_orderkey") === col("o_orderkey")
        )
        .select(
          col("o_custkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          size(array_distinct(collect_list(col("l_suppkey")).over(w)))
            .cast("long")
            .as("distinct_supps")
        )
        .orderBy(col("o_custkey"), col("l_orderkey"), col("l_linenumber"))
    }
  )

  /** Strict-adjacency event-sequence match — the MATCH_RECOGNIZE shape
    * neither engine has natively, composed from lead() chains: find
    * every view→click→purchase run of three CONSECUTIVE events in a
    * user's stream (funnel_vcp's subsequence semantics, tightened to
    * adjacency) and report where it started and how long the run took.
    * One window pass over the (user, time) partitioning; the pattern
    * predicate is evaluated per row, so this scales like any lag/lead
    * query. Ties in the µs-truncated timestamps are broken by event_id
    * so "consecutive" is cross-engine unambiguous.
    */
  val winPattern3Seq: Q = Q(
    "win_pattern_3seq",
    Some(
      "WITH s AS (SELECT user_id, event_id, ts, event_type, " +
        "lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2, " +
        "date_diff('microsecond', ts, lead(ts, 2) OVER w) AS span_us " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT user_id, event_id AS start_event_id, span_us FROM s " +
        "WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase' " +
        "ORDER BY user_id, start_event_id"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables
        .events(spark, dir)
        .select(
          col("user_id"),
          col("event_id").as("start_event_id"),
          col("event_type"),
          lead(col("event_type"), 1).over(w).as("t1"),
          lead(col("event_type"), 2).over(w).as("t2"),
          (Det.ntzMicros(lead(col("ts"), 2).over(w)) - Det.ntzMicros(col("ts"))).as("span_us")
        )
        .filter(col("event_type") === "view" && col("t1") === "click" && col("t2") === "purchase")
        .select(col("user_id"), col("start_event_id"), col("span_us"))
        .orderBy(col("user_id"), col("start_event_id"))
    }
  )

  def qs: Seq[Q] = Seq(
    winRanking, winTop3PerGroup, winTop3TopK, winLagLead, winRunningSum, winRangeFrame, winFirstLast, winGapsIslands,
    winCumeDist, winMovingMedian, winRollingDistinct, winPattern3Seq
  )
}
