package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation operators (SURVEY §2.4).
  *
  * All grouped aggregates compile to Spark's two-phase HashAggregateExec
  * (partial map-side combine → shuffle on group keys → final), the shape
  * that scales linearly at 100 TB. Money aggregates go through
  * [[graft.Det]] so results are independent of partition count/order.
  * Statistical moments (`agg_stats`) are computed from exact decimal
  * power sums rather than streaming-merge formulas — single-pass,
  * combinable, and bit-identical across engines and cluster sizes.
  */
object Aggregates {

  /** Flagship: TPC-H-Q1-style pricing summary over lineitem.
    * 6 groups out of 600k rows at sf0.1 — partial aggregation reduces
    * the shuffle to (#partitions × 6) rows, so this shape is scan-bound
    * at any scale.
    */
  val aggGroupPricing: Q = Q(
    "agg_group_pricing",
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        s"round(${Det.oSum("l_quantity")}, 2) AS sum_qty, " +
        s"round(${Det.oSum("l_extendedprice")}, 2) AS sum_base_price, " +
        s"round(${Det.oSum("l_extendedprice * (1 - l_discount)")}, 2) AS sum_disc_price, " +
        s"round(${Det.oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}, 2) AS sum_charge, " +
        s"round(${Det.oAvg("l_quantity")}, 6) AS avg_qty, " +
        s"round(${Det.oAvg("l_extendedprice")}, 6) AS avg_price, " +
        s"round(${Det.oAvg("l_discount")}, 6) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"
    ),
    (spark, dir) => {
      val l = Tables.lineitem(spark, dir)
      l.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(Det.dsum(col("l_quantity")), 2).as("sum_qty"),
          round(Det.dsum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(
            Det.dsum(
              col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))
            ),
            2
          ).as("sum_charge"),
          round(Det.davg(col("l_quantity")), 6).as("avg_qty"),
          round(Det.davg(col("l_extendedprice")), 6).as("avg_price"),
          round(Det.davg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  /** End-to-end DecimalType pricing: inputs cast to tight decimals
    * (safe — FIXTURES money columns are exact 2-dp values, so the
    * double→decimal cast recovers the identical decimal in both
    * engines), every multiply/subtract/sum stays EXACT decimal
    * arithmetic (precisions sized so no Spark precision-loss rounding
    * fires: (8,2)×(4,2)→(13,4), (13,4)×(4,2)→(18,6), sums widen the
    * integral part only), and only the final output casts to double
    * (§2.9.3 bans decimal output columns; an exact decimal → double is
    * one deterministic IEEE rounding in both engines). This is the
    * decimal counterpart of agg_group_pricing's Det.dsum trick — the
    * whole pipeline is typed decimal, not just the sum. */
  val aggDecimalPricing: Q = Q(
    "agg_decimal_pricing",
    Some(
      "WITH d AS (SELECT l_returnflag, l_linestatus, " +
        "l_extendedprice::DECIMAL(8,2) AS ep, " +
        "l_discount::DECIMAL(3,2) AS disc, l_tax::DECIMAL(3,2) AS tax " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'), " +
        "p AS (SELECT l_returnflag, l_linestatus, ep, " +
        "ep * (1.00 - disc) AS disc_price, " +
        "ep * (1.00 - disc) * (1.00 + tax) AS charge FROM d) " +
        "SELECT l_returnflag, l_linestatus, " +
        "cast(sum(ep) as double) AS sum_base_price, " +
        "cast(sum(disc_price) as double) AS sum_disc_price, " +
        "cast(sum(charge) as double) AS sum_charge, " +
        "count(*) AS count_order " +
        "FROM p GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"
    ),
    (spark, dir) => {
      val one = lit(1).cast("decimal(3,2)")
      val d = Tables
        .lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          col("l_extendedprice").cast("decimal(8,2)").as("ep"),
          col("l_discount").cast("decimal(3,2)").as("disc"),
          col("l_tax").cast("decimal(3,2)").as("tax")
        )
        .withColumn("disc_price", col("ep") * (one - col("disc")))
        .withColumn("charge", col("ep") * (one - col("disc")) * (one + col("tax")))
      d.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("ep")).cast("double").as("sum_base_price"),
          sum(col("disc_price")).cast("double").as("sum_disc_price"),
          sum(col("charge")).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  /** Value-distribution histogram of o_totalprice: 10 fixed-width
    * buckets over a literal range, computed with pure floor arithmetic
    * (identical cross-engine; width_bucket is not portable) and
    * clamped at the edges. One map-side bucket projection + one 10-row
    * aggregate — the data-profiling shape that runs at any scale. */
  val aggHistogram: Q = Q(
    "agg_histogram",
    Some(
      "WITH b AS (SELECT cast(least(9, greatest(0, floor(o_totalprice / 60000.0))) as bigint) AS bucket " +
        "FROM orders) " +
        // cast: DuckDB types int * decimal-literal as DECIMAL — the
        // same HUGEINT-class trap the dtype checker exists to catch
        "SELECT bucket, cast(bucket * 60000.0 as double) AS lo, " +
        "cast((bucket + 1) * 60000.0 as double) AS hi, " +
        "count(*) AS n_orders FROM b GROUP BY bucket ORDER BY bucket"
    ),
    (spark, dir) =>
      Tables
        .orders(spark, dir)
        .select(
          least(lit(9), greatest(lit(0), floor(col("o_totalprice") / 60000.0)))
            .cast("long")
            .as("bucket")
        )
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"))
        .select(
          col("bucket"),
          (col("bucket") * 60000.0).as("lo"),
          ((col("bucket") + 1) * 60000.0).as("hi"),
          col("n_orders")
        )
        .orderBy(col("bucket"))
  )

  /** Distinct-count SKETCH REUSE: per-event-type HLL sketches
    * (Datasketches, order- and partition-independent by construction),
    * with the global count produced by UNIONING the per-type sketches —
    * never rescanning the data. That is the 100 TB pattern: persist
    * small sketches per partition/day, answer rollup distinct-count
    * questions by merging them. No oracle: the estimate is exact only
    * while the sketch stays in sparse mode (true at sf0.01's 150
    * users, already off by ~1% at sf0.1's 1500), so pinning exact
    * counts would be an SF-dependent landmine — SketchSpec asserts
    * the ±5% error bound and that the merged-union estimate equals a
    * direct whole-scan sketch exactly (mergeability). */
  private[graft] def hllMergeEstimates(spark: SparkSession, dir: String): DataFrame = {
    val sk = Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val per = sk.select(
      col("event_type").as("scope"),
      hll_sketch_estimate(col("sk")).as("n_users")
    )
    val all = sk
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(lit("ALL").as("scope"), hll_sketch_estimate(col("sk")).as("n_users"))
    per.unionByName(all).orderBy(col("scope"))
  }

  /** Oracle-ratcheted in r12, same move as [[aggApproxDistinct]]: the
    * Datasketches HLL registers are engine-specific, so the row emits
    * exact counts plus two constant verdicts the oracle can pin —
    * `within_5pct` (the union-merged estimate vs the exact distinct
    * count; deterministic because register merge is elementwise max)
    * and `merge_consistent`: the ALL row's union-of-per-type-sketches
    * estimate agrees with the union over an UNRELATED hash grouping of
    * the same users within the same 5% envelope — the cross-check that
    * a rollup answered from persisted per-partition sketches estimates
    * the SAME set as any other merge shape (a union that dropped one
    * per-type sketch loses hundreds of users here, > 20% off, and
    * trips it); per-type rows are trivially 1.
    *
    * r13 scale finding (caught by the first full sweep at sf0.1 —
    * sparse mode masked it at sf0.01): Datasketches HLL estimates are
    * NOT merge-shape-invariant, so NO exact-equality verdict between
    * two build paths is deterministic at scale. Measured on sf0.1's
    * 1500 exact users: a never-merged single-pass sketch reads 1499
    * (HIP estimator); the same scan across 32 partitions reads 1488
    * (Spark's partial aggregation is a merge — composite estimator);
    * unions of the same set grouped 5 / 7 / 2 / 100 ways read
    * 1488 / 1487 / 1488 / 1499, and the 7-way union moves 1487 → 1492
    * under repartition(32). The estimator path (HIP vs composite, and
    * the gadget's mode-transition history) rides along with the merge
    * shape even though register content is an elementwise max. The r12
    * spelling (union == direct whole-scan, exact) was therefore an SF-
    * AND partition-layout-dependent landmine; the envelope verdict is
    * layout-proof (the arms differ by < 1% while sharing registers;
    * the gate is 5% of exact). Raw estimates stay pinned by
    * [[hllMergeEstimates]] + SketchSpec. */
  val aggHllMerge: Q = Q(
    "agg_hll_merge",
    Some(
      "WITH p AS (SELECT event_type AS scope, count(DISTINCT user_id) AS n_exact " +
        "FROM events GROUP BY 1 " +
        "UNION ALL SELECT 'ALL', count(DISTINCT user_id) FROM events) " +
        "SELECT scope, n_exact, CAST(1 AS INT) AS within_5pct, " +
        "CAST(1 AS INT) AS merge_consistent FROM p ORDER BY scope"
    ),
    (spark, dir) => {
      val ev  = Tables.events(spark, dir)
      val est = hllMergeEstimates(spark, dir)
      val exact = ev
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .select(col("event_type").as("scope"), col("n_exact"))
        .unionByName(
          ev.agg(countDistinct(col("user_id")).as("n_exact"))
            .select(lit("ALL").as("scope"), col("n_exact")))
      // the comparison arm: the SAME users sketched under an unrelated
      // grouping (7 hash buckets), then unioned — a merge product like
      // the per-type union, so both sides use the composite estimator
      // over identical registers (see the scaladoc's r13 finding)
      val direct = ev
        .groupBy(pmod(col("user_id"), lit(7)).as("b"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .agg(hll_union_agg(col("sk")).as("sk"))
        .select(lit("ALL").as("scope"), hll_sketch_estimate(col("sk")).as("n_direct"))
      est
        .join(exact, Seq("scope"))
        .join(broadcast(direct), Seq("scope"), "left_outer")
        .select(
          col("scope"),
          col("n_exact"),
          (abs(col("n_users") - col("n_exact")) <= col("n_exact") * 0.05)
            .cast("int")
            .as("within_5pct"),
          coalesce(
            abs(col("n_users") - col("n_direct")) <= col("n_exact") * 0.05,
            lit(true))
            .cast("int")
            .as("merge_consistent")
        )
        .orderBy(col("scope"))
    }
  )

  /** Ungrouped global aggregate — one row, fully map-side combinable. */
  val aggGlobal: Q = Q(
    "agg_global",
    Some(
      "SELECT count(*) AS n_rows, " +
        s"round(${Det.oSum("l_quantity")}, 2) AS sum_qty, " +
        "min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price, " +
        s"round(${Det.oAvg("l_discount")}, 6) AS avg_disc " +
        "FROM lineitem"
    ),
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          round(Det.dsum(col("l_quantity")), 2).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          round(Det.davg(col("l_discount")), 6).as("avg_disc")
        )
  )

  /** Distinct aggregates — Spark expands to a two-phase distinct plan
    * (RewriteDistinctAggregates); the distinct quantity sum goes through
    * a per-element decimal cast so it is order-independent.
    */
  val aggDistinct: Q = Q(
    "agg_distinct",
    Some(
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
        "cast(sum(DISTINCT cast(l_quantity as decimal(30,8))) as double) AS sum_dist_qty " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          sum_distinct(col("l_quantity").cast(DecimalType(30, 8)))
            .cast("double")
            .as("sum_dist_qty")
        )
        .orderBy(col("l_returnflag"))
  )

  private def custGeo(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables
      .customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))

  /** ROLLUP(r_name, n_name) with GROUPING flags (cast to int — Spark's
    * grouping() is tinyint, DuckDB's is bigint; int on both sides keeps
    * the output schema identical). */
  val aggRollup: Q = Q(
    "agg_rollup",
    Some(
      "SELECT r_name, n_name, count(*) AS n_cust, " +
        s"round(${Det.oSum("c_acctbal")}, 2) AS sum_bal, " +
        "cast(GROUPING(r_name) as int) AS g_r, cast(GROUPING(n_name) as int) AS g_n " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"
    ),
    (spark, dir) =>
      custGeo(spark, dir)
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          round(Det.dsum(col("c_acctbal")), 2).as("sum_bal"),
          grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n")
        )
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  )

  /** CUBE(l_returnflag, l_linestatus) counts. */
  val aggCube: Q = Q(
    "agg_cube",
    Some(
      "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "cast(GROUPING(l_returnflag) as int) AS g_rf, cast(GROUPING(l_linestatus) as int) AS g_ls " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"
    ),
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls")
        )
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  )

  /** Explicit GROUPING SETS ((c_mktsegment), (n_name), ()). */
  val aggGroupingSets: Q = Q(
    "agg_grouping_sets",
    Some(
      "SELECT c_mktsegment, n_name, count(*) AS n_cust, " +
        s"round(${Det.oSum("c_acctbal")}, 2) AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ()) " +
        "ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST"
    ),
    (spark, dir) =>
      Tables
        .customer(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq()),
          col("c_mktsegment"),
          col("n_name")
        )
        .agg(
          count(lit(1)).as("n_cust"),
          round(Det.dsum(col("c_acctbal")), 2).as("sum_bal")
        )
        .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("n_name"))
  )

  /** Sample stddev/variance/corr/covar from exact decimal power sums:
    * var = (Σx² − (Σx)²/n)/(n−1), corr from the analogous cross sums.
    * The power sums are order-independent (Det), the remaining double
    * arithmetic is identical on identical inputs — bit-exact parity
    * without trusting either engine's streaming-merge implementation.
    */
  val aggStats: Q = Q(
    "agg_stats", {
      val sx = Det.oSum("l_extendedprice")
      val sy = Det.oSum("l_quantity")
      val sxx = Det.oSum("l_extendedprice * l_extendedprice")
      val syy = Det.oSum("l_quantity * l_quantity")
      val sxy = Det.oSum("l_extendedprice * l_quantity")
      val n = "cast(count(*) as double)"
      Some(
        "SELECT l_returnflag, " +
          s"round(sqrt(($sxx - $sx * $sx / $n) / ($n - 1)), 4) AS stddev_price, " +
          s"round(($sxx - $sx * $sx / $n) / ($n - 1), 4) AS var_price, " +
          s"round(($sxy - $sx * $sy / $n) / sqrt(($sxx - $sx * $sx / $n) * ($syy - $sy * $sy / $n)), 6) AS corr_price_qty, " +
          s"round(($sxy - $sx * $sy / $n) / ($n - 1), 4) AS covar_price_qty " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      )
    },
    (spark, dir) => {
      val sx = Det.dsum(col("l_extendedprice"))
      val sy = Det.dsum(col("l_quantity"))
      val sxx = Det.dsum(col("l_extendedprice") * col("l_extendedprice"))
      val syy = Det.dsum(col("l_quantity") * col("l_quantity"))
      val sxy = Det.dsum(col("l_extendedprice") * col("l_quantity"))
      val n = count(lit(1)).cast("double")
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(sqrt((sxx - sx * sx / n) / (n - lit(1))), 4).as("stddev_price"),
          round((sxx - sx * sx / n) / (n - lit(1)), 4).as("var_price"),
          round(
            (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            6
          ).as("corr_price_qty"),
          round((sxy - sx * sy / n) / (n - lit(1)), 4).as("covar_price_qty")
        )
        .orderBy(col("l_returnflag"))
    }
  )

  /** max_by with a deterministic tiebreak: ordering by (price, orderkey)
    * struct picks the highest orderkey among price ties (§2.9.6).
    */
  val aggMinMaxBy: Q = Q(
    "agg_minmax_by",
    Some(
      "WITH j AS (SELECT c_mktsegment, o_orderkey, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "m AS (SELECT c_mktsegment, max(o_totalprice) AS mp FROM j GROUP BY 1) " +
        "SELECT j.c_mktsegment, max(j.o_orderkey) AS best_orderkey, " +
        "round(max(j.o_totalprice), 2) AS max_price " +
        "FROM j JOIN m ON j.c_mktsegment = m.c_mktsegment AND j.o_totalprice = m.mp " +
        "GROUP BY j.c_mktsegment ORDER BY j.c_mktsegment"
    ),
    (spark, dir) =>
      Tables
        .orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
            .as("best_orderkey"),
          round(max(col("o_totalprice")), 2).as("max_price")
        )
        .orderBy(col("c_mktsegment"))
  )

  /** Per-nation sorted list of supplier names, emitted as a joined string
    * (forced element order per §2.9.6; string output avoids exotic-type
    * hashing differences). */
  val aggCollectSorted: Q = Q(
    "agg_collect_sorted",
    Some(
      "SELECT n_name, count(*) AS n_sup, " +
        "string_agg(s_name, ',' ORDER BY s_name) AS names " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"
    ),
    (spark, dir) =>
      Tables
        .supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_sup"),
          array_join(sort_array(collect_list(col("s_name"))), ",").as("names")
        )
        .orderBy(col("n_name"))
  )

  /** HyperLogLog distinct — the 100 TB cardinality-estimation path:
    * constant memory per group. Oracle-ratcheted in r12: the raw
    * estimate is engine-specific (DuckDB cannot replay Spark's HLL++
    * registers), so the row emits the DuckDB-checkable DERIVED columns
    * instead — the exact count plus a `within_5pct` verdict folding the
    * estimate into a constant the oracle can pin. The verdict is
    * deterministic: HLL register merge is an elementwise max
    * (order/partition-independent), so the estimate — and therefore the
    * boolean — is a pure function of the input set. The raw estimates
    * stay pinned by [[approxDistinctEstimates]] + ExtrasSpec's ±5%
    * assertion. rsd is pinned at 0.02 (4096 registers, 4 KB/group —
    * still the constant-memory contract): the DEFAULT 0.05 rsd was
    * measured 5.65% off exact on this corpus at sf0.01 — rsd is a
    * standard deviation, not a hard bound, so a 5% verdict over a
    * 5%-rsd sketch is a coin flip by design. A driver compare failure
    * here means the sketch's error contract broke, which is exactly
    * what the row now gates. */
  private[graft] def approxDistinctEstimates(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))
      .orderBy(col("o_orderstatus"))

  val aggApproxDistinct: Q = Q(
    "agg_approx_distinct",
    Some(
      "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_exact, " +
        "CAST(1 AS INT) AS within_5pct " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
    (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("approx")
        )
        .select(
          col("o_orderstatus"),
          col("n_exact"),
          (abs(col("approx") - col("n_exact")) <= col("n_exact") * 0.05)
            .cast("int")
            .as("within_5pct")
        )
        .orderBy(col("o_orderstatus"))
  )

  /** Mergeable quantile sketch (Greenwald–Khanna summaries, what
    * `approx_percentile` runs): p50/p90/p99 of event values per type at
    * accuracy 2000 (≈ 0.05 % rank error). The scale path for
    * [[graft.operators.Extras.aggPercentile]]'s exact percentiles:
    * exact needs all values of a group on one reducer, the sketch is
    * O(accuracy·log n) memory, merges associatively across partitions
    * (partial aggregation applies), and is the right primitive for
    * quantiles over 100 TB or inside [[TimeSeries.tsAnomalyMad]]-style
    * screens at petabyte row counts. No DuckDB oracle — sketch
    * contents are engine-specific; the spec pins the rank-error
    * guarantee against exact ranks instead. */
  private[graft] def quantileSketchEstimates(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(value, array(0.5, 0.9, 0.99), 2000)").as("qs")
      )
      .select(
        col("event_type"),
        col("n"),
        col("qs").getItem(0).as("p50"),
        col("qs").getItem(1).as("p90"),
        col("qs").getItem(2).as("p99")
      )
      .orderBy(col("event_type"))

  /** Oracle-ratcheted in r12 (the last of the three sketch rows): the
    * GK summary's picked element is engine-specific, but its RANK-ERROR
    * CONTRACT is not — so the row emits, per (event_type, quantile),
    * the EXACT order-statistic values at the guaranteed rank window and
    * an `in_bounds` verdict that the sketch estimate landed inside it.
    * Every emitted column is DuckDB-replayable: `lo_val`/`hi_val` are
    * k-th-smallest values (deterministic for fixed data regardless of
    * tie order — the value at a rank is a property of the multiset),
    * and `in_bounds` is constant 1 because GK at accuracy 2000
    * guarantees rank error ≤ n/2000 for EVERY merge order — so the
    * boolean is deterministic even where the estimate itself is not.
    * The window mirrors SketchSpec's proven bound exactly (2× the
    * nominal ε·n, ±2 ranks for interpolation edges); quantiles ride as
    * integer basis points and the rank arithmetic is pure integer
    * (`div`), so no IEEE rounding can diverge between engines. Raw
    * estimates stay pinned by [[quantileSketchEstimates]] + SketchSpec.
    * At 100 TB: two partitioned windows over the metric + a 15-row
    * broadcast of rank bounds — the sketch-audit pattern a pipeline
    * runs on a sampled slice to certify its percentile dashboards. */
  val aggQuantileSketch: Q = Q(
    "agg_quantile_sketch",
    Some(
      "WITH v AS (SELECT event_type, value, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk FROM events), " +
        "c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1), " +
        "q(q_bp) AS (VALUES (5000), (9000), (9900)), " +
        "b AS (SELECT c.event_type, q.q_bp, c.n, " +
        "greatest(1, ((c.n * (q.q_bp - 10)) // 10000) - 2) AS lo_rank, " +
        "least(c.n, (((c.n * (q.q_bp + 10)) + 9999) // 10000) + 2) AS hi_rank " +
        "FROM c CROSS JOIN q) " +
        "SELECT b.event_type AS event_type, b.q_bp AS q_bp, b.n, " +
        "lo.value AS lo_val, hi.value AS hi_val, " +
        "CAST(1 AS INT) AS in_bounds " +
        "FROM b JOIN v lo ON lo.event_type = b.event_type AND lo.rk = b.lo_rank " +
        "JOIN v hi ON hi.event_type = b.event_type AND hi.rk = b.hi_rank " +
        "ORDER BY b.event_type, b.q_bp"
    ),
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
      val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      // rank window = target ± (2·ε·n + 2) with ε = 1/accuracy, in pure
      // integer basis-point math (q_bp ± 10 bp = ± 2·ε at accuracy 2000)
      val bounds = counts
        .select(col("event_type"), col("n"),
          explode(array(lit(5000), lit(9000), lit(9900))).as("q_bp"))
        .select(col("event_type"), col("n"), col("q_bp"),
          greatest(lit(1L), expr("((n * (q_bp - 10)) div 10000) - 2")).as("lo_rank"),
          least(col("n"), expr("(((n * (q_bp + 10)) + 9999) div 10000) + 2")).as("hi_rank"))
      val ranked = ev.withColumn("rk",
        row_number().over(Window.partitionBy(col("event_type")).orderBy(col("value"))).cast("long"))
      def pick(rankCol: String, out: String): DataFrame =
        ranked
          .join(
            broadcast(bounds.select(col("event_type").as("et"), col("q_bp"), col(rankCol))),
            col("event_type") === col("et") && col("rk") === col(rankCol))
          .select(col("event_type"), col("q_bp"), col("value").as(out))
      val est = ev
        .groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, array(0.5, 0.9, 0.99), 2000)").as("qs"))
        .select(col("event_type"), explode(array(
          struct(lit(5000).as("q_bp"), col("qs").getItem(0).as("est")),
          struct(lit(9000).as("q_bp"), col("qs").getItem(1).as("est")),
          struct(lit(9900).as("q_bp"), col("qs").getItem(2).as("est")))).as("s"))
        .select(col("event_type"), col("s.q_bp").as("q_bp"), col("s.est").as("est"))
      bounds
        .select(col("event_type"), col("q_bp"), col("n"))
        .join(pick("lo_rank", "lo_val"), Seq("event_type", "q_bp"))
        .join(pick("hi_rank", "hi_val"), Seq("event_type", "q_bp"))
        .join(est, Seq("event_type", "q_bp"))
        .select(
          col("event_type"), col("q_bp"), col("n"), col("lo_val"), col("hi_val"),
          (col("est") >= col("lo_val") && col("est") <= col("hi_val"))
            .cast("int")
            .as("in_bounds"))
        .orderBy(col("event_type"), col("q_bp"))
    }
  )

  /** Predicate aggregates: count_if, bool_and/bool_or, and a
    * FILTER-style conditional sum — per returnflag over lineitem.
    * Booleans land as int (0/1) for comparator friendliness. */
  val aggPredicates: Q = Q(
    "agg_predicates",
    Some(
      "SELECT l_returnflag, " +
        "count(*) FILTER (l_discount > 0.05) AS n_discounted, " +
        "CAST(bool_and(l_quantity >= 1) AS INT) AS all_qty_ok, " +
        "CAST(bool_or(l_tax > 0.07) AS INT) AS any_high_tax, " +
        Det.oRN("coalesce(" + Det.oSum("CASE WHEN l_discount > 0.05 THEN l_extendedprice END") + ", 0)", 2) +
        " AS discounted_value " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") >= 1).cast("int").as("all_qty_ok"),
          bool_or(col("l_tax") > 0.07).cast("int").as("any_high_tax"),
          Det.rN(
            coalesce(Det.dsum(when(col("l_discount") > 0.05, col("l_extendedprice"))), lit(0.0)),
            2
          ).as("discounted_value")
        )
        .orderBy(col("l_returnflag"))
  )

  /** Weekly cohort retention — the canonical product-analytics shape:
    * users bucketed by first-seen ISO week, then for each later week
    * the fraction still active. Two aggregates and one broadcast-sized
    * join (cohort table is |users| rows, week pairs are |users|×|weeks|
    * at most); retention is an exact int ratio. */
  val aggCohortRetention: Q = Q(
    "agg_cohort_retention",
    Some(
      "WITH c AS (SELECT user_id, date_trunc('week', min(ts)) AS c0 FROM events GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events), " +
        "j AS (SELECT c.c0, datediff('day', c.c0, a.w) // 7 AS week_offset, a.user_id " +
        "FROM a JOIN c ON a.user_id = c.user_id), " +
        "g AS (SELECT c0, week_offset, count(DISTINCT user_id) AS n_active FROM j GROUP BY 1, 2), " +
        "base AS (SELECT c0, n_active AS n0 FROM g WHERE week_offset = 0) " +
        "SELECT g.c0 AS cohort_week, g.week_offset, g.n_active, " +
        Det.oRN("g.n_active::DOUBLE / base.n0", 6) + " AS retention " +
        "FROM g JOIN base ON g.c0 = base.c0 " +
        "ORDER BY cohort_week, week_offset"
    ),
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
      // Det.ntzTruncWeek, not date_trunc("week", ·): the built-in only
      // accepts TIMESTAMP, so the NTZ events column would round-trip
      // through the session zone and cohort boundaries would shift in a
      // non-UTC session (TzRobustnessSpec probes this row under NY).
      val c = ev.groupBy(col("user_id")).agg(Det.ntzTruncWeek(min(col("ts"))).as("c0"))
      val a = ev.select(col("user_id"), Det.ntzTruncWeek(col("ts")).as("w")).distinct()
      val g = a
        .join(c, Seq("user_id"))
        .select(col("c0"), (datediff(col("w"), col("c0")) / 7).cast("long").as("week_offset"), col("user_id"))
        .groupBy(col("c0"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val base = g.filter(col("week_offset") === 0).select(col("c0"), col("n_active").as("n0"))
      g.join(broadcast(base), Seq("c0"))
        .select(
          col("c0").as("cohort_week"),
          col("week_offset"),
          col("n_active"),
          Det.rN(col("n_active").cast("double") / col("n0"), 6).as("retention")
        )
        .orderBy(col("cohort_week"), col("week_offset"))
    }
  )

  /** Per-group mode (most frequent value) with a deterministic
    * tie-break — Spark's `mode()` breaks ties arbitrarily (and
    * cross-engine modes NEVER agree on ties), so the portable spelling
    * is count-then-argmax with a total order: (count DESC, value ASC).
    * The argmax runs through the engine's TopKPerGroup operator (k=1),
    * pruning to one candidate per group map-side instead of
    * window-sorting every (group, value) pair — at 100 TB the shuffle
    * carries |groups|×|partitions| rows, not the whole count table.
    */
  val aggMode: Q = Q(
    "agg_mode",
    Some(
      "WITH t AS (SELECT c_mktsegment, o_orderpriority, count(*) AS n " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment " +
        "ORDER BY n DESC, o_orderpriority) AS rn FROM t) " +
        "SELECT c_mktsegment, o_orderpriority AS mode_value, n " +
        "FROM r WHERE rn = 1 ORDER BY c_mktsegment"
    ),
    (spark, dir) => {
      val counts = Tables
        .orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      org.apache.spark.sql.graftx
        .TopKPerGroup(counts, Seq("c_mktsegment"), Seq("n" -> true, "o_orderpriority" -> false), 1)
        .select(col("c_mktsegment"), col("o_orderpriority").as("mode_value"), col("n"))
        .orderBy(col("c_mktsegment"))
    }
  )

  /** Exact distinct counting via a segmented bitmap — the technique a
    * 100 TB engine uses when `count(DISTINCT key)` must be exact AND
    * rolled up incrementally (HLL is approximate; count-distinct
    * doesn't merge): keys are sliced into 63-bit segments, each
    * (group, segment) aggregates a `bit_or` mask (commutative —
    * partition/merge order free, partial-aggregatable map-side), and
    * the distinct count is the sum of popcounts. Memory is
    * O(key-range/63) per group, the masks are themselves mergeable
    * partials (an MV can maintain them under inserts), and no shuffle
    * carries raw keys. Bits 0..62 only — the sign bit stays clear so
    * the mask semantics never touch two's-complement. The oracle is a
    * plain `count(DISTINCT …)`, proving the bitmap path exact.
    */
  val aggBitmapDistinct: Q = Q(
    "agg_bitmap_distinct",
    Some(
      "SELECT event_type, count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    (spark, dir) =>
      Tables
        .events(spark, dir)
        .select(
          col("event_type"),
          expr("user_id div 63").as("seg"),
          expr("shiftleft(cast(1 as bigint), cast(user_id % 63 as int))").as("bit")
        )
        .groupBy(col("event_type"), col("seg"))
        .agg(expr("bit_or(bit)").as("mask"))
        .groupBy(col("event_type"))
        .agg(sum(expr("bit_count(mask)")).cast("long").as("n_users"))
        .orderBy(col("event_type"))
  )

  /** Per-group OLS trend (slope + intercept of price over time) from
    * the closed-form moment sums — the portable spelling of
    * regr_slope/regr_intercept, whose native implementations sum IEEE
    * doubles in engine-specific order and therefore never cross-match.
    * Here every moment (Σx, Σy, Σxy, Σx²) goes through the decimal
    * order-independent sum: per-row products are identical doubles in
    * both engines, their decimal casts round identically, the sums are
    * exact, and the final slope/intercept arithmetic is pure IEEE on
    * identical inputs. One scan, one 5-group aggregate — and the
    * moments are mergeable partials, so this trend is incrementally
    * maintainable the same way as [[graft.operators.Maintenance]]'s MV.
    */
  val aggRegression: Q = Q(
    "agg_regression",
    Some(
      "WITH b AS (SELECT o_orderpriority, " +
        "date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::DOUBLE AS x, " +
        "o_totalprice AS y FROM orders), " +
        "m AS (SELECT o_orderpriority, count(*)::DOUBLE AS n, " +
        s"${Det.oSum("x")} AS sx, ${Det.oSum("y")} AS sy, " +
        s"${Det.oSum("x * y")} AS sxy, ${Det.oSum("x * x")} AS sxx FROM b GROUP BY 1) " +
        "SELECT o_orderpriority, cast(n as bigint) AS n_orders, " +
        Det.oRN("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6) + " AS slope, " +
        Det.oRN("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n", 4) +
        " AS intercept FROM m ORDER BY o_orderpriority"
    ),
    (spark, dir) => {
      val b = Tables
        .orders(spark, dir)
        .select(
          col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("double").as("x"),
          col("o_totalprice").as("y")
        )
      val m = b
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.dsum(col("x")).as("sx"),
          Det.dsum(col("y")).as("sy"),
          Det.dsum(col("x") * col("y")).as("sxy"),
          Det.dsum(col("x") * col("x")).as("sxx")
        )
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      m.select(
        col("o_orderpriority"),
        col("n").cast("long").as("n_orders"),
        Det.rN(slope, 6).as("slope"),
        Det.rN((col("sy") - slope * col("sx")) / col("n"), 4).as("intercept")
      ).orderBy(col("o_orderpriority"))
    }
  )

  /** Per-group Pearson correlation from the same exact decimal moment
    * sums as [[aggRegression]] — the portable corr(): native
    * implementations stream IEEE doubles in engine order and drift; the
    * moment spelling is order-free, mergeable, and the final
    * arithmetic (two multiplies, a sqrt, a divide) is IEEE on identical
    * inputs — sqrt is correctly rounded by spec, so even it is
    * bit-stable cross-engine. Quantity-vs-discount per return flag.
    */
  val aggCorr: Q = Q(
    "agg_corr",
    Some(
      "WITH b AS (SELECT l_returnflag, l_quantity AS x, l_discount AS y FROM lineitem), " +
        "m AS (SELECT l_returnflag, count(*)::DOUBLE AS n, " +
        s"${Det.oSum("x")} AS sx, ${Det.oSum("y")} AS sy, ${Det.oSum("x * y")} AS sxy, " +
        s"${Det.oSum("x * x")} AS sxx, ${Det.oSum("y * y")} AS syy FROM b GROUP BY 1) " +
        "SELECT l_returnflag, cast(n as bigint) AS n_rows, " +
        Det.oRN(
          "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))",
          6
        ) + " AS corr_qty_disc FROM m ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val m = Tables
        .lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_quantity").as("x"), col("l_discount").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.dsum(col("x")).as("sx"),
          Det.dsum(col("y")).as("sy"),
          Det.dsum(col("x") * col("y")).as("sxy"),
          Det.dsum(col("x") * col("x")).as("sxx"),
          Det.dsum(col("y") * col("y")).as("syy")
        )
      m.select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        Det.rN(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))),
          6
        ).as("corr_qty_disc")
      ).orderBy(col("l_returnflag"))
    }
  )

  /** Weighted median — smallest price whose cumulative weight reaches
    * half the group's total. Neither engine has a weighted-median
    * aggregate, and this composition is deliberately tie-proof: the
    * cumulative weight uses a RANGE frame over the price ordering, so
    * every row of a tied price sees the SAME cumulative total (a ROWS
    * frame over a non-unique order would be ambiguous cross-engine —
    * the lineitem "keys" are not unique, see win_rolling_distinct).
    * Weights are integer-valued doubles and every partial sum stays
    * below 2^53, so the window sums are exact in any order. One window
    * pass + a 3-row argmin — at 100 TB this is a per-group sort, the
    * same cost envelope as any percentile.
    */
  val aggWeightedMedian: Q = Q(
    "agg_weighted_median",
    Some(
      "WITH b AS (SELECT l_returnflag, l_extendedprice AS price, l_quantity AS w FROM lineitem), " +
        "c AS (SELECT *, sum(w) OVER (PARTITION BY l_returnflag ORDER BY price " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw, " +
        "sum(w) OVER (PARTITION BY l_returnflag) AS tot FROM b) " +
        "SELECT l_returnflag, min(price) AS weighted_median, " +
        "cast(min(tot) as bigint) AS total_weight " +
        "FROM c WHERE cw >= tot / 2 GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val byPrice = Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("price"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("l_returnflag"))
      Tables
        .lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice").as("price"), col("l_quantity").as("w"))
        .withColumn("cw", sum(col("w")).over(byPrice))
        .withColumn("tot", sum(col("w")).over(whole))
        .filter(col("cw") >= col("tot") / 2)
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("price")).as("weighted_median"),
          min(col("tot")).cast("long").as("total_weight")
        )
        .orderBy(col("l_returnflag"))
    }
  )

  /** Population skewness from exact raw moments — completes the
    * portable-moments family ([[aggRegression]], [[aggCorr]]): native
    * skewness() streams doubles in engine order; here Σx, Σx², Σx³ go
    * through decimal-exact sums (per-row x·x and x·x·x are identical
    * IEEE products in both engines — spelled as multiplication, never
    * pow(), which has no correct-rounding guarantee), and the closing
    * m₃/m₂^1.5 uses m₂·sqrt(m₂) — sqrt IS correctly rounded by spec.
    */
  val aggSkewness: Q = Q(
    "agg_skewness",
    Some(
      "WITH m AS (SELECT l_returnflag, count(*)::DOUBLE AS n, " +
        s"${Det.oSum("l_quantity")} AS s1, " +
        s"${Det.oSum("l_quantity * l_quantity")} AS s2, " +
        s"${Det.oSum("l_quantity * l_quantity * l_quantity")} AS s3 FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, cast(n as bigint) AS n_rows, " +
        Det.oRN("s1 / n", 6) + " AS mean_qty, " +
        Det.oRN(
          "(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) / " +
            "((s2 / n - (s1 / n) * (s1 / n)) * sqrt(s2 / n - (s1 / n) * (s1 / n)))",
          6
        ) + " AS skewness FROM m ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val x = col("l_quantity")
      val m = Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.dsum(x).as("s1"),
          Det.dsum(x * x).as("s2"),
          Det.dsum(x * x * x).as("s3")
        )
      val mu = col("s1") / col("n")
      val m2 = col("s2") / col("n") - mu * mu
      val m3 = col("s3") / col("n") - lit(3) * mu * (col("s2") / col("n")) + lit(2) * mu * mu * mu
      m.select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        Det.rN(mu, 6).as("mean_qty"),
        Det.rN(m3 / (m2 * sqrt(m2)), 6).as("skewness")
      ).orderBy(col("l_returnflag"))
    }
  )

  /** Excess kurtosis from exact raw moments — the fourth and last of
    * the portable-moments family ([[aggRegression]], [[aggCorr]],
    * [[aggSkewness]]): Σx…Σx⁴ through decimal-exact sums (powers
    * spelled as chained multiplication — identical IEEE products in
    * both engines, unlike pow()), closed with the raw-moment identity
    * m₄ = s₄/n − 4μ·s₃/n + 6μ²·s₂/n − 3μ⁴ and m₄/m₂² − 3. Tail
    * heaviness per return flag; one scan, mergeable partials.
    */
  val aggKurtosis: Q = Q(
    "agg_kurtosis",
    Some(
      "WITH m AS (SELECT l_returnflag, count(*)::DOUBLE AS n, " +
        s"${Det.oSum("l_quantity")} AS s1, " +
        s"${Det.oSum("l_quantity * l_quantity")} AS s2, " +
        s"${Det.oSum("l_quantity * l_quantity * l_quantity")} AS s3, " +
        s"${Det.oSum("l_quantity * l_quantity * l_quantity * l_quantity")} AS s4 " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, cast(n as bigint) AS n_rows, " +
        Det.oRN(
          "(s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) " +
            "- 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) / " +
            "((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3",
          6
        ) + " AS excess_kurtosis FROM m ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val x = col("l_quantity")
      val m = Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.dsum(x).as("s1"),
          Det.dsum(x * x).as("s2"),
          Det.dsum(x * x * x).as("s3"),
          Det.dsum(x * x * x * x).as("s4")
        )
      val mu = col("s1") / col("n")
      val m2 = col("s2") / col("n") - mu * mu
      val m4 = col("s4") / col("n") - lit(4) * mu * (col("s3") / col("n")) +
        lit(6) * mu * mu * (col("s2") / col("n")) - lit(3) * mu * mu * mu * mu
      m.select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        Det.rN(m4 / (m2 * m2) - lit(3), 6).as("excess_kurtosis")
      ).orderBy(col("l_returnflag"))
    }
  )

  /** Gini coefficient of quantity concentration per return flag, from
    * the rank-weighted Lorenz identity G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n.
    * The subtlety is ties: row_number assigns tied x's DIFFERENT ranks
    * in engine-specific order, but Σ i·x over a tied block is x·Σi —
    * invariant under any permutation of the block — so the aggregate is
    * deterministic even though the per-row ranks are not. Both sums are
    * exact integers (quantities are integer-valued, i·x < 2⁵³), summed
    * as BIGINT — no decimal path needed. One sort per group + one
    * aggregate; at scale this is the same cost envelope as any
    * percentile.
    */
  val aggGini: Q = Q(
    "agg_gini",
    Some(
      "WITH r AS (SELECT l_returnflag, l_quantity AS x, " +
        "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS i FROM lineitem), " +
        "m AS (SELECT l_returnflag, count(*)::DOUBLE AS n, " +
        "cast(sum(cast(i * x as bigint)) as bigint)::DOUBLE AS swx, " +
        "cast(sum(cast(x as bigint)) as bigint)::DOUBLE AS sx FROM r GROUP BY 1) " +
        "SELECT l_returnflag, cast(n as bigint) AS n_rows, " +
        Det.oRN("(2.0 * swx) / (n * sx) - (n + 1) / n", 6) + " AS gini " +
        "FROM m ORDER BY l_returnflag"
    ),
    (spark, dir) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("x"))
      val m = Tables
        .lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_quantity").as("x"))
        .withColumn("i", row_number().over(w))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum((col("i") * col("x")).cast("long")).cast("double").as("swx"),
          sum(col("x").cast("long")).cast("double").as("sx")
        )
      m.select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        Det.rN(
          (lit(2.0) * col("swx")) / (col("n") * col("sx")) - (col("n") + 1) / col("n"),
          6
        ).as("gini")
      ).orderBy(col("l_returnflag"))
    }
  )

  /** Audience overlap via THETA sketches — the set-operation sketch HLL
    * cannot be ([[aggHllMerge]] can only union): sketch each event
    * type's user set once, then answer every pairwise "users who did
    * BOTH" / "users who did EITHER" / Jaccard question from the
    * kilobyte sketches alone — at 100 TB that replaces 10 self-joins of
    * the fact table with one scan plus sketch algebra. The custom
    * [[org.apache.spark.sql.graftx.ThetaSketchAgg]] is a mergeable
    * TypedImperativeAggregate (partition- and order-independent by the
    * theta structure itself). At test cardinalities (≤1.5k users <
    * 4096-entry nominal) the sketches retain every hash and the
    * estimates are EXACT, so this query is hash-checked against the
    * exact-join oracle — the same positioning as `agg_bitmap_distinct`;
    * past the nominal size it degrades gracefully to ±ε estimates
    * (SketchSpec pins exactness here and partition invariance).
    */
  val aggThetaOverlap: Q = Q(
    "agg_theta_overlap",
    Some(
      "WITH s AS (SELECT DISTINCT event_type, user_id FROM events), " +
        "c AS (SELECT a.event_type ta, b.event_type tb, count(*) AS nc FROM s a " +
        "JOIN s b ON a.user_id = b.user_id AND a.event_type < b.event_type GROUP BY 1, 2), " +
        "n AS (SELECT event_type, count(*) AS nn FROM s GROUP BY 1) " +
        "SELECT c.ta AS type_a, c.tb AS type_b, na.nn AS n_a, nb.nn AS n_b, " +
        "c.nc AS n_common, na.nn + nb.nn - c.nc AS n_either, " +
        Det.oRN("c.nc::DOUBLE / (na.nn + nb.nn - c.nc)", 6) + " AS jaccard " +
        "FROM c JOIN n na ON na.event_type = c.ta JOIN n nb ON nb.event_type = c.tb " +
        "ORDER BY type_a, type_b"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.ThetaSketchAgg
      val sk = Tables
        .events(spark, dir)
        .groupBy(col("event_type"))
        .agg(ThetaSketchAgg.sketch(col("user_id")).as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
      val inter = ThetaSketchAgg.pairEstimate(col("ska"), col("skb"), "intersect")
      val uni   = ThetaSketchAgg.pairEstimate(col("ska"), col("skb"), "union")
      a.join(b, col("type_a") < col("type_b"))
        .select(
          col("type_a"),
          col("type_b"),
          ThetaSketchAgg.estimate(col("ska")).cast("long").as("n_a"),
          ThetaSketchAgg.estimate(col("skb")).cast("long").as("n_b"),
          inter.cast("long").as("n_common"),
          uni.cast("long").as("n_either"),
          Det.rN(inter / uni, 6).as("jaccard")
        )
        .orderBy(col("type_a"), col("type_b"))
    }
  )

  def qs: Seq[Q] = Seq(
    aggGroupPricing, aggDecimalPricing, aggHistogram, aggHllMerge, aggGlobal, aggDistinct, aggRollup, aggCube,
    aggGroupingSets, aggStats, aggMinMaxBy, aggCollectSorted, aggApproxDistinct,
    aggPredicates, aggCohortRetention, aggMode, aggBitmapDistinct, aggRegression, aggCorr,
    aggWeightedMedian, aggSkewness, aggKurtosis, aggGini, aggThetaOverlap, aggQuantileSketch
  )
}
