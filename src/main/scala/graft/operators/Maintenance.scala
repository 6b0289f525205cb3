package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pipeline-maintenance operators: incremental aggregate upkeep,
  * data-quality auditing, and partition-layout-aware join pruning —
  * the jobs that keep a 100 TB warehouse correct and cheap BETWEEN
  * queries, not just the queries themselves.
  */
object Maintenance {

  /** Incremental materialized-view maintenance. At 100 TB the
    * anti-pattern is re-aggregating the whole fact table every time a
    * batch lands; the fix is keeping the MV as mergeable PARTIAL state
    * (count + exact decimal sum — commutative monoids) and folding each
    * delta batch in with one tiny aggregate over (|MV| + |delta
    * groups|) rows. Derived metrics (avg) are computed at read time
    * from the merged partials, never maintained directly (avg is not a
    * monoid). Here the "standing MV" is orders before a cutoff and the
    * delta is the rest; the oracle is the full recompute over all of
    * orders, so the hash match IS the proof that merge == recompute.
    * Decimal partials keep the merge exact and order-independent
    * (SURVEY §2.9.2) — with IEEE double partials, MV + delta would
    * drift from the recompute by summation order.
    */
  val maintIncrementalAgg: Q = Q(
    "maint_incremental_agg",
    Some(
      // revenue is rounded to 2 dp BEFORE the avg derivation on both
      // sides: the raw decimal-sum→double conversion differs by 1 ulp
      // between engines (DuckDB rounds int128→double then /1e8; Spark's
      // BigDecimal converts in one correctly-rounded step)
      "SELECT o_orderpriority, count(*) AS n_orders, " +
        s"${Det.oRN(Det.oSum("o_totalprice"), 2)} AS revenue, " +
        Det.oRN(s"(${Det.oRN(Det.oSum("o_totalprice"), 2)}) / count(*)", 4) + " AS avg_price " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    (spark, dir) => {
      val orders = Tables
        .orders(spark, dir)
        .select(col("o_orderpriority"), col("o_orderdate"), col("o_totalprice"))
      // partial state: one row per group, metrics still mergeable
      def partials(df: DataFrame): DataFrame =
        df.groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(30, 8))).as("rev")
          )
      val mv    = partials(orders.filter(col("o_orderdate") < lit("1997-06-01")))
      val delta = partials(orders.filter(col("o_orderdate") >= lit("1997-06-01")))
      mv.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("n")).cast("long").as("n_orders"),
          Det.rN(sum(col("rev")).cast("double"), 2).as("revenue")
        )
        .withColumn("avg_price", Det.rN(col("revenue") / col("n_orders"), 4))
        .orderBy(col("o_orderpriority"))
    }
  )

  /** Data-quality audit: the constraint checks a curation pipeline runs
    * before trusting a batch — null/empty rates, value-range
    * violations, key uniqueness, and referential integrity between
    * fact and dimension. Shape matters at 100 TB: all per-row checks
    * on one table share ONE scan (a single aggregate computing every
    * violation counter, unpivoted to report rows with `stack`), and
    * the referential checks are anti-joins on the join key — never a
    * row-by-row lookup. Every counter is an exact integer, so the
    * report is trivially cross-engine deterministic.
    */
  val dqAudit: Q = Q(
    "dq_audit",
    Some(
      "SELECT * FROM (" +
        "SELECT 'customer_null_segment' AS check_name, " +
        "(SELECT cast(sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 ELSE 0 END) as bigint) FROM customer) AS n_bad, " +
        "(SELECT count(*) FROM customer) AS n_checked " +
        "UNION ALL SELECT 'lineitem_disc_range', " +
        "(SELECT cast(sum(CASE WHEN l_discount < cast(0 as double) OR l_discount > cast(0.1 as double) THEN 1 ELSE 0 END) as bigint) FROM lineitem), " +
        "(SELECT count(*) FROM lineitem) " +
        "UNION ALL SELECT 'lineitem_orphan_order', " +
        "(SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)), " +
        "(SELECT count(*) FROM lineitem) " +
        "UNION ALL SELECT 'lineitem_qty_range', " +
        "(SELECT cast(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) as bigint) FROM lineitem), " +
        "(SELECT count(*) FROM lineitem) " +
        "UNION ALL SELECT 'order_orphan_customer', " +
        "(SELECT count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)), " +
        "(SELECT count(*) FROM orders) " +
        "UNION ALL SELECT 'part_dup_key', " +
        "(SELECT count(*) - count(DISTINCT p_partkey) FROM part), " +
        "(SELECT count(*) FROM part)" +
        ") ORDER BY check_name"
    ),
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
      val li   = Tables.lineitem(spark, dir)
      val ord  = Tables.orders(spark, dir)
      val prt  = Tables.part(spark, dir)
      // one scan of lineitem covers BOTH range checks
      val liRanges = li
        .agg(
          sum(
            when(col("l_discount") < lit(0.0) || col("l_discount") > lit(0.1), 1L).otherwise(0L)
          ).as("disc_bad"),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("qty_bad"),
          count(lit(1)).as("n")
        )
        .select(
          expr(
            "stack(2, 'lineitem_disc_range', disc_bad, n, 'lineitem_qty_range', qty_bad, n) " +
              "AS (check_name, n_bad, n_checked)"
          )
        )
      val nullSegment = cust
        .agg(
          sum(when(col("c_mktsegment").isNull || col("c_mktsegment") === "", 1L).otherwise(0L))
            .as("n_bad"),
          count(lit(1)).as("n_checked")
        )
        .select(lit("customer_null_segment").as("check_name"), col("n_bad"), col("n_checked"))
      def orphans(name: String, fact: DataFrame, factKey: String, dimKeys: DataFrame): DataFrame =
        fact
          .join(dimKeys, col(factKey) === dimKeys.columns.map(col).head, "left_anti")
          .agg(count(lit(1)).as("n_bad"))
          .crossJoin(fact.agg(count(lit(1)).as("n_checked"))) // 1 row × 1 row
          .select(lit(name).as("check_name"), col("n_bad"), col("n_checked"))
      val liOrphans =
        orphans("lineitem_orphan_order", li.select(col("l_orderkey")), "l_orderkey",
          ord.select(col("o_orderkey")))
      val ordOrphans =
        orphans("order_orphan_customer", ord.select(col("o_custkey")), "o_custkey",
          cust.select(col("c_custkey")))
      val dupKeys = prt
        .agg(
          (count(lit(1)) - countDistinct(col("p_partkey"))).as("n_bad"),
          count(lit(1)).as("n_checked")
        )
        .select(lit("part_dup_key").as("check_name"), col("n_bad"), col("n_checked"))
      nullSegment
        .unionByName(liRanges)
        .unionByName(liOrphans)
        .unionByName(ordOrphans)
        .unionByName(dupKeys)
        .orderBy(col("check_name"))
    }
  )

  /** Dynamic partition pruning through a partitioned layout: the fact
    * table is laid out partitioned by its join key, the dimension side
    * carries the selective filter, and the scan of the fact must read
    * ONLY the partitions the filtered dimension can match — Spark
    * injects the dim-side values into the fact scan's partition filters
    * at runtime (DPP). This is THE 100 TB pattern for star-schema
    * filters: the predicate lives on the small table, yet the big scan
    * skips whole directories. MaintenanceSpec asserts the executed plan
    * carries a `dynamicpruning` partition filter; the oracle is the
    * equivalent static filter over the unpartitioned original, so the
    * values prove the pruned read is lossless.
    */
  val joinDppPrune: Q = Q(
    "join_dpp_prune",
    Some(
      "SELECT o_orderpriority, count(*) AS n_orders, " +
        Det.oRN(Det.oSum("o_totalprice"), 2) + " AS revenue " +
        "FROM orders WHERE substr(o_orderpriority, 1, 1) IN ('1', '2') " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    (spark, dir) => {
      val base = graft.Staging.dir("graft_dpp")
      Tables
        .orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write
        .mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(s"$base/fact")
      Tables
        .orders(spark, dir)
        .select(col("o_orderpriority").as("pri"))
        .distinct()
        .write
        .mode("overwrite")
        .parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read
        .parquet(s"$base/dim")
        .filter(substring(col("pri"), 1, 1).isin("1", "2"))
      fact
        .join(dim, col("o_orderpriority") === col("pri"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          Det.rN(Det.dsum(col("o_totalprice")), 2).as("revenue")
        )
        .orderBy(col("o_orderpriority"))
    }
  )

  /** Snapshot reconciliation: classify every key across two table
    * versions as added / removed / changed / unchanged — the audit a
    * pipeline runs after a CDC apply or a backfill to prove the delta
    * it shipped is the delta that landed. One full-outer join on the
    * primary key and a 4-row aggregate; at 100 TB both snapshots
    * shuffle once on the key (or not at all when the table is bucketed
    * by it — the [[Extras.snkBucketed]] layout). The "today" snapshot
    * is derived deterministically from the base table (drop keys
    * ≡0 mod 97, perturb prices on ≡0 mod 101, inject re-keyed rows for
    * ≡0 mod 103), so both engines reconstruct bit-identical inputs and
    * the class counts are exact.
    */
  val maintSnapshotDiff: Q = Q(
    "maint_snapshot_diff",
    Some(
      "WITH a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders), " +
        "b AS (SELECT o_orderkey, o_orderstatus, " +
        "CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT -o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 103 = 0) " +
        "SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added' " +
        "WHEN b.o_orderkey IS NULL THEN 'removed' " +
        "WHEN a.o_totalprice <> b.o_totalprice OR a.o_orderstatus <> b.o_orderstatus THEN 'changed' " +
        "ELSE 'unchanged' END AS diff_class, count(*) AS n " +
        "FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey " +
        "GROUP BY diff_class ORDER BY diff_class"
    ),
    (spark, dir) => {
      val base = Tables
        .orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val a = base.select(
        col("o_orderkey").as("ak"),
        col("o_orderstatus").as("as_"),
        col("o_totalprice").as("ap")
      )
      val b = base
        .filter(col("o_orderkey") % 97 =!= 0)
        .select(
          col("o_orderkey").as("bk"),
          col("o_orderstatus").as("bs"),
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice"))
            .as("bp")
        )
        .unionByName(
          base
            .filter(col("o_orderkey") % 103 === 0)
            .select((-col("o_orderkey")).as("bk"), col("o_orderstatus").as("bs"),
              col("o_totalprice").as("bp"))
        )
      a.join(b, col("ak") === col("bk"), "full_outer")
        .select(
          when(col("ak").isNull, "added")
            .when(col("bk").isNull, "removed")
            .when(col("ap") =!= col("bp") || col("as_") =!= col("bs"), "changed")
            .otherwise("unchanged")
            .as("diff_class")
        )
        .groupBy(col("diff_class"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("diff_class"))
    }
  )

  /** Column-statistics collection — the ANALYZE TABLE job that feeds a
    * cost-based optimizer: exact NDV, null count, and min/max per
    * column, ALL from one scan (a single aggregate computing every
    * column's stats, unpivoted to long form with stack — the same
    * one-pass shape as [[dqAudit]]). At 100 TB this runs after each
    * ingest batch and the results drive join-order and broadcast
    * decisions; NDV would move to HLL partials for re-mergeability
    * (exact here, proving the plumbing). Values are stringified for
    * the long-form schema: integer and date renderings are identical
    * cross-engine (doubles would not be — excluded by design).
    */
  val maintColumnStats: Q = Q(
    "maint_column_stats",
    Some(
      "SELECT * FROM (" +
        "SELECT 'o_custkey' AS column_name, count(DISTINCT o_custkey) AS n_distinct, " +
        "cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_nulls, " +
        "min(o_custkey)::VARCHAR AS min_val, max(o_custkey)::VARCHAR AS max_val FROM orders " +
        "UNION ALL SELECT 'o_orderdate', count(DISTINCT o_orderdate), " +
        "cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) as bigint), " +
        "min(o_orderdate)::DATE::VARCHAR, max(o_orderdate)::DATE::VARCHAR FROM orders " +
        "UNION ALL SELECT 'o_orderkey', count(DISTINCT o_orderkey), " +
        "cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) as bigint), " +
        "min(o_orderkey)::VARCHAR, max(o_orderkey)::VARCHAR FROM orders " +
        "UNION ALL SELECT 'o_orderpriority', count(DISTINCT o_orderpriority), " +
        "cast(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) as bigint), " +
        "min(o_orderpriority), max(o_orderpriority) FROM orders " +
        "UNION ALL SELECT 'o_orderstatus', count(DISTINCT o_orderstatus), " +
        "cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) as bigint), " +
        "min(o_orderstatus), max(o_orderstatus) FROM orders" +
        ") ORDER BY column_name"
    ),
    (spark, dir) => {
      // one pruned single-column scan per column: N count(DISTINCT)s in
      // ONE aggregate would instead plan an Expand that multiplies every
      // row N-fold (measured 4.4 s vs 0.6 s at sf0.1). Each branch is a
      // two-phase partial-distinct aggregate over one columnar read.
      // render applies to the NATIVE min/max results (min over rendered
      // strings would be lexicographic — wrong for numeric columns)
      type C = org.apache.spark.sql.Column
      def stats(c: String, render: C => C): DataFrame =
        Tables
          .orders(spark, dir)
          .select(col(c))
          .agg(
            countDistinct(col(c)).as("n_distinct"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            render(min(col(c))).as("min_val"),
            render(max(col(c))).as("max_val")
          )
          .select(lit(c).as("column_name"), col("n_distinct"), col("n_nulls"),
            col("min_val"), col("max_val"))
      stats("o_custkey", _.cast("string"))
        .unionByName(stats("o_orderdate", _.cast("date").cast("string")))
        .unionByName(stats("o_orderkey", _.cast("string")))
        .unionByName(stats("o_orderpriority", identity))
        .unionByName(stats("o_orderstatus", identity))
        .orderBy(col("column_name"))
    }
  )

  /** Z-order bit-interleave of (partkey, suppkey) — 10 low bits of each
    * interleaved, remaining partkey bits above. Pure integer bit ops,
    * identical in both engines. */
  // shared Morton kernel (s = even positions, p = odd) + the high-bit
  // carry that keeps over-10-bit partkeys order-preserving above the
  // interleave — values identical to the pre-r13 inline spelling
  private def zTermsSql: String =
    Morton.zvalSql("s", "p", 10) + " + ((p >> 10) << 20)"

  private def zCol: Column =
    Morton.zval(col("s"), col("p"), 10) + shiftleft(shiftright(col("p"), 10), 20)

  /** Why multi-dimensional layout matters at 100 TB: a table clustered
    * on partkey alone prunes partkey predicates but every file spans
    * the full suppkey range — suppkey predicates scan everything.
    * Z-ORDER interleaves the bits of both keys, so equal-width z-ranges
    * (the "files") bound BOTH dimensions at once. This operator
    * quantifies exactly that: bucket lineitem by the top z bits vs by
    * equal-width partkey ranges, and report the average per-bucket span
    * of each dimension — the z layout's suppkey span collapses by ~an
    * order of magnitude while its partkey span stays usable, which is
    * the min/max-pruning win a real lakehouse gets from Z-ordering.
    * All arithmetic is integer until the final span averages (exact
    * sums ÷ counts). Companion to `join_dpp_prune` (partition pruning)
    * and `snk_partitioned` (layout writing).
    */
  val maintZorder: Q = Q(
    "maint_zorder",
    Some(
      "WITH b AS (SELECT l_partkey AS p, l_suppkey AS s FROM lineitem), " +
        s"z AS (SELECT p, s, ($zTermsSql) AS zv FROM b), " +
        "zb AS (SELECT zv >> 16 AS bucket, max(p) - min(p) + 1 AS pspan, " +
        "max(s) - min(s) + 1 AS sspan FROM z GROUP BY 1), " +
        "pb AS (SELECT p >> 6 AS bucket, max(p) - min(p) + 1 AS pspan, " +
        "max(s) - min(s) + 1 AS sspan FROM b GROUP BY 1), " +
        "m AS (SELECT 'pkey_sort' AS layout, count(*) AS n_buckets, " +
        Det.oRN("cast(sum(pspan) as bigint)::DOUBLE / count(*)", 2) + " AS avg_p_span, " +
        Det.oRN("cast(sum(sspan) as bigint)::DOUBLE / count(*)", 2) + " AS avg_s_span FROM pb " +
        "UNION ALL SELECT 'zorder', count(*), " +
        Det.oRN("cast(sum(pspan) as bigint)::DOUBLE / count(*)", 2) + ", " +
        Det.oRN("cast(sum(sspan) as bigint)::DOUBLE / count(*)", 2) + " FROM zb) " +
        "SELECT layout, n_buckets, avg_p_span, avg_s_span FROM m ORDER BY layout"
    ),
    (spark, dir) => {
      val b = Tables
        .lineitem(spark, dir)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      def layout(name: String, bucket: Column, src: DataFrame): DataFrame =
        src
          .groupBy(bucket.as("bucket"))
          .agg(
            (max(col("p")) - min(col("p")) + 1).as("pspan"),
            (max(col("s")) - min(col("s")) + 1).as("sspan")
          )
          .agg(
            count(lit(1)).as("n_buckets"),
            Det.rN(sum(col("pspan")).cast("double") / count(lit(1)), 2).as("avg_p_span"),
            Det.rN(sum(col("sspan")).cast("double") / count(lit(1)), 2).as("avg_s_span")
          )
          .select(lit(name).as("layout"), col("n_buckets"), col("avg_p_span"), col("avg_s_span"))
      layout("pkey_sort", shiftright(col("p"), 6), b)
        .unionAll(layout("zorder", shiftright(zCol, 16), b))
        .orderBy(col("layout"))
    }
  )

  /** Slowly-changing-dimension (Type 2) build: collapse each customer's
    * order-status history into versioned validity intervals —
    * (version, status, valid_from, valid_to, is_current) — the standard
    * warehouse dimension-versioning shape (Kimball SCD2), built here
    * from the raw fact stream in one pass: change-flag via lag, run id
    * via a running sum, one grouped aggregate per run, valid_to closed
    * by lead over the runs.
    *
    * Determinism: runs are segmented on the total (o_orderdate,
    * o_orderkey) order, so version numbering is unique; all outputs are
    * exact (dates, longs, booleans).
    *
    * 100 TB: both windows and the aggregate share ONE partitioning on
    * the dimension key (custkey) — a single shuffle; per-key history
    * length bounds the window state, not corpus size. */
  val maintScd2: Q = Q(
    "maint_scd2",
    Some(
      "WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus, " +
        "CASE WHEN lag(o_orderstatus) OVER w IS NULL " +
        "OR o_orderstatus != lag(o_orderstatus) OVER w THEN 1 ELSE 0 END AS chg " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), " +
        "r AS (SELECT *, cast(sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS UNBOUNDED PRECEDING) as bigint) AS version FROM o), " +
        "v AS (SELECT o_custkey, version, min(o_orderstatus) AS status, " +
        "min(o_orderdate) AS valid_from, cast(count(*) as bigint) AS n_orders " +
        "FROM r GROUP BY o_custkey, version) " +
        "SELECT o_custkey, version, status, valid_from, " +
        "lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) AS valid_to, " +
        "lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) IS NULL AS is_current, " +
        "n_orders FROM v ORDER BY o_custkey, version"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val chg = when(
        lag(col("o_orderstatus"), 1).over(w).isNull ||
          col("o_orderstatus") =!= lag(col("o_orderstatus"), 1).over(w),
        1
      ).otherwise(0)
      val runs = Tables
        .orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
        .withColumn(
          "version",
          sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
      val versions = runs
        .groupBy(col("o_custkey"), col("version"))
        .agg(
          min(col("o_orderstatus")).as("status"), // constant within a run
          min(col("o_orderdate")).as("valid_from"),
          count(lit(1)).as("n_orders")
        )
      val wv = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
      versions
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
        .select(
          col("o_custkey"),
          col("version"),
          col("status"),
          col("valid_from"),
          col("valid_to"),
          col("valid_to").isNull.as("is_current"),
          col("n_orders")
        )
        .orderBy(col("o_custkey"), col("version"))
    }
  )

  /** Benford first-digit screen over the money column — the classic
    * fabricated-data / wrong-unit detector a DQ suite runs next to
    * [[dqAudit]]'s structural checks. Emits the observed digit
    * distribution, Benford's expectation log₁₀(1+1/d), and the per-digit
    * χ² contribution. (Synthetic uniform prices deliberately FAIL
    * Benford — the screen's job is to say so, deterministically.)
    *
    * Determinism: the first digit comes from integer-cents string
    * formatting (exact in both engines — no float log10 bucketing, which
    * can ulp-flip at powers of ten); counts exact; the χ² chain is
    * written in one fixed op order and trunc-rounded 6 dp.
    *
    * 100 TB: one map-side digit extraction + a 9-group aggregate. */
  val dqBenford: Q = Q(
    "dq_benford",
    Some(
      "WITH c AS (SELECT cast(substr(cast(cast(floor(o_totalprice * 100 + 0.5) as bigint) " +
        "as varchar), 1, 1) as bigint) AS digit FROM orders WHERE o_totalprice > 0), " +
        "d AS (SELECT digit, cast(count(*) as bigint) AS n FROM c GROUP BY digit), " +
        "t AS (SELECT cast(sum(n) as bigint) AS total FROM d) " +
        "SELECT digit, n, " +
        Det.oRN("n::DOUBLE / t.total", 6) + " AS obs_frac, " +
        Det.oRN("log10(1.0 + 1.0 / digit)", 6) + " AS benford_p, " +
        Det.oRN(
          "(n - t.total * log10(1.0 + 1.0 / digit)) * (n - t.total * log10(1.0 + 1.0 / digit)) " +
            "/ (t.total * log10(1.0 + 1.0 / digit))",
          4
        ) + " AS chi2_part " +
        "FROM d CROSS JOIN t ORDER BY digit"
    ),
    (spark, dir) => {
      val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
      val c = Tables
        .orders(spark, dir)
        .filter(col("o_totalprice") > 0)
        .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      val d = c.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val t = d.agg(sum(col("n")).as("total"))
      val p = log10(lit(1.0) + lit(1.0) / col("digit"))
      d.crossJoin(broadcast(t))
        .select(
          col("digit"),
          col("n"),
          Det.rN(col("n").cast("double") / col("total"), 6).as("obs_frac"),
          Det.rN(p, 6).as("benford_p"),
          Det.rN(
            (col("n") - col("total") * p) * (col("n") - col("total") * p) / (col("total") * p),
            4
          ).as("chi2_part")
        )
        .orderBy(col("digit"))
    }
  )

  /** RIGHT-TO-BE-FORGOTTEN PROPAGATION REPORT — the takedown audit a
    * 100 TB pipeline runs when a deletion request lands: for EVERY
    * id-keyed serving view in the engine (the three dedup signature
    * tables, the LSH signatures, the IVF inverted lists, both PQ code
    * tables, the BM25 postings), how many physical rows reference the
    * doomed ids (here the demo predicate `id % 97 = 0`) and how many
    * survive the delete. Because every view row carries its source
    * doc/vec id, the delete itself is a MAP-SIDE anti-filter per view
    * — no join, no re-derivation from text — and this report is its
    * coverage proof.
    *
    * The oracle never reads the views: it derives each view's expected
    * row counts from the BASE tables (per-doc views = |documents|,
    * per-vector views = |embeddings|, postings = distinct (doc, token)
    * pairs), so the driver compare doubles as a VIEW-INTEGRITY check —
    * a stale, duplicated, or short view fails this row's hash even if
    * every other consumer happens to mask it. Determinism: exact
    * counts, integer modulus. */
  val maintForgetReport: Q = Q(
    "maint_forget_report",
    Some(
      "WITH dn AS (SELECT cast(count(*) as bigint) AS n, " +
        "cast(count(*) FILTER (WHERE doc_id % 97 = 0) as bigint) AS f FROM documents), " +
        "en AS (SELECT cast(count(*) as bigint) AS n, " +
        "cast(count(*) FILTER (WHERE vec_id % 97 = 0) as bigint) AS f FROM embeddings), " +
        "pn AS (SELECT cast(count(*) as bigint) AS n, " +
        "cast(count(*) FILTER (WHERE doc_id % 97 = 0) as bigint) AS f FROM " +
        "(SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)) " +
        "SELECT view, n_rows, n_forget, n_rows - n_forget AS n_kept FROM (" +
        "SELECT 'bm25_postings' AS view, n AS n_rows, f AS n_forget FROM pn " +
        "UNION ALL SELECT 'dedup_sigs', n, f FROM dn " +
        "UNION ALL SELECT 'ivf_assignments', n, f FROM en " +
        "UNION ALL SELECT 'ivfpq_codes', n, f FROM en " +
        "UNION ALL SELECT 'lsh_sigs', n, f FROM en " +
        "UNION ALL SELECT 'minhash_sigs', n, f FROM dn " +
        "UNION ALL SELECT 'pq_codes', n, f FROM en " +
        "UNION ALL SELECT 'simhash_sigs', n, f FROM dn" +
        ") ORDER BY view"
    ),
    (spark, dir) => {
      def viewRow(name: String, path: String, idCol: String): DataFrame =
        spark.read
          .parquet(path)
          .select(col(idCol).as("id"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("id") % 97 === 0, 1L).otherwise(0L)).as("n_forget"))
          .select(
            lit(name).as("view"), col("n_rows"), col("n_forget"),
            (col("n_rows") - col("n_forget")).as("n_kept"))
      val (ivfCent, ivfAsg) = Advanced.ivfIndexPath(spark, dir)
      val rows = Seq(
        viewRow("bm25_postings", TextAnalysis.bm25IndexPath(spark, dir)._1, "doc_id"),
        viewRow("dedup_sigs", Dedup.sigTablePath(spark, dir), "doc_id"),
        viewRow("ivf_assignments", ivfAsg, "vec_id"),
        viewRow("ivfpq_codes", Advanced.ivfPqIndexPath(spark, dir)._2, "vec_id"),
        viewRow("lsh_sigs", Similarity.lshSigTablePath(spark, dir), "vec_id"),
        viewRow("minhash_sigs", Dedup.minhashSigTablePath(spark, dir), "doc_id"),
        viewRow("pq_codes", Advanced.pqIndexPath(spark, dir)._2, "vec_id"),
        viewRow("simhash_sigs", Dedup.simhashSigTablePath(spark, dir), "doc_id"))
      rows.reduce(_ unionByName _).orderBy(col("view"))
    }
  )

  def qs: Seq[Q] =
    Seq(maintIncrementalAgg, dqAudit, joinDppPrune, maintSnapshotDiff, maintColumnStats,
      maintZorder, maintScd2, dqBenford, maintForgetReport)
}
