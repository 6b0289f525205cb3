package graft.operators

import graft.{Det, Q, Tables}

/** SQL entry point: the same engine surface through `spark.sql` over
  * registered temp views — a user who writes SQL instead of DataFrame
  * code gets the identical Catalyst plan (views are lazy aliases of
  * the parquet scans; nothing is materialized by registration).
  */
object SqlSurface {

  /** Register all ten tables as temp views (idempotent). */
  private def registerViews(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "documents", "embeddings").foreach { t =>
      Tables.t(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** The flagship pricing summary expressed as literal SQL. The Spark
    * SQL text and the DuckDB oracle differ only where the determinism
    * helpers require (decimal-cast sums, trunc rounding) — both are
    * ANSI. */
  val sqlPricing: Q = Q(
    "sql_pricing",
    Some(
      "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        Det.oRN(Det.oSum("l_quantity"), 2) + " AS sum_qty, " +
        Det.oRN(Det.oSum("l_extendedprice * (1 - l_discount)"), 2) + " AS sum_disc_price " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    ),
    (spark, dir) => {
      registerViews(spark, dir)
      spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
          "floor(cast(sum(cast(l_quantity as decimal(30,8))) as double) * 100 + 0.5) / 100 AS sum_qty, " +
          "floor(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(30,8))) as double) * 100 + 0.5) / 100 AS sum_disc_price " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
      )
    }
  )

  /** Correlated subqueries through SQL: customers whose balance exceeds
    * their nation's average (correlated scalar subqueries → Catalyst
    * rewrites to joins). Phrased as balance·count > decimal-sum so the
    * comparison is order-independent — a bare avg() of doubles could
    * differ in the last ulp between engines right at the boundary. */
  private val correlatedSql =
    "SELECT c_custkey, c_nationkey FROM customer c " +
      "WHERE c_acctbal * (SELECT count(*) FROM customer i WHERE i.c_nationkey = c.c_nationkey) " +
      "> (SELECT cast(sum(cast(c_acctbal as decimal(30,8))) as double) " +
      "FROM customer i WHERE i.c_nationkey = c.c_nationkey) " +
      "ORDER BY c_custkey"

  val sqlCorrelated: Q = Q(
    "sql_correlated",
    Some(correlatedSql),
    (spark, dir) => {
      registerViews(spark, dir)
      spark.sql(correlatedSql)
    }
  )

  /** CTE + window through SQL: each nation's share of its region's
    * supplier account balance. */
  val sqlCteWindow: Q = Q(
    "sql_cte_window",
    Some(
      "WITH nb AS (SELECT n_regionkey, n_name, " + Det.oRN(Det.oSum("s_acctbal"), 2) + " AS bal " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_regionkey, n_name) " +
        "SELECT n_regionkey, n_name, bal, " +
        Det.oRN("bal / cast(sum(cast(bal as decimal(30,8))) OVER (PARTITION BY n_regionkey) as double)", 6) +
        " AS share FROM nb ORDER BY n_regionkey, n_name"
    ),
    (spark, dir) => {
      registerViews(spark, dir)
      spark.sql(
        "WITH nb AS (SELECT n_regionkey, n_name, " +
          "floor(cast(sum(cast(s_acctbal as decimal(30,8))) as double) * 100 + 0.5) / 100 AS bal " +
          "FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_regionkey, n_name) " +
          "SELECT n_regionkey, n_name, bal, " +
          "floor(bal / cast(sum(cast(bal as decimal(30,8))) OVER (PARTITION BY n_regionkey) as double) " +
          "* 1000000 + 0.5) / 1000000 AS share " +
          "FROM nb ORDER BY n_regionkey, n_name"
      )
    }
  )

  /** LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    * SQL spelling of "top-2 orders per customer". Catalyst decorrelates
    * this into the same grouped-limit shape as the window idiom; the
    * oracle runs DuckDB's native LATERAL. Scoped to the first 100
    * customers to keep the verified output small. */
  val sqlLateral: Q = Q(
    "sql_lateral", {
      val sql =
        "SELECT c_custkey, o_orderkey, o_totalprice " +
          "FROM customer, LATERAL (" +
          "SELECT o_orderkey, o_totalprice FROM orders " +
          "WHERE o_custkey = c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) " +
          "WHERE c_custkey < 100 " +
          "ORDER BY c_custkey, o_totalprice DESC, o_orderkey"
      Some(sql)
    },
    (spark, dir) => {
      registerViews(spark, dir)
      spark.sql(
        "SELECT c_custkey, o_orderkey, o_totalprice " +
          "FROM customer, LATERAL (" +
          "SELECT o_orderkey, o_totalprice FROM orders " +
          "WHERE o_custkey = c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) " +
          "WHERE c_custkey < 100 " +
          "ORDER BY c_custkey, o_totalprice DESC, o_orderkey"
      )
    }
  )

  /** Catalog DDL lifecycle: CTAS into a managed parquet table, INSERT
    * INTO appending a second slice, aggregate read-back — the
    * warehouse surface (a user managing tables instead of paths).
    * Oracle: the same aggregate straight off the part file (the
    * managed copy must be lossless). DROP..IF EXISTS first makes the
    * query re-runnable in a shared warehouse. */
  val sqlDdlCtas: Q = Q(
    "sql_ddl_ctas",
    Some(
      "SELECT p_brand, count(*) AS n, cast(sum(p_size) as bigint) AS total_size " +
        "FROM part WHERE p_size >= 25 GROUP BY p_brand ORDER BY p_brand"
    ),
    (spark, dir) => {
      registerViews(spark, dir)
      spark.sql("DROP TABLE IF EXISTS graft_ctas")
      // the default catalog is in-memory per session but the warehouse
      // files persist — a stale location from an earlier session blocks
      // CTAS even after DROP IF EXISTS, so clear it physically too
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "graft_ctas")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      spark.sql(
        "CREATE TABLE graft_ctas USING parquet AS " +
          "SELECT p_brand, p_size FROM part WHERE p_size > 25"
      )
      spark.sql("INSERT INTO graft_ctas SELECT p_brand, p_size FROM part WHERE p_size = 25")
      spark.sql(
        "SELECT p_brand, count(*) AS n, cast(sum(p_size) as bigint) AS total_size " +
          "FROM graft_ctas GROUP BY p_brand ORDER BY p_brand"
      )
    }
  )

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): generate the complete
    * month spine of the order-date range, then LEFT JOIN order counts
    * onto it — the gap-free calendar a reporting layer needs (months
    * with zero orders appear as 0, which no plain GROUP BY can
    * produce). The recursion is 80 rows of driver-cheap generation;
    * the join probes it broadcast-style against the fact scan. Bounds
    * are literals of the fixture's fixed date range (identical at
    * every SF — see TESTDATA.md). */
  val sqlRecursive: Q = Q(
    "sql_recursive", {
      val body =
        "WITH RECURSIVE cal(m) AS (" +
          "SELECT TIMESTAMP '1995-01-01 00:00:00' " +
          "UNION ALL SELECT m + INTERVAL 1 MONTH FROM cal " +
          "WHERE m < TIMESTAMP '2001-08-01 00:00:00') " +
          "SELECT c.m AS month, count(o.o_orderkey) AS n_orders " +
          "FROM cal c LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = c.m " +
          "GROUP BY c.m ORDER BY month"
      Some(body)
    },
    (spark, dir) => {
      registerViews(spark, dir)
      spark.sql(
        "WITH RECURSIVE cal(m) AS (" +
          "SELECT TIMESTAMP_NTZ '1995-01-01 00:00:00' " +
          "UNION ALL SELECT m + INTERVAL 1 MONTH FROM cal " +
          "WHERE m < TIMESTAMP_NTZ '2001-08-01 00:00:00'), " +
          // Aggregate-before-join (r22): the join-then-group spelling
          // planned a BroadcastHashJoin that broadcast the ENTIRE fact
          // side as the build relation (the spine is the 80-row probe
          // side of a LeftOuter, so Catalyst must build the right) —
          // at scale that is a broadcast of the whole orders table.
          // Grouping orders to per-month counts FIRST makes the build
          // side ~80 rows; count(o_orderkey) per unique spine month is
          // the same value joined-then-grouped or grouped-then-joined
          // (null o_orderdate months match no spine row either way),
          // and months with no orders surface as the left join's null
          // -> coalesce 0, exactly the old empty group's count.
          // trunc(DATE)→DATE→NTZ is field arithmetic end to end; the
          // date_trunc builtin would produce a session-zone INSTANT and
          // the join keys against the NTZ spine would shift off-month
          // in a non-UTC library session (TzRobustnessSpec probes this).
          "mo AS (SELECT cast(trunc(cast(o_orderdate as date), 'MM') as timestamp_ntz) AS m, " +
          "count(o_orderkey) AS n FROM orders GROUP BY 1) " +
          "SELECT c.m AS month, coalesce(mo.n, 0) AS n_orders " +
          "FROM cal c LEFT JOIN mo ON mo.m = c.m " +
          "ORDER BY month"
      )
    }
  )

  /** The engine's NATIVE codegen expressions called from SQL text —
    * the extension-registration path (`graft.GraftExtensions` /
    * `GraftFunctions.registerFunctions`) proven through the driver
    * gate, not just a spec: `float_dot` in a SQL string must plan the
    * same codegen'd [[org.apache.spark.sql.graftx.FloatDot]] the
    * DataFrame rows use, and its double must value-match DuckDB's
    * `list_dot_product` exactly (the equality every cosine row already
    * rests on). A user who writes SQL gets the engine's kernels. */
  val sqlNativeFns: Q = Q(
    "sql_native_fns",
    Some(
      "SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        Det.oRS("list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])", 6) +
        " AS cos FROM embeddings a JOIN embeddings b " +
        "ON a.vec_id < 5 AND b.vec_id < 50 AND a.vec_id != b.vec_id " +
        "ORDER BY query_id, neighbor_id"
    ),
    (spark, dir) => {
      registerViews(spark, dir)
      org.apache.spark.sql.graftx.GraftFunctions.registerFunctions(spark)
      spark.sql(
        "SELECT query_id, neighbor_id, " +
          "(floor(abs(d) * 1000000 + 0.5) / 1000000) * sign(d) AS cos FROM (" +
          "SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
          "float_dot(a.embedding, b.embedding) AS d " +
          "FROM embeddings a JOIN embeddings b " +
          "ON a.vec_id < 5 AND b.vec_id < 50 AND a.vec_id != b.vec_id) " +
          "ORDER BY query_id, neighbor_id"
      )
    }
  )

  /** The sorted-merge intersect kernel from SQL text — closing the
    * SQL-callable-natives gap after `sql_native_fns` proved the
    * pattern for `float_dot` (VERDICT r14 #7): `sorted_intersect_count`
    * in a SQL string plans the same codegen'd
    * [[org.apache.spark.sql.graftx.SortedLongIntersectCount]] merge
    * loop every exact-Jaccard row uses, and its count must value-match
    * DuckDB's `list_intersect` length on the same sorted-distinct
    * 60-bit md5 token hashes. Bounded: 20 docs → 190 pairs. */
  val sqlSortedIntersect: Q = Q(
    "sql_sorted_intersect",
    Some(
      "WITH d AS (SELECT doc_id, list_sort(list_distinct(list_transform(string_split(text, ' '), " +
        "x -> ('0x' || substr(md5(x), 1, 15))::BIGINT))) AS t FROM documents WHERE doc_id < 20) " +
        "SELECT a.doc_id AS ida, b.doc_id AS idb, " +
        "cast(len(list_intersect(a.t, b.t)) as bigint) AS n_common " +
        "FROM d a JOIN d b ON a.doc_id < b.doc_id ORDER BY ida, idb"
    ),
    (spark, dir) => {
      registerViews(spark, dir)
      org.apache.spark.sql.graftx.GraftFunctions.registerFunctions(spark)
      spark.sql(
        "WITH d AS (SELECT doc_id, array_sort(array_distinct(transform(split(text, ' '), " +
          "x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)))) AS t " +
          "FROM documents WHERE doc_id < 20) " +
          "SELECT a.doc_id AS ida, b.doc_id AS idb, " +
          "cast(sorted_intersect_count(a.t, b.t) as bigint) AS n_common " +
          "FROM d a JOIN d b ON a.doc_id < b.doc_id ORDER BY ida, idb"
      )
    }
  )

  /** The bloom-probe kernel from SQL text — a runtime bloom filter
    * built over a selective dimension subset, embedded as an X'…'
    * binary literal in the SQL string, probed by the codegen'd
    * [[org.apache.spark.sql.graftx.LongBloomMightContain]] directly
    * above the fact scan (Catalyst pushes the single-column predicate
    * down), with the join removing false positives — so the result is
    * EXACT and the oracle is the plain join (`join_bloom_prune`'s
    * argument, now through the SQL-text path a query author takes). */
  val sqlBloomFilter: Q = Q(
    "sql_bloom_filter",
    Some(
      "SELECT s_suppkey, count(*) AS n_items, " +
        s"round(${Det.oSum("l_extendedprice * (1 - l_discount)")}, 2) AS revenue " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE s_suppkey % 10 = 0 GROUP BY s_suppkey ORDER BY s_suppkey"
    ),
    (spark, dir) => {
      registerViews(spark, dir)
      org.apache.spark.sql.graftx.GraftFunctions.registerFunctions(spark)
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.graftx.LongBloomMightContain
      val dim = Tables
        .supplier(spark, dir)
        .filter(col("s_suppkey") % 10 === 0)
        .select(col("s_suppkey"))
      // one job over the small side builds the filter; 1k expected
      // keys / 1% fpp → ~1.2 KB plan literal (bitwise-OR inserts make
      // the serialized bytes order-independent, so the literal — and
      // the row's plan — is deterministic)
      val hex = LongBloomMightContain
        .serialize(dim.stat.bloomFilter("s_suppkey", 1000L, 0.01))
        .map(b => f"$b%02X").mkString
      spark.sql(
        "SELECT s_suppkey, count(*) AS n_items, " +
          "round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(30,8))) as double), 2) AS revenue " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          s"WHERE long_bloom_might_contain(X'$hex', l_suppkey) AND s_suppkey % 10 = 0 " +
          "GROUP BY s_suppkey ORDER BY s_suppkey"
      )
    }
  )

  def qs: Seq[Q] =
    Seq(sqlPricing, sqlCorrelated, sqlCteWindow, sqlLateral, sqlDdlCtas, sqlRecursive,
      sqlNativeFns, sqlSortedIntersect, sqlBloomFilter)
}
