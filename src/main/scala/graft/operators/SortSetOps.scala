package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / set operations (SURVEY §2.6).
  *
  * `topk_global` compiles to TakeOrderedAndProject — per-partition
  * top-k then a k-row driver merge, never a full sort: the only sane
  * global-top-k plan at 100 TB. Set ops shuffle on the full row; NULL
  * ordering is always explicit because engine defaults differ.
  */
object SortSetOps {

  /** Multi-key sort with explicit NULL placement (NULLs synthesized via
    * nullif — the testdata itself is null-free). */
  val sortMultiNulls: Q = Q(
    "sort_multi_nulls",
    Some(
      "SELECT nullif(l_returnflag, 'R') AS rf_or_null, l_linestatus, l_orderkey, l_linenumber " +
        "FROM lineitem " +
        "ORDER BY rf_or_null ASC NULLS FIRST, l_linestatus DESC NULLS LAST, l_orderkey, l_linenumber"
    ),
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(
          nullif(col("l_returnflag"), lit("R")).as("rf_or_null"),
          col("l_linestatus"),
          col("l_orderkey"),
          col("l_linenumber")
        )
        .orderBy(
          asc_nulls_first("rf_or_null"),
          desc_nulls_last("l_linestatus"),
          col("l_orderkey"),
          col("l_linenumber")
        )
  )

  /** Global top-100 with a unique tiebreak. */
  val topkGlobal: Q = Q(
    "topk_global",
    Some(
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    (spark, dir) =>
      Tables
        .orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
  )

  private def sliceA(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables
      .customer(spark, dir)
      .filter(col("c_acctbal") > 3000)
      .select(col("c_custkey"), col("c_name"))

  private def sliceB(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables
      .customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))

  /** UNION ALL keeps duplicates (overlapping slices make that visible). */
  val setUnionAll: Q = Q(
    "set_union_all",
    Some(
      "SELECT * FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 3000 " +
        "UNION ALL SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') " +
        "ORDER BY c_custkey"
    ),
    (spark, dir) =>
      sliceA(spark, dir).unionAll(sliceB(spark, dir)).orderBy(col("c_custkey"))
  )

  /** UNION DISTINCT de-duplicates the overlap. */
  val setUnionDistinct: Q = Q(
    "set_union_distinct",
    Some(
      "SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 3000 " +
        "UNION SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "ORDER BY c_custkey"
    ),
    (spark, dir) =>
      sliceA(spark, dir).union(sliceB(spark, dir)).distinct().orderBy(col("c_custkey"))
  )

  /** INTERSECT of the nation-key sets reachable from customers vs
    * suppliers (ANSI distinct semantics). */
  val setIntersect: Q = Q(
    "set_intersect",
    Some(
      "SELECT c_nationkey AS nationkey FROM customer " +
        "INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"
    ),
    (spark, dir) =>
      Tables
        .customer(spark, dir)
        .select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(spark, dir).select(col("s_nationkey")))
        .orderBy(col("nationkey"))
  )

  /** EXCEPT (ANSI distinct semantics): customers with 'P'-status orders
    * but no 'F'-status orders — 67 rows at sf0.01, non-degenerate at
    * every SF (the customer-nations-minus-supplier-nations variant is
    * empty at sf0.01 because suppliers cover all 25 nations). */
  val setExcept: Q = Q(
    "set_except",
    Some(
      "SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' ORDER BY o_custkey"
    ),
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      o.filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }
  )

  /** EXCEPT ALL (bag semantics): per-occurrence difference of
    * nationkey multisets — each duplicate is cancelled once, unlike the
    * distinct EXCEPT above. */
  val setExceptAll: Q = Q(
    "set_except_all",
    Some(
      "SELECT c_nationkey AS nk FROM customer EXCEPT ALL " +
        "SELECT s_nationkey FROM supplier ORDER BY nk"
    ),
    (spark, dir) =>
      Tables
        .customer(spark, dir)
        .select(org.apache.spark.sql.functions.col("c_nationkey").as("nk"))
        .exceptAll(
          Tables.supplier(spark, dir).select(org.apache.spark.sql.functions.col("s_nationkey").as("nk"))
        )
        .orderBy(org.apache.spark.sql.functions.col("nk"))
  )

  /** unionByName: schemas aligned by column NAME, not position — the
    * safe union for evolving schemas. The oracle's UNION ALL BY NAME is
    * the same semantics. */
  val setUnionByName: Q = Q(
    "set_union_by_name",
    Some(
      "SELECT * FROM (SELECT r_regionkey AS k, r_name AS name FROM region " +
        "UNION ALL BY NAME SELECT n_name AS name, n_nationkey AS k FROM nation) " +
        "ORDER BY k, name"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val a = graft.Tables.region(spark, dir)
        .select(col("r_regionkey").as("k"), col("r_name").as("name"))
      val b = graft.Tables.nation(spark, dir)
        .select(col("n_name").as("name"), col("n_nationkey").as("k"))
      a.unionByName(b).orderBy(col("k"), col("name"))
    }
  )

  def qs: Seq[Q] = Seq(setExceptAll, setUnionByName, 
    sortMultiNulls, topkGlobal, setUnionAll, setUnionDistinct, setIntersect, setExcept
  )
}
