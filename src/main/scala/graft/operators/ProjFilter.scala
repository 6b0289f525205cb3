package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Projection / filter / predicate operators (SURVEY §2.2).
  *
  * All expressions stay inside whole-stage codegen (built-in functions
  * only), and the conjunctive parts of `filt_pred_combo` are pushed into
  * the parquet scan by Catalyst — free row-group skipping at 100 TB.
  */
object ProjFilter {

  /** Arithmetic projection: element-level double arithmetic is IEEE-
    * deterministic on identical inputs, so both engines produce identical
    * doubles before the final round.
    */
  val projArith: Q = Q(
    "proj_arith",
    Some(
      "SELECT l_orderkey, l_linenumber, " +
        s"${Det.oR2("l_extendedprice * (1 - l_discount)")} AS net_price, " +
        s"${Det.oR2("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge, " +
        "CASE WHEN l_quantity >= 25 THEN 'bulk' WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS qty_class, " +
        "cast(l_quantity as bigint) % 7 AS qty_mod7 " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          Det.r2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
          Det.r2(
            col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))
          ).as("charge"),
          when(col("l_quantity") >= 25, "bulk")
            .when(col("l_quantity") >= 10, "mid")
            .otherwise("small")
            .as("qty_class"),
          (col("l_quantity").cast("long") % 7).as("qty_mod7")
        )
        .orderBy(col("l_orderkey"), col("l_linenumber"))
  )

  /** Predicate combinators: AND/OR/NOT, IN, BETWEEN, LIKE prefix/infix,
    * IS NULL on a synthesized NULL, and null-safe equality (`<=>` ≡
    * DuckDB `IS NOT DISTINCT FROM`).
    */
  val filtPredCombo: Q = Q(
    "filt_pred_combo",
    Some(
      "SELECT p_partkey, p_name, p_brand, p_type, p_size " +
        "FROM part " +
        "WHERE (p_type IN ('PROMO','ECONOMY') OR p_name LIKE '%widget%') " +
        "AND p_size BETWEEN 10 AND 40 " +
        "AND NOT (p_brand = 'Brand#13') " +
        "AND (nullif(p_type, 'STANDARD') IS NOT NULL) " +
        "AND (nullif(p_brand, 'Brand#99') IS NOT DISTINCT FROM p_brand) " +
        "ORDER BY p_partkey"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .filter(
          (col("p_type").isin("PROMO", "ECONOMY") || col("p_name").like("%widget%")) &&
            col("p_size").between(10, 40) &&
            !(col("p_brand") === "Brand#13") &&
            nullif(col("p_type"), lit("STANDARD")).isNotNull &&
            (nullif(col("p_brand"), lit("Brand#99")) <=> col("p_brand"))
        )
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
        .orderBy(col("p_partkey"))
  )

  def qs: Seq[Q] = Seq(projArith, filtPredCombo)
}
