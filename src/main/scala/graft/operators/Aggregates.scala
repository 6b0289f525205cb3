package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY §2.4).
  *
  * All grouped aggregates compile to Spark's two-phase HashAggregateExec
  * (partial map-side combine → shuffle on the group keys → final) — the
  * shape that scales linearly with executors at 100 TB. Money aggregates
  * go through [[graft.Det]] so results are independent of partition
  * count/order (see Det's scaladoc).
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

  def qs: Seq[Q] = Seq(aggGroupPricing)
}
