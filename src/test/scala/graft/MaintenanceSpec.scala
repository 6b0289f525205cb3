package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Maintenance-family correctness stories: incremental MV merge equals
  * full recompute, the audit's single-scan unpivot covers every check,
  * and the partitioned join actually prunes via dynamic partition
  * pruning (the part the DuckDB oracle cannot see).
  */
class MaintenanceSpec extends SparkSuite {

  test("incremental MV merge equals the direct full recompute") {
    val merged = operators.Maintenance.maintIncrementalAgg
      .run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val direct = Tables
      .orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.rN(sum(col("o_totalprice").cast(DecimalType(30, 8))).cast("double"), 2).as("revenue")
      )
      .withColumn("avg_price", Det.rN(col("revenue") / col("n_orders"), 4))
      .orderBy(col("o_orderpriority"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(merged == direct) // bit-identical, not approximately equal
  }

  test("dq_audit emits every check exactly once with sane counters") {
    val rows = operators.Maintenance.dqAudit
      .run(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(
      rows.keySet == Set(
        "customer_null_segment", "lineitem_disc_range", "lineitem_orphan_order",
        "lineitem_qty_range", "order_orphan_customer", "part_dup_key"
      )
    )
    for ((name, (bad, checked)) <- rows) {
      assert(bad >= 0 && checked > 0 && bad <= checked, s"$name: $bad/$checked")
    }
    // the synthetic tables are referentially intact and key-unique
    assert(rows("lineitem_orphan_order")._1 == 0)
    assert(rows("part_dup_key")._1 == 0)
  }

  test("join_dpp_prune's fact scan carries a dynamic-pruning partition filter") {
    val df = operators.Maintenance.joinDppPrune.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"), plan.take(2000))
    assert(df.count() > 0)
  }
}
