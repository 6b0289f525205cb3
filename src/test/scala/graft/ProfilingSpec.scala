package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Pre-join diagnostics invariants: the fanout predictor equals the
  * executed join's true output count, the skew report is internally
  * consistent with the raw tables, hot-key shares are true row shares,
  * and the reservoir sample is an exact-k stable subset chosen by a
  * shuffle-free TakeOrderedAndProject plan.
  */
class ProfilingSpec extends SparkSuite {

  test("profile_fanout predictions equal the executed join counts") {
    val pred = operators.Profiling.profileFanout.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val li  = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf)
    val prt = Tables.part(spark, sf)
    val self = li.select(col("l_partkey").as("k"))
      .join(li.select(col("l_partkey").as("k")), "k").count()
    val liOrd = li.select(col("l_orderkey").as("k"))
      .join(ord.select(col("o_orderkey").as("k")), "k").count()
    val liPrt = li.select(col("l_partkey").as("k"))
      .join(prt.select(col("p_partkey").as("k")), "k").count()
    assert(pred("lineitem_lineitem_partkey") == self)
    assert(pred("lineitem_orders_orderkey") == liOrd)
    assert(pred("lineitem_part_partkey") == liPrt)
  }

  test("profile_skew rows/keys/extremes agree with the raw tables") {
    val rows = operators.Profiling.profileSkew.run(spark, sf).collect()
    assert(rows.length == 3)
    val li = Tables.lineitem(spark, sf)
    for (r <- rows) {
      val (keyCol, nKeys, nRows) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (minC, p50, p99, maxC) =
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6))
      assert(minC <= p50 && p50 <= p99 && p99 <= maxC, s"$keyCol percentile order")
      assert(r.getDouble(7) >= 1.0 - 1e-9, s"$keyCol skew < 1")
      if (keyCol.startsWith("l_")) {
        assert(nRows == li.count())
        assert(nKeys == li.select(col(keyCol)).distinct().count())
      }
    }
  }

  test("hot-key shares are exact row shares and counts are maximal") {
    val rows = operators.Profiling.profileHotKeys.run(spark, sf).collect()
    val li    = Tables.lineitem(spark, sf)
    val total = li.count().toDouble
    val partCounts = li.groupBy(col("l_partkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hot = rows.filter(_.getString(0) == "l_partkey")
    assert(hot.length == 5)
    // each reported count is the true count and the share is cnt/total
    for (r <- hot) {
      assert(partCounts(r.getLong(1)) == r.getLong(2))
      assert(math.abs(r.getDouble(3) - r.getLong(2) / total) < 1e-12)
    }
    // nothing outside the top-5 beats the smallest reported count
    val floor = hot.map(_.getLong(2)).min
    val better = partCounts.count(_._2 > floor)
    assert(better < 5, s"$better keys beat the reported floor")
  }

  test("reservoir sample is an exact-k stable subset via TakeOrdered") {
    def pkOf(r: org.apache.spark.sql.Row): (Long, Long) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
    val a = operators.Profiling.sampleReservoir.run(spark, sf)
    val rowsA = a.collect().map(pkOf)
    val rowsB = operators.Profiling.sampleReservoir.run(spark, sf).collect().map(pkOf)
    assert(rowsA.length == 100)
    assert(rowsA.sameElements(rowsB))
    val pk = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(pkOf).toSet
    assert(rowsA.forall(pk.contains))
    def hasTakeOrdered(p: SparkPlan): Boolean =
      p.toString.contains("TakeOrderedAndProject")
    assert(hasTakeOrdered(a.queryExecution.executedPlan), "bottom-k must not global-sort")
  }
}
