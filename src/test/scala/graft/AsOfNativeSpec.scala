package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.AsOfJoinNative

/** The native ordered-merge as-of operator: equality with the
  * union-window formulation, plan shape, partition invariance, and the
  * self-join aliasing path.
  */
class AsOfNativeSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Any, Any)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3))).toSeq

  test("native as-of equals the union-window formulation row for row") {
    val native = rows(operators.Joins.asOfNative.run(spark, sf))
    val window = rows(operators.Joins.asOf.run(spark, sf))
    assert(native.nonEmpty)
    assert(native == window)
  }

  test("forward direction equals the forward union-window formulation") {
    val native = rows(operators.Joins.asOfNativeForward.run(spark, sf))
    val window = rows(operators.Joins.asOfForward.run(spark, sf))
    assert(native.nonEmpty)
    assert(native == window)
  }

  test("plan: AsOfJoinMerge node, no Window, both sides exchanged once") {
    val df = operators.Joins.asOfNative.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinMerge"), plan.take(2000))
    assert(!plan.contains("Window"), "native form must not fall back to a window")
    // one shuffle per side for the co-partitioning, and nothing else
    // between the scans and the merge
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2, s"expected co-partitioning exchanges, got $exchanges\n${plan.take(2000)}")
  }

  test("chained nearest equals the window formulation and reuses the left exchange") {
    val native = rows(operators.Joins.asOfNativeNearest.run(spark, sf))
    val window = rows(operators.Joins.asOfNearest.run(spark, sf))
    assert(native.nonEmpty && native == window)
    val df = operators.Joins.asOfNativeNearest.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the chain shuffles exactly twice: purchases once (the second
    // join's left side reuses the first join's partitioning — only a
    // direction re-sort between the merges) and clicks once (both
    // directions need the same hash exchange, so the second is a
    // ReusedExchange with its own per-direction sort downstream).
    // (the AQE string appends the pre-execution "== Initial Plan ==",
    // whose exchanges carry different plan ids — inspect the final
    // section only)
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = """Exchange hashpartitioning[^\n]*plan_id=(\d+)""".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSet
    assert(exchanges.size == 2,
      s"chain should shuffle each input once: ${exchanges.size} hash exchanges\n${finalPlan.take(3000)}")
    assert(finalPlan.contains("ReusedExchange"), "clicks exchange should be shared across directions")
  }

  test("tolerance filters exactly the matches older than the gap budget") {
    val base = operators.Joins.asOfNative.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getAs[java.time.LocalDateTime](2), r.getAs[java.time.LocalDateTime](3)))))
      .toMap
    val tol = operators.Joins.asOfNativeTol.run(spark, sf).collect()
      .map(r => r.getLong(0) -> !r.isNullAt(3)).toMap
    assert(tol.keySet == base.keySet)
    var dropped = 0
    for ((id, hasMatch) <- tol) {
      base(id) match {
        case None => assert(!hasMatch, s"event $id matched under tolerance but not without")
        case Some((lt, ct)) =>
          val gapUs = java.time.Duration.between(ct, lt).toNanos / 1000
          val within = gapUs <= 86400000000L
          assert(hasMatch == within, s"event $id gap ${gapUs}us, tolerated=$hasMatch")
          if (!within) dropped += 1
      }
    }
    assert(dropped > 0, "fixture exercises no out-of-tolerance matches")
  }

  test("result is invariant to input partitioning") {
    val ev = Tables
      .events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def run(p: Int): Seq[(Long, Long, Any, Any)] = {
      val purchases = ev.filter(col("event_type") === "purchase")
        .repartition(p)
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .repartition(p + 1)
        .select(col("user_id"), col("ts"))
      rows(
        AsOfJoinNative(purchases, clicks, "user_id", "ts", "ts", Seq("last_click_ts" -> "ts"))
          .orderBy(col("event_id"))
          .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
      )
    }
    assert(run(1) == run(7))
  }

  test("unmatched left rows carry nulls; matches never post-date the left time") {
    val out = operators.Joins.asOfNative.run(spark, sf).collect()
    val matched = out.filter(!_.isNullAt(3))
    assert(matched.nonEmpty, "fixture has no click-before-purchase pairs")
    for (r <- matched) {
      val lt = r.getAs[java.time.LocalDateTime](2)
      val ct = r.getAs[java.time.LocalDateTime](3)
      assert(!ct.isAfter(lt), s"match post-dates purchase: $r")
    }
    // users with no clicks at all must still appear, with null
    val users = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purch"))
      .filter(col("clicks") === 0 && col("purch") > 0)
      .collect().map(_.getLong(0)).toSet
    if (users.nonEmpty) {
      val byUser = out.filter(r => users.contains(r.getLong(1)))
      assert(byUser.nonEmpty && byUser.forall(_.isNullAt(3)))
    }
  }
}
