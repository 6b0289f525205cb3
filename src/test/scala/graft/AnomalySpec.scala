package graft

import org.apache.spark.sql.functions._

/** ts_anomaly_mad invariants: the flagged set matches a driver-side
  * recomputation of the median/MAD screen, and the robust threshold
  * actually behaves robustly (anomaly rate is a small minority).
  */
class AnomalySpec extends SparkSuite {

  /** Linear-interpolated percentile, the formula both engines use:
    * pos = p·(n−1) over the sorted values, lower + (upper−lower)·frac. */
  private def quantile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 >= s.length) s(lo) else s(lo) + (s(lo + 1) - s(lo)) * frac
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("flagged events match a driver-side median/MAD recomputation") {
    val events = Tables
      .events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = events.groupBy(_._2)
    val med = byType.map { case (t, rs) => t -> quantile(rs.map(_._3).toSeq, 0.5) }
    val mad = byType.map { case (t, rs) =>
      t -> quantile(rs.map(r => math.abs(r._3 - med(t))).toSeq, 0.5)
    }
    val expected = events.collect {
      case (id, t, v) if r6(math.abs(v - med(t))) > r6(3.0 * mad(t)) => id
    }.toSet
    val got = operators.TimeSeries.tsAnomalyMad.run(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected, s"symmetric diff: ${(got diff expected) ++ (expected diff got)}")
    assert(got.nonEmpty, "fixture produced no anomalies")
    // robustness: the 3-MAD screen flags a minority, never the bulk
    assert(got.size.toDouble / events.length < 0.25, s"${got.size}/${events.length} flagged")
  }
}
