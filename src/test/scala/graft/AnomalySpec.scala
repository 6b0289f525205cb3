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

  test("DAU/WAU match a driver-side set recomputation, WAU bounds DAU") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byDay = ud.groupBy(_._2).map { case (d, v) => d -> v.map(_._1).toSet }
    val got = operators.TimeSeries.eventsDauWau.run(spark, sf).collect()
    assert(got.length == byDay.size)
    for (r <- got) {
      val day = r.getDate(0).toLocalDate
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val expWau = (0 to 6).flatMap(o => byDay.getOrElse(day.minusDays(o), Set.empty)).toSet.size
      assert(dau == byDay(day).size, s"$day dau")
      assert(wau == expWau, s"$day wau $wau vs $expWau")
      assert(wau >= dau && st > 0.0 && st <= 1.0)
    }
  }

  test("forecast backtest matches a driver-side recomputation per type") {
    val hours = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .count().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = operators.TimeSeries.tsBacktestNaive.run(spark, sf).collect()
    for (r <- got) {
      val (tpe, nEvals) = (r.getString(0), r.getLong(1))
      val series = hours.filter(_._1 == tpe).sortBy(_._2).map(_._3)
      val evals = (24 until series.length)
      assert(nEvals == evals.size, s"$tpe n_evals")
      def mae(pred: Int => Double): Double =
        evals.map(i => math.abs(series(i) - pred(i))).sum / evals.size
      assert(math.abs(r.getDouble(2) - mae(i => series(i - 1).toDouble)) < 1e-3, s"$tpe naive")
      assert(math.abs(r.getDouble(3) - mae(i => series(i - 24).toDouble)) < 1e-3, s"$tpe snaive")
      assert(
        math.abs(r.getDouble(4) - mae(i => (i - 6 until i).map(series).sum / 6.0)) < 1e-3,
        s"$tpe ma6"
      )
    }
  }

  test("periodogram matches a driver-side DFT and shares sum to 1") {
    val hours = Tables.events(spark, sf)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600).cast("long").as("eh"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h0 = hours.keys.min
    val nn = hours.keys.max - h0 + 1
    val mu = hours.values.sum.toDouble / nn
    val exp = (1 to 12).map { k =>
      val (a, b) = hours.foldLeft((0.0, 0.0)) { case ((ca, cb), (eh, x)) =>
        val ang = 2.0 * math.Pi * k * (eh - h0) / nn
        (ca + (x - mu) * math.cos(ang), cb + (x - mu) * math.sin(ang))
      }
      k.toLong -> (a * a + b * b)
    }.toMap
    val got = operators.TimeSeries.tsPeriodogram.run(spark, sf).collect()
    assert(got.length == 12)
    for (r <- got) {
      val (k, per, pw) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(per - nn.toDouble / k) < 1e-3)
      assert(pw >= 0.0)
      assert(math.abs(pw - exp(k)) < 1e-3, s"k=$k power $pw vs ${exp(k)}")
    }
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-4, "shares sum to 1")
  }

  test("logreg GD matches a driver-side unrolled recomputation and descends") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority")).collect()
      .map { r =>
        val y = if (r.getString(0) == "F") 1.0 else 0.0
        (y, Array(1.0, r.getDouble(1) / 500000.0, r.getString(2).substring(0, 1).toInt / 5.0))
      }
    val n = rows.length.toDouble
    var w = Array(0.0, 0.0, 0.0)
    def p(x: Array[Double]): Double =
      1.0 / (1.0 + math.exp(-(w(0) * x(0) + w(1) * x(1) + w(2) * x(2))))
    for (_ <- 1 to 3) {
      val g = Array(0, 1, 2).map(j => rows.map { case (y, x) => (p(x) - y) * x(j) }.sum / n)
      w = Array.tabulate(3)(j => w(j) - 2.0 * g(j))
    }
    val loss = rows.map { case (y, x) =>
      -(y * math.log(p(x)) + (1 - y) * math.log(1 - p(x)))
    }.sum / n
    val r = operators.Ml.mlLogregGd.run(spark, sf).collect().head
    for (j <- 0 to 2)
      assert(math.abs(r.getDouble(j) - w(j)) < 1e-5, s"w$j ${r.getDouble(j)} vs ${w(j)}")
    assert(math.abs(r.getDouble(4) - loss) < 1e-5, "log loss")
    // three steps from w=0 must descend below the w=0 loss = ln 2
    assert(r.getDouble(4) < math.log(2.0), "GD descended")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

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

  test("holt level/trend/forecast match a driver-side sequential fold") {
    val events = Tables
      .events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map { r =>
        // events.ts is TIMESTAMP_NTZ → LocalDateTime; µs precision survives (SURVEY §1.3)
        val t = r.getAs[java.time.LocalDateTime](1)
        val key = (t.toEpochSecond(java.time.ZoneOffset.UTC), t.getNano)
        (r.getLong(0), (key, r.getLong(2), r.getDouble(3)))
      }
    val expected = events.groupBy(_._1).map { case (u, rs) =>
      val vs = rs.map(_._2).sortBy { case (t, id, _) => (t, id) }.map(_._3)
      var l = vs.head
      var b = 0.0
      for (x <- vs.tail) {
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l2 - l) + 0.7 * b
        l = l2
      }
      u -> (vs.length.toLong, l, b)
    }
    val got = operators.TimeSeries.tsHolt.run(spark, sf).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (u, n, lvl, tr, fc) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (en, el, eb) = expected(u)
      assert(n == en, s"user $u count")
      assert(math.abs(lvl - el) < 1e-5, s"user $u level $lvl vs $el")
      assert(math.abs(tr - eb) < 1e-5, s"user $u trend $tr vs $eb")
      assert(math.abs(fc - (el + eb)) < 1e-5, s"user $u forecast")
    }
  }

  test("stl decomposition matches a driver-side MA + hour-of-day recompute") {
    val rows = operators.TimeSeries.tsStlDecompose.run(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side recompute from the raw hourly series
    val hourly = Tables.events(spark, sf)
      .groupBy(Det.ntzTruncHour(col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .map(r => (r.getString(1), r.getAs[java.time.LocalDateTime](0), r.getLong(2)))
    val byType = hourly.groupBy(_._1).view
      .mapValues(_.sortBy(_._2)(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))).toMap
    val trendMap = byType.flatMap { case (t, series) =>
      series.indices.collect {
        case i if i >= 12 && i + 12 < series.length =>
          val win = (i - 12 to i + 12).map(j => series(j)._3).sum
          (t, series(i)._2) -> win.toDouble / 25
      }
    }
    val det = trendMap.map { case ((t, h), tr) =>
      (t, h) -> (byType(t).find(_._2 == h).get._3.toDouble - tr)
    }
    val seasonal = det.groupBy { case ((t, h), _) =>
      (t, h.getHour)
    }.view.mapValues(vs => vs.values.sum / vs.size).toMap
    var checked = 0
    for (r <- rows if !r.isNullAt(3)) {
      val key = (r.getString(0), r.getAs[java.time.LocalDateTime](1))
      val (tr, se, re) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(tr - trendMap(key)) < 1e-5, s"$key trend")
      val es = seasonal((key._1, key._2.getHour))
      assert(math.abs(se - es) < 1e-4, s"$key seasonal $se vs $es")
      assert(math.abs(re - (det(key) - es)) < 1e-4, s"$key residual")
      checked += 1
    }
    assert(checked > 0, "at least one full window must exist")
    // partial windows are NULL, never a biased estimate
    for (r <- rows if r.isNullAt(3)) { assert(r.isNullAt(4) && r.isNullAt(5)) }
    // per (type, hour-of-day): seasonal components sum to ~zero over
    // the detrended rows by construction of the mean
    val resid = rows.filter(!_.isNullAt(5)).map(_.getDouble(5))
    assert(math.abs(resid.sum / resid.length) < 1e-2, "residual mean ~ 0")
  }
}
