package graft

/** Deterministic k-means: Lloyd's invariant (WCSS never increases) and
  * run-to-run reproducibility of the full cluster profile.
  */
class MlSpec extends SparkSuite {

  test("WCSS is monotone non-increasing across Lloyd's iterations") {
    val (_, wcss) = operators.Ml.lloyd(spark, sf, trackWcss = true)
    assert(wcss.nonEmpty)
    for (Seq(a, b) <- wcss.sliding(2).toSeq if wcss.size > 1) {
      assert(b <= a + 1e-9, s"WCSS increased: $wcss")
    }
  }

  test("cluster profile is identical across runs") {
    def profile() = operators.Ml.mlKmeans.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(profile() == profile())
  }

  test("naive bayes scores every held-out doc once, deterministically") {
    def preds() = operators.Ml.mlNaiveBayes.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3), r.getDouble(4)))
      .toSeq
    val p = preds()
    assert(p.nonEmpty)
    assert(p.map(_._1).distinct.size == p.size, "one prediction per doc")
    // log-probabilities of multi-token docs are strictly negative
    assert(p.forall(_._5 < 0.0))
    // correct flag is consistent with the labels
    assert(p.forall(r => r._4 == (r._2 == r._3)))
    assert(preds() == p, "prediction must be run-to-run identical")
  }

  test("AUC matches a driver-side tie-aware rank recomputation") {
    import org.apache.spark.sql.functions._
    val pairs = Tables.orders(spark, sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_totalprice").cast("double"), col("o_orderpriority"))
      .collect().map(r => (r.getDouble(0), r.getString(1) == "1-URGENT"))
    val pos = pairs.filter(_._2).map(_._1).sorted
    val neg = pairs.filterNot(_._2).map(_._1).sorted
    // O(n·m) exact pair count on the driver — fine at test scale
    var wins = 0.0
    for (p <- pos; n <- neg) wins += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expected = wins / (pos.length.toLong * neg.length)
    val row = operators.Ml.mlAuc.run(spark, sf).collect().head
    assert(row.getLong(0) == pos.length.toLong && row.getLong(1) == neg.length.toLong)
    assert(math.abs(row.getDouble(2) - expected) < 1e-5, s"auc ${row.getDouble(2)} vs $expected")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("calibration bins partition all orders and bound their scores") {
    import org.apache.spark.sql.functions._
    val rows  = operators.Ml.mlCalibration.run(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "bins must partition the table")
    val base = Tables.orders(spark, sf)
      .agg(avg(when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)
    for (r <- rows) {
      val (bin, ms, pr, gap) = (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(bin >= 0 && bin <= 9)
      // mean score must lie inside the bin's score range (bin 9 includes 1.0)
      assert(ms >= bin / 10.0 - 1e-6 && ms <= (bin + 1) / 10.0 + 1e-6, s"bin $bin mean $ms")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(math.abs(gap - (ms - pr)) < 2e-6, s"bin $bin gap")
    }
    // pos rates are bin-local estimates of the same base rate; their
    // count-weighted mean is the base rate exactly
    val wmean = rows.map(r => r.getLong(1) * r.getDouble(3)).sum / total
    assert(math.abs(wmean - base) < 1e-4, s"weighted pos rate $wmean vs base $base")
  }

  test("PR curve: recall falls with threshold, F1 is the harmonic mean, floor row is total") {
    import org.apache.spark.sql.functions._
    val rows = operators.Ml.mlPrCurve.run(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 10)
    val total = Tables.orders(spark, sf).count()
    val tpos = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    // threshold 0 predicts everything positive: recall 1, precision = base rate
    val floorRow = rows.head
    assert(floorRow._1 == 0.0 && floorRow._2 == total && floorRow._3 == tpos)
    assert(math.abs(floorRow._5 - 1.0) < 1e-6)
    assert(math.abs(floorRow._4 - tpos.toDouble / total) < 1e-5)
    // monotonicity in the threshold sweep: pred_pos and tp only shrink
    for (Array(a, b) <- rows.sliding(2)) {
      assert(a._2 >= b._2 && a._3 >= b._3, s"cumulatives must shrink: $a -> $b")
      assert(a._5 >= b._5 - 1e-9, "recall is non-increasing")
    }
    for (r <- rows if r._3 > 0) {
      val (p, rec) = (r._3.toDouble / r._2, r._3.toDouble / tpos)
      assert(math.abs(r._4 - p) < 1e-5 && math.abs(r._5 - rec) < 1e-5)
      assert(math.abs(r._6 - 2 * p * rec / (p + rec)) < 1e-5, "f1 harmonic identity")
    }
  }

  test("lift/gains: deciles partition the table, cumulatives close at gain=lift=1") {
    import org.apache.spark.sql.functions._
    val rows = operators.Ml.mlLiftGains.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == 10 && rows.map(_._1).toSeq == (1L to 10L))
    val total = Tables.orders(spark, sf).count()
    val tpos = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT").count()
    assert(rows.map(_._2).sum == total && rows.map(_._3).sum == tpos)
    val last = rows.last
    assert(last._4 == total && last._5 == tpos)
    assert(math.abs(last._6 - 1.0) < 1e-6 && math.abs(last._7 - 1.0) < 1e-6)
    for (r <- rows) {
      // gain and lift identities from the exact cumulative counts
      assert(math.abs(r._6 - r._5.toDouble / tpos) < 1e-5)
      assert(math.abs(r._7 - (r._5.toDouble / r._4) / (tpos.toDouble / total)) < 1e-5)
    }
    for (Array(a, b) <- rows.sliding(2)) assert(a._4 < b._4 && a._5 <= b._5, "cumulatives grow")
  }

  test("PSI: bins cover both periods exactly, terms are non-negative, shares close to 1") {
    import org.apache.spark.sql.functions._
    val rows = operators.Ml.mlPsi.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 10 && rows.map(_._1).toSeq == (0L to 9L))
    val refTotal = Tables.orders(spark, sf).filter(year(col("o_orderdate")) <= 1997).count()
    val curTotal = Tables.orders(spark, sf).filter(year(col("o_orderdate")) > 1997).count()
    assert(rows.map(_._2).sum == refTotal && rows.map(_._3).sum == curTotal)
    // smoothed shares sum to exactly 1 by construction: Σ(n+1) = total+10
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4 && math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // (cs-rs)·ln(cs/rs) has matching signs — every term is ≥ 0
    assert(rows.forall(_._6 >= -1e-9), "psi terms are non-negative")
    // identity recompute from the exact counts
    for (r <- rows) {
      val rs = (r._2 + 1).toDouble / (refTotal + 10)
      val cs = (r._3 + 1).toDouble / (curTotal + 10)
      assert(math.abs(r._6 - (cs - rs) * math.log(cs / rs)) < 1e-5)
    }
  }

  test("welch t-test matches a driver-side recomputation") {
    import org.apache.spark.sql.functions._
    def vals(t: String): Array[Double] = Tables.events(spark, sf)
      .filter(col("event_type") === t).select(col("value")).collect().map(_.getDouble(0))
    val (a, b) = (vals("click"), vals("purchase"))
    def stats(x: Array[Double]) = {
      val n = x.length.toDouble
      val m = x.sum / n
      val v = x.map(e => (e - m) * (e - m)).sum / (n - 1)
      (n, m, v / n)
    }
    val ((na, ma, qa), (nb, mb, qb)) = (stats(a), stats(b))
    val r = operators.Ml.mlTtestWelch.run(spark, sf).collect().head
    assert(r.getLong(0) == na.toLong && r.getLong(1) == nb.toLong)
    assert(math.abs(r.getDouble(2) - ma) < 1e-3 && math.abs(r.getDouble(3) - mb) < 1e-3)
    assert(math.abs(r.getDouble(4) - (ma - mb)) < 1e-3, "diff")
    val se = math.sqrt(qa + qb)
    assert(math.abs(r.getDouble(5) - se) < 1e-4, "se")
    assert(math.abs(r.getDouble(6) - (ma - mb) / se) < 1e-2, "t")
    val dof = (qa + qb) * (qa + qb) / (qa * qa / (na - 1) + qb * qb / (nb - 1))
    assert(math.abs(r.getDouble(7) - dof) < 0.5, "dof")
    assert(dof >= math.min(na, nb) - 1 - 1e-6 && dof <= na + nb - 2 + 1e-6)
  }

  test("mutual info matches a driver-side recomputation and respects 0 <= MI <= min(H)") {
    import org.apache.spark.sql.functions._
    val cells = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum.toDouble
    val rl = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cs = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val mi = cells.map { case (l, s, o) =>
      (o / n) * math.log(o * n / (rl(l).toDouble * cs(s)))
    }.sum
    def h(m: Iterable[Long]): Double =
      m.map { c => val p = c.toDouble / n; -p * math.log(p) }.sum
    val r = operators.Ml.mlMutualInfo.run(spark, sf).collect().head
    val (gMi, gHl, gHs, gNmi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(gMi - mi) < 1e-5, s"mi $gMi vs $mi")
    assert(math.abs(gHl - h(rl.values)) < 1e-5)
    assert(math.abs(gHs - h(cs.values)) < 1e-5)
    assert(gMi >= -1e-6 && gMi <= math.min(gHl, gHs) + 1e-6, "0 <= MI <= min(H)")
    assert(math.abs(gNmi - gMi / math.min(gHl, gHs)) < 1e-4)
  }

  test("chi2: full contingency grid, margins reproduce, contributions match identity") {
    import org.apache.spark.sql.functions._
    val rows = operators.Ml.mlChi2.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val o = Tables.orders(spark, sf)
    val nPri = o.select("o_orderpriority").distinct().count()
    val nSt = o.select("o_orderstatus").distinct().count()
    assert(rows.length == nPri * nSt, "full R x C grid emitted")
    val total = o.count()
    assert(rows.map(_._3).sum == total)
    // expected counts reproduce the row margins: Σ_s exp(p,s) = rowTotal(p)
    val rowTotals = o.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((p, cells) <- rows.groupBy(_._1))
      assert(math.abs(cells.map(_._4).sum - rowTotals(p)) < 1e-3, s"margin of $p")
    for (r <- rows if r._4 > 0) {
      val d = r._3.toDouble - r._4
      assert(math.abs(r._5 - d * d / r._4) < 1e-4, "chi2 cell identity")
    }
    assert(rows.map(_._5).sum >= 0.0)
  }
}
