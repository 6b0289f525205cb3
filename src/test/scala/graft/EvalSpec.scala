package graft

/** Mathematical invariants of the round-5 evaluation/statistics family
  * — properties the DuckDB hash compare cannot express (it proves
  * equality, not correctness of the math itself).
  */
class EvalSpec extends SparkSuite {

  test("markov transition rows are distributions: row_frac sums to 1 per state") {
    val rows = Registry.byName("events_markov_transition").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCur = rows.groupBy(_.getString(0))
    for ((cur, rs) <- byCur) {
      val s = rs.map(_.getDouble(3)).sum
      // row_frac is 6-dp trunc-rounded per cell; |cells| ≤ 5
      assert(math.abs(s - 1.0) < 5e-6, s"state $cur sums to $s")
      // counts are positive and fractions consistent with counts
      val tot = rs.map(_.getLong(2)).sum
      for (r <- rs)
        assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / tot) < 2e-6)
    }
  }

  test("cross-correlation r stays in [-1, 1] and lag 0 has the most pairs") {
    val rows = Registry.byName("ts_cross_correlation").run(spark, sf).collect()
    assert(rows.length == 7)
    for (r <- rows if !r.isNullAt(2)) {
      val v = r.getDouble(2)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"lag ${r.getLong(0)}: r=$v")
    }
    // the unshifted alignment can never have fewer pairs than a shift
    val n0 = rows.find(_.getLong(0) == 0L).get.getLong(1)
    for (r <- rows) assert(r.getLong(1) <= n0)
  }

  test("ANN recall report is bounded and consistent with the two rankings") {
    val rows = Registry.byName("sim_ann_recall_report").run(spark, sf).collect()
    assert(rows.length == 100) // one row per probe, zero-recall probes included
    for (r <- rows) {
      val hits = r.getLong(1)
      assert(hits >= 0 && hits <= 3)
      assert(math.abs(r.getDouble(2) - hits / 3.0) < 2e-6)
    }
    // the LSH bucket always contains the query's own near-identical
    // bucket-mates; on this corpus SOME probe must score a hit
    assert(rows.map(_.getLong(1)).sum > 0, "zero total recall is a broken join")
  }

  test("confusion matrix cells reconcile with the classifier's flat output") {
    val nb = Registry.byName("ml_naive_bayes").run(spark, sf).collect()
    val expected = nb
      .groupBy(r => (r.getString(1), r.getString(2)))
      .map { case (k, v) => k -> v.length.toLong }
    val cells = Registry.byName("ml_confusion_matrix").run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(cells == expected)
    // diagonal mass equals the classifier's correct count
    val correct = nb.count(_.getBoolean(3)).toLong
    val diag = cells.collect { case ((a, p), n) if a == p => n }.sum
    assert(diag == correct)
  }

  test("simhash pair screen: every emitted pair is within Hamming 3 of the signatures") {
    val sig = Registry.byName("dedup_simhash").run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Registry.byName("dedup_simhash_pairs").run(spark, sf).collect()
    assert(pairs.nonEmpty)
    for (r <- pairs) {
      val h = java.lang.Long.bitCount(sig(r.getLong(0)) ^ sig(r.getLong(1)))
      assert(h.toLong == r.getLong(2) && h <= 3, s"pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }
}
