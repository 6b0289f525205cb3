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
}
