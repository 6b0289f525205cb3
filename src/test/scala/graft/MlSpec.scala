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
}
