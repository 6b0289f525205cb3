package graft

import org.apache.spark.sql.functions._

/** text_perplexity invariants: the held-out cross-entropy matches a
  * driver-side recomputation of the add-1-smoothed bigram model, and
  * the smoothing keeps every score inside the uniform-model bound.
  */
class TextEvalSpec extends SparkSuite {

  test("held-out cross-entropy matches a driver-side model recomputation") {
    val docs = Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    def isTest(id: Long): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      val hex = md5.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 10 == 0
    }
    val (test, train) = docs.partition { case (id, _) => isTest(id) }
    val trainBigrams = train.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
    val c2 = trainBigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = trainBigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = train.flatMap(_._2).distinct.size
    val expected = test.map { case (id, ts) =>
      val lps = ts.zip(ts.drop(1)).map { bg =>
        math.log((c2.getOrElse(bg, 0) + 1).toDouble / (c1.getOrElse(bg._1, 0) + v))
      }
      id -> (lps.length.toLong, -lps.sum / lps.length)
    }.toMap
    val got = operators.TextAnalysis.textPerplexity.run(spark, sf).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (id, n, ce) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val (en, ece) = expected(id)
      assert(n == en, s"doc $id bigram count")
      assert(math.abs(ce - ece) < 1e-5, s"doc $id ce $ce vs $ece")
      // worst bigram score is an unseen continuation of the most
      // frequent history: ln((max c1 + V) / 1)
      val worst = math.log((c1.values.max + v).toDouble)
      assert(ce > 0 && ce <= worst, s"doc $id ce $ce out of bounds (worst $worst)")
    }
  }

  test("zipf fit matches a driver-side least-squares recomputation") {
    val freqs = Tables
      .documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // same total order as the query: freq desc, token asc
    val ranked = freqs.sortBy { case (tok, n) => (-n, tok) }.zipWithIndex
    val pts = ranked.map { case ((_, n), i) => (math.log((i + 1).toDouble), math.log(n.toDouble)) }
    val k   = pts.length.toDouble
    val (sx, sy)   = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
    val syy        = pts.map(p => p._2 * p._2).sum
    val slope      = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val intercept  = (sy - slope * sx) / k
    val r2         = math.pow(k * sxy - sx * sy, 2) / ((k * sxx - sx * sx) * (k * syy - sy * sy))
    val row = operators.TextAnalysis.textZipfFit.run(spark, sf).collect().head
    assert(row.getLong(0) == freqs.length.toLong, "vocab size")
    assert(math.abs(row.getDouble(1) - slope) < 1e-5, s"slope ${row.getDouble(1)} vs $slope")
    assert(math.abs(row.getDouble(2) - intercept) < 1e-5, "intercept")
    assert(math.abs(row.getDouble(3) - r2) < 1e-5, "r2")
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1.0)
  }
}
