package graft

import org.apache.spark.sql.functions._

/** Similarity-search invariants: cosine bounds on normalized vectors,
  * brute-force top-k as ground truth for the LSH variant's recall, and
  * deterministic knn voting.
  */
class SimilaritySpec extends SparkSuite {

  test("cosines on L2-normalized vectors stay in [-1, 1]") {
    val topk = operators.Similarity.simCosineTopk.run(spark, sf)
    val bad = topk.filter(col("cos") > 1.000001 || col("cos") < -1.000001)
    assert(bad.count() == 0)
  }

  test("top-k ranks are dense 1..k per query") {
    val topk = operators.Similarity.simCosineTopk.run(spark, sf)
    val perQuery = topk.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"), max(col("rank")).as("hi"))
      .filter(col("n") =!= 10 || col("lo") =!= 1 || col("hi") =!= 10)
    assert(perQuery.count() == 0)
  }

  test("ANN-LSH returns a subset of plausible neighbors with bucket agreement") {
    val ann = operators.Similarity.simAnnLsh.run(spark, sf).collect()
    assert(ann.nonEmpty)
    // every returned neighbor must share the probe's bucket by construction;
    // ranks dense from 1 per query
    val byQuery = ann.groupBy(_.getLong(0))
    for ((_, rows) <- byQuery) {
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1L })
    }
  }

  test("multi-probe recall@3 dominates single-probe LSH") {
    def recall(q: graft.Q): Double = {
      val brute = operators.Similarity.simCosineTopk.run(spark, sf)
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ann = q.run(spark, sf)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & ann).size.toDouble / brute.size
    }
    val single = recall(operators.Similarity.simAnnLsh)
    val multi = recall(operators.Similarity.simAnnMultiprobe)
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0.0)
  }

  test("ANN-LSH recall@3 vs brute force is nonzero (buckets collapse candidates)") {
    val brute = operators.Similarity.simCosineTopk.run(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = operators.Similarity.simAnnLsh.run(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // near-random vectors + 8-bit buckets: recall is low by design, but
    // the structure must still find SOME true neighbors
    assert(recall > 0.0, s"recall=$recall")
  }

  test("int8-quantized top-10 recalls most of the float-exact top-10") {
    val exact = operators.Similarity.simCosineTopk.run(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = operators.Similarity.simQuantizedTopk.run(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.5, s"int8 recall@10 too low: $recall")
  }

  test("knn prediction is a label that actually appears among the 5-NN") {
    val knn = operators.Similarity.simKnnClassify.run(spark, sf).collect()
    assert(knn.length == 50)
    for (r <- knn) assert(r.getLong(2) >= 1 && r.getLong(2) <= 5)
  }

  test("coarse-prefix rerank beats the random-candidate recall baseline") {
    import org.apache.spark.sql.functions.col
    val exact = operators.Similarity.simCosineTopk.run(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cascade = operators.Similarity.simCoarseRerank.run(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & cascade).size.toDouble / exact.size
    // candidates are 50 of ~200 base vectors → random cut recalls ~0.25;
    // the 16-dim prefix is deterministic, measured 0.468 on this fixture
    assert(recall >= 0.4, s"prefix-cascade recall@10 too low: $recall")
  }

  test("bm25 top-k matches a driver-side recomputation of the full ranking") {
    import org.apache.spark.sql.functions.col
    val query = Seq("spark", "join", "fast", "window")
    val docs = Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = query.map(t => t -> docs.count(_._2.contains(t))).toMap
    val scores = docs.map { case (id, toks) =>
      val score = query.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0.0
        else
          math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
            (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.length / avgdl))
      }.sum
      (id, score)
    }
    val expectedScore = scores.toMap
    val expected = scores.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(20)
    val got = operators.TextAnalysis.textBm25Topk.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == math.min(20, expected.length))
    // returned list is score-descending and each score matches the recompute
    for (Seq((_, s1), (_, s2)) <- got.toSeq.sliding(2)) assert(s1 >= s2 - 1e-9)
    for ((gid, gs) <- got) {
      val es = expectedScore.getOrElse(gid, 0.0)
      assert(math.abs(es - gs) < 1e-4, s"doc $gid score $es vs $gs")
    }
    // the sets agree except possibly at 6-dp rounding ties on the cut line
    val overlap = (expected.map(_._1).toSet & got.map(_._1).toSet).size
    assert(overlap >= got.length - 2, s"top-20 overlap only $overlap")
  }

  test("MMR rerank: rank-1 is the cosine top-1, picks diversify the top-4") {
    val mmr = operators.Similarity.simMmrRerank.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = operators.Similarity.simCosineTopk.run(spark, sf).collect()
      .filter(_.getLong(0) < 20)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val top1 = brute.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    val top8 = brute.filter(_._2 <= 8).groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for { a <- ids; b <- ids if a < b } yield {
        val (ea, eb) = (emb(a), emb(b))
        ea.indices.map(i => ea(i).toDouble * eb(i).toDouble).sum
      }
      ps.sum / ps.length
    }
    val byQuery = mmr.groupBy(_._1)
    assert(byQuery.size == 20)
    var diversified = 0
    for ((q, rows) <- byQuery) {
      val picks = rows.sortBy(_._2).map(_._3)
      assert(picks.length == 4 && picks.distinct.length == 4)
      assert(picks.head == top1(q), s"query $q rank-1 disagrees with brute top-1")
      assert(picks.forall(top8(q).contains), s"query $q picked outside the top-8")
      val plain = brute.filter(t => t._1 == q && t._2 <= 4).sortBy(_._2).map(_._3)
      if (meanPairSim(picks) <= meanPairSim(plain) + 1e-9) diversified += 1
    }
    // the λ-penalty must reduce (or tie) mean pairwise similarity vs the
    // plain top-4 on essentially every query; allow one adversarial tie
    assert(diversified >= 19, s"only $diversified/20 queries diversified")
  }

  test("hard negatives: labels correct, both picks are true per-side maxima, margin reconciles") {
    val rows = operators.Similarity.simHardNegatives.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == 100, "one row per probe query")
    val labelOf = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    for ((q, ql, pos, posCos, neg, negCos, margin) <- rows) {
      assert(labelOf(q) == ql)
      assert(labelOf(pos) == ql, s"query $q: positive must share the label")
      assert(labelOf(neg) != ql, s"query $q: hard negative must differ in label")
      assert(math.abs(margin - (posCos - negCos)) < 1e-6)
    }
    // spot-check 5 queries against the already-verified brute ranking:
    // the positive is the best same-label neighbor and the negative the
    // best different-label one, so each must dominate its side of the
    // brute top-10 whenever that side appears there
    val brute = operators.Similarity.simCosineTopk.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for ((q, ql, pos, posCos, neg, negCos, _) <- rows.take(5)) {
      val ranked = brute(q).sortBy(t => (-t._3, t._2))
      ranked.find(t => labelOf(t._2) == ql).foreach { best =>
        assert((best._2, best._3) == (pos, posCos), s"query $q: positive disagrees with brute")
      }
      ranked.find(t => labelOf(t._2) != ql).foreach { best =>
        assert((best._2, best._3) == (neg, negCos), s"query $q: negative disagrees with brute")
      }
    }
  }

  test("persisted-signature LSH ANN is bit-equal and scans the signature table") {
    val fresh = operators.Similarity.simAnnLsh.run(spark, sf).collect().toSeq
    val served = operators.Similarity.simAnnLshPersisted.run(spark, sf)
    assert(served.collect().toSeq == fresh, "persistence must be result-invisible")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("graft_lsh_sigs"), s"expected signature-table scan in plan:\n${plan.take(2000)}")
  }
}
