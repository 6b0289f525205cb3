package graft

import org.apache.spark.sql.functions._

/** IVF ANN structure + funnel monotonicity. */
class AdvancedSpec extends SparkSuite {

  test("IVF ANN returns dense ranks and nonzero recall@3 vs brute force") {
    val ivf = operators.Advanced.simAnnIvf.run(spark, sf).collect()
    assert(ivf.nonEmpty)
    for ((_, rows) <- ivf.groupBy(_.getLong(0))) {
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1L })
    }
    val brute = operators.Similarity.simCosineTopk.run(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall > 0.0, s"recall=$recall")
  }

  test("persisted IVF index: probe equals recompute and reads parquet, not the base table") {
    val recomputed = operators.Advanced.simAnnIvf.run(spark, sf).collect().toSeq
    val persisted = operators.Advanced.simAnnIvfPersisted.run(spark, sf)
    assert(persisted.collect().toSeq == recomputed,
      "index round-trip must not change the ANN result")
    // the probe plan's base side must be a parquet scan of the index
    // dir — NOT the centroid aggregate / assignment recompute
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_index"), s"expected index scan in plan:\n$plan")
    // build-once: a second invocation reuses the cached index path, so
    // its plan still reads the same persisted location
    val again = operators.Advanced.simAnnIvfPersisted.run(spark, sf)
    assert(again.queryExecution.executedPlan.toString.contains("graft_ivf_index"))
  }

  test("PQ codes: every stored code is the argmin codeword of its subvector") {
    val (cbPath, codesPath) = operators.Advanced.pqIndexPath(spark, sf)
    val cb = spark.read.parquet(cbPath).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val codes = spark.read.parquet(codesPath).collect()
      .map(r => r.getLong(0) -> (0 until 8).map(m => r.getInt(1 + m))).toMap
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(codes.keySet == embs.keySet, "one compact code row per vector")
    val labels = cb.keys.map(_._2).toSet.toSeq.sorted
    for ((vid, e) <- embs.toSeq.sortBy(_._1).take(50); m <- 0 until 8) {
      def dist(lab: Int): Double =
        (0 until 8).map { d =>
          val diff = e(m * 8 + d).toDouble - cb((m.toLong, lab, d.toLong))
          diff * diff
        }.sum
      val chosen = dist(codes(vid)(m))
      val best   = labels.map(dist).min
      // driver doubles vs the engine's decimal sums can differ in the
      // last ulps — assert near-argmin, not bit equality (the EXACT
      // argmin is pinned cross-engine by the DuckDB oracle replay)
      assert(chosen <= best + 1e-6, s"vec $vid subspace $m: chosen=$chosen best=$best")
    }
  }

  test("PQ encoding is partition-invariant (decimal-sum distances, total-order argmin)") {
    val (cbPath, _) = operators.Advanced.pqIndexPath(spark, sf)
    val cb = spark.read.parquet(cbPath)
    def codesOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Int])] =
      operators.Advanced.pqCodesOf(df, cb).collect()
        .map(r => r.getLong(0) -> (1 to 8).map(r.getInt))
        .sortBy(_._1).toSeq
    val e = Tables.embeddings(spark, sf)
    assert(codesOf(e.repartition(13)) == codesOf(e.repartition(1)),
      "PQ codes must not depend on the input partitioning")
  }

  test("PQ ANN: dense ranks, nonzero recall@3 vs brute force, plan scans the persisted index") {
    val pq = operators.Advanced.simAnnPq.run(spark, sf)
    val rows = pq.collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_.getLong(0))) {
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1L })
    }
    val brute = operators.Similarity.simCosineTopk.run(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall > 0.0, s"recall=$recall")
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_index"), s"expected PQ index scan in plan:\n$plan")
  }

  test("IVF-PQ ANN: dense ranks, candidates stay in probed lists, plan scans the persisted index") {
    val q = operators.Advanced.simAnnIvfPq.run(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_.getLong(0))) {
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1L })
      // nprobe = 2: the top-3 of a query can span at most 2 lists
      assert(rs.map(_.getInt(4)).distinct.length <= 2)
    }
    // every (neighbor, list) pair must be the neighbor's own inverted
    // list — the candidate came from the index, not a recompute
    val (_, codesPath) = operators.Advanced.ivfPqIndexPath(spark, sf)
    val listOf = spark.read.parquet(codesPath).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- rows) assert(listOf(r.getLong(2)) == r.getInt(4))
    // recall@3 vs brute force is nonzero (coarse pruning + residual
    // quantization is lossy, but not useless)
    val brute = operators.Similarity.simCosineTopk.run(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((brute & got).nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivfpq_index"), s"expected IVF-PQ index scan in plan:\n$plan")
    // the IVF prune must stay an EQUI-join keyed on list_id: a hash
    // join probes only the probed lists' code rows, where a
    // nested-loop over the codes table would re-scan every code row
    // per query — the regression that would erase the family's 100 TB
    // story. (The plan's BroadcastNestedLoopJoin Cross nodes are the
    // DOCUMENTED bounded quantizer broadcasts — 10 centroids, M x K
    // codewords — on the QUERY side, never the codes scan.)
    assert(plan.contains("BroadcastHashJoin [list_id"),
      s"IVF prune must be a hash equi-join on list_id:\n$plan")
  }

  test("IVF-PQ rerank: exact re-rank does not lose recall vs plain ADC, top-3 is a shortlist subset") {
    val rer = operators.Advanced.simAnnIvfPqRerank.run(spark, sf).collect()
    assert(rer.nonEmpty)
    for ((_, rs) <- rer.groupBy(_.getLong(0))) {
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1L })
    }
    val brute = operators.Similarity.simCosineTopk.run(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Set[(Long, Long)]) = (brute & rows).size.toDouble / brute.size
    val adc = operators.Advanced.simAnnIvfPq.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rr = rer.map(r => (r.getLong(0), r.getLong(2))).toSet
    // the exact stage can only improve the ORDER of the probed
    // shortlist: whenever a true neighbor is in the probed lists at
    // all, re-ranking surfaces it — so rerank recall must dominate
    assert(recallOf(rr) >= recallOf(adc),
      s"rerank recall ${recallOf(rr)} < ADC recall ${recallOf(adc)}")
    assert(recallOf(rr) > 0.0)
  }

  test("IVF-PQ nprobe report: cost and recall are monotone, tier 2 reconciles with the serving row") {
    val rep = operators.Advanced.simAnnIvfPqNprobeReport.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rep.map(_._1).toSeq == Seq(1L, 2L, 3L), "one row per tier")
    // tier nprobe is a subset of tier nprobe+1: candidates and hits
    // can only grow with probes
    assert(rep.sliding(2).forall { case Array(a, b) => a._2 < b._2 && a._3 <= b._3 })
    assert(rep.forall { case (_, _, h, r) => math.abs(r - h / 300.0) < 1e-6 },
      "recall must be hits / (3 x 100 probes)")
    // the nprobe=2 tier must reproduce the serving row's recall exactly
    // (same index, same algebra, independent spelling)
    val brute = operators.Similarity.simCosineTopk.run(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val serving = operators.Advanced.simAnnIvfPq.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rep(1)._3 == (brute & serving).size.toLong,
      "nprobe=2 hits must equal the serving row's brute-force intersection")
  }

  test("IVF-PQ encoding is partition-invariant") {
    val (cbPath, _) = operators.Advanced.ivfPqIndexPath(spark, sf)
    val cb   = spark.read.parquet(cbPath)
    val cent = spark.read.parquet(operators.Advanced.ivfIndexPath(spark, sf)._1)
    def codesOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Seq[Int])] =
      operators.Advanced.ivfPqCodesOf(operators.Advanced.residualsOf(df, cent), cb).collect()
        .map(r => (r.getLong(0), r.getInt(1), (2 to 9).map(r.getInt)))
        .sortBy(_._1).toSeq
    val e = Tables.embeddings(spark, sf)
    assert(codesOf(e.repartition(13)) == codesOf(e.repartition(1)),
      "IVF-PQ codes must not depend on the input partitioning")
  }

  test("family report reconciles with both per-family audits and its own arithmetic") {
    val rep = operators.Advanced.simAnnFamilyReport.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(rep.keySet == Set("lsh", "lsh_multi", "ivf", "pq", "ivfpq"))
    // multiprobe widens the candidate set (own bucket ⊆ own + 8 flips)
    // and its recall dominates single-probe on the same corpus
    assert(rep("lsh_multi")._1 >= rep("lsh")._1)
    assert(rep("lsh_multi")._3 >= rep("lsh")._3)
    // (1) the LSH row must reproduce sim_ann_recall_report's totals —
    // same index, same truth, independent spelling
    val lshHits = operators.Similarity.simAnnRecallReport.run(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(rep("lsh")._3 == lshHits,
      s"family-report lsh hits ${rep("lsh")._3} != recall-report total $lshHits")
    // (2) the IVF-PQ row must reproduce the nprobe report's nprobe=2
    // candidate count (one coarse quantizer, one candidate set)
    val np2 = operators.Advanced.simAnnIvfPqNprobeReport.run(spark, sf).collect()
      .find(_.getLong(0) == 2L).get
    assert(rep("ivfpq")._1 == np2.getLong(1),
      "family-report ivfpq candidates != nprobe-report nprobe=2 candidates")
    // (3) IVF and IVF-PQ share the candidate set by construction; PQ
    // scans the whole corpus minus self
    assert(rep("ivf")._1 == rep("ivfpq")._1)
    val nBase = Tables.embeddings(spark, sf).count()
    assert(rep("pq")._1 == 100L * (nBase - 1))
    // (4) internal arithmetic: recall = hits / 300, mean = cand / 100
    for ((f, (cand, mean, hits, rec)) <- rep) {
      assert(math.abs(rec - hits / 300.0) < 1e-6, s"$f recall arithmetic")
      assert(math.abs(mean - cand / 100.0) < 1e-6, s"$f mean_cand arithmetic")
    }
    // (5) the exact-rerank families dominate their own first stage:
    // ivfpq (ADC within probed lists + exact rerank) cannot beat the
    // IVF exact scan of the SAME candidates
    assert(rep("ivfpq")._3 <= rep("ivf")._3,
      "compressed scoring of one candidate set cannot out-recall exact scoring of it")
  }

  test("funnel timestamps are monotone: view <= click <= purchase") {
    val f = operators.Advanced.funnelVcp.run(spark, sf).collect()
    assert(f.nonEmpty)
    for (r <- f) {
      val vt = r.getAs[java.time.LocalDateTime]("vt")
      val ct = Option(r.getAs[java.time.LocalDateTime]("ct"))
      val pt = Option(r.getAs[java.time.LocalDateTime]("pt"))
      for (c <- ct) assert(!c.isBefore(vt))
      for (c <- ct; p <- pt) assert(!p.isBefore(c))
      if (ct.isEmpty) assert(pt.isEmpty, "purchase without click stage")
    }
  }

  test("diverse IVF sample equals the naive per-cell window spelling") {
    import org.apache.spark.sql.expressions.Window
    val got = operators.Advanced.sampleDiverseIvf.run(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue, r.getAs[Number](4).longValue))
    assert(got.nonEmpty)
    // structure: ranks are 1..k dense per cell, at most 3 picks per cell
    got.groupBy(_._1).foreach { case (cell, rows) =>
      assert(rows.length <= 3, s"cell $cell has ${rows.length} picks")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"cell $cell ranks not dense: ${rows.map(_._2).sorted.toSeq}")
    }
    // equality against the standard window formulation over the same
    // persisted assignments (the row itself uses the bounded-heap
    // TopKPerGroup operator — both must pick identical rows)
    val (_, asgPath) = operators.Advanced.ivfIndexPath(spark, sf)
    val asg = spark.read.parquet(asgPath).select(col("vec_id"), col("list_id"))
    val lab = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
    val hk = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy(col("list_id")).orderBy(hk, col("vec_id"))
    val naive = asg.join(lab, Seq("vec_id"))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= 3)
      .select("list_id", "pick_rank", "vec_id").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue)).toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet == naive)
    // n_cell matches the true cell populations
    val sizes = asg.groupBy(col("list_id")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    got.foreach { case (cell, _, _, _, n) => assert(sizes(cell) == n) }
  }

}
