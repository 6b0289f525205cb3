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

  test("ngram novelty: per-source novel counts sum to the distinct-shingle total") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    val shingled = docs.filter(_._3.length >= 5)
    val perDoc = shingled.map { case (id, src, ts) =>
      (id, src, ts.sliding(5).map(_.mkString(" ")).toSet)
    }
    val firstOwner = perDoc
      .flatMap { case (id, _, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).min }
    val expBySource = perDoc.groupBy(_._2).map { case (src, ds) =>
      val nSh = ds.map(_._3.size.toLong).sum
      val nNov = ds.map { case (id, _, ss) => ss.count(firstOwner(_) == id).toLong }.sum
      src -> (ds.length.toLong, nSh, nNov)
    }
    val got = operators.TextAnalysis.textNgramNovelty.run(spark, sf).collect()
    assert(got.length == expBySource.size)
    for (r <- got) {
      val (src, nd, nSh, nNov) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (ed, eSh, eNov) = expBySource(src)
      assert(nd == ed && nSh == eSh && nNov == eNov, s"source $src: ($nd,$nSh,$nNov) vs ($ed,$eSh,$eNov)")
      assert(nNov <= nSh)
    }
    // every distinct shingle is introduced exactly once, by its first owner
    assert(got.map(_.getLong(3)).sum == firstOwner.size.toLong)
  }

  test("dataset card: shares sum to 1 and cells reproduce the corpus totals") {
    val got = operators.TextAnalysis.pipelineDatasetCard.run(spark, sf).collect()
    val d = Tables.documents(spark, sf)
    assert(got.map(_.getLong(2)).sum == d.count())
    assert(math.abs(got.map(_.getDouble(6)).sum - 1.0) < 1e-4, "docs_share sums to 1")
    assert(math.abs(got.map(_.getDouble(7)).sum - 1.0) < 1e-4, "toks_share sums to 1")
    for (r <- got) {
      assert(r.getLong(5) <= r.getLong(2), "n_distinct <= n_docs")
      val dup = r.getDouble(8)
      assert(dup >= 0.0 && dup < 1.0)
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

  test("persisted-index BM25 is bit-equal to from-scratch and scans the index, not documents") {
    import org.apache.spark.sql.functions.col
    // the reference side tokenizes the corpus at query time — the
    // derivation the index build must be result-invisible against
    // (the pin is against the kept-for-verification scratch
    // implementation)
    val fresh = operators.TextAnalysis
      .bm25FrameScratch(spark, sf, Seq("spark", "join", "fast", "window"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
      .collect().toSeq
    val served = operators.TextAnalysis.textBm25Topk.run(spark, sf)
    assert(served.collect().toSeq == fresh, "index persistence must be result-invisible")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bm25_index"), s"expected index scan in plan:\n${plan.take(2000)}")
    assert(!plan.contains("documents.parquet"), "query-time plan must not re-read the corpus")
  }

  test("persisted BM25 postings carry no duplicate (tok, doc_id) keys") {
    // ADVICE r21: both BM25 df call sites (bm25Frame / bm25MultiFrame)
    // derive document frequency as a plain count(*) over probed
    // postings — correct ONLY while the materialized postings view is
    // unique per (tok, doc_id). That invariant is structural today
    // (groupBy in bm25PostingsOf, keyed merge in streamedBm25Index);
    // this pin makes a future writer that appends without merging fail
    // a test instead of silently inflating df in two query paths.
    import org.apache.spark.sql.functions.{col, count, lit}
    val (pPath, _) = operators.TextAnalysis.bm25IndexPath(spark, sf)
    val dups = spark.read.parquet(pPath)
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(dups == 0L, s"postings view has $dups duplicate (tok, doc_id) keys")
  }

  test("multi-query BM25 batch: per-query slice equals the single-query path; plan stays on the index") {
    import org.apache.spark.sql.functions.col
    // batching must be result-invisible PER QUERY: the "lexical"
    // term-set is exactly text_bm25_topk's query, so that slice of the
    // batch row (rank <= 10) must reproduce the single-query row's
    // first 10 (doc_id, bm25) pairs in order.
    val single = operators.TextAnalysis.textBm25Topk
      .run(spark, sf).collect().toSeq.take(10)
      .map(r => (r.getLong(0), r.getDouble(1)))
    val batch = operators.TextAnalysis.textBm25Persisted.run(spark, sf)
    val lexical = batch.collect().toSeq
      .filter(_.getString(0) == "lexical")
      .sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(lexical == single, "lexical slice of the batch must equal the single-query top-10")
    // every query in the fixed batch produces a full top-10
    val byQuery = batch.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byQuery == Map("lexical" -> 10, "storage" -> 10, "streaming" -> 10))
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bm25_index"), "batch scoring must probe the persisted index")
    assert(!plan.contains("documents.parquet"), "batch scoring must not re-read the corpus")
  }

  test("BPE training: an independent driver-side greedy replay reproduces the merge list") {
    // full independent recomputation of the training loop: word freqs
    // from the raw corpus, pair counts by hand, argmax with the
    // (n desc, pair asc) total order, and the same 3-pass literal
    // replace (java.lang.String.replace has the identical left-to-right
    // continue-after-match semantics as both engines' replace()).
    val wf = Tables.documents(spark, sf).collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var st: Map[String, String] =
      wf.keys.map(w => w -> w.toCharArray.mkString(" ", " ", " ")).toMap
    val expected = (1 to 10).map { rank =>
      val counts = collection.mutable.Map.empty[String, Long]
      for ((w, s) <- st) {
        val toks = s.trim.split(" ", -1)
        for (Array(a, b) <- toks.sliding(2) if toks.length > 1)
          counts(a + " " + b) = counts.getOrElse(a + " " + b, 0L) + wf(w)
      }
      val (pr, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val pat = " " + pr + " "; val rep = " " + pr.replace(" ", "") + " "
      st = st.view.mapValues(s => s.replace(pat, rep).replace(pat, rep).replace(pat, rep)).toMap
      (rank, pr.split(" ")(0), pr.split(" ")(1), pr.replace(" ", ""), n)
    }
    val got = operators.TextAnalysis.textBpeTrain.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expected, s"merge list drifted:\n got=$got\n exp=$expected")
    // winning counts are non-increasing: a pair created by a merge
    // cannot occur more often than the merged pair that created it
    assert(got.map(_._5).sliding(2).forall(p => p.head >= p.last))
  }

  test("BPE encode: per-doc token counts are bounded and consistent with the corpus") {
    val enc = operators.TextAnalysis.textBpeEncode.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("text")).toMap
    assert(enc.map(_._1).toSet == docs.keySet, "one row per document")
    for ((id, nWords, nBpe) <- enc) {
      val words = docs(id).split(" ", -1)
      assert(nWords == words.length.toLong)
      // merging only ever shrinks: chars-per-word is the start state,
      // one token per word the floor
      assert(nBpe <= words.map(_.length.max(1)).sum.toLong)
      assert(nBpe >= nWords)
    }
    // rank-1 of the training row is exactly text_bpe_pairs' top pair:
    // per-instance pair counts over the corpus == freq-weighted counts
    // over distinct words
    val top = operators.TextAnalysis.textBpePairs.run(spark, sf).collect().head
    val m1  = operators.TextAnalysis.textBpeTrain.run(spark, sf).collect().head
    assert(top.getString(0) == m1.getString(1) + m1.getString(2))
    assert(top.getLong(1) == m1.getLong(4))
  }

  test("BPE encode is OOV-total: direct merge application == the vocab memo, unseen tokens still encode") {
    val (mergesPath, vocabPath) = operators.TextAnalysis.bpeIndexPath(spark, sf)
    val merges = operators.TextAnalysis.bpeMergeList(spark, mergesPath)
    // memo == direct on every trained token: the vocab view is an
    // optimization, not a semantic dependency
    val vocab = spark.read.parquet(vocabPath)
      .select(col("tok"), col("st")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val direct = operators.TextAnalysis
      .bpeEncodeStates(spark.createDataFrame(
        vocab.keys.toSeq.sorted.map(Tuple1(_))).toDF("tok"), merges)
      .select(col("tok"), col("st")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(direct == vocab, "direct merge application diverges from the persisted vocab states")
    // a token the training corpus never saw still encodes: no dropped
    // rows, >= 1 symbols, and any applicable merge applies to it too
    val lhsRhs = merges.head.replace(" ", "") // the rank-1 merged symbol
    // pick novel chars from outside every learned merge so no merge can
    // touch the all-novel token (the merge list is data-learned, so the
    // choice must be dynamic)
    val mergeChars = merges.flatMap(_.replace(" ", "")).toSet
    val novel = "zqxjvw0123456789".filterNot(mergeChars).take(4)
    assert(novel.length == 4, s"fixture exhausted the novel-char pool: merges=$merges")
    val allNovel = novel + novel.reverse // 8 chars, no learnable pair
    val unseen = Seq(allNovel, lhsRhs + novel)
    val got = operators.TextAnalysis
      .bpeEncodeStates(spark.createDataFrame(unseen.map(Tuple1(_))).toDF("tok"), merges)
      .select(col("tok"), col("n_toks"), col("st")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.size == unseen.size, "OOV tokens must not be dropped")
    assert(got(allNovel)._1 == allNovel.length.toLong,
      "no merge applies to an all-novel token: one symbol per char")
    assert(got(lhsRhs + novel)._1 < (lhsRhs + novel).length.toLong,
      "the rank-1 merge must apply inside an unseen token that contains its pair")
  }

  test("BPE drift: per-lang slices reconcile exactly with the corpus encode and the baseline") {
    val drift = operators.TextAnalysis.textBpeDrift.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(drift.nonEmpty)
    // slice sums == the per-document encode's corpus totals
    val enc = operators.TextAnalysis.textBpeEncode.run(spark, sf).collect()
    assert(drift.map(_._2).sum == enc.map(_.getLong(1)).sum, "word totals reconcile")
    assert(drift.map(_._3).sum == enc.map(_.getLong(2)).sum, "token totals reconcile")
    for ((lang, nw, nb, nc, cpt, tpw, _) <- drift) {
      assert(nb >= nw, s"$lang: merging never makes more tokens than words")
      assert(nc >= nb, s"$lang: a BPE token is at least one char")
      assert(math.abs(cpt - nc.toDouble / nb) < 1e-5)
      assert(math.abs(tpw - nb.toDouble / nw) < 1e-5)
    }
    // the baseline is the token-weighted mean: weighted drift sums to ~0
    val weighted = drift.map { case (_, _, nb, _, _, _, d) => d * nb }.sum
    assert(math.abs(weighted) < drift.map(_._3).sum * 1e-5,
      s"token-weighted cpt drift should cancel, got $weighted")
  }

  test("wide BPE training (budget 100) extends the 10-merge view as an exact prefix, to exhaustion") {
    // Greedy BPE is prefix-stable: rank i's argmax depends only on
    // merges 1..i-1, so training deeper can never rewrite the head.
    // This pins the incremental-state trainer at depth against the
    // 10-merge view (itself driver-oracle-replayed): a drift anywhere
    // in the first 10 rounds would mean the materialized-state
    // advance diverged from the stacked-expression algebra. The
    // fixture corpus's 31-word vocabulary exhausts its pair pool
    // before the 100-merge budget — the loop must stop exactly there
    // (every word one symbol), never pad or loop.
    val wide = operators.TextAnalysis.textBpeTrainWide.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val narrow = operators.TextAnalysis.textBpeTrain.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(wide.length > 50 && wide.length <= 100, s"implausible merge count ${wide.length}")
    assert(wide.take(narrow.length).toSeq == narrow.toSeq,
      "deeper training rewrote the head of the merge list")
    assert(wide.map(_._1).toSeq == (1 to wide.length), "ranks must be dense")
    if (wide.length < 100) {
      // exhaustion claim: the merges consumed every pair — total symbol
      // count merged down to one per word means sum over the vocab of
      // (chars(tok) - 1) merge APPLICATIONS happened, and no pair can
      // remain. Verify directly: apply all merges to the corpus vocab
      // and demand single-symbol states everywhere.
      val merges = wide.map(m => m._2 + " " + m._3).toSeq
      val states = operators.TextAnalysis
        .bpeEncodeStates(
          Tables.documents(spark, sf)
            .select(org.apache.spark.sql.functions.explode(
              org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
            .distinct(),
          merges)
        .select(col("n_toks")).collect().map(_.getLong(0))
      assert(states.forall(_ == 1L),
        "loop stopped early but some word still has a mergeable pair")
    }
  }

  test("BPE trainer handles true depth: 128 merges on a synthetic 200-word vocabulary") {
    // The fixture corpus can't exercise >=100 merges (31 words), so
    // prove depth on a synthetic word-frequency table: 200 distinct
    // 8-char pseudo-words over a 20-char alphabet, deterministic
    // frequencies. The incremental-state loop must learn the full 128
    // budget with dense ranks and strictly-valid merge rows. (Cost
    // linearity in merge count is recorded in SCALING.md — timing is
    // not asserted here because suite boxes are co-tenant.)
    import spark.implicits._
    val alphabet = "abcdefghijklmnopqrst"
    val words = (0 until 200).map { i =>
      val chars = (0 until 8).map(k => alphabet(((i * 31 + k * 7 + (i >> 3) * k) % 20)))
      (chars.mkString, (i % 13) + 1L)
    }
    val w = words.toDF("tok", "freq")
      .withColumn("st", operators.TextAnalysis.bpeInitSt)
    val merges = operators.TextAnalysis.bpeTrainLoopOn(w, 128)
    assert(merges.length == 128, s"expected the full 128-merge budget, got ${merges.length}")
    assert(merges.map(_._1) == (1 to 128), "ranks must be dense 1..128")
    // each merge row is internally consistent: positive weighted count,
    // pair of non-empty symbols
    for ((rank, pr, n) <- merges) {
      val parts = pr.split(" ")
      assert(parts.length == 2 && parts.forall(_.nonEmpty), s"rank $rank: bad pair '$pr'")
      assert(n > 0, s"rank $rank: non-positive count")
    }
    // counts weakly decrease in rank EXCEPT where a merge creates a new
    // frequent pair — so don't pin monotonicity; pin instead that the
    // first merge is the global argmax of raw pair counts
    val firstCount = merges.head._3
    assert(merges.forall(_._3 <= firstCount), "rank 1 must be the global argmax")
  }

  test("BPE trainer sustains 1000 merges with ~linear cost in merge count") {
    // VERDICT r14 #5: the O(M)-per-depth claim was measured only to
    // 100 (TextEvalSpec above trains 128); real tokenizers run 32k.
    // Train a FULL 1000-merge budget on a vocabulary rich enough to
    // never exhaust (1300 distinct 12-char pseudo-words over 26
    // letters — the symbol inventory grows with every merge, so the
    // greedy pair pool outlives the budget), and pin linearity with a
    // two-point ratio: t(1000)/t(250) ≈ 4 for the incremental-state
    // loop vs ≈ 16 for the r12 stacked-expression spelling. 8 is the
    // midpoint guard, tolerant of co-tenant suite boxes; the measured
    // curve lives in SCALING.md. The 250-merge run goes FIRST so plan
    // compile warm-up inflates the denominator — the safe direction.
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    val words = (0 until 1400)
      .map { i =>
        // md5-derived 12-char hex words (16-symbol alphabet):
        // deterministic and collision-free at this count, where the
        // arithmetic mixers tried first collapsed to a few hundred
        // distinct words
        val hex = md.digest(s"w$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (hex.take(12), (i % 7) + 1L)
      }
      .groupBy(_._1).map { case (t, rs) => (t, rs.map(_._2).sum) }.toSeq.sortBy(_._1)
    assert(words.size >= 1300, s"vocab generation collided too much: ${words.size}")
    val w = words.toDF("tok", "freq")
      // one tiny partition: per-round cost is the ROUND, not task fanout
      .repartition(1)
      .withColumn("st", operators.TextAnalysis.bpeInitSt)
    def timed(n: Int): (Double, Int) = {
      val t0 = System.nanoTime()
      val m  = operators.TextAnalysis.bpeTrainLoopOn(w, n)
      ((System.nanoTime() - t0) / 1e9, m.length)
    }
    val (t250, n250)   = timed(250)
    val (t1000, n1000) = timed(1000)
    info(f"bpe depth curve: 250 merges in $t250%.1f s, 1000 merges in $t1000%.1f s, ratio ${t1000 / t250}%.2f")
    assert(n250 == 250, s"expected the full 250-merge budget, got $n250")
    assert(n1000 == 1000, s"expected the full 1000-merge budget, got $n1000")
    // ADVICE r15: a wall-clock ratio can flake on a loaded co-tenant
    // box (GC or scheduler noise inflating ONE of the runs), so a
    // first failure re-measures both points once before asserting —
    // genuine super-linearity reproduces, a noise spike doesn't.
    val ratio =
      if (t1000 / t250 < 8.0) t1000 / t250
      else {
        val (r250, _)  = timed(250)
        val (r1000, _) = timed(1000)
        info(f"bpe depth retry: 250 in $r250%.1f s, 1000 in $r1000%.1f s, ratio ${r1000 / r250}%.2f " +
          f"(first attempt ${t1000 / t250}%.2f)")
        r1000 / r250
      }
    assert(ratio < 8.0,
      f"cost ratio $ratio%.1f suggests super-linear per-merge cost (reproduced across a retry)")
  }
}
