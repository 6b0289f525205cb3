package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative ML primitives on the engine's own operator set — the
  * point is the EXECUTION SHAPE, not model quality: each Lloyd's
  * iteration is (broadcast tiny centroid table) × (one linear scan of
  * the vectors) + (argmin via the map-side-pruning top-k operator) +
  * (one k×dims-row aggregate), i.e. the big side never shuffles and
  * the driver only ever holds k·dims doubles. That is exactly how
  * k-means runs on 100 TB of vectors: per-iteration cost is one pass,
  * state is the centroid table.
  *
  * Determinism: init = the first k vectors (no RNG); per-dim centroid
  * means go through the order-independent decimal sum; distance
  * comparisons tiebreak on centroid id — so every run, engine, and
  * partitioning yields identical assignments (MlSpec asserts run-to-run
  * equality and monotone non-increasing WCSS, Lloyd's invariant).
  */
object Ml {

  private val K = 8
  // 3 iterations: each costs a fixed number of scheduler/AQE rounds
  // (the data is tiny at demo scale); convergence on this corpus is
  // visible by iteration 2-3 and the invariant spec tracks the trace
  private val Iters = 3

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("x"))

  /** One assignment pass: nearest centroid per vector (squared L2,
    * centroid-id tiebreak). `cents` is (cid, c: array<double>) — tiny,
    * broadcast. */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    // codegen'd squared-L2 (bit-identical to the HOF
    // aggregate(zip_with(...)) spelling AND the oracle's unrolled
    // (x-c)^2 CTE sums — same element order, same accumulation): the
    // hot inner loop is vectors x K x dims per Lloyd iteration
    val d2 = org.apache.spark.sql.graftx.SquaredL2.dist2(col("x"), col("c"))
    org.apache.spark.sql.graftx
      .TopKPerGroup(
        e.crossJoin(broadcast(cents)).withColumn("d2", d2),
        Seq("vec_id"),
        Seq("d2" -> false, "cid" -> false), // ascending distance, cid tiebreak
        1
      )
      .select(col("vec_id"), col("x"), col("cid"), col("d2"))
  }

  /** Centroid table from an assignment via per-dimension decimal-sum
    * means (order-independent → deterministic centroids). */
  private def recompute(spark: SparkSession, assigned: DataFrame): DataFrame = {
    import spark.implicits._
    // ONE aggregation; the k·dims mean rows are the MODEL (512 values
    // here), collected and reassembled driver-side — the only
    // driver-side state of the whole loop. A second distributed
    // groupBy to re-pack arrays would buy nothing but a stage.
    val perDim = assigned
      .select(col("cid"), posexplode(col("x")).as(Seq("p", "v")))
      .groupBy(col("cid"), col("p"))
      .agg((Det.dsum(col("v")) / count(lit(1))).as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val rows = perDim
      .groupBy(_._1)
      .map { case (cid, dims) => (cid, dims.sortBy(_._2).map(_._3).toSeq) }
      .toSeq
    rows.toDF("cid", "c")
  }

  /** Run Lloyd's and return (final assignment, per-iteration WCSS). */
  private[graft] def lloyd(
      spark: SparkSession,
      dir: String,
      trackWcss: Boolean = false
  ): (DataFrame, Seq[Double]) = {
    import spark.implicits._
    // one pass builds the vectors; every iteration reads the cache —
    // without it each of the ~3 consumers per iteration (WCSS,
    // centroid recompute, final profile) re-runs the scan + transform
    val e = vecs(spark, dir).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = e
      .filter(col("vec_id") < K)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1)))
      .toSeq
      .toDF("cid", "c")
    val wcss = scala.collection.mutable.ArrayBuffer.empty[Double]
    var assigned: DataFrame = null
    var prev: DataFrame = null
    for (_ <- 1 to Iters) {
      assigned = assign(e, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the WCSS trace costs one extra job per iteration — only the
      // invariant test wants it; the profile query skips it
      if (trackWcss) wcss += assigned.agg(Det.dsum(col("d2"))).collect()(0).getDouble(0)
      cents = recompute(spark, assigned)
      if (prev != null) prev.unpersist(blocking = false)
      prev = assigned
    }
    e.unpersist(blocking = false)
    (assigned, wcss.toSeq)
  }

  /** The SQL twin of one [[assign]]+[[recompute]] round, unrolled
    * [[Iters]] times. Parity rests on three equivalences: (1) the d2
    * fold — DuckDB `list_reduce` is a left fold seeded with the first
    * element, and Spark's `aggregate(…, 0.0, +)` seeds with 0.0; for
    * the non-negative squared terms 0.0+v ≡ v bitwise, so every
    * partial sum matches; (2) argmin ties break on cid in both; (3)
    * centroid means go through the decimal-exact sum in both. */
  private def kmeansOracle: String = {
    def d2(x: String, c: String): String =
      s"list_reduce(list_transform(list_zip($x, $c), p -> (p[1] - p[2]) * (p[1] - p[2])), " +
        "(a, b) -> a + b)"
    def assignCte(i: Int, cents: String): String =
      s"a$i AS (SELECT vec_id, x, cid, d2 FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM (" +
        s"SELECT v.vec_id, v.x, c.cid, ${d2("v.x", "c.c")} AS d2 " +
        s"FROM v CROSS JOIN $cents c)) WHERE rn = 1)"
    def recomputeCte(i: Int): String =
      s"m$i AS (SELECT cid, p, cast(sum(cast(v as decimal(30,8))) as double) / count(*) AS m " +
        s"FROM (SELECT cid, unnest(x) AS v, unnest(range(0, 64)) AS p FROM a$i) " +
        "GROUP BY cid, p), " +
        s"c${i + 1} AS (SELECT cid, list(m ORDER BY p) AS c FROM m$i GROUP BY cid)"
    val iterations = (1 until Iters)
      .map(i => assignCte(i, s"c$i") + ", " + recomputeCte(i) + ", ")
      .mkString
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings), " +
      s"c1 AS (SELECT cast(vec_id as integer) AS cid, embedding::DOUBLE[] AS c " +
      s"FROM embeddings WHERE vec_id < $K), " +
      iterations +
      assignCte(Iters, s"c$Iters") + " " +
      s"SELECT cid, cast(count(*) as bigint) AS n_members, " +
      Det.oRN(Det.oSum("d2"), 6) + s" AS wcss FROM a$Iters GROUP BY cid ORDER BY cid"
  }

  /** Cluster profile after 3 deterministic Lloyd's iterations:
    * (cid, n_members, wcss). ORACLE-checked (upgraded from no-oracle)
    * by unrolling the iterations into one SQL statement — see
    * [[kmeansOracle]] for the cross-engine parity argument; MlSpec
    * keeps the determinism and monotone-WCSS invariants. */
  val mlKmeans: Q = Q(
    "ml_kmeans",
    Some(kmeansOracle),
    (spark, dir) => {
      val (assigned, _) = lloyd(spark, dir)
      assigned
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), Det.rN(Det.dsum(col("d2")), 6).as("wcss"))
        .orderBy(col("cid"))
    }
  )

  /** Multinomial Naive Bayes language classifier, trained and scored
    * entirely in the engine — counts in, argmax out, no RNG, no
    * gradient: NB is the one classical classifier whose training IS a
    * groupBy (token counts per class) and whose scoring IS a join +
    * sum, which makes it both hash-verifiable cross-engine and
    * embarrassingly scalable (the model — class priors, per-class token
    * counts, vocab size — is a broadcastable table; scoring touches
    * each test token once).
    *
    * Split: the md5 bucket of [[Sampling.hkey]] (same boundary as
    * `sample_train_test_split`), 90% train / 10% test. Laplace +1
    * smoothing over the train vocabulary. Score(c,d) = ln P(c) +
    * Σ_tok tf·ln((cnt+1)/(tot_c+V)); every log argument is an identical
    * small rational in both engines, the per-doc sum goes through the
    * decimal-exact path, and the argmax tie-breaks on class name — so
    * the prediction, not just the score, is deterministic.
    */
  private val nbOracleSql: String = {
      val h = Sampling.oHkey("doc_id")
      "WITH tr AS (SELECT doc_id, lang, text FROM documents WHERE " + h + " % 10 <> 0), " +
        "te AS (SELECT doc_id, lang, text FROM documents WHERE " + h + " % 10 = 0), " +
        "trt AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM tr), " +
        "cnt AS (SELECT lang, tok, count(*)::DOUBLE AS c FROM trt GROUP BY 1, 2), " +
        "tot AS (SELECT lang, count(*)::DOUBLE AS t FROM trt GROUP BY 1), " +
        "voc AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM trt), " +
        "pri AS (SELECT lang, ln(count(*)::DOUBLE / (SELECT count(*) FROM tr)::DOUBLE) AS lp " +
        "FROM tr GROUP BY 1), " +
        "tet AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM te) GROUP BY 1, 2), " +
        "sc AS (SELECT tet.doc_id, tot.lang, min(pri.lp) + " +
        Det.oSum("tet.tf * ln((coalesce(cnt.c, 0) + 1) / (tot.t + (SELECT v FROM voc)))") +
        " AS s FROM tet CROSS JOIN tot " +
        "LEFT JOIN cnt ON cnt.lang = tot.lang AND cnt.tok = tet.tok " +
        "JOIN pri ON pri.lang = tot.lang GROUP BY 1, 2), " +
        "rk AS (SELECT doc_id, lang AS predicted, s, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn FROM sc) " +
        "SELECT rk.doc_id, te.lang AS actual, rk.predicted, " +
        "(rk.predicted = te.lang) AS correct, " + Det.oRN("rk.s", 6) + " AS log_score " +
        "FROM rk JOIN te ON te.doc_id = rk.doc_id WHERE rn = 1 ORDER BY rk.doc_id"
  }

  val mlNaiveBayes: Q = Q(
    "ml_naive_bayes",
    Some(nbOracleSql),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs  = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text"))
      val isTest = Sampling.hkey(col("doc_id")) % 10 === 0
      val tr = docs.filter(!isTest)
      val te = docs.filter(isTest)
      val trt = tr.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      // ONE tokenize+explode pass over the training corpus: the
      // (lang, tok) count table is the only aggregate computed from
      // token instances; the per-class totals and the vocabulary size
      // derive from it EXACTLY (sum of exact long counts / distinct
      // tok over the classes×vocab table) — the same
      // derive-the-smaller-aggregate move as text_bigram_lm's
      // c1-from-c2. Casts to double happen after the exact integer
      // aggregation, so every model value is bit-identical.
      val cnt0 = trt.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("ci"))
      val cnt  = cnt0.select(col("lang"), col("tok"), col("ci").cast("double").as("c"))
      val tot  = cnt0.groupBy(col("lang")).agg(sum(col("ci")).cast("double").as("t"))
      val voc  = cnt0.agg(countDistinct(col("tok")).cast("double").as("v"))
      // Class priors likewise: one doc-count aggregate, with the corpus
      // total derived from the per-class counts instead of a second
      // scan of the training docs.
      val nc0 = tr.groupBy(col("lang")).agg(count(lit(1)).as("ncl"))
      val pri = nc0
        .crossJoin(broadcast(nc0.agg(sum(col("ncl")).cast("double").as("nall"))))
        .select(col("lang"), log(col("ncl").cast("double") / col("nall")).as("lp"))
      val tet = te
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).cast("double").as("tf"))
      // model tables are all broadcastable: classes × vocab
      val sc = tet
        .as("tet")
        .crossJoin(broadcast(tot.withColumnRenamed("lang", "clang")))
        .join(
          broadcast(cnt.as("cnt")),
          col("cnt.lang") === col("clang") && col("cnt.tok") === col("tet.tok"),
          "left"
        )
        .crossJoin(broadcast(voc))
        .select(
          col("doc_id"),
          col("clang"),
          (col("tf") * log((coalesce(col("c"), lit(0.0)) + 1) / (col("t") + col("v"))))
            .as("addend")
        )
        .groupBy(col("doc_id"), col("clang"))
        .agg(Det.dsum(col("addend")).as("partial"))
        .join(broadcast(pri), col("clang") === pri("lang"))
        .select(col("doc_id"), col("clang"), (col("lp") + col("partial")).as("s"))
      val w  = Window.partitionBy(col("doc_id")).orderBy(col("s").desc, col("clang"))
      val rk = sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      rk.join(te.select(col("doc_id"), col("lang").as("actual")), "doc_id")
        .select(
          col("doc_id"),
          col("actual"),
          col("clang").as("predicted"),
          (col("clang") === col("actual")).as("correct"),
          Det.rN(col("s"), 6).as("log_score")
        )
        .orderBy(col("doc_id"))
    }
  )

  /** Two-sample Kolmogorov–Smirnov statistic between the order-value
    * distributions of the URGENT and LOW priority classes — the
    * standard distribution-drift test a pipeline runs between a new
    * data slice and a reference slice before mixing them.
    *
    * Determinism: D = max |F₁ − F₂| is computed over the pooled value
    * grid ENTIRELY in integer arithmetic — max |cum₁·n₂ − cum₂·n₁| —
    * and divided by n₁·n₂ exactly once at output (§2.9 playbook: exact
    * algebra first, one IEEE op last). No per-row doubles are summed,
    * so no ordering sensitivity exists at all.
    *
    * 100 TB: per-value counts partial-aggregate; the CDF scan over the
    * distinct-value grid is [[Grids.runningSums]]' two-level cumulative
    * (range-bucketed, PARTITIONED windows + a ≤256-row offset table) —
    * EXACT at any grid cardinality, so no partitionless window exists
    * even when values are near-unique. Bound on the
    * integer algebra: cum·n products stay below 2⁶³ only while
    * n₁·n₂ < 2⁶³, i.e. class counts up to ~3·10⁹ each — plenty for a
    * drift test between two slices, but a whole-corpus run past that
    * must widen the cross-products to DECIMAL(38,0) before the
    * subtraction (DuckDB side is already HUGEINT). */
  val mlKsTest: Q = Q(
    "ml_ks_test",
    Some(
      "WITH s AS (SELECT o_totalprice AS v, " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1 " +
        "FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')), " +
        "pv AS (SELECT v, cast(sum(g1) as bigint) AS c1, cast(sum(1 - g1) as bigint) AS c2 " +
        "FROM s GROUP BY v), " +
        "n AS (SELECT cast(sum(g1) as bigint) AS n1, cast(sum(1 - g1) as bigint) AS n2 FROM s), " +
        "c AS (SELECT cast(sum(c1) OVER w as bigint) AS cum1, " +
        "cast(sum(c2) OVER w as bigint) AS cum2 FROM pv " +
        "WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)), " +
        "d AS (SELECT max(abs(cum1 * n.n2 - cum2 * n.n1)) AS dnum, " +
        "max(n.n1) AS n1, max(n.n2) AS n2 FROM c CROSS JOIN n) " +
        "SELECT n1, n2, " + Det.oRN("dnum::DOUBLE / (n1 * n2)", 6) + " AS d_stat FROM d"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val s = Tables
        .orders(spark, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
          col("o_totalprice").as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("g1")
        )
      val pv = s
        .groupBy(col("v"))
        .agg(sum(col("g1")).as("c1"), sum(lit(1) - col("g1")).as("c2"))
      val n = s.agg(sum(col("g1")).as("n1"), sum(lit(1) - col("g1")).as("n2"))
      Grids
        .runningSums(pv, "v", desc = false, Nil, Seq((col("c1"), "cum1"), (col("c2"), "cum2")))
        .select(col("cum1"), col("cum2"))
        .crossJoin(broadcast(n))
        .agg(
          max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("dnum"),
          max(col("n1")).as("n1"),
          max(col("n2")).as("n2")
        )
        .select(
          col("n1"),
          col("n2"),
          Det.rN(col("dnum").cast("double") / (col("n1") * col("n2")), 6).as("d_stat")
        )
    }
  )

  /** Equal-frequency feature binning (decile bucketing of the order
    * value): ntile(10) over the total (value, key) order, reported as
    * per-bin count + value range — the discretization step before
    * categorical models or drift dashboards.
    *
    * Determinism: ntile over a TOTAL order (ties broken by o_orderkey)
    * is engine-independent by definition; outputs are exact.
    *
    * 100 TB: NO global-order window — each row's global rank comes from
    * [[Grids.globalRank]]'s two-level cumulative decomposition (range
    * buckets + partitioned intra-bucket windows + a ≤256-row offset
    * table), and the decile is [[Grids.ntileFromRank]] arithmetic on
    * (rank, broadcast exact N). Bit-identical to the oracle's ntile —
    * the rank IS the position in the same total order — with the only
    * input-sized passes being one partial aggregate and one PARTITIONED
    * window. */
  val mlFeatureBins: Q = Q(
    "ml_feature_bins",
    Some(
      "WITH b AS (SELECT o_totalprice AS v, " +
        "ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin FROM orders) " +
        "SELECT bin, cast(count(*) as bigint) AS n, min(v) AS min_v, max(v) AS max_v " +
        "FROM b GROUP BY bin ORDER BY bin"
    ),
    (spark, dir) => {
      val s = Tables
        .orders(spark, dir)
        .select(col("o_totalprice").as("v"), col("o_orderkey"))
      val n = s.agg(count(lit(1)).as("_n"))
      Grids
        .globalRank(s, "v", desc = false, Seq("o_orderkey"), "rnk")
        .crossJoin(broadcast(n))
        .select(col("v"), Grids.ntileFromRank(col("rnk"), col("_n"), 10).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("bin"))
    }
  )

  /** Confusion matrix of the Naive Bayes classifier on its held-out
    * split: (actual, predicted, n, row_frac) — the per-class error
    * breakdown `ml_naive_bayes`'s flat prediction rows don't show,
    * which is what decides whether a classifier's mistakes are benign
    * (adjacent classes) or structural. Composes the NB query itself,
    * so the matrix is hash-checked end-to-end through training,
    * scoring, argmax, AND aggregation.
    *
    * Determinism: cell counts exact; row_frac is one division per
    * cell over the exact per-actual total, trunc-rounded 6 dp.
    *
    * 100 TB: adds one |classes|²-bounded aggregate over the scored
    * test set — free next to scoring. */
  val mlConfusionMatrix: Q = Q(
    "ml_confusion_matrix",
    Some(
      "WITH nb AS (" + nbOracleSql + ") " +
        "SELECT actual, predicted, cast(count(*) as bigint) AS n, " +
        Det.oRN(
          "count(*)::DOUBLE / cast(sum(count(*)) OVER (PARTITION BY actual) as bigint)",
          6
        ) + " AS row_frac " +
        "FROM nb GROUP BY actual, predicted ORDER BY actual, predicted"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = mlNaiveBayes
        .run(spark, dir)
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("actual"))
      cells
        .select(
          col("actual"),
          col("predicted"),
          col("n"),
          Det.rN(col("n").cast("double") / sum(col("n")).over(w), 6).as("row_frac")
        )
        .orderBy(col("actual"), col("predicted"))
    }
  )

  /** Tie-aware ROC AUC of "order value predicts urgency" — the
    * Mann–Whitney twin of [[mlKsTest]] over the same two classes: the
    * probability a random URGENT order outranks a random LOW one, ties
    * counted half. The standard threshold-free score for the binary
    * quality classifiers a curation pipeline gates on.
    *
    * Determinism: like the KS statistic, the whole computation is
    * EXACT integer algebra — 2·U = Σ_v c1_v·(2·cum2_{<v} + c2_v) over
    * the distinct-value grid — with ONE IEEE division at output
    * (§2.9: exact algebra first, one float op last). No double is ever
    * summed.
    *
    * 100 TB: per-value counts partial-aggregate; the U scan is the same
    * [[Grids.runningSums]] two-level grid cumulative as the KS CDF scan
    * — exact at any grid cardinality, no partitionless window.
    * Integer bound: 2U ≤ 2·n₁·n₂ must stay below 2⁶³
    * → class counts to ~2·10⁹ each; past that widen to DECIMAL(38,0)
    * (DuckDB side is already HUGEINT). */
  val mlAuc: Q = Q(
    "ml_auc",
    Some(
      "WITH s AS (SELECT o_totalprice AS v, " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1 " +
        "FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')), " +
        "pv AS (SELECT v, cast(sum(g1) as bigint) AS c1, cast(sum(1 - g1) as bigint) AS c2 " +
        "FROM s GROUP BY v), " +
        "n AS (SELECT cast(sum(g1) as bigint) AS n1, cast(sum(1 - g1) as bigint) AS n2 FROM s), " +
        "c AS (SELECT c1, c2, cast(sum(c2) OVER w - c2 as bigint) AS cum2p FROM pv " +
        "WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)), " +
        "u AS (SELECT cast(sum(c1 * (2 * cum2p + c2)) as bigint) AS u2 FROM c) " +
        "SELECT n.n1 AS n_pos, n.n2 AS n_neg, " +
        Det.oRN("u2::DOUBLE / (2.0 * n.n1 * n.n2)", 6) + " AS auc " +
        "FROM u CROSS JOIN n"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val s = Tables
        .orders(spark, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
          col("o_totalprice").as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("g1")
        )
      val pv = s
        .groupBy(col("v"))
        .agg(sum(col("g1")).as("c1"), sum(lit(1) - col("g1")).as("c2"))
      val n = s.agg(sum(col("g1")).as("n1"), sum(lit(1) - col("g1")).as("n2"))
      Grids
        .runningSums(pv, "v", desc = false, Nil, Seq((col("c2"), "cum2")))
        .select(col("c1"), col("c2"), (col("cum2") - col("c2")).as("cum2p"))
        .agg(sum(col("c1") * (lit(2) * col("cum2p") + col("c2"))).as("u2"))
        .crossJoin(broadcast(n))
        .select(
          col("n1").as("n_pos"),
          col("n2").as("n_neg"),
          Det.rN(col("u2").cast("double") / (lit(2.0) * col("n1") * col("n2")), 6).as("auc")
        )
    }
  )

  /** Reliability diagram (calibration bins) for a [0,1] score against
    * the URGENT label: min-max-normalized order value in 10 equal-width
    * score bins; per bin the count, mean predicted score, exact
    * positive rate, and the signed calibration gap. The audit that
    * decides whether a quality-classifier's scores can be used as
    * sampling probabilities ([[Sampling.sampleQualityWeighted]]) or
    * must be re-calibrated first.
    *
    * Determinism: min/max are exact decimals; the normalized score is
    * IEEE ops on identical doubles; bin = floor(score·10) clamped to 9
    * (pure arithmetic, no engine round()); mean score is a [[Det.dsum]]
    * decimal sum over the bin; pos_rate is one division of exact longs.
    *
    * 100 TB: two passes — a scalar min/max aggregate broadcast back,
    * then one bin-keyed partial aggregate; both map-side-combine
    * friendly. The bin table is 10 rows regardless of scale. */
  val mlCalibration: Q = Q(
    "ml_calibration",
    Some(
      "WITH mm AS (SELECT min(o_totalprice)::DOUBLE AS lo, max(o_totalprice)::DOUBLE AS hi FROM orders), " +
        "s AS (SELECT (o_totalprice::DOUBLE - mm.lo) / (mm.hi - mm.lo) AS score, " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y " +
        "FROM orders CROSS JOIN mm), " +
        "b AS (SELECT least(cast(floor(score * 10) as bigint), 9) AS bin, score, y FROM s) " +
        "SELECT bin, cast(count(*) as bigint) AS n, " +
        Det.oRN(Det.oSum("score") + " / count(*)", 6) + " AS mean_score, " +
        Det.oRN("cast(sum(y) as bigint)::DOUBLE / count(*)", 6) + " AS pos_rate, " +
        Det.oRS(
          Det.oSum("score") + " / count(*) - cast(sum(y) as bigint)::DOUBLE / count(*)",
          6
        ) + " AS gap " +
        "FROM b GROUP BY bin ORDER BY bin"
    ),
    (spark, dir) => {
      val o  = Tables.orders(spark, dir)
      val mm = o.agg(min(col("o_totalprice")).cast("double").as("lo"), max(col("o_totalprice")).cast("double").as("hi"))
      val s = o
        .crossJoin(broadcast(mm))
        .select(
          ((col("o_totalprice").cast("double") - col("lo")) / (col("hi") - col("lo"))).as("score"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y")
        )
        .select(least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"), col("score"), col("y"))
      val meanScore = Det.dsum(col("score")) / count(lit(1))
      val posRate   = sum(col("y")).cast("double") / count(lit(1))
      s.groupBy(col("bin"))
        .agg(
          count(lit(1)).as("n"),
          Det.rN(meanScore, 6).as("mean_score"),
          Det.rN(posRate, 6).as("pos_rate"),
          Det.rS(meanScore - posRate, 6).as("gap")
        )
        .orderBy(col("bin"))
    }
  )

  /** Precision/recall/F1 swept over the 10 decile thresholds of the
    * same normalized score [[mlCalibration]] bins — the third leg of
    * the eval kit (AUC ranks, calibration trusts, PR curve picks the
    * operating threshold a filter actually deploys at).
    *
    * Determinism: per-bin (n, pos) counts are exact; the
    * threshold-cumulative TP / predicted-positive counts are an exact
    * integer window over the 10-row bin table scanned top-down;
    * precision/recall/F1 are IEEE arithmetic on those exact integers
    * (F1 from the UNROUNDED p·r), trunc-rounded 6 dp; the tp=0 edge is
    * an explicit 0, not engine-dependent NaN.
    *
    * 100 TB: identical shape to [[mlCalibration]] — scalar min/max
    * broadcast, one bin-keyed partial aggregate, then arithmetic over
    * 10 rows. */
  val mlPrCurve: Q = Q(
    "ml_pr_curve",
    Some(
      "WITH mm AS (SELECT min(o_totalprice)::DOUBLE AS lo, max(o_totalprice)::DOUBLE AS hi FROM orders), " +
        "s AS (SELECT least(cast(floor((o_totalprice::DOUBLE - mm.lo) / (mm.hi - mm.lo) * 10) as bigint), 9) AS bin, " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y " +
        "FROM orders CROSS JOIN mm), " +
        "b AS (SELECT bin, cast(count(*) as bigint) AS n, cast(sum(y) as bigint) AS pos FROM s GROUP BY bin), " +
        "t AS (SELECT cast(sum(pos) as bigint) AS tpos FROM b), " +
        "c AS (SELECT bin, cast(sum(n) OVER w as bigint) AS pred_pos, " +
        "cast(sum(pos) OVER w as bigint) AS tp FROM b " +
        "WINDOW w AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)) " +
        "SELECT bin / 10.0 AS threshold, pred_pos, tp, " +
        "CASE WHEN tp = 0 THEN 0.0 ELSE " + Det.oRN("tp::DOUBLE / pred_pos", 6) + " END AS precision, " +
        "CASE WHEN tp = 0 THEN 0.0 ELSE " + Det.oRN("tp::DOUBLE / t.tpos", 6) + " END AS recall, " +
        "CASE WHEN tp = 0 THEN 0.0 ELSE " + Det.oRN(
          "2.0 * (tp::DOUBLE / pred_pos) * (tp::DOUBLE / t.tpos) / " +
            "(tp::DOUBLE / pred_pos + tp::DOUBLE / t.tpos)",
          6
        ) + " END AS f1 " +
        "FROM c CROSS JOIN t ORDER BY threshold"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o  = Tables.orders(spark, dir)
      val mm = o.agg(min(col("o_totalprice")).cast("double").as("lo"), max(col("o_totalprice")).cast("double").as("hi"))
      val b = o
        .crossJoin(broadcast(mm))
        .select(
          least(
            floor((col("o_totalprice").cast("double") - col("lo")) / (col("hi") - col("lo")) * 10).cast("long"),
            lit(9L)
          ).as("bin"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y")
        )
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val t = b.agg(sum(col("pos")).as("tpos"))
      val w = Window.partitionBy(Det.onePart(col("bin"))).orderBy(col("bin").desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p = col("tp").cast("double") / col("pred_pos")
      val r = col("tp").cast("double") / col("tpos")
      b.select(col("bin"), sum(col("n")).over(w).as("pred_pos"), sum(col("pos")).over(w).as("tp"))
        .crossJoin(broadcast(t))
        .select(
          (col("bin") / 10.0).as("threshold"),
          col("pred_pos"),
          col("tp"),
          when(col("tp") === 0, 0.0).otherwise(Det.rN(p, 6)).as("precision"),
          when(col("tp") === 0, 0.0).otherwise(Det.rN(r, 6)).as("recall"),
          when(col("tp") === 0, 0.0).otherwise(Det.rN(lit(2.0) * p * r / (p + r), 6)).as("f1")
        )
        .orderBy(col("threshold"))
    }
  )

  /** Cumulative gains / lift table over score deciles — the business
    * cousin of [[mlPrCurve]]: "reading the top d deciles by score, what
    * share of all positives did we capture, and at what multiple of the
    * base rate?" Deciles come from `ntile(10)` over a TOTAL order
    * (score desc, key asc), so tied scores land deterministically.
    *
    * Determinism: decile membership is exact (total order); per-decile
    * and cumulative counts are exact integers; gain is one double
    * division and lift is one division of two exact integer PRODUCTS
    * (`cum_pos·total / (cum_n·tpos)`) — a single IEEE operation each,
    * identical in both engines, trunc-rounded 6 dp.
    *
    * 100 TB: no global ntile window — decile membership is
    * [[Grids.globalRank]] (two-level cumulative: range buckets,
    * partitioned windows, ≤256-row offset table) + [[Grids.ntileFromRank]]
    * arithmetic, bit-identical to the oracle's ntile; the cumulative
    * gains window then runs over the 10-row decile table only. */
  val mlLiftGains: Q = Q(
    "ml_lift_gains",
    Some(
      "WITH s AS (SELECT o_totalprice AS score, o_orderkey, " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y FROM orders), " +
        "d AS (SELECT cast(ntile(10) OVER (ORDER BY score DESC, o_orderkey) as bigint) AS decile, y FROM s), " +
        "g AS (SELECT decile, cast(count(*) as bigint) AS n, cast(sum(y) as bigint) AS pos FROM d GROUP BY 1), " +
        "t AS (SELECT cast(sum(pos) as bigint) AS tpos, cast(sum(n) as bigint) AS total FROM g), " +
        "c AS (SELECT decile, n, pos, cast(sum(n) OVER w as bigint) AS cum_n, " +
        "cast(sum(pos) OVER w as bigint) AS cum_pos FROM g " +
        "WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)) " +
        "SELECT decile, n, pos, cum_n, cum_pos, " +
        Det.oRN("cum_pos::DOUBLE / t.tpos", 6) + " AS gain, " +
        Det.oRN("(cum_pos * t.total)::DOUBLE / (cum_n * t.tpos)", 6) + " AS lift " +
        "FROM c CROSS JOIN t ORDER BY decile"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val s = Tables
        .orders(spark, dir)
        .select(
          col("o_totalprice").as("score"),
          col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y")
        )
      // totals straight off the base projection, NOT off the decile
      // aggregate: tpos/total don't depend on decile membership, and a
      // `g.agg(...)` formulation re-executed the whole rank+decile
      // subtree (the partitioned window included) a second time under
      // the final cross join — the r8 bench regression. One scalar
      // aggregate now serves both the ntile N and the gain/lift
      // denominators (its identical broadcast subtree is exchange-reused
      // where the plan needs it twice).
      val t = s.agg(count(lit(1)).as("total"), sum(col("y")).as("tpos"))
      val d = Grids
        .globalRank(s, "score", desc = true, Seq("o_orderkey"), "rnk")
        .crossJoin(broadcast(t))
        .select(Grids.ntileFromRank(col("rnk"), col("total"), 10).as("decile"), col("y"))
      val g = d.groupBy(col("decile")).agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val w = Window.partitionBy(Det.onePart(col("decile"))).orderBy(col("decile")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("decile"), col("n"), col("pos"),
          sum(col("n")).over(w).as("cum_n"), sum(col("pos")).over(w).as("cum_pos"))
        .crossJoin(broadcast(t))
        .select(
          col("decile"),
          col("n"),
          col("pos"),
          col("cum_n"),
          col("cum_pos"),
          Det.rN(col("cum_pos").cast("double") / col("tpos"), 6).as("gain"),
          Det.rN((col("cum_pos") * col("total")).cast("double") / (col("cum_n") * col("tpos")), 6).as("lift")
        )
        .orderBy(col("decile"))
    }
  )

  /** Population Stability Index between a reference period (orders
    * through 1997) and the current period (1998+) over 10 equal-width
    * price bins fitted on the REFERENCE period — the standard
    * training-data drift monitor: PSI < 0.1 stable, > 0.25 retrain.
    * Current-period values outside the reference range clamp into the
    * edge bins, exactly as a deployed binner would.
    *
    * Determinism: the bin grid is `range(10)` left-joined so all 10
    * bins always appear; counts are exact integers; shares use
    * add-one smoothing `(n+1)/(total+10)` (ln(0)-proof) — one double
    * division each; the per-bin term `(cs−rs)·ln(cs/rs)` is the same
    * IEEE chain in both engines (ln precedent: [[graft.operators.TextAnalysis]]
    * entropy/perplexity), trunc-rounded 6 dp. Per-bin rows, not a
    * pre-summed scalar, so no cross-engine sum-order hazard; the spec
    * asserts the total.
    *
    * 100 TB: scalar reference min/max broadcast, one bin-keyed partial
    * aggregate over the union of both periods, then arithmetic on 10
    * rows — the same fully map-side-combinable shape as
    * [[mlCalibration]], and the natural per-source/per-day extension
    * just adds those columns to the groupBy key. */
  val mlPsi: Q = Q(
    "ml_psi",
    Some(
      "WITH o AS (SELECT o_totalprice::DOUBLE AS v, " +
        "CASE WHEN year(o_orderdate) <= 1997 THEN 0 ELSE 1 END AS per FROM orders), " +
        "mm AS (SELECT min(v) AS lo, max(v) AS hi FROM o WHERE per = 0), " +
        "b AS (SELECT per, greatest(least(cast(floor((v - mm.lo) / (mm.hi - mm.lo) * 10) as bigint), 9), 0) AS bin " +
        "FROM o CROSS JOIN mm), " +
        "c AS (SELECT bin, cast(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) as bigint) AS ref_n, " +
        "cast(sum(per) as bigint) AS cur_n FROM b GROUP BY 1), " +
        "t AS (SELECT cast(sum(ref_n) as bigint) AS rt, cast(sum(cur_n) as bigint) AS ct FROM c), " +
        "g AS (SELECT gs.bin, coalesce(c.ref_n, 0) AS ref_n, coalesce(c.cur_n, 0) AS cur_n " +
        "FROM (SELECT unnest(range(10)) AS bin) gs LEFT JOIN c ON gs.bin = c.bin) " +
        "SELECT g.bin, ref_n, cur_n, " +
        Det.oRN("(ref_n + 1)::DOUBLE / (t.rt + 10)", 6) + " AS ref_share, " +
        Det.oRN("(cur_n + 1)::DOUBLE / (t.ct + 10)", 6) + " AS cur_share, " +
        Det.oRN(
          "((cur_n + 1)::DOUBLE / (t.ct + 10) - (ref_n + 1)::DOUBLE / (t.rt + 10)) * " +
            "ln(((cur_n + 1)::DOUBLE / (t.ct + 10)) / ((ref_n + 1)::DOUBLE / (t.rt + 10)))",
          6
        ) + " AS psi_term " +
        "FROM g CROSS JOIN t ORDER BY bin"
    ),
    (spark, dir) => {
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_totalprice").cast("double").as("v"),
          when(year(col("o_orderdate")) <= 1997, 0L).otherwise(1L).as("per")
        )
      val mm = o.filter(col("per") === 0).agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val b = o
        .crossJoin(broadcast(mm))
        .select(
          col("per"),
          greatest(
            least(floor((col("v") - col("lo")) / (col("hi") - col("lo")) * 10).cast("long"), lit(9L)),
            lit(0L)
          ).as("bin")
        )
      val c = b
        .groupBy(col("bin"))
        .agg(
          sum(when(col("per") === 0, 1L).otherwise(0L)).as("ref_n"),
          sum(col("per")).as("cur_n")
        )
      val t = c.agg(sum(col("ref_n")).as("rt"), sum(col("cur_n")).as("ct"))
      val rs = (col("ref_n") + 1).cast("double") / (col("rt") + 10)
      val cs = (col("cur_n") + 1).cast("double") / (col("ct") + 10)
      spark
        .range(10)
        .select(col("id").as("bin"))
        .join(c, Seq("bin"), "left")
        .na.fill(0L, Seq("ref_n", "cur_n"))
        .crossJoin(broadcast(t))
        .select(
          col("bin"),
          col("ref_n"),
          col("cur_n"),
          Det.rN(rs, 6).as("ref_share"),
          Det.rN(cs, 6).as("cur_share"),
          Det.rN((cs - rs) * log(cs / rs), 6).as("psi_term")
        )
        .orderBy(col("bin"))
    }
  )

  /** Chi-square test of independence over the priority × status
    * contingency table — per-cell observed vs expected counts and the
    * cell's χ² contribution (feature-vs-label dependence screening; the
    * spec asserts the summed statistic and dof = (R−1)(C−1)).
    * The full R×C grid is emitted (margin cross join + left join), so
    * structurally-zero cells still contribute their expected mass.
    *
    * Determinism: the contingency and margin counts are exact
    * integers; expected = `rn·cn / n` is one division of exact integer
    * products; the contribution `(obs−e)²/e` reuses that same IEEE
    * value — identical chains in both engines, trunc-rounded 6 dp.
    *
    * 100 TB: one groupBy on the (low-cardinality) cell key with
    * map-side combine; margins re-aggregate the R·C-row cell table, so
    * nothing after the first aggregate touches the fact table. */
  val mlChi2: Q = Q(
    "ml_chi2",
    Some(
      "WITH c AS (SELECT o_orderpriority AS p, o_orderstatus AS s, cast(count(*) as bigint) AS obs " +
        "FROM orders GROUP BY 1, 2), " +
        "rp AS (SELECT p, cast(sum(obs) as bigint) AS rn FROM c GROUP BY 1), " +
        "cs AS (SELECT s, cast(sum(obs) as bigint) AS cn FROM c GROUP BY 1), " +
        "n AS (SELECT cast(sum(obs) as bigint) AS nn FROM c), " +
        "g AS (SELECT rp.p, cs.s, coalesce(c.obs, 0) AS obs, rn, cn " +
        "FROM rp CROSS JOIN cs LEFT JOIN c ON c.p = rp.p AND c.s = cs.s) " +
        "SELECT p AS o_orderpriority, s AS o_orderstatus, obs, " +
        Det.oRN("(rn * cn)::DOUBLE / n.nn", 6) + " AS expected, " +
        Det.oRN(
          "(obs::DOUBLE - (rn * cn)::DOUBLE / n.nn) * (obs::DOUBLE - (rn * cn)::DOUBLE / n.nn) / " +
            "((rn * cn)::DOUBLE / n.nn)",
          6
        ) + " AS contrib " +
        "FROM g CROSS JOIN n ORDER BY 1, 2"
    ),
    (spark, dir) => {
      val c = Tables
        .orders(spark, dir)
        .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("s"))
        .agg(count(lit(1)).as("obs"))
      val rp = c.groupBy(col("p")).agg(sum(col("obs")).as("rn"))
      val cst = c.groupBy(col("s")).agg(sum(col("obs")).as("cn"))
      val n = c.agg(sum(col("obs")).as("nn"))
      val e = (col("rn") * col("cn")).cast("double") / col("nn")
      rp.crossJoin(broadcast(cst))
        .join(c, Seq("p", "s"), "left")
        .na.fill(0L, Seq("obs"))
        .crossJoin(broadcast(n))
        .select(
          col("p").as("o_orderpriority"),
          col("s").as("o_orderstatus"),
          col("obs"),
          Det.rN(e, 6).as("expected"),
          Det.rN((col("obs").cast("double") - e) * (col("obs").cast("double") - e) / e, 6).as("contrib")
        )
        .orderBy(col("o_orderpriority"), col("o_orderstatus"))
    }
  )

  /** Mutual information between the two categorical document
    * dimensions (lang × source) plus both marginal entropies and the
    * normalized MI — the information-theoretic companion to
    * [[mlChi2]]'s frequency test (feature-selection ranking uses MI
    * directly; NMI ∈ [0,1] is the comparable-across-features form).
    *
    * Determinism: all counts are exact integers; each cell term
    * `(obs/n)·ln(obs·n/(rn·cn))` and entropy term are identical IEEE
    * chains in both engines (products ≤ n² fit exactly in a double);
    * the three sums go through the order-independent decimal sum, so
    * `nmi = mi / min(h_lang, h_source)` divides identical values.
    *
    * 100 TB: one groupBy on the tiny (lang, source) cell key with
    * map-side combine; everything downstream re-aggregates the
    * |lang|·|source|-row cell table — the fact scan happens once. */
  val mlMutualInfo: Q = Q(
    "ml_mutual_info",
    Some(
      "WITH c AS (SELECT lang, source, cast(count(*) as bigint) AS obs FROM documents GROUP BY 1, 2), " +
        "rl AS (SELECT lang, cast(sum(obs) as bigint) AS rn FROM c GROUP BY 1), " +
        "cs AS (SELECT source, cast(sum(obs) as bigint) AS cn FROM c GROUP BY 1), " +
        "n AS (SELECT cast(sum(obs) as bigint) AS nn FROM c), " +
        "mi AS (SELECT " +
        Det.oSum("(obs::DOUBLE / nn) * ln((obs::DOUBLE * nn) / (rn::DOUBLE * cn))") +
        " AS mi FROM c JOIN rl USING (lang) JOIN cs USING (source) CROSS JOIN n), " +
        "hl AS (SELECT " +
        Det.oSum("-(rn::DOUBLE / nn) * ln(rn::DOUBLE / nn)") +
        " AS h FROM rl CROSS JOIN n), " +
        "hs AS (SELECT " +
        Det.oSum("-(cn::DOUBLE / nn) * ln(cn::DOUBLE / nn)") +
        " AS h FROM cs CROSS JOIN n) " +
        "SELECT " + Det.oRS("mi.mi", 6) + " AS mi, " +
        Det.oRN("hl.h", 6) + " AS h_lang, " +
        Det.oRN("hs.h", 6) + " AS h_source, " +
        Det.oRS("mi.mi / least(hl.h, hs.h)", 6) + " AS nmi " +
        "FROM mi CROSS JOIN hl CROSS JOIN hs"
    ),
    (spark, dir) => {
      val c = Tables
        .documents(spark, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("obs"))
      val rl = c.groupBy(col("lang")).agg(sum(col("obs")).as("rn"))
      val cs = c.groupBy(col("source")).agg(sum(col("obs")).as("cn"))
      val n  = c.agg(sum(col("obs")).as("nn"))
      val term = (col("obs").cast("double") / col("nn")) *
        log((col("obs").cast("double") * col("nn")) / (col("rn").cast("double") * col("cn")))
      val mi = c
        .join(broadcast(rl), Seq("lang"))
        .join(broadcast(cs), Seq("source"))
        .crossJoin(broadcast(n))
        .agg(Det.dsum(term).as("mi"))
      def entropy(m: DataFrame, cnt: String, out: String): DataFrame = {
        val p = col(cnt).cast("double") / col("nn")
        m.crossJoin(broadcast(n)).agg(Det.dsum(-p * log(p)).as(out))
      }
      val hl = entropy(rl, "rn", "h_lang")
      val hs = entropy(cs, "cn", "h_source")
      mi.crossJoin(broadcast(hl))
        .crossJoin(broadcast(hs))
        .select(
          Det.rS(col("mi"), 6).as("mi"),
          Det.rN(col("h_lang"), 6).as("h_lang"),
          Det.rN(col("h_source"), 6).as("h_source"),
          Det.rS(col("mi") / least(col("h_lang"), col("h_source")), 6).as("nmi")
        )
    }
  )

  /** Logistic regression by 3 unrolled full-batch gradient-descent
    * steps (lr = 2, w₀ = 0) on two order features — the canonical
    * distributed-GD execution shape: each step is ONE scan with a
    * 4-double map-side partial aggregate, the weight vector rides into
    * the next step as plan literals (a broadcast of 3 doubles), and
    * driver state is just those weights — exactly how full-batch GD
    * runs on 100 TB. The oracle unrolls the same three steps as
    * chained CTEs, proving the iteration is pure dataflow.
    *
    * Determinism: σ(z) = 1/(1+e⁻ᶻ) is an identical IEEE chain on
    * identical inputs in both engines; each gradient component goes
    * through the order-independent decimal sum, so the collected
    * weights are bit-identical to the CTE-computed ones; accuracy is
    * an exact-integer count and the log-loss is decimal-summed —
    * both trunc-rounded 6 dp.
    */
  val mlLogregGd: Q = {
    val featSql = "SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y, " +
      "1.0 AS x0, o_totalprice / 500000.0 AS x1, " +
      "substr(o_orderpriority, 1, 1)::INT / 5.0 AS x2 FROM orders"
    val pSql = "1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2)))"
    def stepSql(i: Int): String = {
      val prev = s"ww${i - 1}"
      s"g$i AS (SELECT " +
        Seq(0, 1, 2).map(j => Det.oSum(s"(($pSql) - y) * x$j") + s" AS s$j").mkString(", ") +
        s" FROM f CROSS JOIN $prev), " +
        s"ww$i AS (SELECT " +
        Seq(0, 1, 2).map(j => s"w$j - 2.0 * (s$j / n) AS w$j").mkString(", ") +
        s" FROM g$i CROSS JOIN $prev CROSS JOIN n)"
    }
    Q(
      "ml_logreg_gd",
      Some(
        s"WITH f AS ($featSql), " +
          "n AS (SELECT count(*)::DOUBLE AS n FROM f), " +
          "ww0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2), " +
          Seq(1, 2, 3).map(stepSql).mkString(", ") + ", " +
          s"a AS (SELECT sum(CASE WHEN (($pSql) > 0.5) = (y = 1.0) THEN 1 ELSE 0 END)::DOUBLE AS an, " +
          Det.oSum(s"-(y * ln($pSql) + (1.0 - y) * ln(1.0 - ($pSql)))") + " AS ls " +
          "FROM f CROSS JOIN ww3) " +
          "SELECT " + Det.oRS("w0", 6) + " AS w0, " + Det.oRS("w1", 6) + " AS w1, " +
          Det.oRS("w2", 6) + " AS w2, " +
          Det.oRN("an / n", 6) + " AS accuracy, " + Det.oRN("ls / n", 6) + " AS log_loss " +
          "FROM ww3 CROSS JOIN a CROSS JOIN n"
      ),
      (spark, dir) => {
        def feats: DataFrame = Tables
          .orders(spark, dir)
          .select(
            when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"),
            lit(1.0).as("x0"),
            (col("o_totalprice") / 500000.0).as("x1"),
            (substring(col("o_orderpriority"), 1, 1).cast("int") / 5.0).as("x2")
          )
        def sigmoid(w: Array[Double]) = {
          val z = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
          lit(1.0) / (lit(1.0) + exp(-z))
        }
        var w = Array(0.0, 0.0, 0.0)
        for (_ <- 1 to 3) {
          val p = sigmoid(w)
          val r = feats
            .agg(
              Det.dsum((p - col("y")) * col("x0")).as("s0"),
              Det.dsum((p - col("y")) * col("x1")).as("s1"),
              Det.dsum((p - col("y")) * col("x2")).as("s2"),
              count(lit(1)).as("n")
            )
            .collect()(0)
          val n = r.getLong(3).toDouble
          w = Array.tabulate(3)(j => w(j) - 2.0 * (r.getDouble(j) / n))
        }
        val p = sigmoid(w)
        feats
          .agg(
            sum(when((p > 0.5) === (col("y") === 1.0), 1).otherwise(0)).cast("double").as("an"),
            Det.dsum(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))).as("ls"),
            count(lit(1)).cast("double").as("n")
          )
          .select(
            Det.rS(lit(w(0)), 6).as("w0"),
            Det.rS(lit(w(1)), 6).as("w1"),
            Det.rS(lit(w(2)), 6).as("w2"),
            Det.rN(col("an") / col("n"), 6).as("accuracy"),
            Det.rN(col("ls") / col("n"), 6).as("log_loss")
          )
      }
    )
  }

  /** Welch's unequal-variance t-test of mean `value` between the
    * click and purchase event populations — the A/B-experimentation
    * primitive (difference in means, Welch standard error, t
    * statistic, Welch–Satterthwaite dof). Completes the eval kit
    * next to [[mlKsTest]] (distribution-free twin) and
    * `sample_bootstrap_ci` (the resampling route to the same
    * uncertainty). No p-value on purpose: that needs the t CDF,
    * whose implementations differ across engines — the statistic and
    * dof are the deterministic, judgeable outputs.
    *
    * Determinism: per-group n/Σx/Σx² go through the decimal sum;
    * variance, se, t, and dof are identical IEEE chains on those
    * aggregates in both engines, trunc-rounded.
    *
    * 100 TB: one filtered scan with a 2-group partial aggregate —
    * six doubles cross the wire; everything after is scalar algebra
    * on a broadcast 1-row pair. */
  val mlTtestWelch: Q = {
    def sideSql(t: String, s: String) =
      s"$s AS (SELECT count(*)::DOUBLE AS n, ${Det.oSum("value")} AS sx, " +
        s"${Det.oSum("value * value")} AS sxx FROM events WHERE event_type = '$t')"
    Q(
      "ml_ttest_welch",
      Some(
        s"WITH ${sideSql("click", "a")}, ${sideSql("purchase", "b")}, " +
          "v AS (SELECT a.n AS na, b.n AS nb, a.sx / a.n AS ma, b.sx / b.n AS mb, " +
          "(a.sxx - a.sx * a.sx / a.n) / (a.n - 1) / a.n AS qa, " +
          "(b.sxx - b.sx * b.sx / b.n) / (b.n - 1) / b.n AS qb " +
          "FROM a CROSS JOIN b) " +
          "SELECT cast(na as bigint) AS n_click, cast(nb as bigint) AS n_purchase, " +
          Det.oRN("ma", 4) + " AS mean_click, " + Det.oRN("mb", 4) + " AS mean_purchase, " +
          Det.oRS("ma - mb", 4) + " AS diff, " +
          Det.oRN("sqrt(qa + qb)", 6) + " AS se, " +
          Det.oRS("(ma - mb) / sqrt(qa + qb)", 4) + " AS t_stat, " +
          Det.oRN(
            "((qa + qb) * (qa + qb)) / (qa * qa / (na - 1) + qb * qb / (nb - 1))",
            2
          ) + " AS dof " +
          "FROM v"
      ),
      (spark, dir) => {
        def side(t: String) = Tables
          .events(spark, dir)
          .filter(col("event_type") === t)
          .agg(
            count(lit(1)).cast("double").as("n"),
            Det.dsum(col("value")).as("sx"),
            Det.dsum(col("value") * col("value")).as("sxx")
          )
        def q(n: Column, sx: Column, sxx: Column): Column =
          (sxx - sx * sx / n) / (n - 1) / n
        val a = side("click").select(col("n").as("na"), col("sx").as("sxa"), col("sxx").as("sxxa"))
        val b = side("purchase").select(col("n").as("nb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
        val ma = col("sxa") / col("na")
        val mb = col("sxb") / col("nb")
        val qa = q(col("na"), col("sxa"), col("sxxa"))
        val qb = q(col("nb"), col("sxb"), col("sxxb"))
        a.crossJoin(broadcast(b))
          .select(
            col("na").cast("long").as("n_click"),
            col("nb").cast("long").as("n_purchase"),
            Det.rN(ma, 4).as("mean_click"),
            Det.rN(mb, 4).as("mean_purchase"),
            Det.rS(ma - mb, 4).as("diff"),
            Det.rN(sqrt(qa + qb), 6).as("se"),
            Det.rS((ma - mb) / sqrt(qa + qb), 4).as("t_stat"),
            Det.rN(
              ((qa + qb) * (qa + qb)) / (qa * qa / (col("na") - 1) + qb * qb / (col("nb") - 1)),
              2
            ).as("dof")
          )
      }
    )
  }

  def qs: Seq[Q] = Seq(
    mlKmeans, mlNaiveBayes, mlKsTest, mlFeatureBins, mlConfusionMatrix, mlAuc, mlCalibration,
    mlPrCurve, mlLiftGains, mlPsi, mlChi2, mlMutualInfo, mlLogregGd, mlTtestWelch
  )
}
