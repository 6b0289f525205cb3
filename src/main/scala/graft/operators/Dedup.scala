package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact hash,
  * token-set Jaccard, n-gram-shingle Jaccard, SimHash, MinHash-LSH.
  *
  * 100 TB notes: exact dedup is one hash-shuffle (map-side partial agg
  * on the 256-bit key). The pairwise-Jaccard operators block on
  * language and prefilter on distinct-token-count ratio (jac ≥ t ⇒
  * min(n)/max(n) ≥ t), cutting the quadratic candidate set before any
  * set intersection runs; at real scale the LSH variants below replace
  * the quadratic step entirely — MinHash banding turns near-dup search
  * into an equi-join on band signatures, and SimHash reduces each doc
  * to one 60-bit integer joinable on rotated prefixes. Both are
  * shuffle-based with no driver-side state.
  */
object Dedup {

  private def toks(c: Column): Column = array_distinct(split(c, " "))

  /** Exact-duplicate groups by sha256(text): group size + surviving
    * (minimum) doc_id per distinct text. */
  val dedupExact: Q = Q(
    "dedup_exact",
    Some(
      "SELECT sha256(text) AS text_sha, count(*) AS n_copies, min(doc_id) AS keeper " +
        "FROM documents GROUP BY 1 ORDER BY text_sha"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .groupBy(sha2(col("text"), 256).as("text_sha"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
        .orderBy(col("text_sha"))
  )

  /** Near-duplicate pairs by distinct-token-set Jaccard ≥ 0.8 with
    * same-language blocking and the count-ratio prefilter (5·min ≥
    * 4·max, exact integer arithmetic). The Jaccard itself is a ratio of
    * small ints — bit-identical across engines. */
  val dedupNearJaccard: Q = Q(
    "dedup_near_jaccard",
    Some(
      "WITH d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t FROM documents), " +
        "p AS (SELECT a.doc_id ida, b.doc_id idb, " +
        "len(list_intersect(a.t, b.t))::DOUBLE / len(list_distinct(a.t || b.t)) AS jac " +
        "FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
        "AND 5 * least(len(a.t), len(b.t)) >= 4 * greatest(len(a.t), len(b.t))) " +
        "SELECT ida, idb, " + Det.oRN("jac", 6) + " AS jac FROM p WHERE jac >= 0.8 " +
        "ORDER BY ida, idb"
    ),
    (spark, dir) => {
      val d = Tables
        .documents(spark, dir)
        .select(col("doc_id"), col("lang"), toks(col("text")).as("t"), size(toks(col("text"))).as("nt"))
      val a = d.select(col("doc_id").as("ida"), col("lang"), col("t").as("ta"), col("nt").as("na"))
      val b = d.select(col("doc_id").as("idb"), col("lang"), col("t").as("tb"), col("nt").as("nb"))
      a.join(b, Seq("lang"))
        .filter(
          col("ida") < col("idb") &&
            lit(5) * least(col("na"), col("nb")) >= lit(4) * greatest(col("na"), col("nb"))
        )
        .withColumn(
          "jac",
          size(array_intersect(col("ta"), col("tb")))
            .cast("double") / size(array_union(col("ta"), col("tb")))
        )
        .filter(col("jac") >= 0.8)
        .select(col("ida"), col("idb"), Det.rN(col("jac"), 6).as("jac"))
        .orderBy(col("ida"), col("idb"))
    }
  )

  /** Near-dup pairs on token-BIGRAM shingles (n-gram Jaccard): stricter
    * than token sets because it is order-sensitive. Bounded to doc_id <
    * 200 per side to keep the verified output small. */
  val dedupNgramJaccard: Q = Q(
    "dedup_ngram_jaccard",
    Some(
      "WITH d AS (SELECT doc_id, lang, list_distinct(list_filter(" +
        "list_transform(list_zip(string_split(text, ' '), string_split(text, ' ')[2:]), " +
        "x -> x[1] || ' ' || x[2]), v -> v IS NOT NULL)) AS s " +
        "FROM documents WHERE doc_id < 200), " +
        "p AS (SELECT a.doc_id ida, b.doc_id idb, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jac " +
        "FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id) " +
        "SELECT ida, idb, " + Det.oRN("jac", 6) + " AS jac FROM p WHERE jac >= 0.6 " +
        "ORDER BY ida, idb"
    ),
    (spark, dir) => {
      val t = split(col("text"), " ")
      val shingles = array_distinct(
        filter(
          zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))), (x, y) => concat(x, lit(" "), y)),
          v => v.isNotNull
        )
      )
      val d = Tables
        .documents(spark, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), col("lang"), shingles.as("s"))
      val a = d.select(col("doc_id").as("ida"), col("lang"), col("s").as("sa"))
      val b = d.select(col("doc_id").as("idb"), col("lang"), col("s").as("sb"))
      a.join(b, Seq("lang"))
        .filter(col("ida") < col("idb"))
        .withColumn(
          "jac",
          size(array_intersect(col("sa"), col("sb")))
            .cast("double") / size(array_union(col("sa"), col("sb")))
        )
        .filter(col("jac") >= 0.6)
        .select(col("ida"), col("idb"), Det.rN(col("jac"), 6).as("jac"))
        .orderBy(col("ida"), col("idb"))
    }
  )

  /** 60-bit SimHash per document from md5-derived token hashes: for
    * each bit, sum ±1 contributions over distinct tokens; the sign
    * becomes the bit. Pure integer arithmetic — identical in DuckDB.
    * At scale, near-dups are found by joining on rotated simhash
    * prefixes (Hamming ≤ k); here the verified artifact is the
    * signature itself. */
  val dedupSimhash: Q = Q(
    "dedup_simhash",
    Some(
      "WITH tok AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h " +
        "FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM documents)), " +
        "bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s " +
        "FROM tok CROSS JOIN (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b) " +
        "SELECT doc_id, cast(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) as bigint) AS simhash " +
        "FROM bits GROUP BY doc_id ORDER BY doc_id"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), explode(toks(col("text"))).as("t"))
        .select(col("doc_id"), conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
        .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(59))).as("b"))
        .groupBy(col("doc_id"), col("b"))
        .agg(sum(when(expr("(h >> b) & 1") === 1, 1).otherwise(-1)).as("s"))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), b)")).otherwise(0L))
            .cast("long")
            .as("simhash")
        )
        .orderBy(col("doc_id"))
  )

  /** MinHash-LSH candidate pairs via spark.ml (no oracle — sketch
    * internals are engine-specific; recall vs exact Jaccard is
    * property-tested in DedupSpec). Fixed seed keeps it deterministic.
    * This is the 100 TB near-dup path: banding turns the quadratic
    * compare into an equi-join on hash-band keys. */
  val dedupMinhashLsh: Q = Q(
    "dedup_minhash_lsh",
    None,
    (spark, dir) => minhashPairs(spark, dir, 0.2)
  )

  private[graft] def minhashPairs(spark: SparkSession, dir: String, maxDist: Double): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
    val tf = new HashingTF()
      .setInputCol("t")
      .setOutputCol("features")
      .setNumFeatures(1024)
      .setBinary(true)
    val feat = tf.transform(docs).filter(size(col("t")) > 0)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig").setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feat)
    model
      .approxSimilarityJoin(feat, feat, maxDist, "dist")
      .select(
        col("datasetA.doc_id").as("ida"),
        col("datasetB.doc_id").as("idb"),
        Det.rN(lit(1.0) - col("dist"), 6).as("est_jac")
      )
      .filter(col("ida") < col("idb"))
      .orderBy(col("ida"), col("idb"))
  }

  def qs: Seq[Q] = Seq(dedupExact, dedupNearJaccard, dedupNgramJaccard, dedupSimhash, dedupMinhashLsh)
}
