package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style similarity search and event-funnel analysis.
  *
  * IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
  * a list; queries search only the nearest `nprobe` lists. Here the
  * coarse lists are per-label centroids (computed by the engine itself,
  * oracle-checked); at 100 TB the centroid table stays tiny (one row
  * per list) and broadcasts, list assignment is a map-side argmin, and
  * the candidate search is an equi-join on list id — the same
  * shuffle-shape as the LSH variant but with learned/structured lists.
  */
object Advanced {

  /** Per-label centroids of the embedding vectors, emitted as
    * (label, dim, value) rows. Mean per dimension via the
    * order-independent decimal sum (§2.9.2). */
  val ivfCentroids: Q = Q(
    "ivf_centroids",
    Some(
      "WITH e AS (SELECT label, unnest(embedding) AS v, unnest(range(1, 65)) AS dim " +
        "FROM embeddings) " +
        "SELECT label, dim, " +
        Det.oRS("cast(sum(cast(v::DOUBLE as decimal(30,8))) as double) / count(*)", 6) + " AS c " +
        "FROM e GROUP BY label, dim ORDER BY label, dim"
    ),
    (spark, dir) =>
      Tables
        .embeddings(spark, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("label"), (col("pos0") + 1).cast("long").as("dim"), col("v").cast("double").as("v"))
        .groupBy(col("label"), col("dim"))
        .agg(Det.rS(Det.dsum(col("v")) / count(lit(1)), 6).as("c"))
        .orderBy(col("label"), col("dim"))
  )

  /** Centroid per label as an array column (collapsed onto ~10 rows —
    * the coarse quantizer is tiny by construction and broadcasts).
    * Decimal-sum mean: partition-order-independent, so repeated runs
    * assign vectors to identical lists. */
  private def centroidTable(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label"), col("p"))
      .agg((Det.dsum(col("v").cast("double")) / count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("p"), col("c")))).as("pc"))
      .select(col("label").as("list_id"), transform(col("pc"), x => x.getField("c")).as("centroid"))

  /** Dot of every src vector against every list centroid (10 lists);
    * built per caller so the probe side filters BEFORE the cross join.
    * Keeps all src columns + (list_id, d). */
  private def withDist(src: DataFrame, cent: DataFrame): DataFrame = src
    .crossJoin(broadcast(cent))
    .withColumn(
      "d",
      aggregate(
        zip_with(col("embedding"), col("centroid"), (x, c) => x.cast("double") * c),
        lit(0.0),
        (acc, x) => acc + x
      )
    )
    .drop("centroid")

  /** Exact cosine re-rank of list-collision candidates: probes search
    * their nearest `nprobe` lists, candidates come from one equi-join
    * on list_id, top-3 via the map-side-pruning custom operator. */
  private def ivfProbe(probes: DataFrame, assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.TopKPerGroup
    // the probe side is |queries|·nprobe rows BY CONSTRUCTION — pin it
    // as the broadcast build side so the inverted lists (the 100 TB
    // side) stream; without the hint, local size estimates can invert
    // the choice and broadcast the base
    val cands = broadcast(probes)
      .join(
        assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("list_id")),
        Seq("list_id")
      )
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Det.rS(org.apache.spark.sql.graftx.FloatDot.dot(col("qe"), col("ne")), 6))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("list_id"))
    TopKPerGroup(cands, Seq("query_id"), Seq("cos" -> true, "neighbor_id" -> false), 3, rnName = "rank")
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        col("cos"), col("list_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF ANN: assign each vector to its nearest label-centroid list
    * (map-side argmin over the broadcast centroid table), then search
    * the probe's nearest 2 lists only. ORACLE-checked (upgraded from
    * no-oracle): every stage is deterministic — decimal-sum centroids,
    * sequential-fold assignment dots (bit-identical to DuckDB
    * list_dot_product, the same equivalence [[dedupSemantic]]'s oracle
    * rests on), 6-dp-rounded candidate cosine with neighbor_id
    * tiebreaks — so the full quantize→probe→re-rank cascade
    * hash-matches SQL; recall vs brute force stays property-tested in
    * AdvancedSpec. */
  /** The coarse-quantizer CTE fragment shared by the IVF rows and the
    * IVF-PQ row: decimal-mean centroids `cl`, full-corpus nearest-list
    * assignment `asg` (label/embedding carried for downstream residual
    * computation), and the nprobe=2 probe side `pro`. `cl` is
    * MATERIALIZED — the residual chain references it three times and
    * DuckDB's default inlining re-evaluates a CTE per reference. */
  private def ivfCoarseCtesK(probeK: Int): String =
    "u AS (SELECT label, unnest(embedding) AS v, unnest(range(1, 65)) AS dim " +
      "FROM embeddings), " +
      "cm AS (SELECT label, dim, " +
      "cast(sum(cast(v::DOUBLE as decimal(30,8))) as double) / count(*) AS c " +
      "FROM u GROUP BY label, dim), " +
      "cl AS MATERIALIZED (SELECT label AS list_id, list(c ORDER BY dim) AS centroid " +
      "FROM cm GROUP BY label), " +
      "ad AS (SELECT e.vec_id, e.label, e.embedding, cl.list_id, " +
      "list_dot_product(e.embedding::DOUBLE[], cl.centroid) AS d " +
      "FROM embeddings e CROSS JOIN cl), " +
      "asg AS (SELECT vec_id, label, embedding, list_id FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, list_id) AS r FROM ad) " +
      "WHERE r = 1), " +
      "pro AS (SELECT vec_id AS query_id, embedding AS qe, list_id, r AS prank FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, list_id) AS r " +
      s"FROM ad WHERE vec_id < 100) WHERE r <= $probeK)"

  private val ivfCoarseCtes: String = ivfCoarseCtesK(2)

  private val ivfOracleSql: String =
      s"WITH $ivfCoarseCtes, " +
        "cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, " +
        Det.oRS("list_dot_product(p.qe::DOUBLE[], a.embedding::DOUBLE[])", 6) + " AS cos, " +
        "a.list_id FROM pro p JOIN asg a USING (list_id) WHERE p.query_id != a.vec_id), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) " +
        "AS rank FROM cand) " +
        "SELECT query_id, rank, neighbor_id, cos, list_id FROM r WHERE rank <= 3 " +
        "ORDER BY query_id, rank"

  val simAnnIvf: Q = Q(
    "sim_ann_ivf",
    Some(ivfOracleSql),
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      val cent = centroidTable(spark, dir)
      import org.apache.spark.sql.graftx.TopKPerGroup
      // argmin assignment / nprobe selection via the custom top-k
      // operator: all 10 centroid rows of a vector sit in one scan
      // partition, so the partial collapses them map-side — the
      // exchange moves 1 (resp. 2) rows per vector, not 10
      val assigned = TopKPerGroup(withDist(e, cent), Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 1)
        .select(col("vec_id"), col("embedding"), col("list_id"))
      val probes = TopKPerGroup(
        withDist(e.filter(col("vec_id") < 100), cent),
        Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 2) // nprobe = 2
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("list_id"))
      ivfProbe(probes, assigned)
    }
  )

  /** Where the persisted IVF index lives for a given sf dir, and the
    * per-session build-once cache. A real pipeline builds the index in
    * one job and serves many query batches from it; recomputing
    * signatures per query (as the demo variants above do) re-pays the
    * full base-table pass every time. The index is two parquet tables —
    * `centroids` (the coarse quantizer, ~|lists| rows) and
    * `assignments` (vec_id, embedding, list_id — the inverted lists,
    * |base| rows, list_id-partitionable at scale). */
  /** (centroids path, assignments path) — two [[graft.ViewStore]]
    * materializations (input-fingerprinted staleness key, write-to-temp
    * + rename for the cross-JVM race) replacing an earlier ad-hoc cache
    * that keyed on 32-bit `dir.hashCode` and REWROTE the index on every
    * new JVM (two processes sharing a tmpdir could clobber each other
    * mid-read). The assignments build reads the materialized centroids
    * parquet, so both tables derive from one consistent quantizer. */
  /** Nearest-list assignment of ANY (vec_id, embedding) frame against
    * a FIXED centroid table — a pure per-vector function once the
    * quantizer is frozen (broadcast argmin, map-side), which is what
    * makes the inverted lists micro-batch-maintainable: the streaming
    * ingest ([[graft.streaming.StreamDemos.streamedIvfAssignments]])
    * runs this same projection per batch against the PERSISTED
    * quantizer and merges by vec_id; a replayed vector recomputes the
    * identical row. Retraining centroids is a new index build (a new
    * buildVersion/snapshot), never a streaming concern — the standard
    * IVF serving contract. */
  private[graft] def ivfAssignmentsOf(embs: DataFrame, cent: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.TopKPerGroup
    TopKPerGroup(withDist(embs, cent), Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 1)
      .select(col("vec_id"), col("embedding"), col("list_id"))
  }

  private[graft] def ivfIndexPath(spark: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val centPath =
      graft.ViewStore.materialize(spark, "graft_ivf_index/centroids", dir)(centroidTable(spark, dir))
    val asgPath = graft.ViewStore.materialize(spark, "graft_ivf_index/assignments", dir)(
      ivfAssignmentsOf(Tables.embeddings(spark, dir), spark.read.parquet(centPath))
    )
    (centPath, asgPath)
  }

  /** IVF ANN served from the PERSISTED index: the quantizer and the
    * inverted lists are read back from parquet — only the 100 probe
    * vectors are quantized at query time; the base table is never
    * re-scanned. AdvancedSpec asserts (a) result equality with the
    * recomputing sim_ann_ivf and (b) that this plan's base side is a
    * parquet scan of the index path, not an aggregate. Shares
    * [[ivfOracleSql]]: index persistence must be result-invisible, so
    * the oracle is the same recomputing SQL. */
  val simAnnIvfPersisted: Q = Q(
    "sim_ann_ivf_persisted",
    Some(ivfOracleSql),
    (spark, dir) => {
      val (centPath, asgPath) = ivfIndexPath(spark, dir)
      val cent = spark.read.parquet(centPath)
      val assigned = spark.read.parquet(asgPath)
      import org.apache.spark.sql.graftx.TopKPerGroup
      val probes = TopKPerGroup(
        withDist(Tables.embeddings(spark, dir).filter(col("vec_id") < 100), cent),
        Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 2)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("list_id"))
      ivfProbe(probes, assigned)
    }
  )

  /** SemDeDup (Abbas et al.): semantic dedup scoped to coarse embedding
    * clusters. Every vector is assigned to its nearest centroid list
    * (the same map-side argmax quantization as [[simAnnIvf]]); WITHIN
    * each cluster, vectors with a lower-id neighbor at cosine ≥ 0.3 are
    * marked dropped (the pair-screen approximation of greedy
    * keep-one-representative); the output is the per-cluster curation
    * report. This is the embedding-space member of the dedup family —
    * it catches semantic duplicates that share no tokens, which the
    * Jaccard/minhash/simhash screens cannot see.
    *
    * Determinism: centroids are decimal-sum means; both the assignment
    * dot and the pair cosine are sequential element-order folds
    * (bit-identical to DuckDB's list_dot_product); the pair cosine is
    * 6-dp trunc-rounded before the threshold; counts are exact.
    *
    * 100 TB: this is exactly why SemDeDup clusters first — the
    * quadratic pair join runs per cluster, so cost is Σ|cluster|², not
    * |corpus|²; with k clusters sized |corpus|/k the work drops by k×,
    * and k scales with the corpus (here k = the 10-label quantizer;
    * production uses k ~ 10⁵ so clusters stay bounded). Assignment is
    * map-side against the broadcast centroid table. */
  val dedupSemantic: Q = Q(
    "dedup_semantic",
    Some(
      "WITH u AS (SELECT label, unnest(embedding) AS v, unnest(range(1, 65)) AS dim " +
        "FROM embeddings), " +
        "cm AS (SELECT label, dim, " +
        "cast(sum(cast(v::DOUBLE as decimal(30,8))) as double) / count(*) AS c " +
        "FROM u GROUP BY label, dim), " +
        "cl AS (SELECT label AS list_id, list(c ORDER BY dim) AS centroid FROM cm GROUP BY label), " +
        "ad AS (SELECT e.vec_id, e.embedding, cl.list_id, " +
        "list_dot_product(e.embedding::DOUBLE[], cl.centroid) AS d " +
        "FROM embeddings e CROSS JOIN cl), " +
        "asg AS (SELECT vec_id, embedding, list_id FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, list_id) AS r FROM ad) " +
        "WHERE r = 1), " +
        "pr AS (SELECT a.list_id, a.vec_id AS ia, b.vec_id AS ib " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id AND a.vec_id < b.vec_id " +
        "WHERE " + Det.oRS("list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])", 6) +
        " >= 0.3), " +
        "nv AS (SELECT list_id, cast(count(*) as bigint) AS n_vecs FROM asg GROUP BY list_id), " +
        "dp AS (SELECT list_id, cast(count(DISTINCT ib) as bigint) AS n_dropped, " +
        "cast(count(*) as bigint) AS n_dup_pairs FROM pr GROUP BY list_id) " +
        "SELECT nv.list_id, nv.n_vecs, coalesce(dp.n_dropped, 0) AS n_dropped, " +
        "nv.n_vecs - coalesce(dp.n_dropped, 0) AS n_kept, " +
        "coalesce(dp.n_dup_pairs, 0) AS n_dup_pairs " +
        "FROM nv LEFT JOIN dp ON nv.list_id = dp.list_id ORDER BY nv.list_id"
    ),
    (spark, dir) => {
      // cell assignments come from the persisted IVF index — the same
      // (vec_id, embedding, list_id) table sim_ann_ivf_persisted
      // serves from, built once per corpus snapshot. Semantic dedup at
      // scale mines the ANN index the pipeline already wrote; it does
      // not re-quantize the corpus (bit-identical either way: the
      // index IS TopKPerGroup(withDist(e, centroidTable), 1)).
      val (_, asgPath) = ivfIndexPath(spark, dir)
      val assigned = spark.read.parquet(asgPath)
      val pr = assigned
        .select(col("list_id"), col("vec_id").as("ia"), col("embedding").as("ea"))
        .join(
          assigned.select(col("list_id"), col("vec_id").as("ib"), col("embedding").as("eb")),
          Seq("list_id")
        )
        .filter(col("ia") < col("ib"))
        .filter(
          Det.rS(org.apache.spark.sql.graftx.FloatDot.dot(col("ea"), col("eb")), 6) >= 0.3
        )
        .select(col("list_id"), col("ia"), col("ib"))
      val nv = assigned.groupBy(col("list_id")).agg(count(lit(1)).as("n_vecs"))
      val dp = pr
        .groupBy(col("list_id"))
        .agg(countDistinct(col("ib")).as("n_dropped"), count(lit(1)).as("n_dup_pairs"))
      nv.join(dp, Seq("list_id"), "left")
        .select(
          col("list_id"),
          col("n_vecs"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"),
          coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs")
        )
        .orderBy(col("list_id"))
    }
  )

  /** View → click → purchase funnel per user: first view, first click
    * at-or-after it, first purchase at-or-after that; all min()s, so
    * every emitted timestamp is deterministic. */
  val funnelVcp: Q = Q(
    "funnel_vcp",
    Some(
      "WITH v AS (SELECT user_id, min(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN v ON e.user_id = v.user_id " +
        "WHERE e.event_type = 'click' AND e.ts >= v.vt GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts >= c.ct GROUP BY e.user_id) " +
        "SELECT v.user_id, v.vt, c.ct, p.pt FROM v " +
        "LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id " +
        "ORDER BY v.user_id"
    ),
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
      val v = ev
        .filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("vt"))
      val c = ev
        .filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") >= col("vt"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("ct"))
      val p = ev
        .filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") >= col("ct"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("pt"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("vt"), col("ct"), col("pt"))
        .orderBy(col("user_id"))
    }
  )

  // ----------------------------------------------------------------
  // Product quantization (PQ) — the memory-side ANN scale path, the
  // complement of the IVF list pruning above: the 64-dim float vector
  // (256 B) is compressed to M = 8 one-byte codes by quantizing each
  // 8-dim SUBVECTOR against its own sub-codebook, and queries score
  // candidates with an asymmetric-distance (ADC) table — M lookups +
  // adds per candidate instead of a 64-wide float dot, over an index
  // 32x smaller than the raw vectors (Jégou et al., TPAMI 2011). At
  // 100 TB this is what keeps the base scan in memory: the codes
  // table is bytes per vector, the per-query distance table is
  // M x K = 80 floats, and the ADC scan is an equi-join on (m, code)
  // against a broadcast table. Like the IVF quantizer, the
  // sub-codebooks here are per-label subvector means — deterministic,
  // engine-replayable "training" (the same move that made
  // ivf_centroids oracle-checkable), so the ENTIRE
  // codebook -> encode -> ADC cascade hash-matches a DuckDB replay:
  // all distances go through the order-independent decimal sum and
  // every argmin/top-k carries a total-order tie-break.
  // ----------------------------------------------------------------

  private val PqM      = 8 // subspaces
  private val PqSubDim = 8 // dims per subspace (8 x 8 = the 64-dim contract)

  /** Lloyd refinement iterations over the label-mean seeds (cid = label*8 + vec_id%8, K = 80 codewords
    * per subspace). Label means alone quantize POORLY — labels cluster the FULL vector, so the 10
    * per-label subvector means are near-duplicates inside each
    * subspace (measured recall@3 vs exact: 0.117). Each iteration is
    * the deterministic, engine-replayable pair (argmin assignment with
    * a total-order tie-break -> decimal-mean recompute, empty cells
    * keeping their previous codeword), so the oracle replays the whole
    * training loop symbolically. Measured at sf0.01 (recall@3 of the
    * re-rank row vs exact cosine / mean distortion): label-mean seeds
    * alone 0.22 / 0.109; +2 Lloyd iters 0.31 / 0.082; K=40 hash-split
    * seeds 0.52 / 0.054; K=80 (shipped) 0.72 / 0.041 — the hash-split
    * seeds start near-redundant (a random subset's mean ~= the label
    * mean) but the assignment cells separate them within two
    * iterations. */
  private val PqIters = 2

  /** Generate the training CTE chain over any source table carrying
    * (vec_id, label, <vector>): seeds (cid = label*split + vec_id%split
    * — K = 10*split codewords per subspace), [[PqIters]] Lloyd
    * refinements, final `cb`/`sdl`/`sd`. The base PQ family
    * instantiates it over raw `embeddings` (split = 8); the IVF-PQ row
    * instantiates it over the residual CTE (split = [[IvfPqSeedSplit]]
    * — residuals carry far less variance, so a smaller codebook
    * suffices). `cb{i}` CTEs are MATERIALIZED: each is referenced twice
    * by the next iteration and DuckDB's default inlining re-evaluates
    * the whole chain per reference.
    *
    * @param tbl       source CTE/table name
    * @param embUnnest column to unnest for per-component rows
    * @param embList   DOUBLE[]-typed expression for list_slice
    * @param seedSplit per-label hash-split fan-out of the seeds
    */
  private def pqTrainCtes(
      tbl: String,
      embUnnest: String,
      embList: String,
      seedSplit: Int): String = {
    // Squared subvector distance via the dot identity
    // |s|^2 + |c|^2 - 2 s.c, each dot a list_dot_product — the
    // sequential IEEE fold Spark's zip_with/aggregate HOF reproduces
    // bit-for-bit (the equivalence the IVF oracle already rests on).
    def sdCte(name: String, cbName: String): String =
      s"${name}l AS (SELECT m, cid, list(c ORDER BY dim) AS carr FROM $cbName GROUP BY m, cid), " +
        s"$name AS (SELECT sv.vec_id, sv.m, cbl.cid, " +
        "list_dot_product(sv.sub, sv.sub) + list_dot_product(cbl.carr, cbl.carr) " +
        "- 2 * list_dot_product(sv.sub, cbl.carr) AS d " +
        s"FROM sv JOIN ${name}l cbl ON sv.m = cbl.m)"
    val head =
      s"e AS (SELECT vec_id, label, unnest($embUnnest) AS v, unnest(range(0, 64)) AS i " +
        s"FROM $tbl), " +
        s"cb0 AS (SELECT i // 8 AS m, CAST(label * $seedSplit + vec_id % $seedSplit AS INT) " +
        "AS cid, i % 8 AS dim, " +
        Det.oRS("cast(sum(cast(v::DOUBLE as decimal(30,8))) as double) / count(*)", 6) +
        " AS c FROM e GROUP BY 1, 2, 3), " +
        "s AS (SELECT vec_id, i // 8 AS m, i % 8 AS dim, v::DOUBLE AS v FROM e), " +
        "ms AS (SELECT unnest(range(0, 8)) AS m), " +
        "sv AS (SELECT vec_id, ms.m, " +
        s"list_slice($embList, ms.m * 8 + 1, ms.m * 8 + 8) AS sub " +
        s"FROM $tbl CROSS JOIN ms)"
    val iters = (1 to PqIters).map { it =>
      sdCte(s"sd${it - 1}", s"cb${it - 1}") + ", " +
        s"asg$it AS (SELECT vec_id, m, cid FROM " +
        s"(SELECT sd.*, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn " +
        s"FROM sd${it - 1} sd) WHERE rn = 1), " +
        s"ref$it AS (SELECT s.m, a.cid, s.dim, " +
        Det.oRS("cast(sum(cast(s.v as decimal(30,8))) as double) / count(*)", 6) +
        s" AS c FROM s JOIN asg$it a ON a.vec_id = s.vec_id AND a.m = s.m " +
        "GROUP BY 1, 2, 3), " +
        s"cb$it AS MATERIALIZED (SELECT cb.m, cb.cid, cb.dim, coalesce(r.c, cb.c) AS c " +
        s"FROM cb${it - 1} cb LEFT JOIN ref$it r " +
        "ON r.m = cb.m AND r.cid = cb.cid AND r.dim = cb.dim)"
    }
    (Seq(head) ++ iters ++ Seq(
      s"cb AS (SELECT * FROM cb$PqIters)",
      sdCte("sd", "cb"))).mkString(", ")
  }

  private val pqOracleCtes: String =
    pqTrainCtes("embeddings", "embedding", "embedding::DOUBLE[]", seedSplit = 8)

  /** The refined sub-codebooks as (m, cid, dim, c) rows — codeword ids
    * are the seeding labels; values are the Lloyd-refined means. */
  val pqCodebooks: Q = Q(
    "pq_codebooks",
    Some(
      s"WITH $pqOracleCtes SELECT m, cid, dim, c FROM cb ORDER BY m, cid, dim"
    ),
    (spark, dir) => codebookFrame(spark, dir).orderBy(col("m"), col("cid"), col("dim"))
  )

  /** Per-vector subspace components (vec_id, m, dim, v) — the explode
    * both the codebook training and the distance kernel start from. */
  private def pqComponents(vecs: DataFrame, embCol: String = "embedding"): DataFrame =
    vecs
      .select(col("vec_id"), posexplode(col(embCol)).as(Seq("i", "v")))
      .select(
        col("vec_id"),
        (col("i") / lit(PqSubDim)).cast("long").as("m"),
        (col("i") % lit(PqSubDim)).cast("long").as("dim"),
        col("v").cast("double").as("v"))

  /** One Lloyd iteration: assign every subvector to its nearest
    * codeword (total-order tie-break), recompute each cell's decimal
    * mean, keep the PREVIOUS codeword for cells no subvector chose.
    * Every step is deterministic and partitioning-independent, which
    * is what lets the DuckDB oracle replay the training loop. */
  private def pqRefineOnce(vecs: DataFrame, cb: DataFrame, embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftx.TopKPerGroup
    val asg = TopKPerGroup(
      pqSubDists(vecs, cb, embCol),
      Seq("vec_id", "m"), Seq("d" -> false, "cid" -> false), 1)
      .select(col("vec_id"), col("m"), col("cid"))
    val refined = pqComponents(vecs, embCol)
      .join(asg, Seq("vec_id", "m"))
      .groupBy(col("m"), col("cid"), col("dim"))
      .agg(Det.rS(Det.davg(col("v")), 6).as("rc"))
    cb.join(refined, Seq("m", "cid", "dim"), "left_outer")
      .select(col("m"), col("cid"), col("dim"), coalesce(col("rc"), col("c")).as("c"))
  }

  /** Seed + [[PqIters]] refinements = the trained codebook frame the
    * view build materializes. Seeds are per-label subvector means
    * through the proven decimal-mean spelling, rounded to 6 dp so all
    * downstream squared-distance arithmetic starts from bit-identical
    * doubles in both engines. */
  private def codebookFrame(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    codebookFrameOf(Tables.embeddings(spark, dir), "embedding", seedSplit = 8)

  /** Seed + refine over ANY (vec_id, label, vector) frame — the base PQ
    * family trains on raw embeddings, the IVF-PQ family on coarse
    * residuals; same loop, same oracle algebra ([[pqTrainCtes]]). */
  private def codebookFrameOf(vecs: DataFrame, embCol: String, seedSplit: Int): DataFrame = {
    val seed = pqComponents(vecs, embCol)
      .join(vecs.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(
        col("m"),
        (col("label").cast("int") * seedSplit + pmod(col("vec_id"), lit(seedSplit)).cast("int"))
          .as("cid"),
        col("dim"))
      .agg(Det.rS(Det.davg(col("v")), 6).as("c"))
    (1 to PqIters).foldLeft(seed)((cb, _) => pqRefineOnce(vecs, cb, embCol))
  }

  /** Squared L2 of every input vector's m-th subvector to every
    * codeword of subspace m — the one kernel codebook training,
    * ENCODING (argmin over codewords) and the per-query ADC distance
    * table are all made of. Computed IN-ROW against a broadcast
    * array-form codebook (|vecs| x M·K projected rows) — NOT by
    * exploding components and shuffling into a (vec, m, cid)
    * aggregate: at K = 80 that spelling moved 25.6 M rows into a
    * 3.2 M-group decimal aggregate per pass and took the sf0.1 index
    * build to 60 s (negative A/B, r12). The distance is the dot
    * identity |s|² + |c|² − 2·s·c, each dot the sequential
    * zip_with/aggregate IEEE fold that is bit-identical to DuckDB's
    * list_dot_product (the equivalence the IVF and SemDeDup oracles
    * already rest on) — an all-double kernel; the earlier per-term
    * decimal(30,8) fold was exact but allocated 16 JVM Decimals per
    * row (second negative A/B: 24 s build, 6.5 s distortion scan). */
  /** (m, cid, carr) — one codeword-array row per (subspace, codeword),
    * the broadcastable spelling of the codebook both the full
    * candidate scan and the chosen-code distortion path join against. */
  private def cbArrOf(cb: DataFrame): DataFrame =
    cb.groupBy(col("m"), col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("dc"))
      .select(col("m"), col("cid"), expr("transform(dc, x -> x.c)").as("carr"))

  /** ‖sub − carr‖² via the dot identity (one pass per operand pair) —
    * the SHARED kernel: every PQ distance in this file, candidate or
    * chosen-only, must run this exact expression so their doubles are
    * bit-identical. */
  private def subSqDist(sub: Column, carr: Column): Column = {
    def fold(products: Column): Column =
      aggregate(products, lit(0.0), (acc, x) => acc + x)
    def dotFF(a: Column) = fold(zip_with(a, a, (x, y) => x.cast("double") * y.cast("double")))
    def dotDD(a: Column) = fold(zip_with(a, a, (x, y) => x * y))
    def dotFD(a: Column, b: Column) = fold(zip_with(a, b, (x, y) => x.cast("double") * y))
    dotFF(sub) + dotDD(carr) - lit(2.0) * dotFD(sub, carr)
  }

  private def pqSubDists(
      vecs: DataFrame,
      cb: DataFrame,
      embCol: String = "embedding",
      keys: Seq[String] = Seq("vec_id")): DataFrame =
    vecs
      .select(keys.map(col) :+ col(embCol): _*)
      .crossJoin(broadcast(cbArrOf(cb))) // bounded build: M x K codeword rows
      .withColumn("sub", slice(col(embCol), (col("m") * PqSubDim + 1).cast("int"), lit(PqSubDim)))
      .select(keys.map(col) ++ Seq(col("m"), col("cid"),
        subSqDist(col("sub"), col("carr")).as("d")): _*)

  /** PQ-encode ANY (vec_id, embedding) frame against a FROZEN codebook
    * — nearest codeword per subspace (ties to the smaller cid),
    * pivoted to ONE compact row (vec_id, c0..c7) per vector: the
    * stored index is M small ints per vector, the whole point of PQ.
    * A pure per-vector function once the codebook is frozen, so the
    * streaming twin ([[graft.streaming.StreamDemos.streamedPqCodes]])
    * merges micro-batches by vec_id idempotently — the
    * [[ivfAssignmentsOf]] serving contract; re-training is a new
    * buildVersion, never a streaming concern. */
  private[graft] def pqCodesOf(embs: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.TopKPerGroup
    val code = TopKPerGroup(
      pqSubDists(embs, cb),
      Seq("vec_id", "m"),
      Seq("d" -> false, "cid" -> false), 1)
      .select(col("vec_id"), col("m"), col("cid").as("code"))
    val aggs = (0 until PqM).map(m =>
      max(when(col("m") === m, col("code"))).as(s"c$m"))
    code.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Write-once PQ index: sub-codebooks + compact code rows, two paths
    * in one [[graft.ViewStore]] family ([[ivfIndexPath]]'s shape). The
    * codes build reads the MATERIALIZED codebook parquet, so both
    * tables derive from one consistent quantizer. buildVersion 5: the
    * r12 post-close Lloyd refinement (v2), the hash-split seeds (v3/v4) and the dot-identity kernel (v5) each changed the codebook DERIVATION
    * (stores from any older derivation must not satisfy the exists-check). */
  private[graft] def pqIndexPath(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val cbPath =
      graft.ViewStore.materialize(spark, "graft_pq_index/codebooks", dir, buildVersion = 5)(
        codebookFrame(spark, dir))
    val codesPath = graft.ViewStore.materialize(
      spark, "graft_pq_index/codes", dir, buildVersion = 5)(
      pqCodesOf(Tables.embeddings(spark, dir), spark.read.parquet(cbPath)))
    (cbPath, codesPath)
  }

  /** ADC top-3 over the PERSISTED PQ index: the 100 probe queries
    * build their M x K distance table against the persisted codebook
    * (8,000 rows — broadcast), and the base side is the compact codes
    * parquet exploded to (neighbor, m, code) and scored by ONE
    * equi-join + decimal sum — no float dot against base vectors
    * anywhere, and the raw base embeddings are never scanned
    * (AdvancedSpec pins both). The oracle replays codebook, encoding
    * and ADC symbolically, so rows/schema/hash all check — an ANN row
    * whose approximation is itself exact-verified. */
  val simAnnPq: Q = Q(
    "sim_ann_pq",
    Some(
      s"WITH $pqOracleCtes, " +
        "code AS (SELECT vec_id, m, cid AS code FROM " +
        "(SELECT sd.*, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn " +
        "FROM sd) WHERE rn = 1), " +
        "adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        Det.oRS(Det.oSum("q.d"), 6) + " AS adc " +
        "FROM code c JOIN sd q ON q.m = c.m AND q.cid = c.code " +
        "AND q.vec_id < 100 AND q.vec_id != c.vec_id GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) " +
        "AS rank FROM adc) " +
        "SELECT query_id, rank, neighbor_id, adc FROM r WHERE rank <= 3 " +
        "ORDER BY query_id, rank"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      TopKPerGroup(pqAdcScores(spark, dir), Seq("query_id"),
        Seq("adc" -> false, "neighbor_id" -> false), 3, rnName = "rank")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("adc"))
        .orderBy(col("query_id"), col("rank"))
    }
  )

  /** The ADC scan itself: (query_id, neighbor_id, adc) for every
    * (probe query, base vector) pair, computed the way a real PQ
    * engine does — the per-query distance tables ride along as ONE
    * broadcast row per query (a nested m -> code -> d map, 100 rows x
    * 80 entries), and each base code row scores every query with M
    * map lookups + adds in a single projection. NO shuffle touches
    * the scoring: the only exchange in the whole ANN row is the final
    * top-k's partial-prune pass (the first spelling — explode codes,
    * equi-join the 8,000-row table, shuffle 8x|base|x|queries| rows
    * into a half-million-group aggregate — measured 3.5 s vs ~1 s at
    * sf0.1/32 and is NOT the plan PQ promises). Each per-m term goes
    * through the same decimal(30,8) cast the oracle's decimal sum
    * applies, and decimal addition is exact, so the fixed m-ascending
    * fold equals the oracle's order-independent sum bit-for-bit. */
  private def pqAdcScores(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val (cbPath, codesPath) = pqIndexPath(spark, dir)
    val cb    = spark.read.parquet(cbPath)
    val codes = spark.read.parquet(codesPath)
    val qdt = pqSubDists(Tables.embeddings(spark, dir).filter(col("vec_id") < 100), cb)
      .groupBy(col("vec_id"), col("m"))
      .agg(map_from_arrays(collect_list(col("cid")), collect_list(col("d"))).as("md"))
      // dense cid-indexed array per (query, m): the scoring projection
      // below runs once per (query, neighbor) pair, and a MAP
      // element_at is an O(K) linear key scan (K = 80 codewords) — so
      // the nested-map spelling paid 8 x O(80) comparisons per scored
      // pair. Indexing an ARRAY by code is O(1); the d doubles are the
      // same values, so the adc output is bit-identical. The dense
      // build costs |queries| x M x K map lookups once, not per pair.
      // try_element_at: a cid hole (a label x residue seed group empty
      // at tiny SF) must yield a null slot, not an ANSI key error —
      // codes only ever index cids the codebook has, so the null is
      // never read. The decimal(30,8) cast the oracle-exact sum needs
      // is hoisted INTO the dense build too, then SCALED TO A LONG
      // (r22, VERDICT r21 #7): the per-pair fold was 7 decimal adds +
      // a decimal->double cast per scored pair; storing the EXACT
      // unscaled value n = d_dec * 10^8 as a long makes the fold 7
      // long adds + one double divide. Exactness: the decimal multiply
      // is exact (no double multiply touches the value — the spelling
      // the r21 round rejected), sub-distances are bounded (|x| <=
      // 0.58 per dim, 8-dim slices, residuals <= ~1.2 -> d < 50), so
      // the 8-term long sum < 4e10 << 2^53: double(sum)/1e8
      // single-rounds the SAME exact rational the decimal sum's
      // decimal->double cast rounds — bit-identical adc. The
      // (20,8)-narrowing cast and the ANSI long sum both THROW rather
      // than round if a future fixture ever broke those bounds.
      .withColumn("da", transform(
        sequence(lit(0), array_max(map_keys(col("md")))),
        i => (try_element_at(col("md"), i).cast(DecimalType(30, 8))
          .cast(DecimalType(20, 8)) * lit(100000000L).cast(DecimalType(9, 0)))
          .cast("long")))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("da")))).as("ma"))
      .select(col("vec_id").as("query_id"),
        transform(col("ma"), x => x.getField("da")).as("dt"))
    val terms = (0 until PqM).map(m =>
      element_at(element_at(col("dt"), m + 1), col(s"c$m") + 1))
    codes
      .withColumnRenamed("vec_id", "neighbor_id")
      .crossJoin(broadcast(qdt)) // bounded build: one row per probe query
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        Det.rS(terms.reduce(_ + _).cast("double") / lit(1e8), 6).as("adc"))
  }

  /** Two-stage retrieval over the PQ index — the standard serving
    * pattern at scale: a cheap ADC scan SHORTLISTS 20 candidates per
    * query from the compact codes (approximate, recall stage), then
    * ONLY those 20 rows join back to raw embeddings for an exact
    * cosine re-rank to top-3 (precision stage). The expensive exact
    * scoring touches |queries| x 20 vectors regardless of corpus size
    * — that bounded re-join is the entire point. Oracle replays both
    * stages symbolically (ADC via the [[simAnnPq]] algebra, re-rank
    * via `list_dot_product` with the rounded-cos/neighbor total
    * order), so the approximate-then-exact cascade hash-matches. */
  val simAnnPqRerank: Q = Q(
    "sim_ann_pq_rerank",
    Some(
      s"WITH $pqOracleCtes, " +
        "code AS (SELECT vec_id, m, cid AS code FROM " +
        "(SELECT sd.*, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn " +
        "FROM sd) WHERE rn = 1), " +
        "adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        Det.oRS(Det.oSum("q.d"), 6) + " AS adc " +
        "FROM code c JOIN sd q ON q.m = c.m AND q.cid = c.code " +
        "AND q.vec_id < 100 AND q.vec_id != c.vec_id GROUP BY 1, 2), " +
        "short AS (SELECT query_id, neighbor_id FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) " +
        "AS srank FROM adc) WHERE srank <= 20), " +
        "ex AS (SELECT s.query_id, s.neighbor_id, " +
        Det.oRS("list_dot_product(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[])", 6) +
        " AS cos FROM short s " +
        "JOIN embeddings qe ON qe.vec_id = s.query_id " +
        "JOIN embeddings ne ON ne.vec_id = s.neighbor_id), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) " +
        "AS rank FROM ex) " +
        "SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3 " +
        "ORDER BY query_id, rank"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 100)
      val short = TopKPerGroup(pqAdcScores(spark, dir), Seq("query_id"),
        Seq("adc" -> false, "neighbor_id" -> false), 20, rnName = "srank")
        .select(col("query_id"), col("neighbor_id"))
      // exact stage: |queries| x 20 rows join back to raw embeddings —
      // the shortlist broadcasts, the base table is probed by join, and
      // the float dot runs on 2,000 pairs however large the corpus is
      val qe = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val ne = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      val exact = broadcast(short)
        .join(qe, Seq("query_id"))
        .join(ne, Seq("neighbor_id"))
        .withColumn("cos",
          Det.rS(org.apache.spark.sql.graftx.FloatDot.dot(col("qe"), col("ne")), 6))
        .select(col("query_id"), col("neighbor_id"), col("cos"))
      TopKPerGroup(exact, Seq("query_id"), Seq("cos" -> true, "neighbor_id" -> false), 3,
        rnName = "rank")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    }
  )

  /** Per-subspace quantization distortion — the codebook-quality audit
    * a pipeline tracks across corpus snapshots (rising distortion =
    * the frozen quantizer has drifted off the data and the index needs
    * a retrain/new buildVersion): for every vector the CHOSEN
    * codeword's squared error, aggregated per subspace (count, mean,
    * max). Real values, fully oracle-replayed — the sibling of the
    * constant-verdict audits, proving the engine can also ship
    * NUMERIC drift metrics through the same deterministic algebra. */
  val pqDistortionReport: Q = Q(
    "pq_distortion_report",
    Some(
      s"WITH $pqOracleCtes, " +
        "chosen AS (SELECT vec_id, m, d FROM " +
        "(SELECT sd.*, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn " +
        "FROM sd) WHERE rn = 1) " +
        "SELECT m, count(*) AS n_vecs, " +
        Det.oRS(Det.oAvg("d"), 6) + " AS mean_sq_err, " +
        Det.oRS("max(d)", 6) + " AS max_sq_err " +
        "FROM chosen GROUP BY m ORDER BY m"
    ),
    (spark, dir) => {
      // The chosen code per (vector, subspace) is ALREADY in the codes
      // view (it IS the argmin pqCodesOf stored — same kernel, same
      // tie rule), so the audit reads the SERVED index and evaluates
      // the distance kernel once per (vec, m) instead of once per
      // (vec, m, codeword): K=80x fewer kernel evaluations than the
      // r12 spelling that re-ranked every candidate (BenchRepeat A/B
      // in SCALING.md §r14). Auditing the stored codes is also the
      // production-faithful contract — distortion of what is SERVED,
      // not of a recompute that could silently diverge from it.
      val (cbPath, codesPath) = pqIndexPath(spark, dir)
      val cb = spark.read.parquet(cbPath)
      val stacked = spark.read.parquet(codesPath).select(
        col("vec_id"),
        expr("stack(" + PqM + ", " +
          (0 until PqM).map(m => s"bigint($m), c$m").mkString(", ") +
          ") AS (m, cid)"))
      stacked
        .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
          Seq("vec_id"))
        .join(broadcast(cbArrOf(cb)), Seq("m", "cid")) // bounded: M x K rows
        .withColumn("sub",
          slice(col("embedding"), (col("m") * PqSubDim + 1).cast("int"), lit(PqSubDim)))
        .withColumn("d", subSqDist(col("sub"), col("carr")))
        .groupBy(col("m"))
        .agg(
          count(lit(1)).as("n_vecs"),
          Det.rS(Det.davg(col("d")), 6).as("mean_sq_err"),
          Det.rS(max(col("d")), 6).as("max_sq_err"))
        .orderBy(col("m"))
    }
  )

  // ----------------------------------------------------------------
  // IVF-PQ (residual ADC) — the composition of the two quantizers
  // above into the architecture large-scale ANN actually deploys
  // (FAISS "IVFADC", Jégou et al. §IV): the coarse quantizer prunes
  // WHICH inverted lists a query reads (the I/O win), and product
  // quantization compresses WHAT is stored per vector — applied to the
  // RESIDUAL r = x − centroid(list), which carries far less variance
  // than x itself, so a smaller codebook ([[IvfPqSeedSplit]] → K = 40
  // vs the flat family's 80) quantizes it better. Serving shape at
  // 100 TB: the codes table is (list_id, vec_id, 8 small ints) —
  // list_id-partitionable; a query quantizes against the ~10-row
  // coarse table map-side, builds one M x K distance table per probed
  // list from its RESIDUAL, and the candidate scan is an EQUI-JOIN on
  // list_id (the IVF prune) with M map lookups + adds per code row (the
  // ADC scan) — no float dot and no full-corpus scan anywhere. The
  // whole cascade (coarse assign → residual → codebook training →
  // encode → probe → residual distance tables → ADC) is deterministic
  // and replayed symbolically by the oracle.
  // ----------------------------------------------------------------

  /** Seed fan-out of the residual codebooks (K = 10 labels × 4). */
  private val IvfPqSeedSplit = 4

  /** Coarse-assign ANY (vec_id, …, embedding) frame against a FIXED
    * centroid table and attach the residual `emb` = embedding −
    * centroid(list) as a DOUBLE array. Pure per-vector once the
    * quantizer is frozen — the same serving contract as
    * [[ivfAssignmentsOf]]/[[pqCodesOf]], which is what makes the codes
    * view micro-batch-maintainable
    * ([[graft.streaming.StreamDemos.streamedIvfPqCodes]]). */
  private[graft] def residualsOf(embs: DataFrame, cent: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.TopKPerGroup
    TopKPerGroup(withDist(embs, cent), Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 1)
      .join(broadcast(cent.select(col("list_id"), col("centroid"))), Seq("list_id"))
      .withColumn("emb", zip_with(col("embedding"), col("centroid"), (x, c) => x.cast("double") - c))
      .drop("centroid", "d", "rn", "embedding")
  }

  /** PQ-encode a residual frame (vec_id, list_id, emb) against a frozen
    * residual codebook → ONE compact (vec_id, list_id, c0..c7) row per
    * vector: the stored IVF-PQ index row is a list pointer plus M small
    * ints. */
  private[graft] def ivfPqCodesOf(resid: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.TopKPerGroup
    val code = TopKPerGroup(
      pqSubDists(resid, cb, "emb", Seq("vec_id", "list_id")),
      Seq("vec_id", "m"), Seq("d" -> false, "cid" -> false), 1)
      .select(col("vec_id"), col("list_id"), col("m"), col("cid").as("code"))
    val aggs = (0 until PqM).map(m => max(when(col("m") === m, col("code"))).as(s"c$m"))
    code.groupBy(col("vec_id"), col("list_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Write-once IVF-PQ index: residual sub-codebooks + compact code
    * rows. The coarse quantizer is the SAME persisted centroid table
    * the IVF family serves from ([[ivfIndexPath]]) — one quantizer,
    * two indexes, the production layout. The residual frame is
    * persisted across the two builds so the coarse assignment runs
    * once, not once per materialization (a no-op when both views
    * already exist — persist is lazy and the build lambdas never
    * fire). */
  private[graft] def ivfPqIndexPath(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val cent  = spark.read.parquet(ivfIndexPath(spark, dir)._1)
    val resid = residualsOf(Tables.embeddings(spark, dir), cent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cbPath =
        graft.ViewStore.materialize(spark, "graft_ivfpq_index/codebooks", dir)(
          codebookFrameOf(resid, "emb", IvfPqSeedSplit))
      val codesPath = graft.ViewStore.materialize(spark, "graft_ivfpq_index/codes", dir)(
        ivfPqCodesOf(resid, spark.read.parquet(cbPath)))
      (cbPath, codesPath)
    } finally resid.unpersist(blocking = false)
  }

  /** The IVF-PQ candidate scan: probes pick their nearest 2 lists
    * (map-side argmin against the broadcast coarse table), build one
    * M x K distance table per (query, probed list) from the query's
    * RESIDUAL in that list, and the codes table joins them by ONE
    * equi-join on list_id — candidates outside the probed lists are
    * never read (the IVF prune), and each candidate costs M map
    * lookups + decimal adds (the ADC scan, [[pqAdcScores]]'s
    * broadcast-table spelling). */
  private def ivfPqAdcScores(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      probeK: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.graftx.TopKPerGroup
    val (cbPath, codesPath) = ivfPqIndexPath(spark, dir)
    val cb    = spark.read.parquet(cbPath)
    val codes = spark.read.parquet(codesPath)
    val cent  = spark.read.parquet(ivfIndexPath(spark, dir)._1)
    val probes = TopKPerGroup(
      withDist(Tables.embeddings(spark, dir).filter(col("vec_id") < 100), cent),
      Seq("vec_id"), Seq("d" -> true, "list_id" -> false), probeK, rnName = "prank")
      .select(
        col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("list_id"), col("prank").cast("long").as("prank"))
    val qres = probes
      .join(broadcast(cent.select(col("list_id"), col("centroid"))), Seq("list_id"))
      .withColumn("emb", zip_with(col("qe"), col("centroid"), (x, c) => x.cast("double") - c))
      .select(col("query_id"), col("list_id"), col("prank"), col("emb"))
    val qdt = pqSubDists(qres, cb, "emb", Seq("query_id", "list_id", "prank"))
      .groupBy(col("query_id"), col("list_id"), col("prank"), col("m"))
      .agg(map_from_arrays(collect_list(col("cid")), collect_list(col("d"))).as("md"))
      // dense cid-indexed arrays instead of nested maps — same O(K)-
      // map-scan-per-scored-pair argument as [[pqAdcScores]] (K = 40
      // residual codewords here); values identical, lookups O(1), and
      // the oracle-exact decimal cast is hoisted into the build too,
      // scaled to exact longs like [[pqAdcScores]] (r22): 7 long adds
      // + one double divide per scored pair instead of 7 decimal adds
      // — same bounded-sub-distance exactness argument there.
      .withColumn("da", transform(
        sequence(lit(0), array_max(map_keys(col("md")))),
        i => (try_element_at(col("md"), i).cast(DecimalType(30, 8))
          .cast(DecimalType(20, 8)) * lit(100000000L).cast(DecimalType(9, 0)))
          .cast("long")))
      .groupBy(col("query_id"), col("list_id"), col("prank"))
      .agg(array_sort(collect_list(struct(col("m"), col("da")))).as("ma"))
      .select(col("query_id"), col("list_id"), col("prank"),
        transform(col("ma"), x => x.getField("da")).as("dt"))
    val terms = (0 until PqM).map(m =>
      element_at(element_at(col("dt"), m + 1), col(s"c$m") + 1))
    codes
      .withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(qdt), Seq("list_id")) // the IVF prune: equi-join on probed lists
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("list_id"),
        col("prank"),
        Det.rS(terms.reduce(_ + _).cast("double") / lit(1e8), 6).as("adc"))
  }

  /** The oracle CTE chain shared by [[simAnnIvfPq]] and
    * [[simAnnIvfPqRerank]] — everything through the per-list `adc`
    * scores: coarse quantizer, residuals, the residual codebook
    * TRAINING loop, encoding, probe selection, per-(query, list)
    * distance tables, and the ADC join. ONE string so the top-3 row
    * and the rerank row can never drift. */
  private def ivfPqAdcCtesK(probeK: Int): String =
    s"${ivfCoarseCtesK(probeK)}, " +
      "rsv AS MATERIALIZED (SELECT a.vec_id, a.label, a.list_id, " +
      "list_transform(list_zip(a.embedding::DOUBLE[], cl.centroid), x -> x[1] - x[2]) AS emb " +
      "FROM asg a JOIN cl ON a.list_id = cl.list_id), " +
      s"${pqTrainCtes("rsv", "emb", "emb", IvfPqSeedSplit)}, " +
      "code AS MATERIALIZED (SELECT c.vec_id, r2.list_id, c.m, c.code FROM " +
      "(SELECT vec_id, m, cid AS code FROM " +
      "(SELECT sd.*, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn " +
      "FROM sd) WHERE rn = 1) c JOIN rsv r2 ON c.vec_id = r2.vec_id), " +
      "qres AS (SELECT p.query_id, p.list_id, p.prank, " +
      "list_transform(list_zip(p.qe::DOUBLE[], cl.centroid), x -> x[1] - x[2]) AS emb " +
      "FROM pro p JOIN cl ON p.list_id = cl.list_id), " +
      "qsv AS (SELECT query_id, list_id, prank, ms.m, " +
      "list_slice(emb, ms.m * 8 + 1, ms.m * 8 + 8) AS sub FROM qres CROSS JOIN ms), " +
      "qsd AS (SELECT q.query_id, q.list_id, q.prank, q.m, c.cid, " +
      "list_dot_product(q.sub, q.sub) + list_dot_product(c.carr, c.carr) " +
      "- 2 * list_dot_product(q.sub, c.carr) AS d FROM qsv q JOIN sdl c ON q.m = c.m), " +
      // prank is functionally dependent on (query_id, list_id) — the
      // extra GROUP BY key cannot split a group
      "adc AS (SELECT q.query_id, c.vec_id AS neighbor_id, c.list_id, q.prank, " +
      Det.oRS(Det.oSum("q.d"), 6) + " AS adc " +
      "FROM code c JOIN qsd q ON q.list_id = c.list_id AND q.m = c.m AND q.cid = c.code " +
      "AND q.query_id != c.vec_id GROUP BY 1, 2, 3, 4)"

  private val ivfPqAdcCtes: String = ivfPqAdcCtesK(2)

  /** ADC top-3 within the probed inverted lists over the PERSISTED
    * IVF-PQ index. Oracle replays coarse quantizer, residuals, the
    * residual codebook TRAINING loop, encoding, probe selection, and
    * the per-list ADC — rows/schema/hash all check. */
  val simAnnIvfPq: Q = Q(
    "sim_ann_ivfpq",
    Some(
      s"WITH $ivfPqAdcCtes, " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) " +
        "AS rank FROM adc) " +
        "SELECT query_id, rank, neighbor_id, adc, list_id FROM r WHERE rank <= 3 " +
        "ORDER BY query_id, rank"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      TopKPerGroup(ivfPqAdcScores(spark, dir), Seq("query_id"),
        Seq("adc" -> false, "neighbor_id" -> false), 3, rnName = "rank")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("adc"), col("list_id"))
        .orderBy(col("query_id"), col("rank"))
    }
  )

  /** Two-stage retrieval over the IVF-PQ index — the full IVFADC
    * serving cascade (the [[simAnnPqRerank]] pattern with the coarse
    * prune in front): the ADC scan SHORTLISTS 20 candidates per query
    * from the probed lists' compact codes, then ONLY those rows join
    * back to raw embeddings for an exact cosine re-rank to top-3. The
    * exact stage touches |queries| x 20 vectors regardless of corpus
    * size, and the approximate stage never leaves the probed lists —
    * at 100 TB this is the query path: one coarse argmin map-side, a
    * few inverted lists read, a bounded exact re-join. Oracle replays
    * the shared ADC chain plus the re-rank. */
  val simAnnIvfPqRerank: Q = Q(
    "sim_ann_ivfpq_rerank",
    Some(
      s"WITH $ivfPqAdcCtes, " +
        "short AS (SELECT query_id, neighbor_id FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) " +
        "AS srank FROM adc) WHERE srank <= 20), " +
        "ex AS (SELECT s.query_id, s.neighbor_id, " +
        Det.oRS("list_dot_product(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[])", 6) +
        " AS cos FROM short s " +
        "JOIN embeddings qe ON qe.vec_id = s.query_id " +
        "JOIN embeddings ne ON ne.vec_id = s.neighbor_id), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) " +
        "AS rank FROM ex) " +
        "SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3 " +
        "ORDER BY query_id, rank"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      val short = TopKPerGroup(ivfPqAdcScores(spark, dir), Seq("query_id"),
        Seq("adc" -> false, "neighbor_id" -> false), 20, rnName = "srank")
        .select(col("query_id"), col("neighbor_id"))
      val qe = Tables.embeddings(spark, dir).filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val ne = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      // exact stage: the shortlist broadcasts, the base table is probed
      // by join, and the float dot runs on |queries| x 20 pairs however
      // large the corpus is — same shape as sim_ann_pq_rerank
      val exact = broadcast(short)
        .join(qe, Seq("query_id"))
        .join(ne, Seq("neighbor_id"))
        .withColumn("cos",
          Det.rS(org.apache.spark.sql.graftx.FloatDot.dot(col("qe"), col("ne")), 6))
        .select(col("query_id"), col("neighbor_id"), col("cos"))
      TopKPerGroup(exact, Seq("query_id"), Seq("cos" -> true, "neighbor_id" -> false), 3,
        rnName = "rank")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    }
  )

  /** The nprobe tuning curve — recall@3 AND candidate-scan cost per
    * nprobe ∈ {1,2,3}, in one hash-checked report. nprobe is THE knob
    * an IVF deployment turns: each +1 reads one more inverted list per
    * query (cost grows ~linearly in n_cand) and can only add recall
    * (tier nprobe ⊆ tier nprobe+1, spec-pinned monotone). Computing
    * the curve IN the engine over the persisted index makes the
    * cost/recall tradeoff a pipeline artifact instead of a notebook
    * anecdote — at 100 TB this runs on a sampled probe set exactly as
    * spelled here (the exact arm is the broadcast-probe brute-force
    * scan, affordable because probes are few). The candidate frame is
    * computed ONCE at probeK = 3; the per-tier views are prank
    * filters, so the report never rescans the lists per tier. */
  val simAnnIvfPqNprobeReport: Q = Q(
    "sim_ann_ivfpq_nprobe_report",
    Some(
      s"WITH ${ivfPqAdcCtesK(3)}, " +
        "np AS (SELECT cast(unnest([1, 2, 3]) as bigint) AS nprobe), " +
        "tier AS (SELECT np.nprobe, a.* FROM adc a JOIN np ON a.prank <= np.nprobe), " +
        "top3 AS (SELECT nprobe, query_id, neighbor_id FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY nprobe, query_id " +
        "ORDER BY adc, neighbor_id) AS rnk FROM tier) WHERE rnk <= 3), " +
        "bc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        Det.oRS("list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])", 6) +
        " AS cos FROM embeddings a JOIN embeddings b " +
        "ON a.vec_id < 100 AND a.vec_id != b.vec_id), " +
        "br AS (SELECT query_id, neighbor_id FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank " +
        "FROM bc) WHERE rank <= 3), " +
        // nq mirrors the ENGINE's filtered base-table count (not the
        // truth's distinct query_ids): identical on any corpus with
        // >= 2 vectors (every probe then has >= 1 neighbor), and on a
        // degenerate <2-vector corpus the old count-distinct-from-br
        // read 0 -> 0/0 recall (NaN in DuckDB, NULL in Spark) while
        // the engine read a denominator of 1 (ADVICE r14)
        "nq AS (SELECT cast(count(*) as bigint) AS nq FROM embeddings WHERE vec_id < 100), " +
        "h AS (SELECT t.nprobe, cast(count(b.neighbor_id) as bigint) AS n_hits " +
        "FROM top3 t LEFT JOIN br b ON t.query_id = b.query_id " +
        "AND t.neighbor_id = b.neighbor_id GROUP BY 1), " +
        "cn AS (SELECT nprobe, cast(count(*) as bigint) AS n_cand FROM tier GROUP BY 1) " +
        "SELECT cn.nprobe, cn.n_cand, h.n_hits, " +
        Det.oRN("h.n_hits::DOUBLE / (nq.nq::DOUBLE * 3.0)", 6) + " AS recall_at_3 " +
        "FROM cn JOIN h USING (nprobe), nq ORDER BY nprobe"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      val cand = ivfPqAdcScores(spark, dir, probeK = 3)
      val np = spark.range(1, 4).select(col("id").as("nprobe"))
      // non-equi broadcast join against a THREE-row build side: each
      // candidate lands in every tier whose nprobe covers its probe rank
      val tier = cand.join(broadcast(np), col("prank") <= col("nprobe"))
      val top3 = TopKPerGroup(tier, Seq("nprobe", "query_id"),
        Seq("adc" -> false, "neighbor_id" -> false), 3)
        .select(col("nprobe"), col("query_id"), col("neighbor_id"))
      val brute = Similarity.pairsTopK(spark, dir, 100, 3)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("m"))
      val hits = top3
        .join(brute, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("nprobe"))
        .agg(sum(coalesce(col("m"), lit(0L))).as("n_hits"))
      val cnt = tier.groupBy(col("nprobe")).agg(count(lit(1)).as("n_cand"))
      // probe-query count from one filtered base-table count — not a
      // second evaluation of the brute-force truth subtree (same
      // equivalence argument as sim_ann_family_report's nqF: every
      // probe has >= 1 neighbor whenever the corpus has >= 2 vectors)
      val nq = Tables.embeddings(spark, dir)
        .filter(col("vec_id") < 100)
        .agg(count(lit(1)).as("nq"))
      cnt
        .join(hits, Seq("nprobe"))
        .crossJoin(broadcast(nq)) // bounded build: ONE denominator row
        .select(
          col("nprobe"), col("n_cand"), col("n_hits"),
          Det.rN(col("n_hits").cast("double") / (col("nq").cast("double") * 3.0), 6)
            .as("recall_at_3"))
        .orderBy(col("nprobe"))
    }
  )

  /** The cross-family ANN comparison — LSH vs IVF vs flat PQ vs IVF-PQ
    * in ONE hash-checked table, the page a deployment reads when
    * choosing its serving index (VERDICT r12 #7; the per-family audits
    * [[Similarity.simAnnRecallReport]] and [[simAnnIvfPqNprobeReport]]
    * stay as the deep dives — AdvancedSpec pins this row reconciling
    * with both). One row per family:
    *
    *   - `n_cand`   — candidate rows the family's FIRST-STAGE score
    *     touches across the 100 probes: LSH = same-bucket pairs
    *     (`lsh_multi` adds the 8 Hamming-1 probe buckets, distinct
    *     pairs — the recall amplifier's cost visible next to its
    *     gain), IVF and IVF-PQ = members of the nprobe=2 probed lists
    *     (identical sets by construction — one coarse quantizer, two
    *     indexes; the difference is the per-candidate cost: IVF does a
    *     float dot, IVF-PQ does M code-table lookups), flat PQ = the
    *     WHOLE corpus minus self (an ADC scan prunes nothing — that is
    *     its cost profile, visible here next to its recall).
    *   - `mean_cand` — n_cand / queries, the per-query read cost.
    *   - `n_hits` / `recall_at_3` — the family's SERVED top-3 (its own
    *     registry row verbatim: LSH/IVF exact-rerank every candidate;
    *     PQ/IVF-PQ shortlist 20 by ADC then exact-rerank, the equal
    *     20-candidate exact budget) against the brute-force truth.
    *
    * Every family list is that family's already-oracle-checked
    * statement nested verbatim (engine AND oracle), so this table can
    * never drift from the rows it summarizes. Determinism: exact
    * counts; each ratio is one IEEE division of exact longs, rounded.
    *
    * 100 TB: brute truth runs on the sampled 100-probe set (the
    * standard offline audit); every family arm is its serving shape
    * (persisted views, broadcast probes, equi-join candidate
    * generation); the report itself aggregates to 4 rows. */
  val simAnnFamilyReport: Q = Q(
    "sim_ann_family_report",
    Some {
      val nested = Seq(
        "lsh3"  -> Similarity.simAnnLsh.oracle.get,
        "lshm3" -> Similarity.simAnnMultiprobe.oracle.get,
        "ivf3"  -> ivfOracleSql,
        "pq3"   -> simAnnPqRerank.oracle.get,
        "ipq3"  -> simAnnIvfPqRerank.oracle.get
      ).map { case (n, sql) => s"$n AS (SELECT query_id, neighbor_id FROM ($sql))" }
        .mkString(", ")
      "WITH " + nested + ", " +
        "bc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
        Det.oRS("list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])", 6) +
        " AS cos FROM embeddings a JOIN embeddings b " +
        "ON a.vec_id < 100 AND a.vec_id != b.vec_id), " +
        "br AS (SELECT query_id, neighbor_id FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank " +
        "FROM bc) WHERE rank <= 3), " +
        // nq mirrors the engine's filtered base-table count — same
        // degenerate-corpus guard as the nprobe report's nq (ADVICE r14)
        "nq AS (SELECT cast(count(*) as bigint) AS nq FROM embeddings WHERE vec_id < 100), " +
        "sg AS (SELECT vec_id, " + Similarity.bucketSql + " AS bucket FROM embeddings), " +
        "lshc AS (SELECT cast(count(*) as bigint) AS n_cand FROM sg p JOIN sg b " +
        "ON p.bucket = b.bucket AND p.vec_id < 100 AND p.vec_id != b.vec_id), " +
        "lsmc AS (SELECT cast(count(*) as bigint) AS n_cand FROM (SELECT DISTINCT p.query_id, b.vec_id " +
        "FROM (SELECT vec_id AS query_id, unnest([bucket" +
        (0 until 8).map(j => s", xor(bucket, ${1 << j})").mkString +
        "]) AS bucket FROM sg WHERE vec_id < 100) p " +
        "JOIN sg b USING (bucket) WHERE p.query_id != b.vec_id)), " +
        s"ivfc AS (SELECT cast(count(*) as bigint) AS n_cand FROM (WITH $ivfCoarseCtes " +
        "SELECT p.query_id FROM pro p JOIN asg a USING (list_id) WHERE p.query_id != a.vec_id)), " +
        "pqc AS (SELECT (SELECT cast(count(*) as bigint) FROM embeddings WHERE vec_id < 100) * " +
        "((SELECT cast(count(*) as bigint) FROM embeddings) - 1) AS n_cand), " +
        "hl AS (SELECT cast(count(*) as bigint) AS n_hits FROM lsh3 t JOIN br b USING (query_id, neighbor_id)), " +
        "hm AS (SELECT cast(count(*) as bigint) AS n_hits FROM lshm3 t JOIN br b USING (query_id, neighbor_id)), " +
        "hi AS (SELECT cast(count(*) as bigint) AS n_hits FROM ivf3 t JOIN br b USING (query_id, neighbor_id)), " +
        "hp AS (SELECT cast(count(*) as bigint) AS n_hits FROM pq3 t JOIN br b USING (query_id, neighbor_id)), " +
        "hq AS (SELECT cast(count(*) as bigint) AS n_hits FROM ipq3 t JOIN br b USING (query_id, neighbor_id)), " +
        "fam AS (SELECT 'lsh' AS family, lshc.n_cand, hl.n_hits FROM lshc, hl " +
        "UNION ALL SELECT 'lsh_multi', lsmc.n_cand, hm.n_hits FROM lsmc, hm " +
        "UNION ALL SELECT 'ivf', ivfc.n_cand, hi.n_hits FROM ivfc, hi " +
        "UNION ALL SELECT 'pq', pqc.n_cand, hp.n_hits FROM pqc, hp " +
        "UNION ALL SELECT 'ivfpq', ivfc.n_cand, hq.n_hits FROM ivfc, hq) " +
        "SELECT family, n_cand, " +
        Det.oRN("n_cand::DOUBLE / nq.nq::DOUBLE", 6) + " AS mean_cand, n_hits, " +
        Det.oRN("n_hits::DOUBLE / (nq.nq::DOUBLE * 3.0)", 6) + " AS recall_at_3 " +
        "FROM fam, nq ORDER BY family"
    },
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      val brute = Similarity.pairsTopK(spark, dir, 100, 3)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("m"))
      // nq = the probe-query count, read with one filtered count of the
      // base table: identical to the truth's distinct query_ids (every
      // probe has >= 1 neighbor whenever the corpus has >= 2 vectors)
      // without re-evaluating the brute-force subtree just to count it
      val nqF = Tables.embeddings(spark, dir)
        .filter(col("vec_id") < 100)
        .agg(count(lit(1)).as("nq"))
      // first-stage candidate counts, each from the family's PERSISTED
      // serving view (structural counts — no scores evaluated)
      val sigs = spark.read.parquet(Similarity.lshSigTablePath(spark, dir))
      val lshCand = broadcast(
        sigs.filter(col("vec_id") < 100).select(col("vec_id").as("query_id"), col("bucket")))
        .join(sigs.select(col("vec_id").as("neighbor_id"), col("bucket")), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .agg(count(lit(1)).as("n_cand"))
      val multiProbes = sigs
        .filter(col("vec_id") < 100)
        .select(
          col("vec_id").as("query_id"),
          explode(array(col("bucket") +: (0 until 8).map(j =>
            col("bucket").bitwiseXOR(lit(1 << j))): _*)).as("bucket"))
      val lshMultiCand = broadcast(multiProbes)
        .join(sigs.select(col("vec_id").as("neighbor_id"), col("bucket")), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id") // a neighbor can match via several probes
        .agg(count(lit(1)).as("n_cand"))
      val (centPath, asgPath) = ivfIndexPath(spark, dir)
      val probes = TopKPerGroup(
        withDist(Tables.embeddings(spark, dir).filter(col("vec_id") < 100),
          spark.read.parquet(centPath)),
        Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 2)
        .select(col("vec_id").as("query_id"), col("list_id"))
      val ivfCand = broadcast(probes)
        .join(spark.read.parquet(asgPath).select(col("vec_id").as("neighbor_id"), col("list_id")),
          Seq("list_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .agg(count(lit(1)).as("n_cand"))
      val pqCand = Tables.embeddings(spark, dir)
        .agg(count(lit(1)).as("nb"))
        .crossJoin(broadcast(nqF))
        .select((col("nq") * (col("nb") - lit(1L))).as("n_cand"))
      // ONE truth join for all five families: the served top-3 frames
      // are tagged and unioned, then joined against the brute-force
      // truth once — the earlier per-family spelling re-evaluated the
      // brute subtree once per family (6x with the nq count; measured
      // ~0.9 s/extra evaluation at sf0.1 in the r13 min2). Candidate
      // counts stay per-family 1-row aggregates.
      val served = Seq(
        "lsh"       -> Similarity.simAnnLshPersisted.run(spark, dir),
        "lsh_multi" -> Similarity.simAnnMultiprobe.run(spark, dir),
        "ivf"       -> simAnnIvfPersisted.run(spark, dir),
        "pq"        -> simAnnPqRerank.run(spark, dir),
        "ivfpq"     -> simAnnIvfPqRerank.run(spark, dir))
        .map { case (f, df) =>
          df.select(lit(f).as("family"), col("query_id"), col("neighbor_id"))
        }
        .reduce(_.unionByName(_))
      val hits = served
        .join(brute, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("family"))
        .agg(sum(coalesce(col("m"), lit(0L))).as("n_hits"))
      val cands = Seq(
        "lsh" -> lshCand, "lsh_multi" -> lshMultiCand, "ivf" -> ivfCand,
        "pq" -> pqCand, "ivfpq" -> ivfCand)
        .map { case (f, c) => c.select(lit(f).as("family"), col("n_cand")) }
        .reduce(_.unionByName(_))
      cands
        // left join + coalesce: a family that served ZERO rows has no
        // hits group — it must still read n_hits 0 like the oracle's
        // count(*) (ADVICE r13)
        .join(hits, Seq("family"), "left")
        .crossJoin(broadcast(nqF)) // bounded: ONE denominator row
        .select(
          col("family"),
          col("n_cand"),
          Det.rN(col("n_cand").cast("double") / col("nq").cast("double"), 6).as("mean_cand"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          Det.rN(coalesce(col("n_hits"), lit(0L)).cast("double") /
            (col("nq").cast("double") * 3.0), 6).as("recall_at_3"))
        .orderBy(col("family"))
    }
  )

  /** Diversity-stratified sampling from the IVF cells: pick k=3
    * documents per coarse cell, hash-ordered — the cheap
    * embedding-space-coverage sampler a training-mix owner uses when a
    * uniform sample would be dominated by the dense clusters (every
    * cell contributes equally regardless of its population). Selection
    * is a pure function of the persisted index + doc key: reproducible
    * across engines, reruns, and cluster sizes, like every sampler in
    * [[Sampling]].
    *
    * Scale shape: reads the PERSISTED assignments view (never
    * recomputes the quantizer), one equi-join to fetch labels, a
    * [[org.apache.spark.sql.graftx.TopKPerGroup]] bounded-heap top-k
    * per cell (map-side pruning — the exchange carries ≤ k rows per
    * cell per partition, not the cell), and a broadcast join against
    * the ~|cells|-row size table. At 100 TB the cells ARE the
    * partition key; nothing here is corpus-quadratic or driver-side. */
  val sampleDiverseIvf: Q = Q(
    "sample_diverse_ivf",
    Some(
      s"WITH $ivfCoarseCtes, " +
        "p AS (SELECT list_id, vec_id, label, row_number() OVER (PARTITION BY list_id " +
        s"ORDER BY ${Sampling.oHkey("vec_id")}, vec_id) AS pick_rank, " +
        "count(*) OVER (PARTITION BY list_id) AS n_cell FROM asg) " +
        "SELECT list_id, pick_rank, vec_id, label, cast(n_cell as bigint) AS n_cell " +
        "FROM p WHERE pick_rank <= 3 ORDER BY list_id, pick_rank"
    ),
    (spark, dir) => {
      import org.apache.spark.sql.graftx.TopKPerGroup
      val (_, asgPath) = ivfIndexPath(spark, dir)
      val asg = spark.read.parquet(asgPath).select(col("vec_id"), col("list_id"))
      val cells = asg.join(
        Tables.embeddings(spark, dir).select(col("vec_id"), col("label")),
        Seq("vec_id"))
      val sizes = asg.groupBy(col("list_id")).agg(count(lit(1)).cast("long").as("n_cell"))
      TopKPerGroup(
        cells.withColumn("hk", Sampling.hkey(col("vec_id"))),
        Seq("list_id"), Seq("hk" -> false, "vec_id" -> false), 3, rnName = "pick_rank")
        .join(broadcast(sizes), Seq("list_id")) // bounded build: ~|cells| rows
        .select(col("list_id"), col("pick_rank"), col("vec_id"), col("label"), col("n_cell"))
        .orderBy(col("list_id"), col("pick_rank"))
    }
  )

  def qs: Seq[Q] =
    Seq(ivfCentroids, simAnnIvf, simAnnIvfPersisted, funnelVcp, dedupSemantic,
      pqCodebooks, simAnnPq, simAnnPqRerank, pqDistortionReport, simAnnIvfPq,
      simAnnIvfPqRerank, simAnnIvfPqNprobeReport, simAnnFamilyReport, sampleDiverseIvf)
}
