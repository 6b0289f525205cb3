package graft

/** Plan-shape assertions (SURVEY §5.5): the optimizations the 100 TB
  * story depends on must be visible in the physical plan, not assumed.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String = {
    val df = Registry.byName(name).run(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("src_scan_pushdown pushes the filter into the parquet scan") {
    val p = plan("src_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,25)]"), p.take(2000))
  }

  test("src_scan_pushdown prunes to a 3-column ReadSchema") {
    val p = plan("src_scan_pushdown")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("p_partkey") && read.contains("p_name") && read.contains("p_size"))
    assert(!read.contains("p_retailprice") && !read.contains("p_brand"), read)
  }

  test("join_broadcast_dims uses broadcast joins for dimensions") {
    val p = plan("join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("join_broadcast_dims pins 4 broadcast hash joins, no shuffle join, 2 exchanges") {
    // The one headline shape that measured above baseline in r12
    // (2.27 s vs 1.58; attributed to an I/O-pressured window, not a
    // plan change) — pin the exact plan so a planner regression can
    // never again hide behind io_probe noise (VERDICT r12 #4). The
    // star's only shuffles are the 25-group aggregation and the final
    // sort; every join builds a broadcast hash table: orders' join
    // side is pruned to (o_orderkey, o_custkey) so even the
    // fact-to-fact edge broadcasts at any SF where those two columns
    // fit the threshold, and at cluster scale AQE re-plans it from the
    // same declarative shape.
    val p     = plan("join_broadcast_dims")
    val bhj   = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj == 4, s"expected exactly 4 BroadcastHashJoins, saw $bhj\n" + p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "star join must not shuffle either side\n" + p.take(3000))
    val exchanges =
      p.linesIterator.count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 2, s"$exchanges shuffle exchanges — expected agg + final sort only\n" + p.take(3000))
  }

  test("join_skew_stress pins the salted shuffle join: salt in the keys, no broadcast") {
    // The skew-stress row's whole point is the SHUFFLE shape: a
    // broadcast of the per-key dim would make the salt (and the skew)
    // invisible, so the plan must show a shuffled join whose keys
    // include the salt column — the hot key's rows spread over
    // `salts` reducers instead of one.
    val p = plan("join_skew_stress")
    assert(p.contains("ShuffledHashJoin"), "expected a shuffled hash join\n" + p.take(3000))
    assert(!p.contains("BroadcastHashJoin"),
      "the salted dim must not broadcast — that would erase the demonstration\n" + p.take(3000))
    val joinLine = p.linesIterator.find(_.contains("ShuffledHashJoin")).getOrElse("")
    assert(joinLine.contains("salt"), s"salt missing from the join keys: $joinLine")
  }

  test("sim_cosine_topk broadcasts the probe side (no shuffle of the base)") {
    val p = plan("sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("ANN candidate joins broadcast the probe side (left), streaming the base") {
    for (name <- Seq("sim_ann_lsh", "sim_ann_multiprobe", "sim_ann_ivf", "sim_ann_ivf_persisted")) {
      val p = plan(name)
      assert(p.contains("BuildLeft"),
        s"$name: expected the probe side (left) pinned as broadcast build\n" + p.take(2000))
    }
  }

  test("sim_ann_pq_rerank: shortlist stage scores the codes view, never raw base embeddings") {
    // VERDICT r17 #6 — extend the sim_ann_pq "never scans raw
    // embeddings" pin to the rerank cascade. The exact re-rank
    // LEGITIMATELY reads embeddings for (a) the 100 probe queries
    // (pushed vec_id < 100) and (b) the one bounded candidate probe
    // (|queries| x 20 rows join back by key); what must NEVER happen
    // is the candidate-GENERATION stage scoring raw vectors — that
    // silently erases the family's 100 TB story (ADC over compact
    // codes is the entire point). Structural walk on the pre-AQE
    // plan, same rationale as the ingest-screen pin above.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val sp = Registry.byName("sim_ann_pq_rerank").run(spark, sf).queryExecution.sparkPlan
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case s: FileSourceScanExec => s }
    def path(s: FileSourceScanExec): String = s.relation.location.rootPaths.mkString(",")
    def queryFiltered(s: FileSourceScanExec): Boolean =
      s.metadata.getOrElse("PushedFilters", "").contains("LessThan(vec_id,100)")
    val all = scansOf(sp)
    assert(all.exists(s => path(s).contains("graft_pq_index") && path(s).contains("codes")),
      s"candidates must come from the persisted codes view:\n$sp")
    val emb = all.filter(s => path(s).contains("embeddings.parquet"))
    assert(emb.nonEmpty, s"expected embeddings scans in the exact stage:\n$sp")
    assert(emb.count(s => !queryFiltered(s)) == 1,
      "exactly ONE unfiltered embeddings scan is allowed (the exact-stage " +
        s"candidate probe); got ${emb.count(s => !queryFiltered(s))}:\n$sp")
    // and the shortlist (k=20) subtree itself reads no unfiltered embeddings
    val shortTrees = sp.collect {
      case t: org.apache.spark.sql.graftx.TopKPerGroupExec if t.k == 20 => t
    }
    assert(shortTrees.nonEmpty, s"no k=20 shortlist TopKPerGroup in plan:\n$sp")
    for (t <- shortTrees; s <- scansOf(t) if path(s).contains("embeddings.parquet"))
      assert(queryFiltered(s), s"shortlist stage scans raw base embeddings:\n$t")
  }

  test("dedup_ngram_jaccard joins on the length bucket, never lang-only all-pairs") {
    // r18: widening the row's scope to 2000 docs made the original
    // lang-keyed self-join the bench's slowest row (13.9 s at sf0.1 —
    // the exact all-pairs shape the near-jaccard manifest exists to
    // avoid). The fix banded it (bucket key `pb` joins alongside lang,
    // ±1 probe explode, 3:5 prefilter); pin that the pair join's keys
    // INCLUDE the bucket so a re-derivation can't silently fall back
    // to quadratic-within-lang.
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val sp = Registry.byName("dedup_ngram_jaccard").run(spark, sf).queryExecution.sparkPlan
    val equiJoins = sp.collect { case j: BaseJoinExec if j.leftKeys.nonEmpty => j }
    assert(equiJoins.nonEmpty, s"expected an equi pair join:\n$sp")
    def keyNames(j: BaseJoinExec): Set[String] =
      j.leftKeys.flatMap(_.references.map(_.name)).toSet
    assert(equiJoins.exists(j => keyNames(j).exists(_.startsWith("pb"))),
      s"pair join must be keyed on the length bucket, got keys " +
        s"${equiJoins.map(keyNames)}:\n$sp")
    assert(!equiJoins.exists(j => keyNames(j) == Set("lang")),
      s"lang-only all-pairs join regression:\n$sp")
  }

  test("dedup_boilerplate joins only on the (source, paragraph-hash) key — never doc×doc") {
    // The removal stage's 100 TB contract: paragraphs flow through a
    // (source, h)-keyed df aggregate and join back on the SAME key —
    // any join keyed more coarsely (source-only would fan every doc of
    // a source against every hot paragraph of it) or any pairwise
    // doc×doc shape is a regression.
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val sp = Registry.byName("dedup_boilerplate").run(spark, sf).queryExecution.sparkPlan
    val joins = sp.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, s"expected the hot-paragraph join:\n$sp")
    for (j <- joins) {
      val keys = j.leftKeys.flatMap(_.references.map(_.name)).toSet
      // EXACT names (ADVICE r19 #4): startsWith("h") would let any
      // future "hot_*"-named attribute satisfy the paragraph-hash pin
      assert(keys == Set("source", "h"),
        s"hot-paragraph join must be keyed on exactly (source, h), got $keys:\n$sp")
    }
  }

  test("dedup_boilerplate_global joins on (h) and (source, h) only — never doc-keyed or source-only") {
    // The global sibling's 100 TB contract: the corpus-wide df gate
    // joins back on exactly the paragraph hash, the attribution gate on
    // exactly (source, h). A source-only key would fan every doc of a
    // source against all its hot paragraphs; any doc-keyed join is the
    // pairwise regression both boilerplate rows exist to avoid.
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    for (name <- Seq("dedup_boilerplate_global", "pipeline_boilerplate_rewrite")) {
      val sp = Registry.byName(name).run(spark, sf).queryExecution.sparkPlan
      val joins = sp.collect { case j: BaseJoinExec if j.leftKeys.nonEmpty => j }
      assert(joins.size >= 2, s"$name: expected the global + per-source joins:\n$sp")
      val keySets = joins.map(_.leftKeys.flatMap(_.references.map(_.name)).toSet).toSet
      assert(keySets == Set(Set("h"), Set("source", "h")),
        s"$name: joins must be keyed exactly on (h) and (source, h), got $keySets:\n$sp")
    }
  }

  test("pipeline_corpus_build serves its dedup and contamination verdicts from the persisted views") {
    // The composition row's whole point (VERDICT r18 #1): the near-dup
    // and contamination stages must SCAN the write-once views, never
    // re-run the blocked pair join / the shingle build inline. If the
    // view reads silently degrade to recomputes the row still
    // hash-matches — only this structural pin (and the bench delta)
    // would notice.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def paths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
      }
    // half 1: the flag pass (un-truncated) — verdicts view-served, and
    // exactly two corpus passes (keeper groupBy + flag projection)
    val fp = paths(operators.Sampling.corpusBuildFlags(spark, sf))
    assert(fp.exists(_.contains("graft_dedup_pairs")),
      s"near-dup verdicts must come from the pair-manifest view, scans: $fp")
    assert(fp.exists(_.contains("graft_contam_shingles")),
      s"contamination verdicts must come from the shingle view, scans: $fp")
    assert(fp.count(_.contains("documents.parquet")) <= 2,
      s"flag pass re-derives from raw text, scans: $fp")
    // half 2: the composed row reads the TRUNCATED flag frame — its six
    // downstream consumers must plan ZERO file re-scans (documents OR
    // views); everything flows from the one materialized pass
    val rp = paths(Registry.byName("pipeline_corpus_build").run(spark, sf))
    assert(rp.isEmpty,
      s"composition re-scans files instead of the materialized flag frame: $rp")
  }

  test("pipeline_corpus_build_bestkeep keeps the view-served zero-rescan chain") {
    // The policy variant (VERDICT r19 #1) must not regress the
    // composition contract: its flag pass still serves contamination
    // from the persisted shingle view and makes at most two raw corpus
    // passes; the near-dup verdicts arrive as the CHECKPOINTED drop
    // FRAME (r21, VERDICT r20 #1 — the anti-join result of the CC +
    // keeper argmax over the persisted pair manifest, materialized
    // once, so the manifest never appears in the flag PLAN), and the
    // composed row reads only the truncated flag frame.
    import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec}
    def paths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
      }
    val flags = operators.Sampling.corpusBuildFlagsBestKeep(spark, sf)
    val fp = paths(flags)
    assert(fp.exists(_.contains("graft_contam_shingles")),
      s"contamination verdicts must come from the shingle view, scans: $fp")
    assert(!fp.exists(_.contains("graft_dedup_pairs")),
      s"keeper verdicts must arrive as the checkpointed drop frame, not an inline manifest scan: $fp")
    assert(fp.count(_.contains("documents.parquet")) <= 2,
      s"flag pass re-derives from raw text, scans: $fp")
    // the scale pin (VERDICT r20 #1): the drop set must ride a
    // distributed frame, never a LocalRelation rebuilt from ids
    // collected to the driver — at 100 TB the drop set is O(corpus)
    val locals = flags.queryExecution.sparkPlan.collect {
      case l: LocalTableScanExec => l
    }
    assert(locals.isEmpty,
      s"flag pass embeds a LocalTableScan — the drop set was collected driver-side: $locals")
    val rp = paths(Registry.byName("pipeline_corpus_build_bestkeep").run(spark, sf))
    assert(rp.isEmpty,
      s"composition re-scans files instead of the materialized flag frame: $rp")
  }

  test("agg_group_pricing uses two-phase hash aggregation") {
    val p = plan("agg_group_pricing")
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("dedup_embed_cosine broadcasts the per-doc norm table") {
    val p = plan("dedup_embed_cosine")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("dynamic partition pruning fires on a partition-keyed fact join") {
    import org.apache.spark.sql.functions._
    // Pin the feature on so the assertion tests the plan, not whatever
    // the Spark version's default happens to be.
    val dppKey = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val prevDpp = spark.conf.get(dppKey)
    spark.conf.set(dppKey, "true")
    val basePath = java.nio.file.Files.createTempDirectory("graft_dpp")
    try {
      val base = basePath.toString
      val ev = Tables.events(spark, sf).select(col("event_id"), col("event_type"), col("value"))
      ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
      val fact = spark.read.parquet(base)
      // dim filter is on a NON-join column, so the partition filter can
      // only be derived at runtime from the dim scan — at 100 TB this is
      // the difference between scanning one partition and all of them
      val dim = ev
        .select(col("event_type")).distinct()
        .withColumn("type_len", length(col("event_type")))
        .filter(col("type_len") === 8) // "purchase" only
      val joined = fact.join(dim, Seq("event_type"))
      assert(joined.count() > 0)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"), p.take(3000))
    } finally {
      spark.conf.set(dppKey, prevDpp)
      // temp datasets written by tests must not accumulate across runs
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(basePath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    import org.apache.spark.sql.functions._
    // Row-level runtime pruning, the complement of DPP: when the dim
    // side is filtered hard, Catalyst builds a bloom filter over its
    // join keys at runtime and pushes might_contain onto the fact scan
    // — at 100 TB the fact side then skips most of its rows before the
    // shuffle. Thresholds are sized for clusters (10 GB application
    // side), so pin them down to make the rewrite observable at test SF.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      // broadcast joins skip runtime filters (the broadcast IS the filter)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000) // selective dim-side filter
        .select(col("o_orderkey"))
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join_bloom_prune probes the explicit bloom above the fact scan, before the join") {
    val p = plan("join_bloom_prune")
    val probeLine = p.linesIterator.indexWhere(_.contains("long_bloom_might_contain"))
    val joinLine = p.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
    assert(probeLine >= 0, "native bloom probe missing from the plan\n" + p.take(2000))
    assert(joinLine >= 0, p.take(2000))
    // deeper in the tree = later in toString: the filter must sit BELOW
    // the join (between scan and join), not above it
    assert(probeLine > joinLine, s"probe at $probeLine not below join at $joinLine\n" + p.take(3000))
  }

  test("sql_sorted_intersect plans the native codegen merge kernel from SQL text") {
    val p = plan("sql_sorted_intersect")
    assert(p.contains("sorted_intersect_count"),
      "SQL-text call did not plan SortedLongIntersectCount\n" + p.take(2000))
  }

  test("sql_bloom_filter probes the native bloom from SQL text, below the join") {
    val p = plan("sql_bloom_filter")
    val probeLine = p.linesIterator.indexWhere(_.contains("long_bloom_might_contain"))
    val joinLine  = p.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
    assert(probeLine >= 0, "native bloom probe missing from the SQL-text plan\n" + p.take(2000))
    assert(joinLine >= 0, p.take(2000))
    // same pushdown shape join_bloom_prune pins for the DataFrame
    // spelling: the single-column probe predicate must sit below the
    // join, on the fact side
    assert(probeLine > joinLine, s"probe at $probeLine not below join at $joinLine\n" + p.take(3000))
  }

  test("sim_hybrid_rrf cuts both lists with TakeOrderedAndProject, never a global sort") {
    val p = plan("sim_hybrid_rrf")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("maint_scd2 shares one custkey exchange across both windows and the aggregate") {
    val p = plan("maint_scd2")
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    // one hashpartitioning(o_custkey) + the final output range sort
    assert(exchanges <= 2, s"$exchanges exchanges — the SCD2 chain re-shuffled\n" + p.take(3000))
  }

  test("the parity audit's sliced batch cross-checks push the key slice to the scan") {
    // The state-parity audit bounds each machine's batch cross-check
    // with a key-hash slice (pmod(key, 8) === 0); at 100 TB that is
    // only slice-bounded if Catalyst pushes the pmod predicate below
    // the windowed derivations to the scan (partition-key predicates
    // push through Window). Pin it for the two EXPENSIVE cross-checks
    // — scd2 (three o_custkey windows + an aggregate) and the EWMA
    // fold (user window) — so a re-derivation can't silently turn the
    // audit's batch side into a full-table pass.
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def scanHasPmod(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
        l.contains("FileScan parquet") && l.contains("DataFilters:") &&
          l.contains("pmod"))
    val scd2 = operators.Maintenance.maintScd2.run(spark, sf)
      .filter(pmod(col("o_custkey"), lit(8)) === 0)
    assert(scanHasPmod(scd2), "scd2 slice did not reach the orders scan")
    val ewma = operators.TimeSeries.tsEwma.run(spark, sf)
      .filter(pmod(col("user_id"), lit(8)) === 0)
    assert(scanHasPmod(ewma), "ewma slice did not reach the events scan")
  }

  test("the streaming ingest screens' broadcast-probe plan never shuffles the corpus") {
    // The r17 micro-batch screen shape: the trigger-bounded probe
    // side broadcasts, so the persisted corpus index is scanned in
    // place — no (band, bk) exchange on the corpus per trigger. If
    // the broadcast silently degrades (hint dropped, threshold
    // surprise), the audit's cost model regresses invisibly; pin the
    // plan: a BroadcastHashJoin, and NO hashpartitioning exchange on
    // the band key anywhere in the screen's plan.
    import org.apache.spark.sql.functions.col
    val corpus = spark.read
      .parquet(operators.Dedup.minhashSigTablePath(spark, sf))
      .filter(col("doc_id") % 10 =!= 0)
    val corpusB  = operators.Dedup.bandedMinhashSigs(corpus)
    val corpusOk = corpusB
      .join(operators.Dedup.minhashBucketCapOk(corpusB), Seq("band", "bk"))
      .persist() // the twin persists the prepped corpus ONCE per run;
    try {        // the one band exchange lives in that one-time build
      corpusOk.count()
      val probes = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
      // tree walk on the pre-AQE physical plan, NOT the plan string:
      // the string renders the InMemoryRelation's cached BUILD plan,
      // which legitimately contains the one-time band exchanges —
      // collect() does not descend into the cache, so what it sees is
      // exactly the per-trigger work
      val sp = operators.Dedup
        .minhashScreenPrepared(probes, corpusOk, broadcastProbe = true)
        .queryExecution.sparkPlan
      val bandShuffles = sp.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("band") => e
      }
      assert(bandShuffles.isEmpty, s"corpus band shuffle in the per-trigger plan:\n$sp")
      assert(sp.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty, s"no broadcast hash join in the screen plan:\n$sp")
    } finally { corpusOk.unpersist(); () }
  }

  test("text_bm25_persisted and text_bm25_topk run DISTINCT plans (batch vs single probe)") {
    // r10 left the pair byte-identical (two bench slots, one plan);
    // r11 re-differentiated the persisted row into multi-query batch
    // scoring — the registry must never again pay two slots for one
    // plan, and the batch row's distinguishing operators must be
    // visible: the broadcast query-map join fanout and the per-query
    // TopKPerGroup.
    val single = plan("text_bm25_topk")
    val batch  = plan("text_bm25_persisted")
    assert(single != batch, "the two BM25 rows must not share one plan")
    assert(batch.contains("TopKPerGroup"), s"batch row should rank per query via TopKPerGroup:\n${batch.take(2000)}")
    assert(!single.contains("TopKPerGroup"), "single-query row keeps its TakeOrdered top-k")
  }

  test("no unplanned cartesian product anywhere in the registry") {
    // CartesianProduct is the one physical operator that cannot survive
    // a 100x scale-up. Whitelist: the contract's deliberate small-table
    // cartesian. Broadcast nested-loop joins are fine (the broadcast
    // side is bounded); planning-only, no execution.
    val allowed = Set("join_cross_small")
    for (q <- Registry.all if !allowed(q.name)) {
      val p = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct")
    }
  }

  test("no partitionless window over an unaggregated table anywhere in the registry") {
    // The second physical operator that cannot survive a 100x scale-up:
    // Window with no partition spec moves EVERY input row to one
    // partition. Over a raw (or joined/filtered-only) table that is a
    // scale-killer; over an aggregated or k-limited child it is bounded
    // by the aggregate's group count / the limit, which is the only
    // place the registry is allowed to plan one. Grids.runningSums is
    // the sanctioned replacement for the raw-table case.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

    // Window children whose row count is NOT bounded by an aggregate or
    // limit: walk down; hitting a file/DSv2 relation or a LogicalRDD
    // (checkpointed frame) without crossing a bound = unbounded.
    def unbounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => false
      case _: LogicalRelation | _: DataSourceV2Relation => true
      case l if l.nodeName == "LogicalRDD"              => true
      case other                                        => other.children.exists(unbounded)
    }
    // A partition spec that is CONSTANT-VALUED is partitionless in
    // everything but spelling: Det.onePart's pmod(xxhash64, 1) is
    // identically 0 (non-foldable on purpose, so the optimizer can't
    // strip it), and a foldable key folds to one partition outright.
    // Without this, onePart would defeat both the WindowExec warning
    // AND this gate — the exact regression class the gate exists for.
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Pmod}
    def constKey(e: Expression): Boolean = e.foldable || (e match {
      case p: Pmod =>
        p.right match {
          case Literal(v, _) => v == 1 || v == 1L
          case _             => false
        }
      case _ => false
    })
    val offenders = for {
      q <- Registry.all
      w <- q.run(spark, sf).queryExecution.optimizedPlan.collect {
        case w: Window
            if (w.partitionSpec.isEmpty || w.partitionSpec.forall(constKey)) &&
              unbounded(w.child) =>
          w
      }
    } yield s"${q.name}: Window[${w.windowExpressions.map(_.name).mkString(",")}]"
    assert(offenders.isEmpty, "partitionless windows over unaggregated input:\n" + offenders.mkString("\n"))
  }

  test("AQE splits a skewed partition in a sort-merge join") {
    import org.apache.spark.sql.functions._
    // Funnel ~40% of lineitem onto one join key, forbid broadcast, and
    // shrink the skew thresholds to test scale: AQE must mark the hot
    // partition and split it (skew=true in the final plan). At 100 TB
    // this is what keeps one reducer from running for hours.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // sf0.01 for enough bytes, and repartition(8) so the hot reduce
      // partition is built from 8 map outputs — AQE can only split a
      // skewed partition at map-output granularity
      val big = "/root/testdata/sf0.01"
      // one-sided skew: 40% of the left lands on key 0, the right keeps
      // its natural keys — the hot left partition must split while the
      // join output stays small enough to collect
      val skewed = Tables.lineitem(spark, big).repartition(8)
        .select(when(col("l_orderkey") % 5 < 2, 0L).otherwise(col("l_orderkey")).as("k"),
          col("l_extendedprice"))
      val other = Tables.lineitem(spark, big).repartition(8)
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val joined = skewed.join(other, Seq("k"))
      // collect() (not count()) so THIS Dataset's adaptive plan
      // executes and finalizes — count() wraps a separate execution
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(500))
      assert(p.contains("skew=true"), p.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("whole-stage codegen is active on the flagship query") {
    // codegen'd operators render with a "*(id)" prefix — only visible
    // in the FINAL adaptive plan, so execute first
    val df = Registry.byName("agg_group_pricing").run(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(2000))
  }
}
