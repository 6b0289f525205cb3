package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables}

/** Graph analytics over relationally-modeled graphs.
  *
  * Two graphs derived from the fixture tables, both cited patterns from
  * classic large-scale analytics:
  *
  *  - the CO-PURCHASE graph on `part`: an undirected edge joins two
  *    parts that appear in the same order (market-basket co-occurrence).
  *    Built with one self-join of lineitem on the order key — at 100 TB
  *    this is a single shuffle on `l_orderkey`, and per-order pair
  *    fan-out is bounded by the basket size squared.
  *  - the NEAR-DUP graph on `documents`: edges are the token-Jaccard
  *    ≥ 0.8 pairs from [[Dedup.nearJaccardPairs]] (same blocked join,
  *    same probe-scope discipline as the clustering family).
  *
  * Everything here is deterministic by construction: degrees, wedge and
  * triangle counts are exact integers, and PageRank runs in FIXED-POINT
  * integer arithmetic (see [[graphPagerank]]) so no floating-point sum
  * order can leak into the output — long sums are exact and
  * order-independent in both engines, which is what makes an ITERATIVE
  * numeric algorithm hash-verifiable cross-engine at all.
  */
object Graph {

  /** (order, part) incidence list the co-purchase projection is built
    * from. NOT pre-deduplicated: the rare same-part-twice-in-an-order
    * rows only fan the pair join out marginally, and the edge-level
    * DISTINCT subsumes them — one less shuffle than dedup-then-join. */
  private def orderParts(spark: SparkSession, dir: String, orderFilter: Column): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(orderFilter)
      .select(col("l_orderkey"), col("l_partkey"))

  /** Hot-key cap on the co-purchase projection: an order contributing
    * more than this many DISTINCT parts is dropped from the edge build
    * (the LSH screen's bucket-cap argument, applied to baskets): pair
    * fan-out is quadratic in basket size, so one pathological
    * mega-basket — a B2B bulk order, a data glitch — would contribute
    * C(n,2) edge rows from a single `l_orderkey` shuffle key and
    * dominate the whole build, while carrying no co-purchase signal
    * ("everything with everything" is noise, exactly like an oversized
    * LSH bucket). 64 bounds any basket's contribution at C(64,2) =
    * 2,016 pairs; the fixture's largest basket is 17 distinct parts
    * (sf0.1), so on contract data the cap is semantics-invisible —
    * every graph oracle applies the same HAVING bound so the DECLARED
    * semantics match at any scale, and GraphSpec proves the cutoff on
    * a synthetic mega-order. */
  private[graft] val MaxBasketParts = 64

  /** Weighted co-purchase edge derivation over an (l_orderkey,
    * l_partkey) incidence frame — factored out of the ViewStore build
    * so GraphSpec can drive it with a synthetic mega-order without
    * touching the store. */
  private[graft] def edgesFrom(op: DataFrame, maxBasket: Int = MaxBasketParts): DataFrame =
    basketPairs(op, maxBasket)
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("w"))

  /** Per-BASKET pair generation — everything in [[edgesFrom]] except
    * the final cross-basket weight aggregate, with `l_orderkey` kept on
    * each pair row. Factored so the streaming edge-view twin
    * ([[graft.streaming.StreamDemos.streamedEdgeView]]) can maintain
    * per-order pair CONTRIBUTIONS (replace-by-order, which is what
    * makes the hot-key cap retractable when a basket grows past it
    * mid-stream) from literally the batch build's spelling; the batch
    * path's optimizer prunes the carried key before the (pa, pb)
    * exchange, so the view build's plan is unchanged. */
  private[graft] def basketPairs(op: DataFrame, maxBasket: Int = MaxBasketParts): DataFrame =
    // no pre-distinct: collect_set dedups parts within each basket, so
    // a distinct here would just add a full extra exchange before the
    // groupBy for identical view content
    op.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) <= maxBasket) // hot-key cap, see MaxBasketParts
      .select(
        col("l_orderkey"),
        explode(
          flatten(
            expr(
              "transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb)))"
            )
          )
        ).as("e")
      )
      .select(col("l_orderkey"), col("e.pa"), col("e.pb"))

  /** Shared oracle CTE prefix: the distinct (order, part) incidence
    * `li`, its basket-capped restriction `cli` (the oracle spelling of
    * [[edgesFrom]]'s [[MaxBasketParts]] hot-key cap — declared on both
    * sides so Spark and DuckDB agree at ANY scale, not just on
    * fixtures where the cap never fires) and the simple edge set `e`.
    * Every consumer of the materialized edge view opens its oracle
    * with this. */
  private def oEdgeCtes: String =
    "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      s"bk AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) <= $MaxBasketParts), " +
      "cli AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN bk USING (l_orderkey)), " +
      "e AS (SELECT DISTINCT a.l_partkey pa, b.l_partkey pb FROM cli a JOIN cli b " +
      "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"

  /** Materialize the full-scope simple co-purchase edge list ONCE per
    * (session, data dir) and serve every consumer from the parquet —
    * the engine-internal MATERIALIZED EDGE VIEW. Four registry queries
    * (degree, powerlaw_fit, jaccard_neighbors, bfs_reach) analyze the
    * same deduped edge set; the standalone-query contract used to make
    * each of them re-pay the lineitem self-join (the r8 bench note:
    * 4 of the 15 slowest queries were this one build). At 100 TB the
    * co-purchase projection is exactly the kind of derived table a
    * warehouse maintains NEXT TO the facts — build it in one shuffle,
    * serve graph queries from the far smaller edge table, refresh
    * on ingest. Here the first caller per session builds it; every
    * later consumer is a plain parquet scan.
    *
    * Same [[graft.ViewStore]] discipline as [[Dedup.sigTablePath]]:
    * input-fingerprinted path (stale-proof against a regenerated
    * input dir), write-to-temp + rename for the cross-JVM race.
    */
  private[graft] def edgeTablePath(spark: SparkSession, dir: String): String =
    // WEIGHTED edges (pa, pb, w): per-basket in-row pair generation
    // over the distinct part set, COUNTED across baskets instead of
    // distinct'd — same single groupBy shuffle as the simple-graph
    // build, but the view now serves both consumer classes: the
    // simple-graph queries project (pa, pb) (each pair appears once,
    // with its weight alongside), and graph_lift reads w directly as
    // its pair support instead of re-running the basket pair
    // generation.
    // buildVersion = 3: r9's v2 added the w column; r10's v3 added
    // the MaxBasketParts hot-key cap to the derivation — content is
    // identical on the fixture corpora (largest basket: 17), but
    // the BUILD DEFINITION changed, and the rule is to bump on any
    // derivation change rather than reason per-case about whether
    // an old store happens to coincide
    graft.ViewStore.materialize(spark, "graft_graph_edges", dir, buildVersion = 3)(
      edgesFrom(orderParts(spark, dir, lit(true))))

  /** The (pa < pb) simple co-purchase edges served from the
    * materialized view — what the full-scope simple-graph consumers
    * call (the weight column is projected away). */
  private def sharedEdges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(edgeTablePath(spark, dir)).select(col("pa"), col("pb"))

  /** The weighted (pa, pb, w) co-purchase edges from the same view —
    * w = number of distinct baskets containing both parts. */
  private def sharedWeightedEdges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(edgeTablePath(spark, dir))

  /** Degree distribution of the full co-purchase graph: for every part
    * (including the never-co-ordered ones at degree 0), its number of
    * distinct co-purchase partners, rolled up into a degree → n_parts
    * histogram. Served from the [[edgeTablePath]] materialized view —
    * one edge-table scan + two hash aggregates; the histogram output
    * is tiny at any scale, so this is the safe "describe the graph"
    * primitive to run before anything iterative.
    */
  val graphDegree: Q = Q(
    "graph_degree",
    Some(
      s"WITH $oEdgeCtes, " +
        "sym AS (SELECT pa p FROM e UNION ALL SELECT pb FROM e), " +
        "deg AS (SELECT p, count(*) AS dg FROM sym GROUP BY 1), " +
        "alln AS (SELECT part.p_partkey, coalesce(deg.dg, 0) AS degree " +
        "FROM part LEFT JOIN deg ON part.p_partkey = deg.p) " +
        "SELECT degree, count(*) AS n_parts FROM alln GROUP BY degree ORDER BY degree"
    ),
    (spark, dir) => {
      val e = sharedEdges(spark, dir)
      val sym = e.select(col("pa").as("p")).unionAll(e.select(col("pb").as("p")))
      val deg = sym.groupBy(col("p")).agg(count(lit(1)).as("dg"))
      Tables
        .part(spark, dir)
        .select(col("p_partkey"))
        .join(deg, col("p_partkey") === col("p"), "left")
        .select(coalesce(col("dg"), lit(0L)).as("degree"))
        .groupBy(col("degree"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("degree"))
    }
  )

  /** Fixed-point scale for PageRank: probabilities in units of 10⁻¹⁵.
    * Worst-case intermediate is 85 · Σpr ≤ 85 · 10¹⁵ ≪ 2⁶³. */
  private val PrScale = 1000000000000000L
  private val PrBase  = PrScale * 15 / 100 // the (1-d) teleport numerator

  /** 3-iteration PageRank over the WEIGHTED co-purchase multigraph
    * (edge multiplicity = number of co-orders; a pair ordered together
    * twice passes twice the rank mass) — in INTEGER fixed-point
    * arithmetic. Floating-point PageRank is unverifiable cross-engine
    * (the per-node Σ contrib is an order-dependent double sum, and
    * rounding between iterations only shrinks, never removes, the
    * divergence), so pr is carried in units of 10⁻¹⁵: pr₀ = S/N,
    * contrib = pr div deg, pr' = (0.15·S) div N + (85·Σcontrib) div 100 —
    * every operation exact integer, every sum order-independent, the
    * output hash-stable by construction. The deliberate floor-division
    * mass leak (< N·10⁻¹⁵) is the price of determinism and is
    * irrelevant to the ranking. The multigraph form is also one shuffle
    * cheaper than a simple graph (no pair-dedup pass): contrib uses the
    * WEIGHTED degree, so duplicate edge rows are the weights.
    *
    * Plan shape (the [[Dedup]] clustering-loop pattern): the symmetric
    * edge list is built by ONE lineitem self-join (`=!=` emits both
    * directions — no union-of-reversals, so the join runs once, not
    * twice), repartitioned on `s`, and CHECKPOINTED via
    * [[graft.Lineage.truncate]] (executor-local blocks by default;
    * reliable storage when `spark.graft.checkpoint.dir` is set). The
    * checkpoint truncates lineage into a LogicalRDD that PINS the
    * hash(`s`) partitioning — unlike `.persist()`, whose
    * InMemoryRelation wraps an adaptive subplan with unknown
    * outputPartitioning and therefore re-exchanged the cached edge
    * list into every iteration (the round-5 caveat, now fixed rather
    * than documented). Source degrees then attach via one broadcast
    * join (degree table is part-catalog-bounded = a dimension; the
    * broadcast preserves the streamed side's partitioning), so each
    * iteration is exactly one s-join — edge side exchange-free — plus
    * the contribution re-key from src to dst (PageRank's inherent
    * transpose shuffle). The rank side is never broadcast: it scales
    * with nodes. At 100 TB the same shape holds — set
    * `spark.graft.checkpoint.dir` for the reliable checkpoint and swap
    * the broadcast degree join for a shuffle join.
    * Bench clears checkpointed blocks between queries. Orders are
    * 10%-sampled by key (deterministic, same filter in the oracle) to
    * bound the contract query; the operator itself is scale-free.
    */
  val graphPagerank: Q = Q(
    "graph_pagerank",
    Some(
      "WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 = 0), " +
        "e AS (SELECT a.l_partkey pa, b.l_partkey pb FROM li a JOIN li b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), " +
        "sym AS (SELECT pa s, pb d FROM e UNION ALL SELECT pb, pa FROM e), " +
        "deg AS (SELECT s AS node, count(*) AS deg FROM sym GROUP BY 1), " +
        "nn AS (SELECT count(*) AS n FROM deg), " +
        s"p0 AS (SELECT node, $PrScale // n AS pr FROM deg, nn), " +
        s"p1 AS (SELECT sym.d AS node, (SELECT $PrBase // n FROM nn) + " +
        "(85 * cast(sum(p0.pr // deg.deg) as bigint)) // 100 AS pr " +
        "FROM sym JOIN p0 ON sym.s = p0.node JOIN deg ON sym.s = deg.node GROUP BY sym.d), " +
        s"p2 AS (SELECT sym.d AS node, (SELECT $PrBase // n FROM nn) + " +
        "(85 * cast(sum(p1.pr // deg.deg) as bigint)) // 100 AS pr " +
        "FROM sym JOIN p1 ON sym.s = p1.node JOIN deg ON sym.s = deg.node GROUP BY sym.d), " +
        s"p3 AS (SELECT sym.d AS node, (SELECT $PrBase // n FROM nn) + " +
        "(85 * cast(sum(p2.pr // deg.deg) as bigint)) // 100 AS pr " +
        "FROM sym JOIN p2 ON sym.s = p2.node JOIN deg ON sym.s = deg.node GROUP BY sym.d) " +
        "SELECT deg.node AS p_partkey, deg.deg AS degree, p3.pr AS pr_fx " +
        "FROM p3 JOIN deg ON p3.node = deg.node ORDER BY p3.pr DESC, deg.node LIMIT 20"
    ),
    (spark, dir) => {
      val li = orderParts(spark, dir, col("l_orderkey") % 10 === 0)
      // ONE self-join emits BOTH directions of every co-purchase pair
      // (condition =!=, not <): the symmetric multigraph edge list with
      // no union-of-reversals and no double evaluation. Repartition on
      // s + localCheckpoint materializes it ONCE with pinned hash(s)
      // partitioning (LogicalRDD keeps outputPartitioning; a persist()
      // would not — see scaladoc).
      val sym = li
        .as("a")
        .join(
          li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") && col("a.l_partkey") =!= col("b.l_partkey")
        )
        .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("d"))
        .repartition(col("s"))
        .transform(graft.Lineage.truncate)
      // Weighted degree = one groupBy over the already-s-partitioned
      // checkpoint (no exchange); checkpointed too since it feeds three
      // consumers (edge enrichment, pr0, the final degree join).
      val deg = graft.Lineage.truncate(sym.groupBy(col("s")).agg(count(lit(1)).as("deg")))
      val nn  = deg.agg(count(lit(1)).as("n"))
      // Source degrees attach via a broadcast join, which PRESERVES the
      // streamed edge list's hash(s) partitioning — iterations join on
      // s with zero exchange on the edge side.
      val enriched = sym
        .join(broadcast(deg.select(col("s").as("ds"), col("deg").as("degs"))), col("s") === col("ds"))
        .select(col("s"), col("d"), col("degs"))
      // The node count rides along in the rank frame (node, pr, n) so
      // the edge list needs no cross-join against it.
      val pr0 = deg
        .crossJoin(broadcast(nn))
        .select(col("s").as("node"), expr(s"$PrScale div n").as("pr"), col("n"))
      def step(pr: DataFrame): DataFrame =
        enriched
          .join(pr, col("s") === pr("node"))
          .groupBy(col("d"))
          .agg(sum(expr("pr div degs")).as("cs"), min(col("n")).as("n"))
          .select(
            col("d").as("node"),
            (expr(s"$PrBase div n") + expr("(85 * cs) div 100")).as("pr"),
            col("n")
          )
      val p3 = step(step(step(pr0)))
      p3.join(deg, p3("node") === deg("s"))
        .select(col("node").as("p_partkey"), col("deg").as("degree"), col("pr").as("pr_fx"))
        .orderBy(col("pr_fx").desc, col("p_partkey"))
        .limit(20)
    }
  )

  /** Triangle probe scope for [[graphTriangles]]: at sf0.01 this covers
    * the whole documents table; at larger SFs it bounds the contract
    * query the same way [[Dedup.ClusterProbeScope]] bounds clustering
    * (the near-dup graph is near-clique dense by construction, so the
    * triangle COUNT itself grows cubically with cluster size — a real
    * corpus would not, see SCALING.md). */
  private val TriangleProbeScope = 500L

  /** Per-language transitivity of the near-dup graph: nodes, edges,
    * wedges (open 2-paths), closed triangles, and the global clustering
    * coefficient 3·triangles/wedges. High transitivity is the signal
    * that a Jaccard threshold yields stable clusters (near-cliques)
    * rather than accidental chains — the structural health check for
    * threshold-based dedup.
    *
    * The count uses the oriented-wedge formulation: edges are stored
    * a < b, a wedge is e₁(a,b) ⋈ e₂(b,c), and a LEFT-SEMI join against
    * the edge list closes it — each triangle counted exactly once, no
    * DISTINCT pass. All counts are exact integers; the one ratio is a
    * division of identical doubles.
    */
  val graphTriangles: Q = Q(
    "graph_triangles",
    Some(
      "WITH d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t " +
        s"FROM documents WHERE doc_id < $TriangleProbeScope), " +
        "p AS (SELECT a.doc_id ida, b.doc_id idb, a.lang, " +
        s"${Dedup.oJac("a.t", "b.t")} AS jac " +
        "FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
        s"AND ${Dedup.oLenRatio("a.t", "b.t")}), " +
        "e AS (SELECT ida, idb, lang FROM p WHERE jac >= 0.8), " +
        "sym AS (SELECT ida nd, lang FROM e UNION ALL SELECT idb, lang FROM e), " +
        "deg AS (SELECT nd, lang, count(*) AS dg FROM sym GROUP BY 1, 2), " +
        "ns AS (SELECT lang, count(*) AS n_nodes, cast(sum(dg) as bigint) // 2 AS n_edges, " +
        "cast(sum(dg * (dg - 1) // 2) as bigint) AS n_wedges FROM deg GROUP BY 1), " +
        "tri AS (SELECT e1.lang, count(*) AS n_tri FROM e e1 " +
        "JOIN e e2 ON e1.idb = e2.ida JOIN e e3 ON e3.ida = e1.ida AND e3.idb = e2.idb " +
        "GROUP BY 1) " +
        "SELECT ns.lang, ns.n_nodes, ns.n_edges, ns.n_wedges, " +
        "coalesce(tri.n_tri, 0) AS n_triangles, " +
        "CASE WHEN ns.n_wedges > 0 THEN " +
        Det.oRN("(3.0 * coalesce(tri.n_tri, 0)) / ns.n_wedges", 6) +
        " ELSE cast(0 as double) END AS transitivity " +
        "FROM ns LEFT JOIN tri ON ns.lang = tri.lang ORDER BY ns.lang"
    ),
    (spark, dir) => {
      // served from the dedup pair manifest restricted to the probe
      // scope (lossless — see Dedup.scopedManifestPairs) instead of
      // re-screening the scoped corpus
      val edges = Dedup.scopedManifestPairs(spark, dir, TriangleProbeScope)
      val lang = Tables
        .documents(spark, dir)
        .filter(col("doc_id") < TriangleProbeScope)
        .select(col("doc_id"), col("lang"))
      val withLang = edges.join(broadcast(lang), edges("ida") === lang("doc_id"))
      val sym = withLang
        .select(col("ida").as("nd"), col("lang"))
        .unionAll(withLang.select(col("idb").as("nd"), col("lang")))
      val deg = sym.groupBy(col("nd"), col("lang")).agg(count(lit(1)).as("dg"))
      val ns = deg
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_nodes"),
          expr("sum(dg) div 2").as("n_edges"),
          expr("sum(dg * (dg - 1) div 2)").as("n_wedges")
        )
      val wedges = edges
        .as("e1")
        .join(edges.as("e2"), col("e1.idb") === col("e2.ida"))
        .select(col("e1.ida").as("ta"), col("e1.idb").as("tb"), col("e2.idb").as("tc"))
      val closed = wedges.join(
        edges.as("e3"),
        col("ta") === col("e3.ida") && col("tc") === col("e3.idb"),
        "left_semi"
      )
      val tri = closed
        .join(broadcast(lang), col("ta") === lang("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tri"))
      ns.as("ns")
        .join(tri.as("tri"), Seq("lang"), "left")
        .select(
          col("lang"),
          col("n_nodes"),
          col("n_edges"),
          col("n_wedges"),
          coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
          when(
            col("n_wedges") > 0,
            Det.rN((lit(3.0) * coalesce(col("n_tri"), lit(0L))) / col("n_wedges"), 6)
          ).otherwise(lit(0.0)).as("transitivity")
        )
        .orderBy(col("lang"))
    }
  )

  /** Power-law fit of the co-purchase degree distribution: OLS of
    * ln(n_parts) on ln(degree) over the nonzero histogram — the
    * log-log slope is the (negative) scale-free exponent, and r² says
    * whether a power law describes the graph at all. This is the
    * "should I worry about hubs" diagnostic run before sizing any
    * skew-sensitive graph job (a steep slope with high r² means the
    * salting / hub-splitting machinery of agg_salted is needed; a flat
    * or poorly-fit tail means degrees are benign). Composes the
    * [[graphDegree]] histogram (tiny at any scale) with the exact
    * decimal moment sums of `agg_regression`.
    */
  val graphPowerlawFit: Q = Q(
    "graph_powerlaw_fit",
    Some(
      s"WITH $oEdgeCtes, " +
        "sym AS (SELECT pa p FROM e UNION ALL SELECT pb FROM e), " +
        "deg AS (SELECT p, count(*) AS dg FROM sym GROUP BY 1), " +
        "hist AS (SELECT dg AS degree, count(*) AS n_parts FROM deg GROUP BY 1), " +
        "pts AS (SELECT ln(degree::DOUBLE) AS x, ln(n_parts::DOUBLE) AS y FROM hist), " +
        "m AS (SELECT count(*)::DOUBLE AS n, " +
        s"${Det.oSum("x")} AS sx, ${Det.oSum("y")} AS sy, ${Det.oSum("x * y")} AS sxy, " +
        s"${Det.oSum("x * x")} AS sxx, ${Det.oSum("y * y")} AS syy FROM pts) " +
        "SELECT cast(n as bigint) AS n_points, " +
        Det.oRN("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6) + " AS slope, " +
        Det.oRN("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n", 6) +
        " AS intercept, " +
        Det.oRN(
          "((n * sxy - sx * sy) * (n * sxy - sx * sy)) / " +
            "((n * sxx - sx * sx) * (n * syy - sy * sy))",
          6
        ) + " AS r2 FROM m"
    ),
    (spark, dir) => {
      val e   = sharedEdges(spark, dir)
      val sym = e.select(col("pa").as("p")).unionAll(e.select(col("pb").as("p")))
      val m = sym
        .groupBy(col("p"))
        .agg(count(lit(1)).as("dg"))
        .groupBy(col("dg"))
        .agg(count(lit(1)).as("n_parts"))
        .select(log(col("dg").cast("double")).as("x"), log(col("n_parts").cast("double")).as("y"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          Det.dsum(col("x")).as("sx"),
          Det.dsum(col("y")).as("sy"),
          Det.dsum(col("x") * col("y")).as("sxy"),
          Det.dsum(col("x") * col("x")).as("sxx"),
          Det.dsum(col("y") * col("y")).as("syy")
        )
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vx  = col("n") * col("sxx") - col("sx") * col("sx")
      val vy  = col("n") * col("syy") - col("sy") * col("sy")
      m.select(
        col("n").cast("long").as("n_points"),
        Det.rN(cov / vx, 6).as("slope"),
        Det.rN((col("sy") - cov / vx * col("sx")) / col("n"), 6).as("intercept"),
        Det.rN((cov * cov) / (vx * vy), 6).as("r2")
      )
    }
  )

  /** Association rules over the order/part baskets: for every
    * co-purchased part pair with support ≥ 3 baskets, the classic
    * market-basket metrics — support, both directional confidences,
    * and lift — top 50 by lift. The affinity signal a curation or
    * recommendation pipeline mines from co-occurrence (same shape as
    * query-document co-click mining).
    *
    * Determinism: basket counts (N, n_a, n_b, n_ab) are exact longs;
    * each metric is ONE IEEE division (lift: one divide of exact
    * products), trunc-rounded 6 dp; ordering ties break on (pa, pb).
    *
    * 100 TB: pair support comes straight from the materialized
    * weighted edge view (w = distinct-basket co-occurrence count), so
    * the query does no pair generation at all; item supports and the scalar N are small aggregates
    * broadcast back onto the (bounded, support-filtered) pair set.
    * Bound on the integer algebra: the lift numerator nab·N (and
    * denominator na·nb) stays below 2⁶³ only while basket count and
    * item supports keep the products under ~9·10¹⁸ — safe for any
    * plausible basket corpus (nab ≤ na ≤ N, so the binding product is
    * na·nb < 2⁶³, i.e. item supports to ~3·10⁹); past that, widen the
    * products to DECIMAL(38,0) before the divide. */
  val graphLift: Q = Q(
    "graph_lift",
    Some(
      // n and ia are CORPUS stats (uncapped li — the basket count and
      // item supports a lift denominator wants); only the PAIR support
      // comes from the capped incidence, mirroring the Spark side where
      // pr reads the capped edge view while n/ia scan the facts
      "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        s"bk AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) <= $MaxBasketParts), " +
        "cli AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN bk USING (l_orderkey)), " +
        "n AS (SELECT cast(count(DISTINCT l_orderkey) as bigint) AS nb FROM li), " +
        "ia AS (SELECT l_partkey, cast(count(*) as bigint) AS na FROM li GROUP BY 1), " +
        "pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, cast(count(*) as bigint) AS nab " +
        "FROM cli a JOIN cli b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 3) " +
        "SELECT pa, pb, nab, " +
        Det.oRN("nab::DOUBLE / n.nb", 6) + " AS support, " +
        Det.oRN("nab::DOUBLE / ia.na", 6) + " AS conf_a_b, " +
        Det.oRN("nab::DOUBLE / ib.na", 6) + " AS conf_b_a, " +
        Det.oRN("(nab * n.nb)::DOUBLE / (ia.na * ib.na)", 6) + " AS lift " +
        "FROM pr JOIN ia ON pr.pa = ia.l_partkey JOIN ia ib ON pr.pb = ib.l_partkey " +
        "CROSS JOIN n ORDER BY lift DESC, pa, pb LIMIT 50"
    ),
    (spark, dir) => {
      val li = orderParts(spark, dir, lit(true)).distinct()
      val n = li.agg(countDistinct(col("l_orderkey")).as("nb"))
      val ia = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("na"))
      // pair support IS the materialized weighted edge view (w = count
      // of distinct baskets containing both parts) — lift reads it
      // instead of re-running the basket pair generation
      val pr = sharedWeightedEdges(spark, dir)
        .select(col("pa"), col("pb"), col("w").as("nab"))
        .filter(col("nab") >= 3)
      // item supports are hint-broadcast: the table is bounded by the
      // part CATALOG (a dimension, not the fact), and the planner has
      // no stats for a derived aggregate — without the hint it plans
      // SMJ + re-sorts and re-scans the incidence per join (measured
      // 2.4 s → 5.0 s isolated, worse in-suite). An unbounded item
      // universe would drop the hint and accept the shuffle join.
      pr.join(broadcast(ia.select(col("l_partkey").as("pa"), col("na"))), Seq("pa"))
        .join(broadcast(ia.select(col("l_partkey").as("pb"), col("na").as("nbq"))), Seq("pb"))
        .crossJoin(broadcast(n))
        .select(
          col("pa"),
          col("pb"),
          col("nab"),
          Det.rN(col("nab").cast("double") / col("nb"), 6).as("support"),
          Det.rN(col("nab").cast("double") / col("na"), 6).as("conf_a_b"),
          Det.rN(col("nab").cast("double") / col("nbq"), 6).as("conf_b_a"),
          Det.rN((col("nab") * col("nb")).cast("double") / (col("na") * col("nbq")), 6).as("lift")
        )
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(50)
    }
  )

  /** Neighbor-overlap link prediction: for scoped part pairs, the
    * Jaccard of their co-purchase neighbor sets — wedges (shared
    * neighbors) counted by one self-join on the shared endpoint, then
    * |N(a) ∪ N(b)| = deg(a) + deg(b) − common. The classic "customers
    * also bought" / similar-item screen, ranked by structural
    * similarity rather than direct co-occurrence ([[graphLift]]).
    *
    * Determinism: all counts exact; one division trunc-rounded 6 dp;
    * ties break on (pa, pb).
    *
    * 100 TB: the wedge join shuffles on the shared-neighbor id — hub
    * neighbors are the skew (each contributes deg² wedges), handled in
    * production by a degree cap on the JOIN side (drop hubs above a
    * percentile: a part co-bought with everything predicts nothing);
    * the probe scope here bounds the demo pair set the same way the
    * triangle count does. */
  /** Wedge-join probe scope: wedge volume is quadratic in the scoped
    * pair set, so this demo bound is tighter than the triangle one.
    * Measured honestly (r8, pre-view): 6.1 s → 5.4 s at sf0.1 — the
    * query's floor was the simple-graph edge build, now amortized into
    * the [[edgeTablePath]] materialized view; the scope still protects
    * the quadratic wedge term. */
  private val JaccardProbeScope = 200L

  val graphJaccardNeighbors: Q = Q(
    "graph_jaccard_neighbors",
    Some(
      s"WITH $oEdgeCtes, " +
        "sym AS (SELECT pa AS p, pb AS n FROM e UNION ALL SELECT pb, pa FROM e), " +
        "deg AS (SELECT p, cast(count(*) as bigint) AS dg FROM sym GROUP BY p), " +
        "w AS (SELECT a.p AS pa, b.p AS pb, cast(count(*) as bigint) AS common " +
        s"FROM sym a JOIN sym b ON a.n = b.n AND a.p < b.p " +
        s"WHERE a.p < $JaccardProbeScope AND b.p < $JaccardProbeScope " +
        "GROUP BY a.p, b.p HAVING count(*) >= 2) " +
        "SELECT w.pa, w.pb, w.common, da.dg AS deg_a, db.dg AS deg_b, " +
        Det.oRN("w.common::DOUBLE / (da.dg + db.dg - w.common)", 6) + " AS jac " +
        "FROM w JOIN deg da ON w.pa = da.p JOIN deg db ON w.pb = db.p " +
        "ORDER BY jac DESC, w.pa, w.pb LIMIT 50"
    ),
    (spark, dir) => {
      val e = sharedEdges(spark, dir)
      val sym = e
        .select(col("pa").as("p"), col("pb").as("n"))
        .unionAll(e.select(col("pb").as("p"), col("pa").as("n")))
      val deg = sym.groupBy(col("p")).agg(count(lit(1)).as("dg"))
      val w = sym
        .filter(col("p") < JaccardProbeScope)
        .select(col("p").as("pa"), col("n"))
        .join(
          sym.filter(col("p") < JaccardProbeScope).select(col("p").as("pb"), col("n")),
          Seq("n")
        )
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("common"))
        .filter(col("common") >= 2)
      w.join(broadcast(deg.select(col("p").as("pa"), col("dg").as("deg_a"))), Seq("pa"))
        .join(broadcast(deg.select(col("p").as("pb"), col("dg").as("deg_b"))), Seq("pb"))
        .select(
          col("pa"),
          col("pb"),
          col("common"),
          col("deg_a"),
          col("deg_b"),
          Det.rN(col("common").cast("double") / (col("deg_a") + col("deg_b") - col("common")), 6)
            .as("jac")
        )
        .orderBy(col("jac").desc, col("pa"), col("pb"))
        .limit(50)
    }
  )

  /** Min-hop BFS reachability from a 5-part seed set, capped at 3
    * hops, rolled up as (distance → node count + key checksum) — the
    * "blast radius" query (recall impact, contamination spread,
    * related-item expansion) and the missing traversal primitive next
    * to [[graphPagerank]] (global importance) and dedup_clusters
    * (full components). The Spark side unrolls three frontier
    * expansions: each hop is one equi-join of the symmetric edge list
    * against the current frontier, a distinct, and an anti-join
    * against the visited set — the textbook distributed BFS where
    * per-hop cost is one shuffle and state is the (node, dist) set,
    * never a driver-side queue. The oracle walks the same graph with
    * a depth-bounded recursive CTE and takes min(dist) per node.
    *
    * Determinism: frontier sets and min-hop levels are exact; the
    * rollup is integer counts/sums.
    *
    * 100 TB: edges are served from the [[edgeTablePath]] materialized
    * view (built once per session); each hop shuffles only the frontier
    * (bounded by the reachable set), and the anti-join keys are
    * node ids. Hop count is a hard cap, so worst case is 3 bounded
    * self-equi-joins — no transitive-closure blowup. */
  val graphBfsReach: Q = Q(
    "graph_bfs_reach",
    Some(
      s"WITH RECURSIVE $oEdgeCtes, " +
        "sym AS (SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e), " +
        "seeds AS (SELECT p_partkey AS p FROM part WHERE p_partkey < 5), " +
        "walk AS (SELECT p, 0 AS dist FROM seeds " +
        "UNION SELECT sym.d, walk.dist + 1 FROM walk JOIN sym ON sym.s = walk.p " +
        "WHERE walk.dist < 3), " +
        "lvl AS (SELECT p, min(dist) AS dist FROM walk GROUP BY p) " +
        "SELECT dist, count(*)::BIGINT AS n_parts, cast(sum(p) as bigint) AS key_checksum " +
        "FROM lvl GROUP BY dist ORDER BY dist"
    ),
    (spark, dir) => {
      // The frontier recursion references `sym` in every hop's join AND
      // every anti-join's visited union (~12 edge subtrees in the lazy
      // plan). When edges were DERIVED (a lineitem self-join) that
      // forced a lineage truncation here — r7's slowest query, 8.9 s,
      // fixed by checkpointing the derivation once. Served from the
      // materialized parquet view, each subtree is already a cheap
      // columnar scan of a small file, and a localCheckpoint would just
      // copy the table into block-manager memory for no lineage gain —
      // measured 0.5 s SLOWER at sf0.1/32 (BenchRepeat min-of-4,
      // 2.82 s truncated vs 2.26 s direct). So: no truncate.
      val eT = sharedEdges(spark, dir)
      val sym = eT
        .select(col("pa").as("s"), col("pb").as("d"))
        .unionAll(eT.select(col("pb").as("s"), col("pa").as("d")))
      val seeds = Tables
        .part(spark, dir)
        .filter(col("p_partkey") < 5)
        .select(col("p_partkey").as("p"))
      var visited = seeds.withColumn("dist", lit(0))
      var frontier = seeds
      for (i <- 1 to 3) {
        frontier = sym
          .join(frontier, sym("s") === frontier("p"))
          .select(col("d").as("p"))
          .distinct()
          .join(visited.select(col("p")), Seq("p"), "left_anti")
        visited = visited.unionAll(frontier.withColumn("dist", lit(i)))
      }
      visited
        .groupBy(col("dist"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(col("p")).cast("long").as("key_checksum")
        )
        .orderBy(col("dist"))
    }
  )

  def qs: Seq[Q] = Seq(graphDegree, graphPagerank, graphTriangles, graphPowerlawFit, graphLift,
    graphJaccardNeighbors, graphBfsReach)
}
