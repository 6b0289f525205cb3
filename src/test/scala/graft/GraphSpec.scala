package graft

/** Structural invariants of the graph family — checked on sf0.001 so a
  * formula slip (handshake imbalance, wedge undercount, rank-mass blow-
  * up) fails fast without waiting for the oracle round.
  */
class GraphSpec extends SparkSuite {

  test("BFS levels match a driver-side traversal and partition the reachable set") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((_, ps) <- li.groupBy(_._1); Array(a, b) <- ps.map(_._2).distinct.sorted.combinations(2)) {
      adj(a) += b; adj(b) += a
    }
    var level = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_partkey") < 5).collect().map(_.getLong(0)).toSet
    var seen = level
    val exp = scala.collection.mutable.Map(0 -> level)
    for (d <- 1 to 3) {
      level = level.flatMap(adj).diff(seen)
      seen ++= level
      if (level.nonEmpty) exp(d) = level
    }
    val got = operators.Graph.graphBfsReach.run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exp.filter(_._2.nonEmpty).keySet)
    for ((d, nodes) <- exp if nodes.nonEmpty) {
      assert(got(d)._1 == nodes.size, s"dist $d count")
      assert(got(d)._2 == nodes.sum, s"dist $d checksum")
    }
  }

  test("BFS traversal never re-derives the edge build (view scan, no lineitem)") {
    val p = operators.Graph.graphBfsReach.run(spark, sf).queryExecution.executedPlan.toString
    // r8 truncated the DERIVED edge list once before the frontier
    // recursion; r9 serves it from the materialized parquet view, so
    // the traversal plan's ~12 references to the symmetric edge list
    // are all columnar scans of the view — the lineitem self-join edge
    // build must appear NOWHERE in the executed traversal plan (it ran
    // once, inside the view materialization).
    assert(p.contains("graft_graph_edges"), "edge list must scan the materialized view\n" + p.take(2000))
    assert(!p.contains("lineitem"), "traversal plan re-derives the lineitem edge build\n" + p.take(4000))
  }

  test("co-purchase edge view is materialized once and serves all full-scope consumers") {
    val p1 = operators.Graph.edgeTablePath(spark, sf)
    val local = new java.io.File(p1.stripPrefix("file:"))
    val m1 = local.listFiles().map(_.lastModified).max
    val p2 = operators.Graph.edgeTablePath(spark, sf)
    assert(p1 == p2, "view path must be stable within a session")
    assert(local.listFiles().map(_.lastModified).max == m1, "second call must not rewrite the view")
    // every full-scope consumer scans the view, never the lineitem build
    for (q <- Seq(operators.Graph.graphDegree, operators.Graph.graphPowerlawFit,
                  operators.Graph.graphJaccardNeighbors)) {
      val p = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("graft_graph_edges"), s"${q.name} must scan the materialized edge view\n" + p.take(2000))
      assert(!p.contains("lineitem"), s"${q.name} must not rebuild the lineitem edge join\n" + p.take(4000))
    }
  }

  test("edge build drops a synthetic mega-order (hot-key cap) and keeps normal baskets intact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one pathological basket with MaxBasketParts+1 distinct parts
    // (ids 1000+) plus two normal baskets sharing the pair (1, 2): the
    // capped derivation must contribute ZERO edges from the mega-order
    // — without the cap it would add C(65,2) = 2,080 pair rows from a
    // single shuffle key — while the normal baskets' pairs and weights
    // are untouched by the cap.
    val mega    = (0 to operators.Graph.MaxBasketParts).map(i => (999L, 1000L + i))
    val normal  = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L))
    val op      = (mega ++ normal).toDF("l_orderkey", "l_partkey")
    val edges   = operators.Graph.edgesFrom(op).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(!edges.keys.exists { case (a, b) => a >= 1000L || b >= 1000L },
      s"mega-order parts must contribute no edges, got ${edges.keys.filter(_._1 >= 1000L)}")
    assert(edges == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L),
      s"normal-basket edges/weights wrong: $edges")
    // with the cap lifted above the mega-basket, its pairs appear —
    // proving the filter (not some other stage) is what drops them
    val uncapped = operators.Graph.edgesFrom(op, maxBasket = 1000).count()
    assert(uncapped == 3L + 2080L, // C(65,2) mega pairs + the 3 normal-basket pairs
      s"uncapped build must keep the mega-basket pairs, got $uncapped")
  }

  test("degree histogram covers every part and the handshake sum is even") {
    val rows = operators.Graph.graphDegree.run(spark, sf).collect()
    val nParts = spark.read.parquet(s"$sf/part.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nParts, "histogram must cover all parts")
    val handshake = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(handshake % 2 == 0, s"sum of degrees must be 2|E|, got $handshake")
  }

  test("pagerank iterations never re-exchange the checkpointed edge list") {
    val df = operators.Graph.graphPagerank.run(spark, sf)
    val p  = df.queryExecution.executedPlan.toString
    // the edge list is a localCheckpoint scan whose LogicalRDD pins
    // hash(s) partitioning (the round-6 rework); each iteration may
    // shuffle ONLY the transpose re-key (groupBy d) — the edge side,
    // pr0, and the final degree join must all reuse pinned/propagated
    // partitioning. 3 iterations => at most 3 shuffle exchanges, +1
    // slack for planner drift; the pre-rework window+persist shape
    // planned 8+.
    assert(p.contains("Scan ExistingRDD"), "edge list must be a checkpoint scan\n" + p.take(2000))
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 4, s"$exchanges exchanges — the iteration chain re-shuffled\n" + p.take(4000))
  }

  test("pagerank mass stays bounded and the ranking is run-to-run identical") {
    def top() = operators.Graph.graphPagerank.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val t = top()
    assert(t.nonEmpty && t.size <= 20)
    // every fixed-point rank is positive and below the total mass unit
    assert(t.forall { case (_, _, pr) => pr > 0 && pr < 1000000000000000L })
    // sorted by (pr desc, node asc)
    val keys = t.map { case (n, _, pr) => (-pr, n) }
    assert(keys == keys.sorted, "output must be ordered by rank desc, node asc")
    assert(top() == t, "iterative plan must be deterministic across runs")
  }

  test("triangle counts respect the wedge bound and transitivity is a ratio") {
    val rows = operators.Graph.graphTriangles.run(spark, sf).collect()
    for (r <- rows) {
      val (nodes, edges, wedges, tris) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val trans = r.getDouble(5)
      assert(edges <= nodes * (nodes - 1) / 2, s"$r: more edges than node pairs")
      assert(3 * tris <= wedges, s"$r: each triangle closes exactly 3 wedges")
      assert(trans >= 0.0 && trans <= 1.0, s"$r: transitivity out of [0,1]")
    }
  }
}
