package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.DataFrame
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

  /** IVF ANN: assign each vector to its nearest label-centroid list
    * (map-side argmin over the broadcast centroid table), then search
    * the probe's nearest 2 lists only. No oracle — recall vs brute
    * force is asserted in AdvancedSpec. */
  val simAnnIvf: Q = Q(
    "sim_ann_ivf",
    None,
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      // centroid per label as an array column (collected onto ~10 rows,
      // then broadcast — the coarse quantizer is tiny by construction)
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
        .groupBy(col("label"), col("p"))
        // decimal-sum mean: partition-order-independent, so repeated
        // runs assign vectors to identical lists
        .agg((Det.dsum(col("v").cast("double")) / count(lit(1))).as("c"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("p"), col("c")))).as("pc"))
        .select(col("label").as("list_id"), transform(col("pc"), x => x.getField("c")).as("centroid"))
      // distance of a vector set to every list centroid (10 lists);
      // built per caller so the probe side filters BEFORE the cross
      // join — the previous formulation traversed one full-table dots
      // lineage twice (once per window)
      def withDist(src: DataFrame): DataFrame = src
        .crossJoin(broadcast(cent))
        .withColumn(
          "d",
          aggregate(
            zip_with(col("embedding"), col("centroid"), (x, c) => x.cast("double") * c),
            lit(0.0),
            (acc, x) => acc + x
          )
        )
        .select(col("vec_id"), col("embedding"), col("label"), col("list_id"), col("d"))
      import org.apache.spark.sql.graftx.TopKPerGroup
      // argmin assignment / nprobe selection via the custom top-k
      // operator: all 10 centroid rows of a vector sit in one scan
      // partition, so the partial collapses them map-side — the
      // exchange moves 1 (resp. 2) rows per vector, not 10
      val assigned = TopKPerGroup(withDist(e), Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 1)
        .select(col("vec_id"), col("embedding"), col("label"), col("list_id"))
      val probes = TopKPerGroup(
        withDist(e.filter(col("vec_id") < 100)),
        Seq("vec_id"), Seq("d" -> true, "list_id" -> false), 2) // nprobe = 2
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("list_id"))
      val cands = probes
        .join(
          assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("list_id")),
          Seq("list_id")
        )
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", Det.rS(org.apache.spark.sql.graftx.FloatDot.dot(col("qe"), col("ne")), 6))
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("list_id"))
      TopKPerGroup(cands, Seq("query_id"), Seq("cos" -> true, "neighbor_id" -> false), 3, rnName = "rank")
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"), col("list_id"))
        .orderBy(col("query_id"), col("rank"))
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

  def qs: Seq[Q] = Seq(ivfCentroids, simAnnIvf, funnelVcp)
}
