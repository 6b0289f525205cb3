package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val d2 = aggregate(
      zip_with(col("x"), col("c"), (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, v) => acc + v
    )
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

  /** Cluster profile after 3 deterministic Lloyd's iterations:
    * (cid, n_members, wcss). No oracle — unrolled k-means iterations
    * are not reasonably expressible in one SQL statement; MlSpec
    * asserts determinism and the monotone-WCSS invariant instead. */
  val mlKmeans: Q = Q(
    "ml_kmeans",
    None,
    (spark, dir) => {
      val (assigned, _) = lloyd(spark, dir)
      assigned
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), Det.rN(Det.dsum(col("d2")), 6).as("wcss"))
        .orderBy(col("cid"))
    }
  )

  def qs: Seq[Q] = Seq(mlKmeans)
}
