package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r18 #6): stage decomposition of
  * dedup_ngram_jaccard's warm floor at a given SF. Times, in one warm
  * JVM: (1) the per-query shingle-set build alone (the stage a
  * ViewStore serve would eliminate), (2) the bucket join + count
  * prefilter WITHOUT the intersect kernel (candidate materialization
  * cost), (3) the full row. (3)−(2) ≈ the verification kernel;
  * (2)−(1) ≈ candidate generation; (1) = what view-serving could save.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.NgramFloor [reps]
  */
object NgramFloor {
  def main(args: Array[String]): Unit = {
    val reps  = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.graftx.SortedLongIntersectCount
    // the ROW's own signature builder — the probe times the real stages
    def d = operators.Dedup.bigramShingleDocs(spark, sfDir)
    def joined = {
      val a = d.select(
        col("doc_id").as("ida"), col("lang"), col("s").as("sa"), col("ns").as("na"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("pb"))
      val b = d.select(
        col("doc_id").as("idb"), col("lang"), col("s").as("sb"), col("ns").as("nb"),
        col("bkt").as("pb"))
      a.join(b, Seq("lang", "pb"))
        .filter(
          col("ida") < col("idb") &&
            lit(5) * least(col("na"), col("nb")) >= lit(3) * greatest(col("na"), col("nb")))
    }
    def time(tag: String)(f: => Long): Unit = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[ngramfloor] $tag%-22s ${xs.map(_._1).map(x => f"$x%6.3f").mkString(" ")} min=${xs.map(_._1).min}%6.3f rows=${xs.head._2}")
    }
    // warm-up: one full-row pass (codegen + page cache)
    Registry.byName("dedup_ngram_jaccard").run(spark, sfDir).count()
    // one action: sum(ns) forces the full shingle derivation per row;
    // the reported row count is the aggregate's own count, never a
    // literal that could silently drift from the row's scope (ADVICE r19)
    time("shingle_build") {
      d.agg(sum(col("ns")), count(lit(1))).head().getLong(1)
    }
    time("candidates_no_kernel")(joined.count())
    time("full_row")(Registry.byName("dedup_ngram_jaccard").run(spark, sfDir).count())
    // the kernel in isolation over the surviving candidates
    time("candidates_plus_kernel")(
      joined.withColumn("inter", SortedLongIntersectCount.count(col("sa"), col("sb")))
        .filter(col("inter") >= 0).count())
    // r20: the PPJoin-style prefix-filter twin end-to-end (same pair
    // set) — the wall-clock side of the dedup_ngram_blocking_probe
    // candidate-count comparison
    time("prefix_full")(
      operators.Dedup.ngramPairsPrefix(spark, sfDir).count())
    // and the engine-only variant: prefix sliced straight off the
    // already-sorted rolling-mix signature arrays (no md5 build, no
    // window) — order differs, losslessness doesn't
    time("prefix_full_mix") {
      val pfx = d.select(
        col("doc_id"), col("lang"), col("ns"),
        explode(expr("slice(s, 1, ns - ((3 * ns + 4) div 5) + 1)")).as("h"))
      val cand = pfx.select(col("doc_id").as("ida"), col("lang"), col("ns").as("na"), col("h"))
        .join(pfx.select(col("doc_id").as("idb"), col("lang"), col("ns").as("nb"), col("h")),
          Seq("lang", "h"))
        .filter(col("ida") < col("idb") &&
          lit(5) * least(col("na"), col("nb")) >= lit(3) * greatest(col("na"), col("nb")))
        .select(col("ida"), col("idb")).distinct()
      cand
        .join(d.select(col("doc_id").as("ida"), col("s").as("sa"), col("ns").as("na")), Seq("ida"))
        .join(d.select(col("doc_id").as("idb"), col("s").as("sb"), col("ns").as("nb")), Seq("idb"))
        .withColumn("inter", SortedLongIntersectCount.count(col("sa"), col("sb")))
        .withColumn("jac", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jac") >= 0.6)
        .count()
    }
    spark.stop()
  }
}
