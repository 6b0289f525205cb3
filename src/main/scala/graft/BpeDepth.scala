package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline BPE depth measurement (not part of the driver contract —
  * VERDICT r15 #4): run the incremental trainer ONCE to a deep merge
  * budget on a synthetic vocabulary and print cumulative wall seconds
  * at checkpoint ranks, so the per-merge marginal cost past the
  * suite's 1000-merge pin is a measured curve instead of an
  * extrapolation. One instrumented run (the onMerge hook) rather than
  * re-training per budget: t(8000) alone carries t(1000..8000) too.
  *
  * Usage: `runMain graft.BpeDepth [maxMerges] [nWords]`
  * (defaults 8000 / 20000). The vocabulary is md5-derived 32-hex
  * words — 16-symbol alphabet, ~640k symbol occurrences at the
  * default size, so the greedy pair pool outlives an 8k budget with
  * ~77× headroom. Results are recorded in SCALING.md.
  */
object BpeDepth {
  def main(args: Array[String]): Unit = {
    val maxMerges = args.headOption.map(_.toInt).getOrElse(8000)
    val nWords    = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val cpus      = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val md = java.security.MessageDigest.getInstance("MD5")
    val words = (0 until (nWords * 11 / 10))
      .map { i =>
        val hex = md.digest(s"w$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (hex, (i % 7) + 1L)
      }
      .groupBy(_._1).map { case (t, rs) => (t, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1).take(nWords)
    require(words.size == nWords, s"vocab collided: ${words.size} < $nWords")
    val w = words.toDF("tok", "freq")
      // one tiny partition, as in the suite's linearity pin: per-round
      // cost is the ROUND (job + argmax + one replace pass), not task fanout
      .repartition(1)
      .withColumn("st", operators.TextAnalysis.bpeInitSt)

    val checkpoints = Iterator.iterate(250)(_ * 2).takeWhile(_ < maxMerges).toSeq :+ maxMerges
    val marks = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val t0 = System.nanoTime()
    val merges = operators.TextAnalysis.bpeTrainLoopOn(w, maxMerges, { rank =>
      if (checkpoints.contains(rank)) {
        val t = (System.nanoTime() - t0) / 1e9
        marks += ((rank, t))
        val perMerge = marks.toSeq match {
          case _ :+ ((r0, s0)) :+ ((r1, s1)) if r1 > r0 => (s1 - s0) / (r1 - r0) * 1000
          case _                                        => t / rank * 1000
        }
        println(f"[bpe-depth] rank=$rank%6d  cum=$t%8.1f s  marginal=$perMerge%7.1f ms/merge")
      }
    })
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-depth] trained ${merges.length} merges in $total%.1f s over $nWords words")
    if (merges.length < maxMerges)
      println(s"[bpe-depth] WARNING: pair pool exhausted at rank ${merges.length} (< $maxMerges)")
    // flatness verdict at the deepest measured point: the marginal
    // per-merge cost of the LAST checkpoint segment vs the FIRST —
    // linear-in-depth training means the ratio stays near 1 (the
    // suite's two-point cumulative-ratio pin, but on marginals and at
    // 8× the depth). 3× tolerates co-tenant noise and cache-generation
    // drift while still refusing anything super-linear.
    val segs = marks.toSeq.sliding(2).collect {
      case Seq((r0, s0), (r1, s1)) => (r1, (s1 - s0) / (r1 - r0) * 1000)
    }.toSeq
    segs.headOption.zip(segs.lastOption).foreach { case ((rA, mA), (rB, mB)) =>
      val ratio = mB / mA
      println(f"[bpe-depth] marginal flatness: $mA%.1f ms/merge @≤$rA vs $mB%.1f ms/merge @≤$rB → ratio $ratio%.2f " +
        (if (ratio < 3.0) "FLAT" else "SUPER-LINEAR"))
    }
    spark.stop()
  }
}
