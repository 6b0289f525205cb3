package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B harness for the stream_equivalence_report family-session
  * shape (VERDICT r21 #1): runs the report memo-cleared with each
  * `spark.graft.streameq.famsess` arm in ROUND-ROBIN inside one JVM, so
  * co-tenant noise bursts land on every arm instead of whichever JVM was
  * unlucky. Prints per-iteration seconds and per-arm min.
  *
  * Usage: `runMain graft.StreamEqAb [rounds] [arm ...]`
  */
object StreamEqAb {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(4)
    val arms   = if (args.length > 1) args.drop(1).toSeq else Seq("perfam", "pooled", "shared")
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.byName("stream_equivalence_report")
    // one throwaway run to build serving views / warm codegen off the clock
    Registry.clearMemos()
    q.run(spark, sfDir).count()
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to rounds; arm <- arms) {
      spark.conf.set("spark.graft.streameq.famsess", arm)
      Registry.clearMemos()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(arm) = times(arm) :+ dt
      println(f"[ab] round $r arm $arm%-7s $dt%7.2f s")
    }
    arms.foreach { a =>
      val ts = times(a)
      println(f"[ab] ARM $a%-7s ${ts.map(t => f"$t%6.2f").mkString(" ")}  min=${ts.min}%6.2f  median=${ts.sorted.apply(ts.size / 2)}%6.2f")
    }
    spark.stop()
  }
}
