package graft

import org.apache.spark.sql.SparkSession

/** Dev-only interleaved A/B for a RUNTIME SQL conf: runs the named
  * queries with the conf set/unset in alternating rounds inside one
  * JVM, so co-tenant noise bursts land on both arms (the StreamEqAb
  * methodology generalized). Memoized rows are memo-cleared per
  * iteration like BenchRepeat.
  *
  * Usage: `runMain graft.ConfAb <rounds> <key=value> <query> [query ...]`
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val rounds = args(0).toInt
    val Array(key, value) = args(1).split("=", 2)
    val names  = args.drop(2).toSeq
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
    val default = spark.conf.getOption(key)
    // throwaway pass to build serving views / absorb codegen off the clock
    names.foreach(n => scala.util.Try(Registry.byName(n).run(spark, sfDir).count()))
    val times = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (r <- 1 to rounds; arm <- Seq("off", "on")) {
      if (arm == "on") spark.conf.set(key, value)
      else default.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      for (n <- names) {
        val q = Registry.byName(n)
        if (q.memoizes) Registry.clearMemos()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        scala.util.Try(spark.sharedState.cacheManager.clearCache())
        times((n, arm)) = times((n, arm)) :+ dt
      }
      println(s"[confab] round $r done")
    }
    for (n <- names; arm <- Seq("off", "on")) {
      val ts = times((n, arm))
      println(f"[confab] $n%-28s $arm%-3s ${ts.map(t => f"$t%6.2f").mkString(" ")}  min=${ts.min}%6.2f median=${ts.sorted.apply(ts.size / 2)}%6.2f")
    }
    spark.stop()
  }
}
