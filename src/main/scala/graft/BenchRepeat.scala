package graft

import org.apache.spark.sql.SparkSession

/** Local profiling aid (not part of the driver contract): run the
  * named registry queries N times each in one warmed JVM and print
  * per-iteration wall times, so plan-shape A/Bs aren't drowned by the
  * single-shot noise of the full bench (measured ±50% on some boxes).
  *
  * Usage: `runMain graft.BenchRepeat <n> <query> [query ...]`
  * (env `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS` as in [[Bench]]).
  */
object BenchRepeat {
  def main(args: Array[String]): Unit = {
    val n     = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Fail fast on a typo'd query name — BEFORE the session spins up,
    // and with the valid-name list in the message instead of a bare
    // key-not-found from a Map apply.
    val unknown = names.filterNot(Registry.byName.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[repeat] unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")}\n" +
          s"[repeat] valid names: ${Registry.all.map(_.name).sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.scheduler.mode", "FAIR") // match Bench (see its r18 attribution note)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B knob passthrough (e.g. SPARK_GRAFT_CONF="spark.graft.streameq.pool=8"):
    // runtime confs the queries read via spark.conf, ';'-separated k=v.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.trim.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k.trim, v.trim)
        case _ => sys.error(s"bad SPARK_GRAFT_CONF entry (expected k=v): '$kv'")
      }
    })
    for (name <- names) {
      val q = Registry.byName(name)
      val times = (1 to n).map { _ =>
        // A memoized row's iterations 2..n would time the memo HIT —
        // useless for plan A/Bs. Clear like the bench's memo-cleared
        // pass so every iteration measures the recompute.
        if (q.memoizes) Registry.clearMemos()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        scala.util.Try(spark.sharedState.cacheManager.clearCache())
        scala.util.Try(spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false)))
        dt
      }
      println(f"[repeat] $name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
