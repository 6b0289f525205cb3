package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (r17, not part of the driver contract):
  * time ONE equivalence-report family in isolation, with phase
  * breakdown, to attribute the leg's cost without pool contention. */
object ProbeStreamEq {
  def main(args: Array[String]): Unit = {
    val dir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val what = args.headOption.getOrElse("minhash")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    what match {
      case "minhash" =>
        // warm the views first
        t("view warm")(operators.Dedup.minhashSigTablePath(spark, dir))
        (1 to 3).foreach { i =>
          t(s"minhash screen run $i") {
            graft.streaming.StreamDemos
              .minhashScreenedIngest(spark, dir, copies = 2,
                scope = pmod(col("doc_id"), lit(8)) === 0)
              .count()
          }
        }
      case "minhash-phases" =>
        t("view warm")(operators.Dedup.minhashSigTablePath(spark, dir))
        (1 to 2).foreach { i =>
          val corpus = spark.read
            .parquet(operators.Dedup.minhashSigTablePath(spark, dir))
            .filter(col("doc_id") % 10 =!= 0)
          val corpusB = operators.Dedup.bandedMinhashSigs(corpus)
          val corpusOk = t(s"r$i band+cap+persist") {
            val c = corpusB
              .join(operators.Dedup.minhashBucketCapOk(corpusB), Seq("band", "bk"))
              .persist()
            c.count(); c
          }
          val scope = pmod(col("doc_id"), lit(8)) === 0
          val probes = Tables.documents(spark, dir)
            .filter(col("doc_id") % 10 === 0).filter(scope)
          t(s"r$i batch-plan x1")(
            operators.Dedup.minhashScreenPrepared(probes, corpusOk).collect().length)
          t(s"r$i batch-plan x2")(
            operators.Dedup.minhashScreenPrepared(probes, corpusOk).collect().length)
          corpusOk.unpersist()
        }
      case "contam" =>
        t("view warm")(operators.TextAnalysis.contamShingleTablePath(spark, dir))
        (1 to 3).foreach { i =>
          t(s"contam screen run $i") {
            graft.streaming.StreamDemos
              .contamScreenedIngest(spark, dir, copies = 2,
                scope = pmod(col("doc_id"), lit(8)) === 0)
              .count()
          }
        }
      case "edge" =>
        (1 to 3).foreach { i =>
          t(s"edge view run $i") {
            graft.streaming.StreamDemos
              .streamedEdgeView(spark, dir, copies = 2,
                scope = pmod(col("l_orderkey"), lit(16)) === 0)
              .count()
          }
        }
      case "session" =>
        // empirics for the r17 equality cross-check: which last-session
        // timers fire under the 2-chunk AvailableNow replay — the batch-1
        // watermark (chunk0 max − 1 h) or the final one (global max − 1 h)?
        val userScope = pmod(col("user_id"), lit(8)) === 0
        val ev = graft.streaming.StatefulDemos
          .chunkedEventsStream(spark, dir).filter(userScope)
        val emitted = graft.streaming.StatefulDemos
          .sessionTracker(spark, ev, gapMin = 30).toDF()
        val out = java.nio.file.Files
          .createTempDirectory("probe_sess").toString
        val q = emitted.writeStream
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", out + "/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(out + "/data"); ()
          }
          .start()
        q.awaitTermination()
        val f = spark.read.parquet(out + "/data")
        println(s"[probe] emitted rows = ${f.count()}")
        // batch sessions on the slice
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
        val evB = Tables.events(spark, dir).filter(userScope)
          .select(col("user_id"), col("event_id"),
            graft.Det.ntzMicros(col("ts")).as("tu"))
        val sess = evB
          .withColumn("gap", (col("tu") - lag(col("tu"), 1).over(w)) > 30L * 60 * 1000000L)
          .withColumn("sid", sum(when(coalesce(col("gap"), lit(false)), 1).otherwise(0)).over(w))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("tu")).as("start_us"), max(col("tu")).as("end_us"),
            count(lit(1)).as("n_events"))
        val wu = Window.partitionBy(col("user_id"))
        val tagged = sess.withColumn("is_last", col("end_us") === max(col("end_us")).over(wu))
        val maxTu = evB.agg(max(col("tu"))).head().getLong(0)
        // chunk 0 max = max tu <= midpoint cut (replicate chunk cut)
        val r0 = evB.agg(min(col("tu")).as("lo"), max(col("tu")).as("hi")).head()
        // NOTE: the stream's cut uses the UNSLICED events table
        val evAll = Tables.events(spark, dir)
          .select(graft.Det.ntzMicros(col("ts")).as("tu"))
        val rAll = evAll.agg(min(col("tu")).as("lo"), max(col("tu")).as("hi")).head()
        val cut = (rAll.getLong(0) + rAll.getLong(1)) / 2
        val chunk0Max = evB.filter(col("tu") <= cut).agg(max(col("tu"))).head().getLong(0)
        def predict(wmSrcUs: Long): Long = {
          val wmMs = wmSrcUs / 1000 - 3600L * 1000
          tagged.filter(
            !col("is_last") ||
              (col("end_us") / 1000 + 30L * 60 * 1000 + 1) < wmMs).count()
        }
        println(s"[probe] batch sessions total = ${tagged.count()}  nonlast = ${tagged.filter(!col("is_last")).count()}")
        println(s"[probe] predict(batch1 wm from chunk0max) = ${predict(chunk0Max)}")
        println(s"[probe] predict(final wm from globalmax)  = ${predict(maxTu)}")
        println(s"[probe] slice maxTu=$maxTu chunk0Max=$chunk0Max cut=$cut  lo=${r0.getLong(0)}")
      case "skewaqe" =>
        // the skew-stress plan with a MULTI-MAPPER map side (the 2 MB
        // test file scans as one task; repartition(32) stands in for a
        // real cluster's thousands of input splits) — the shape where
        // AQE skew-join CAN split the hot reduce partition
        args.drop(1).headOption.foreach(_.split(';').foreach { kv =>
          val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
        })
        val fanout = 200
        val hk = when(col("user_id") % 10 =!= 0, lit(0L)).otherwise(col("user_id"))
        val fact = Tables.events(spark, dir)
          .select(hk.as("skew_key"), col("value"), col("event_id"))
          .withColumn("rep", explode(sequence(lit(1), lit(fanout))))
          .repartition(32) // multi-mapper map side
        val dimBase = Tables.events(spark, dir)
          .select(hk.as("skew_key")).distinct()
          .withColumn("w", col("skew_key") % 97 + 1)
        val dimPrepped =
          if (sys.env.get("SKEW_CACHE_DIM").contains("1")) {
            val c = dimBase.persist(); c.count(); c
          } else if (sys.env.get("SKEW_DIM_PARQUET").contains("1")) {
            // materialize the dim so the join's right input is a BARE
            // scan → the join-side exchange directly feeds the join
            val p = java.nio.file.Files.createTempDirectory("skewdim").toString
            dimBase.write.mode("overwrite").parquet(p)
            spark.read.parquet(p)
          } else dimBase
        val dim =
          if (sys.env.get("SKEW_SMJ").contains("1")) dimPrepped
          else dimPrepped.hint("shuffle_hash")
        val joined = fact.join(dim, Seq("skew_key"))
          .groupBy(col("skew_key"))
          .agg(count(lit(1)).as("n_events"),
            round(graft.Det.dsum(col("value") * col("w")), 2).as("wsum"))
          .orderBy(col("skew_key"))
        if (sys.env.get("SKEW_DEBUG").contains("1"))
          org.apache.log4j.LogManager
            .getLogger("org.apache.spark.sql.execution.adaptive")
            .setLevel(org.apache.log4j.Level.DEBUG)
        (1 to 3).foreach(i => t(s"skewaqe run $i")(joined.collect().length))
        println(joined.queryExecution.executedPlan.toString)
      case "scd2plan" =>
        val scope = pmod(col("o_custkey"), lit(8)) === 0
        val batch = operators.Maintenance.maintScd2.run(spark, dir).filter(scope)
        println(batch.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Scan") || l.contains("Filter") ||
            l.contains("Window") || l.contains("Push"))
          .mkString("\n"))
      case "aqecheck" =>
        println("[probe] adaptive.enabled=" + spark.conf.get("spark.sql.adaptive.enabled"))
        val d = Tables.events(spark, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        d.count()
        println("[probe] simple agg plan head: " +
          d.queryExecution.executedPlan.toString.linesIterator.take(2).mkString(" | "))
      case "skewplan" =>
        // args: skewplan <salts> [conf k=v;k=v]
        val salts = args.drop(1).headOption.getOrElse("1")
        args.drop(2).headOption.foreach(_.split(';').foreach { kv =>
          val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
        })
        spark.conf.set("spark.graft.skewstress.salts", salts)
        spark.conf.set("spark.graft.skewstress.fanout", "200")
        val df = Registry.byName("join_skew_stress").run(spark, dir)
        t("skew run")(df.collect().length) // collect: executes df's OWN queryExecution
        println(df.queryExecution.executedPlan.toString)
      case "seeds" =>
        val pd = operators.StreamEquivalence.pairDeltaSeedResidue(spark, dir)
        val ct = operators.StreamEquivalence.contamSeedResidue(spark, dir)
        val manifest = spark.read.parquet(operators.Dedup.pairTablePath(spark, dir))
        val hasPc = manifest
          .filter((col("ida") % 10 === 0 && col("idb") % 10 =!= 0) ||
            (col("idb") % 10 === 0 && col("ida") % 10 =!= 0)).limit(1).count() > 0
        val seedRow = spark.read
          .parquet(operators.TextAnalysis.contamSeedPath(spark, dir)).collect()(0)
        println(s"[probe] dir=$dir pairRes=$pd hasProbeCorpusPair=$hasPc contamRes=$ct contamSeedNull=${seedRow.isNullAt(0)}")
      case "pair" =>
        t("view warm")(operators.Dedup.corpusSigTable(spark, dir).count())
        (1 to 3).foreach { i =>
          t(s"pair delta run $i") {
            graft.streaming.StreamDemos
              .pairDeltaIngest(spark, dir, copies = 2,
                scope = pmod(col("doc_id"), lit(8)) === 0)
              .count()
          }
        }
    }
    spark.stop()
  }
}
