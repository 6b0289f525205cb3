package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** The write-once materialized-view store behind the dedup
  * signature/pair views and the graph edge view. The property that
  * matters for correctness: the view path is a function of the input
  * CONTENT fingerprint (file names, lengths, mtimes), not just the dir
  * string — tmpdir views outlive the JVM by design, so a regenerated
  * input dir must map to a NEW path and rebuild instead of serving a
  * stale view to a fresh round's oracle compare.
  */
class ViewStoreSpec extends SparkSuite {

  test("fingerprint is stable across calls and sensitive to file mtime/size/name") {
    val d = Files.createTempDirectory("vstore_fp").toFile
    try {
      val f = new java.io.File(d, "documents.parquet")
      Files.write(f.toPath, Array[Byte](1, 2, 3))
      f.setLastModified(1700000000000L)
      val fp1 = ViewStore.fingerprint(d.getPath)
      assert(fp1 == ViewStore.fingerprint(d.getPath), "same input, same fingerprint")
      f.setLastModified(1700000001000L)
      val fp2 = ViewStore.fingerprint(d.getPath)
      assert(fp2 != fp1, "mtime change must change the fingerprint")
      Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
      f.setLastModified(1700000001000L)
      val fp3 = ViewStore.fingerprint(d.getPath)
      assert(fp3 != fp2, "size change must change the fingerprint")
      // the rsync -a / cp -p case: same name, same size, same mtime,
      // DIFFERENT bytes — the footer-tail hash must still see it
      Files.write(f.toPath, Array[Byte](9, 9, 9, 9))
      f.setLastModified(1700000001000L)
      val fp4 = ViewStore.fingerprint(d.getPath)
      assert(fp4 != fp3, "metadata-preserving content change must change the fingerprint")
      // a non-parquet file is outside the input contract and invisible
      Files.write(new java.io.File(d, "notes.txt").toPath, Array[Byte](9))
      assert(ViewStore.fingerprint(d.getPath) == fp4, "non-parquet files don't key the view")
    } finally {
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }

  test("resolution log records built on first materialize, hit on re-materialize") {
    val root = Files.createTempDirectory("vstore_log").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    try {
      ViewStore.materialize(spark, "graft_test_log", sf)(spark.range(3).toDF("id"))
      assert(ViewStore.resolutionLog.toMap.get("graft_test_log").contains("built"),
        "first materialize must log built")
      ViewStore.materialize(spark, "graft_test_log", sf)(spark.range(3).toDF("id"))
      assert(ViewStore.resolutionLog.toMap.get("graft_test_log").contains("hit"),
        "re-materialize against an existing store must log hit")
    } finally spark.conf.unset("spark.graft.viewstore.dir")
  }

  test("materialize sweeps crashed-writer tmp debris but not fresh in-flight dirs") {
    val root = Files.createTempDirectory("vstore_sweep").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    try {
      val fam = new java.io.File(root, "graft_test_sweep"); fam.mkdirs()
      val stale = new java.io.File(fam, "deadbeef.tmp-crashed"); stale.mkdirs()
      stale.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
      val fresh = new java.io.File(fam, "cafebabe.tmp-inflight"); fresh.mkdirs()
      val p = ViewStore.materialize(spark, "graft_test_sweep", sf)(spark.range(2).toDF("id"))
      assert(spark.read.parquet(p).count() == 2)
      assert(!stale.exists(), "hour-old crashed tmp dir must be swept")
      assert(fresh.exists(), "fresh tmp dir may be a live writer and must survive")
    } finally spark.conf.unset("spark.graft.viewstore.dir")
  }

  test("spark.graft.viewstore.dir relocates the store root") {
    val alt = Files.createTempDirectory("vstore_root").toFile
    spark.conf.set("spark.graft.viewstore.dir", alt.getPath)
    try {
      val p = ViewStore.materialize(spark, "graft_test_root", sf)(
        spark.range(3).toDF("id"))
      assert(p.startsWith(alt.getPath) || p.startsWith(s"file:${alt.getPath}"),
        s"view landed at $p, expected under ${alt.getPath}")
      assert(spark.read.parquet(p).count() == 3)
    } finally spark.conf.unset("spark.graft.viewstore.dir")
  }

  test("age-based retention sweeps a superseded generation while a pre-opened reader completes") {
    val root = Files.createTempDirectory("vstore_ret").toFile
    val d    = Files.createTempDirectory("vstore_ret_in").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    // Generous retention for the SURVIVES phase — the assertion must
    // not depend on p2's fingerprint+build+sweep finishing within the
    // retention window on a loaded box (with a 1 s knob here, a slow
    // parquet write made the "must NOT be swept" check a timing race).
    spark.conf.set("spark.graft.viewstore.retention", "3600")
    def local(p: String): java.io.File = new java.io.File(p.stripPrefix("file:"))
    try {
      Files.copy(
        Paths.get(s"$sf/region.parquet"),
        new java.io.File(d, "region.parquet").toPath,
        StandardCopyOption.REPLACE_EXISTING
      )
      def build = spark.read.parquet(s"${d.getPath}/region.parquet").agg(count(lit(1)).as("n"))
      val p1 = ViewStore.materialize(spark, "graft_test_ret", d.getPath)(build)
      // regenerate the input → a NEW generation; the superseded one is
      // younger than the retention age, so it must survive this build
      val f = new java.io.File(d, "region.parquet")
      assert(f.setLastModified(f.lastModified() + 60000))
      val p2 = ViewStore.materialize(spark, "graft_test_ret", d.getPath)(build)
      assert(p2 != p1, "regenerated input must get a new generation")
      assert(local(p1).exists(), "a just-superseded generation must NOT be swept before the age elapses")
      // a reader that opened the stale generation BEFORE it ages out...
      val part = local(p1).listFiles().find(_.getName.endsWith(".parquet")).get
      val in   = new java.io.FileInputStream(part)
      // ...then drop the knob to 1 s for the SWEEPS phase: the sleep
      // alone guarantees p1's age exceeds retention, no race either way
      spark.conf.set("spark.graft.viewstore.retention", "1")
      Thread.sleep(1500) // let the 1 s retention age elapse
      val p3 = ViewStore.materialize(spark, "graft_test_ret", d.getPath)(build)
      assert(p3 == p2)
      assert(!local(p1).exists(), "a quiescent superseded generation must be swept once the age elapses")
      // ...still completes: POSIX keeps the open handle readable after unlink
      val bytes = in.readAllBytes()
      in.close()
      assert(bytes.nonEmpty, "pre-opened reader of the swept generation must still read its bytes")
      assert(local(p2).exists(), "the CURRENT generation is never swept")
    } finally {
      spark.conf.unset("spark.graft.viewstore.dir")
      spark.conf.unset("spark.graft.viewstore.retention")
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }

  test("a dir regenerated mid-session is re-resolved by consumer path functions (no stale path memo)") {
    // r11: the ten per-(session, dir) path memos were deleted — every
    // *TablePath consumer re-resolves through materialize's
    // state-keyed fingerprint memo, so an input regenerated WITHIN a
    // session maps to a fresh view path on the very next call.
    val d = Files.createTempDirectory("vstore_regen").toFile
    try {
      Files.copy(
        Paths.get(s"$sf/documents.parquet"),
        new java.io.File(d, "documents.parquet").toPath,
        StandardCopyOption.REPLACE_EXISTING
      )
      val p1 = operators.Dedup.simhashSigTablePath(spark, d.getPath)
      assert(operators.Dedup.simhashSigTablePath(spark, d.getPath) == p1, "stable input, stable path")
      val f = new java.io.File(d, "documents.parquet")
      assert(f.setLastModified(f.lastModified() + 60000))
      val p2 = operators.Dedup.simhashSigTablePath(spark, d.getPath)
      assert(p2 != p1, "a regenerated dir must resolve to a NEW view path within the same session")
    } finally {
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }

  test("a crashed builder (live claim + orphan tmp) delays a second builder at most one lease, then it builds") {
    val root = Files.createTempDirectory("vstore_crash").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    spark.conf.set("spark.graft.viewstore.build.lease", "2") // seconds
    try {
      // Simulate a builder that died mid-build: its claim file is FRESH
      // (created just before the crash, never refreshed again) and its
      // half-written tmp dir is long-cold. The fingerprint is what
      // materialize will compute for the same (dir, version), so the
      // fabricated debris sits exactly where a real crash would leave it.
      val fam = new java.io.File(root, "graft_test_crash"); fam.mkdirs()
      val fp  = ViewStore.fingerprint(sf)
      val claim = new java.io.File(fam, s"$fp.building-deadbeef")
      Files.write(claim.toPath, Array.emptyByteArray)
      val orphan = new java.io.File(fam, s"$fp.tmp-orphan"); orphan.mkdirs()
      orphan.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
      val t0 = System.nanoTime()
      val p  = ViewStore.materialize(spark, "graft_test_crash", sf)(spark.range(4).toDF("id"))
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(spark.read.parquet(p).count() == 4, "the waiter must build after the lease expires")
      assert(ViewStore.resolutionLog.toMap.get("graft_test_crash").contains("built"),
        "a crashed peer's claim must not be mistaken for a serving view")
      // The claim was live (fresh mtime, never refreshed): the waiter
      // must actually wait — but at most ~one lease (2 s) plus the poll
      // overshoot, never the unbounded hang a claim without a lease
      // would imply. The generous ceiling absorbs loaded-box build time.
      assert(elapsed >= 1.5, f"waiter returned in $elapsed%.1f s — it never honored the live claim")
      assert(elapsed <= 20.0, f"waiter took $elapsed%.1f s — far beyond one 2 s lease")
      assert(!orphan.exists(), "the crashed builder's cold tmp dir must be swept by the post-build janitor")
      assert(claim.exists(),
        "a fresh claim is within the debris cutoff and must survive this sweep (it ages out later)")
    } finally {
      spark.conf.unset("spark.graft.viewstore.dir")
      spark.conf.unset("spark.graft.viewstore.build.lease")
    }
  }

  test("a live builder refreshes its claim while the build outlives the lease") {
    // lease 2 s, build ~4 s (a sleeping UDF): the toucher must re-PUT
    // the claim (period = max(1 s, lease/3) = 1 s here) so a waiter
    // re-reading claim liveness keeps waiting instead of stampeding
    // into a duplicate build — the ADVICE r11 case where a build
    // longer than its lease silently lost thundering-herd protection.
    val root = Files.createTempDirectory("vstore_touch").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    spark.conf.set("spark.graft.viewstore.build.lease", "2")
    try {
      val fam = new java.io.File(root, "graft_test_touch")
      val mtimes = scala.collection.mutable.Set.empty[Long]
      @volatile var watching = true
      val watcher = new Thread(() => {
        while (watching) {
          val claims = Option(fam.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.contains(".building-"))
          claims.foreach(c => mtimes.synchronized { mtimes += c.lastModified(); () })
          Thread.sleep(100)
        }
      })
      watcher.setDaemon(true)
      watcher.start()
      val slowRow = udf(() => { Thread.sleep(4000); 1 })
      ViewStore.materialize(spark, "graft_test_touch", sf)(
        spark.range(1).select(slowRow().as("x")))
      watching = false
      watcher.join(2000)
      val distinct = mtimes.synchronized(mtimes.toSet)
      assert(distinct.size >= 2,
        s"claim mtime never advanced during a 4 s build (observed: $distinct) — " +
          "a waiter would have declared the builder dead after one 2 s lease")
    } finally {
      spark.conf.unset("spark.graft.viewstore.dir")
      spark.conf.unset("spark.graft.viewstore.build.lease")
    }
  }

  test("a wedged-but-ALIVE builder parks a waiter at most 4 leases, then the waiter builds") {
    // ADVICE r12: a builder whose FS call hangs while its toucher
    // thread stays healthy refreshes its claim forever — before the
    // hard cap, waiters were parked indefinitely (the refresh logic
    // extended the deadline every re-read). Simulate the wedge: a
    // claim file re-touched every 300 ms by a thread that never
    // finishes a build. With lease = 1 s the waiter must stop
    // believing the claim after ~4 leases and build itself.
    val root = Files.createTempDirectory("vstore_wedge").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    spark.conf.set("spark.graft.viewstore.build.lease", "1")
    try {
      val fam = new java.io.File(root, "graft_test_wedge"); fam.mkdirs()
      val fp    = ViewStore.fingerprint(sf)
      val claim = new java.io.File(fam, s"$fp.building-wedged")
      Files.write(claim.toPath, Array.emptyByteArray)
      @volatile var refreshing = true
      val toucher = new Thread(() => {
        while (refreshing) {
          Files.write(claim.toPath, Array.emptyByteArray) // fresh mtime: "alive"
          Thread.sleep(300)
        }
      })
      toucher.setDaemon(true)
      toucher.start()
      val t0 = System.nanoTime()
      val p  = ViewStore.materialize(spark, "graft_test_wedge", sf)(spark.range(3).toDF("id"))
      val elapsed = (System.nanoTime() - t0) / 1e9
      refreshing = false
      assert(spark.read.parquet(p).count() == 3, "the waiter must eventually build")
      assert(elapsed >= 3.5, f"waiter returned in $elapsed%.1f s — it never honored the live claim")
      assert(elapsed <= 30.0,
        f"waiter took $elapsed%.1f s — the 4-lease hard cap (4 s at lease=1) did not fire")
    } finally {
      spark.conf.unset("spark.graft.viewstore.dir")
      spark.conf.unset("spark.graft.viewstore.build.lease")
    }
  }

  test("a FAILED build removes its claim promptly; the toucher cannot resurrect it") {
    // ADVICE r12: interrupt-then-delete raced an in-flight toucher
    // re-PUT — the claim could be recreated after deletion, making a
    // failed build's waiters believe a live builder for up to one full
    // lease. The fix joins the toucher (bounded) before deleting; this
    // pins it: after a build that THROWS, no claim file may exist, not
    // even after a toucher period has elapsed.
    val root = Files.createTempDirectory("vstore_fail").toFile
    spark.conf.set("spark.graft.viewstore.dir", root.getPath)
    spark.conf.set("spark.graft.viewstore.build.lease", "2") // toucher period = 1 s
    try {
      val boom = udf(() => {
        Thread.sleep(1500) // let at least one toucher re-PUT happen mid-build
        throw new RuntimeException("build failed"); 1
      })
      intercept[Exception] {
        ViewStore.materialize(spark, "graft_test_fail", sf)(
          spark.range(1).select(boom().as("x")))
      }
      val fam = new java.io.File(root, "graft_test_fail")
      def claims = Option(fam.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.contains(".building-"))
      assert(claims.isEmpty,
        s"claim survived the failed build: ${claims.map(_.getName).mkString(",")}")
      Thread.sleep(1300) // one toucher period later a resurrected claim would be visible
      assert(claims.isEmpty, "the toucher resurrected the claim after deletion (join race)")
    } finally {
      spark.conf.unset("spark.graft.viewstore.dir")
      spark.conf.unset("spark.graft.viewstore.build.lease")
    }
  }

  test("a regenerated input dir rebuilds the view instead of serving the stale one") {
    val d = Files.createTempDirectory("vstore_in").toFile
    try {
      Files.copy(
        Paths.get(s"$sf/documents.parquet"),
        new java.io.File(d, "documents.parquet").toPath,
        StandardCopyOption.REPLACE_EXISTING
      )
      def build = spark.read.parquet(s"${d.getPath}/documents.parquet").agg(count(lit(1)).as("n"))
      val p1 = ViewStore.materialize(spark, "graft_test_views", d.getPath)(build)
      val n1 = spark.read.parquet(p1).collect()(0).getLong(0)
      // same input: same path, no rebuild needed
      assert(ViewStore.materialize(spark, "graft_test_views", d.getPath)(build) == p1)
      // "regenerate" the input (content function changes with it)
      val f = new java.io.File(d, "documents.parquet")
      f.setLastModified(f.lastModified() + 60000)
      val p2 = ViewStore.materialize(
        spark,
        "graft_test_views",
        d.getPath
      )(build.withColumn("n", col("n") + 1))
      assert(p2 != p1, "regenerated input must get a new view path")
      val n2 = spark.read.parquet(p2).collect()(0).getLong(0)
      assert(n2 == n1 + 1, "the new path must serve the REBUILT view, not the stale one")
    } finally {
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }
}
