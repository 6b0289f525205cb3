package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once materialized-view store shared by the session-scoped
  * serving tables (the dedup signature/pair views, the graph edge
  * view). One discipline, one implementation:
  *
  *   - the view path keys on an MD5 over the input dir path AND a
  *     fingerprint of every parquet file in it (name, length, mtime) —
  *     NOT the dir string alone. A regenerated input dir (same path,
  *     new bytes) therefore maps to a NEW view path and rebuilds,
  *     instead of silently serving a stale view from a previous run's
  *     `java.io.tmpdir` (views outlive the JVM by design — that
  *     cross-run reuse is the point, so the key must carry everything
  *     the content derives from);
  *   - the write goes to a unique temp dir followed by a rename, so
  *     two JVMs sharing a tmpdir race safely: one rename wins, the
  *     loser cleans up its temp and reads the winner's table
  *     (identical content — every view is a deterministic function of
  *     the fingerprinted input). A rename that lands INSIDE an
  *     existing destination (the Hadoop rename semantic when both
  *     racers pass the exists check) is detected and the nested stray
  *     deleted.
  *
  * At 100 TB this is the "derived table keyed by snapshot id" pattern:
  * the fingerprint plays the snapshot id, and a new corpus snapshot
  * gets a new derived table while readers of the old snapshot keep a
  * consistent view.
  */
object ViewStore {

  /** MD5 hex over the dir path + each parquet file's (name, length,
    * mtime) + the last 64 KB of its BYTES, NUL-separated so no crafted
    * name can collide two inputs. The byte tail covers the parquet
    * FOOTER (row counts, column statistics, schema), so a regenerated
    * input whose metadata was preserved (`rsync -a` / `cp -p` from a
    * different snapshot, or a same-second same-size rewrite on a
    * 1 s-granularity filesystem) still changes the key — (name, length,
    * mtime) alone cannot see that case. A file that disappears or
    * shrinks between the listing and the tail read (an input being
    * regenerated at this very moment) degrades to a metadata+error
    * entry for that file instead of failing the build — the key still
    * differs from every stable state, so the worst case is one extra
    * rebuild, never a crash or a stale serve. Listing is
    * non-recursive: the graft input contract is one flat dir of
    * `<table>.parquet` files (TESTDATA.md). Goes through the Hadoop
    * FileSystem API so the fingerprint is scheme-agnostic — the same
    * staleness key works when the input dir lives on HDFS or an
    * object store on a real cluster, not just a local path. */
  private[graft] def fingerprint(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration = new org.apache.hadoop.conf.Configuration()
  ): String = fingerprintOf(dir, listInputs(dir, conf), conf)

  /** Digest over an ALREADY-LISTED snapshot of the input dir — the memo
    * below passes the same listing it derived its key from, so key and
    * digest can never come from two different directory states (a file
    * changing between two listings would otherwise let the memo store a
    * fingerprint under a metaKey that no longer matches it). */
  private def fingerprintOf(
      dir: String,
      inputs: Seq[org.apache.hadoop.fs.FileStatus],
      conf: org.apache.hadoop.conf.Configuration
  ): String = {
    import org.apache.hadoop.fs.Path
    val p  = new Path(dir)
    val fs = p.getFileSystem(conf)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(dir.getBytes("UTF-8"))
    for (s <- inputs) {
      md.update(0.toByte)
      md.update(metaEntry(s).getBytes("UTF-8"))
      md.update(0.toByte)
      val tail = math.min(65536L, s.getLen).toInt
      val buf  = new Array[Byte](tail)
      val tailBytes = scala.util.Try {
        val in = fs.open(s.getPath)
        try {
          in.seek(s.getLen - tail)
          in.readFully(buf)
          buf
        } finally in.close()
      }.getOrElse("UNREADABLE-INPUT".getBytes("UTF-8")) // mid-regeneration: degrade, don't die
      md.update(tailBytes)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def listInputs(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration
  ): Seq[org.apache.hadoop.fs.FileStatus] = {
    import org.apache.hadoop.fs.Path
    val p  = new Path(dir)
    val fs = p.getFileSystem(conf)
    (if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
  }

  private def metaEntry(s: org.apache.hadoop.fs.FileStatus): String =
    s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"

  /** Per-dir fingerprint memo keyed on the METADATA snapshot: the
    * 8 materialize call sites share one tail-read pass per (dir,
    * metadata state) instead of each paying the ranged GETs again. A
    * metadata-visible change (new mtime/length/name set) recomputes,
    * so intra-session regeneration detection is as strong as the
    * unmemoized path; the one case the memo skips — content changed
    * under IDENTICAL metadata mid-session — is already out of model,
    * because every caller memoizes its view path per (session, dir)
    * and would not re-consult the fingerprint anyway. Fresh sessions
    * start with an empty memo and always take the full content path. */
  private val fpCache = scala.collection.mutable.Map.empty[(String, String), String]

  private def fingerprintCached(dir: String, conf: org.apache.hadoop.conf.Configuration): String = {
    // ONE listing feeds both the memo key and (on a miss) the digest:
    // a file changing between two separate listings could otherwise
    // memoize a fingerprint under a metaKey that no longer matches it.
    val inputs  = listInputs(dir, conf)
    val metaKey = inputs.map(metaEntry).mkString("\u0000")
    fpCache.synchronized(fpCache.get((dir, metaKey))) match {
      case Some(fp) => fp
      case None =>
        val fp = fingerprintOf(dir, inputs, conf)
        fpCache.synchronized(fpCache.update((dir, metaKey), fp))
        fp
    }
  }

  /** Serving audit trail: how each `materialize` call this JVM resolved
    * — `built` (the view was absent and this call wrote it) or `hit`
    * (an already-materialized copy satisfied the exists-check). Keyed
    * by family; a later call for the same family overwrites (last
    * state wins — the bench reads this once, right after its warm-up
    * pass, when each family has resolved exactly once). Insertion
    * order preserved so the artifact stanza is deterministic. */
  private val resolutions = scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** Snapshot (family → hit|built) of every materialization so far —
    * what [[graft.Bench]] emits as the per-view serving stanza. */
  private[graft] def resolutionLog: Seq[(String, String)] =
    resolutions.synchronized(resolutions.toSeq)

  /** Idempotently materialize `build` under
    * `<root>/<family>/<fingerprint(dir)>` and return the path. The
    * caller memoizes per (session, dir); this handles the on-disk
    * idempotence and the cross-JVM race.
    *
    * `<root>` defaults to `java.io.tmpdir` and is overridden with
    * `spark.graft.viewstore.dir` — the serving-table twin of
    * `spark.graft.checkpoint.dir`: set it to an HDFS/object-store
    * path at submit time and every serving view lands in durable
    * shared storage instead of node-local tmp. Superseded-generation
    * retention is AGE-based (see [[sweepSiblings]]): a sibling
    * generation is deleted only once it has gone unused for
    * `spark.graft.viewstore.retention` seconds (default 7 days) —
    * never synchronously on supersession, so a reader of the previous
    * corpus snapshot mid-scan is not yanked (the point of snapshot
    * keying), while the ten view families no longer accrete every
    * stale (fingerprint, buildVersion) generation forever. */
  /** Per-generation build serialization WITHIN this JVM: the r11 memo
    * removal (stale-path hazard) means concurrent threads — sbt runs
    * suites in parallel in one JVM — can race to the same cold view;
    * without this lock both would observe `exists == false` and both
    * run the full Spark build (one rename wins, the loser's job is
    * wasted work at exactly the expensive builds the views amortize).
    * Keyed on the resolved base path, so distinct families/generations
    * never contend and nested materializations of DIFFERENT views
    * cannot deadlock. Cross-JVM, the tmp+rename race keeps the result
    * CORRECT; the build-claim lease below additionally keeps it CHEAP. */
  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Cross-JVM thundering-herd protection for cold views: before
    * building, a JVM atomically creates `<base>.building-<uuid>` in
    * the family dir; a second JVM arriving at the same cold generation
    * sees a FRESH claim and polls for `base` instead of duplicating
    * the build — at 100 TB a duplicated signature-table build is hours
    * of cluster time that the rename tie-break would simply throw
    * away. Best-effort by design: the lease
    * (`spark.graft.viewstore.build.lease`, seconds, default 15 min;
    * <= 0 disables claiming AND waiting) bounds how long a claim is
    * believed, judged by the claim file's mtime — a builder that
    * crashes mid-build delays its waiters at most one lease before
    * they build themselves, and a build LONGER than the lease degrades
    * to today's behavior (duplicate build, rename decides). Returns
    * true if the peer's table appeared. */
  private def awaitPeerBuild(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      leaseMs: Long,
      maxWaitMs: Long
  ): Boolean = {
    if (leaseMs <= 0) return false
    def liveClaimDeadline(): Option[Long] = scala.util.Try {
      fs.listStatus(base.getParent)
        .filter(_.getPath.getName.startsWith(base.getName + ".building-"))
        .map(_.getModificationTime)
        .reduceOption(_ max _)
        .filter(_ > System.currentTimeMillis() - leaseMs) // stale claim = crashed builder
        .map(_ + leaseMs)
    }.toOption.flatten
    var deadline = liveClaimDeadline().getOrElse(return false) // no family dir / no live claim
    // TOTAL wait cap: the live-claim REFRESH below extends `deadline`
    // while the builder keeps touching its claim — correct for a slow
    // honest build, but a wedged-but-ALIVE builder (hung FS call with
    // a healthy toucher thread) would otherwise keep its waiters
    // parked indefinitely where the pre-refresh behavior degraded to
    // a duplicate build after one lease (ADVICE r12). The cap cannot
    // distinguish wedged from honest-but-slow, so it is a KNOB
    // (`spark.graft.viewstore.build.maxwait`, seconds), defaulting to
    // 4 leases: deployments whose builds legitimately run long set the
    // lease near the expected build time (which scales this default)
    // or raise the knob directly. Past the cap a waiter stops
    // believing the claim and builds — the tmp+rename race keeps the
    // duplicated result correct, costing only the duplicate work.
    val hardDeadline = System.currentTimeMillis() + maxWaitMs
    // Exponential backoff, 200 ms doubling to a 5 s cap: the old flat
    // 200 ms poll issued ~4,500 existence checks per waiter over a full
    // 15 min lease — nontrivial request volume on an object store —
    // for the same worst-case latency.
    var sleepMs = 200L
    var lastClaimCheck = System.currentTimeMillis()
    // Re-read the claims at the TOUCHER's cadence (lease/3, bounded),
    // not a flat 5 s: with a lease shorter than the flat period a
    // waiter could never observe a live builder's refresh and gave up
    // after one lease — quietly losing thundering-herd protection for
    // exactly the short-lease configs tests and latency-sensitive
    // deployments pick (found by the r13 wedged-builder spec).
    val claimCheckMs = math.max(500L, math.min(leaseMs / 3, 5000L))
    while (System.currentTimeMillis() < math.min(deadline, hardDeadline)) {
      if (fs.exists(base)) return true
      // Clamp the backoff step to the remaining wait: an unclamped 5 s
      // step could oversleep the lease/maxwait deadline by almost a
      // full step, stretching the documented 4-lease cap to 4-leases-
      // plus-5s — material exactly for the short-lease configs the
      // cadence fix above targets (ADVICE r13).
      val remainMs =
        math.min(deadline, hardDeadline) - System.currentTimeMillis()
      if (remainMs > 0) Thread.sleep(math.min(sleepMs, remainMs))
      sleepMs = math.min(sleepMs * 2, 5000L)
      val now = System.currentTimeMillis()
      if (now - lastClaimCheck >= claimCheckMs) {
        // Re-read the claims periodically: a live builder REFRESHES its
        // claim's mtime while it works (see the toucher in materialize),
        // so a build longer than one lease keeps its waiters waiting
        // instead of stampeding; a claim that disappears without the
        // table appearing is a crashed builder — stop waiting and build.
        lastClaimCheck = now
        liveClaimDeadline() match {
          case Some(d) => deadline = d
          case None    => return fs.exists(base)
        }
      }
    }
    fs.exists(base)
  }

  private[graft] def materialize(
      spark: SparkSession,
      family: String,
      dir: String,
      buildVersion: Int = 1
  )(build: => DataFrame): String = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = spark.conf
      .getOption("spark.graft.viewstore.dir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    // The path keys on (input fingerprint, build version): the
    // fingerprint invalidates on input change, the version on BUILD
    // DEFINITION change — bump it whenever the view's schema or
    // derivation changes, or a store populated by an older binary
    // would satisfy the exists-check with stale-SHAPED content (the
    // input hasn't changed, so the fingerprint alone can't see it).
    val ver  = if (buildVersion == 1) "" else s"-v$buildVersion"
    val base = new Path(s"$root/$family/${fingerprintCached(dir, conf)}$ver")
    val fs   = base.getFileSystem(conf)
    val leaseMs = spark.conf
      .getOption("spark.graft.viewstore.build.lease")
      .map(_.toLong * 1000)
      .getOrElse(15L * 60 * 1000)
    val maxWaitMs = spark.conf
      .getOption("spark.graft.viewstore.build.maxwait")
      .map(_.toLong * 1000)
      .getOrElse(4 * leaseMs)
    val existed = buildLocks.computeIfAbsent(base.toString, _ => new Object).synchronized {
      // Peer-claim check counts as a HIT when the peer's table appears:
      // this JVM served without building, which is what the stanza means.
      val there = fs.exists(base) || awaitPeerBuild(fs, base, leaseMs, maxWaitMs)
      if (!there) {
        val claim =
          new Path(base.getParent, s"${base.getName}.building-${java.util.UUID.randomUUID()}")
        if (leaseMs > 0) scala.util.Try(fs.create(claim, true).close()) // best-effort: never fail the build
        // Keep the claim's mtime FRESH while the build runs: a build
        // longer than one lease would otherwise see its own claim go
        // stale and every waiter stampede into a duplicate build — the
        // exact case the lease knob targets. Refresh by re-PUT, not
        // setTimes (a no-op on object stores), every lease/3 capped at
        // 1 min. Daemon thread; interrupted in the finally, so a
        // crashed builder's claim stops refreshing and goes stale after
        // one lease as documented.
        val toucher = if (leaseMs > 0) {
          val period = math.max(1000L, math.min(leaseMs / 3, 60000L))
          val t = new Thread(() =>
            try {
              while (true) {
                Thread.sleep(period)
                scala.util.Try(fs.create(claim, true).close())
              }
            } catch { case _: InterruptedException => }
          )
          t.setDaemon(true)
          t.start()
          Some(t)
        } else None
        try {
          val tmp = new Path(base.getParent, s"${base.getName}.tmp-${java.util.UUID.randomUUID()}")
          build.write.mode("overwrite").parquet(tmp.toString)
          if (!fs.rename(tmp, base)) fs.delete(tmp, true) // lost the race outright
          else {
            val nested = new Path(base, tmp.getName)
            if (fs.exists(nested)) fs.delete(nested, true) // tie: we moved into the winner's dir
          }
        } finally {
          // Interrupt AND join (bounded) BEFORE deleting the claim: an
          // in-flight toucher re-PUT racing the delete would recreate
          // the claim file after it was removed, making a failed
          // build's waiters believe a live builder for up to one full
          // lease (ADVICE r12). The join bound keeps a wedged FS call
          // in the toucher from hanging the build path; in that
          // pathological case the claim goes stale after one lease as
          // on the crash path.
          toucher.foreach { t => t.interrupt(); scala.util.Try(t.join(5000)) }
          scala.util.Try(fs.delete(claim, false)) // crash-path claims go stale after one lease
        }
      }
      there
    }
    resolutions.synchronized(resolutions.update(family, if (existed) "hit" else "built"))
    // Mark recency-of-USE on the resolved generation: the retention
    // sweep below ages a generation from the last time anyone
    // RESOLVED it, not from when it was built — a long-lived store
    // whose input never changes keeps getting touched and never
    // expires, while a superseded generation stops being resolved the
    // moment its input regenerates and ages out from that point.
    // Two channels, because setTimes is a NO-OP on object stores
    // (S3A inherits FileSystem's empty default): (a) best-effort
    // setTimes on the dir for POSIX-ish stores, (b) an overwritten
    // `_USED` marker FILE inside the generation — a fresh PUT gets a
    // fresh object mtime on every store, and `_`-prefixed files are
    // invisible to parquet readers. Without (b), an S3-rooted store's
    // live generations would age from BUILD time and the sweep could
    // delete a generation in active use. Throttled per (JVM, base) so
    // steady-state resolutions don't pay a PUT each.
    val now = System.currentTimeMillis()
    if (lastTouched.synchronized(lastTouched.get(base.toString).forall(_ < now - 60000))) {
      lastTouched.synchronized(lastTouched.update(base.toString, now))
      scala.util.Try(fs.setTimes(base, now, -1))
      scala.util.Try(fs.create(new Path(base, "_USED"), true).close())
    }
    sweepSiblings(spark, fs, base, forced = !existed)
    base.toString
  }

  private val lastTouched = scala.collection.mutable.Map.empty[String, Long]

  /** Janitor pass over `base`'s family dir, two rules in one listing:
    *
    *  - crashed-writer DEBRIS (`.tmp-<uuid>` dirs whose rename never
    *    happened) is deleted after one hour of quiescence;
    *  - SUPERSEDED GENERATIONS (sibling fingerprint/buildVersion dirs
    *    of the same family) are deleted after
    *    `spark.graft.viewstore.retention` seconds (default 7 days;
    *    <= 0 disables generation retention, debris sweep stays) of
    *    quiescence — age-based, never count-based, so a concurrent
    *    reader of a just-superseded generation is not yanked
    *    mid-scan: supersession starts the clock, the generous default
    *    ends it long after any real scan finishes. At 100 TB each
    *    signature-table generation is terabytes, so without this the
    *    ten view families are the deployment's first disk-pressure
    *    incident.
    *
    * Quiescence is the newest mtime anywhere UNDER the dir, not the
    * dir's own mtime — a live long-running writer keeps touching task
    * files even when the top-level mtime is stuck at creation time.
    * The recursion is only entered when the top-level mtime already
    * looks old (newestUnder >= the dir's own mtime, so a fresh
    * top-level mtime proves freshness without listing children) —
    * and `materialize` touches the resolved generation's top-level
    * mtime on every call, so in steady state every live generation is
    * skipped at the pre-filter. Off the build path the sweep is
    * additionally throttled per family dir, so a hit costs at most
    * one extra listing per interval. Best-effort throughout: a sweep
    * failure must never fail the build. */
  private val lastSweep = scala.collection.mutable.Map.empty[String, Long]

  private def sweepSiblings(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      forced: Boolean
  ): Unit = scala.util.Try {
    val now = System.currentTimeMillis()
    val retentionMs = spark.conf
      .getOption("spark.graft.viewstore.retention")
      .map(_.toLong * 1000)
      .getOrElse(7L * 24 * 3600 * 1000)
    // retention <= 0 means generation-GC is DISABLED — throttle at the
    // cap, not at retentionMs/2 (which would collapse to ~1 ms and run
    // the debris listing on every resolution, the opposite intent)
    val throttleMs =
      if (retentionMs <= 0) 60L * 1000
      else math.min(math.max(retentionMs / 2, 1L), 60L * 1000)
    val parent     = base.getParent.toString
    val due = forced || lastSweep.synchronized(
      lastSweep.get(parent).forall(_ < now - throttleMs))
    if (due) {
      lastSweep.synchronized(lastSweep.update(parent, now))
      def newestUnder(st: org.apache.hadoop.fs.FileStatus): Long = {
        if (!st.isDirectory) st.getModificationTime
        else {
          val kids = fs.listStatus(st.getPath)
          (st.getModificationTime +: kids.map(newestUnder).toSeq).max
        }
      }
      // Debris cutoff: max(1 h, one lease) of quiescence. A live builder
      // now refreshes its claim's mtime (and its .tmp- dir's contents
      // keep getting written), so an UNtouched claim/tmp older than both
      // an hour AND one lease is a crashed builder's leftover — a plain
      // 1 h cutoff would sweep a LIVE claim mid-build exactly when the
      // lease is configured above 3600 s for multi-hour builds.
      val leaseMs = spark.conf
        .getOption("spark.graft.viewstore.build.lease")
        .map(_.toLong * 1000)
        .getOrElse(15L * 60 * 1000)
      val debrisCutoff = now - math.max(60L * 60 * 1000, leaseMs)
      for (s <- fs.listStatus(base.getParent) if s.getPath.getName != base.getName) {
        val cutoff =
          if (s.getPath.getName.contains(".tmp-") ||
            s.getPath.getName.contains(".building-")) Some(debrisCutoff)
          else if (retentionMs > 0) Some(now - retentionMs)
          else None // generation retention disabled
        val stale = cutoff.exists { c =>
          s.getModificationTime < c && // cheap pre-filter: fresh top-level mtime proves fresh
            scala.util.Try(newestUnder(s)).getOrElse(Long.MaxValue) < c
        }
        if (stale) fs.delete(s.getPath, true)
      }
    }
  }
}
