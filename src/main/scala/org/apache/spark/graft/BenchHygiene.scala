package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/** Bench-harness block hygiene that needs `private[spark]` access
  * (hence the package). NOT part of the engine — only `graft.Bench`
  * calls it, between queries.
  *
  * Why it exists: broadcast blocks created by per-query `broadcast()`
  * hint exchanges are cleaned only when the driver's ContextCleaner
  * notices the weak reference died — i.e. only after a full GC. In a
  * 214-query single-JVM bench, hundreds of dead broadcast blocks
  * accumulate in the block manager between GCs; at 32 threads the
  * allocation-heavy queries then thrash (measured round 5:
  * `ts_session_window_batch` 0.58 s → 19.5 s on byte-identical code).
  * Explicitly dropping every broadcast block between queries makes
  * cleanup deterministic instead of GC-schedule-dependent. Safe here
  * because no graft operator holds a `Broadcast[_]` across queries
  * (all broadcasts are plan-internal hint exchanges, rebuilt per
  * execution).
  */
object BenchHygiene {
  /** Remove ALL broadcast blocks (driver + storage endpoints).
    * Returns the number of distinct broadcast ids removed.
    */
  def dropAllBroadcasts(sc: SparkContext): Int = {
    val master = sc.env.blockManager.master
    val ids = master.getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
    val bids = ids.collect { case b: BroadcastBlockId => b.broadcastId }.distinct
    bids.foreach(id => master.removeBroadcast(id, removeFromMaster = true, blocking = false))
    bids.length
  }
}
