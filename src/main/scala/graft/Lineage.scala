package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage truncation for iterative operators (connected-components,
  * PageRank), cluster-honest and knob-controlled.
  *
  * `spark.graft.checkpoint.dir` is the one configuration knob that
  * flips EVERY iterative graft operator from executor-local checkpoint
  * blocks to reliable storage checkpoints: set it to an HDFS/object-
  * store path at submit time on a real cluster and an executor loss
  * mid-iteration recovers from storage instead of recomputing a
  * truncated lineage from nothing (localCheckpoint blocks live only on
  * executors, so losing one kills the job). On single-JVM runs the
  * knob stays unset and `localCheckpoint()` remains the fast path —
  * there, executor loss equals driver loss anyway. Results are
  * bit-identical either way (CheckpointSpec pins this for both
  * `dedup_clusters` and `graph_pagerank`).
  *
  * eager=true in both paths — the point is to cut the growing plan
  * lineage NOW, not lazily re-derive it. Both paths return a
  * `LogicalRDD`, which PINS the input's outputPartitioning (unlike
  * `persist()`, whose InMemoryRelation wraps an adaptive subplan with
  * unknown partitioning) — iterative consumers keyed on the same
  * column see zero re-exchange.
  *
  * The reliable path persists first: `checkpoint(eager=true)` alone
  * runs the sub-plan twice (once for the eager action, once for the
  * checkpoint-write job); with a persist the write job reads cached
  * blocks, and the cache is dropped right after — the checkpoint files
  * are the durable copy. Per-iteration checkpoint files are reclaimed
  * by the ContextCleaner only when the job is submitted with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a static
  * conf — set it at submit time on a cluster; Bench/Verify set it on
  * their own fresh sessions).
  */
object Lineage {
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sc    = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      spark.conf.getOption("spark.graft.checkpoint.dir").foreach(sc.setCheckpointDir)
    if (sc.getCheckpointDir.isDefined) {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val out    = cached.checkpoint(eager = true)
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint(eager = true)
  }
}
