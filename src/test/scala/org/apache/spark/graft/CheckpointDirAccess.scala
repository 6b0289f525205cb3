package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only: `SparkContext.setCheckpointDir` has no public inverse,
  * but CheckpointSpec must restore the shared test session to the
  * local-checkpoint fast path after proving the reliable path, or
  * every later suite silently pays checkpoint-file I/O. The var is
  * `private[spark]`, hence this package. */
object CheckpointDirAccess {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
