package graft

import java.util.concurrent.atomic.AtomicLong

/** Central registry of driver-side memo caches.
  *
  * Before this object existed, `Registry.clearMemos()` listed each memo
  * site by hand and had to be kept in lockstep with every `memoizes =
  * true` row — a future memoizing row that set the flag but was missed
  * there would make the bench's `min2_memo_cleared` pass silently time
  * the memo HIT as plan cost, exactly the attribution bug the pass
  * exists to prevent (ADVICE r13). Now each memoizing site registers a
  * [[Memos.Handle]] at object init and `clearMemos` simply iterates the
  * registry: the lockstep is structural, not manual. MemoCouplingSpec
  * closes the remaining gap mechanically — a `memoizes = true` row whose
  * cache is NOT registered here fails the spec (its cleared-run bumps no
  * registered compute counter).
  */
object Memos {

  /** One driver-side memo cache.
    *
    * @param name     stable id for diagnostics/spec messages
    * @param size     current number of memoized entries
    * @param clear    drop every entry (forces the next run to recompute)
    * @param computes monotone count of actual RECOMPUTES (cache misses
    *                 that ran the real computation) since JVM start —
    *                 the probe MemoCouplingSpec uses to tell a memo hit
    *                 from a recompute
    */
  final case class Handle(
      name: String,
      size: () => Int,
      clear: () => Unit,
      computes: () => Long
  )

  private val handles = scala.collection.mutable.ArrayBuffer.empty[Handle]

  private[graft] def register(h: Handle): Unit =
    handles.synchronized { handles += h }

  private[graft] def all: Seq[Handle] = handles.synchronized(handles.toList)

  /** Sum of every registered cache's recompute counter — a cleared run
    * of any memoizing row must strictly increase this. */
  private[graft] def totalComputes(): Long = all.map(_.computes()).sum

  private[graft] def clearAll(): Unit = all.foreach(_.clear())

  /** Helper for the common site shape: an [[AtomicLong]] recompute
    * counter a memo site bumps on every true cache miss. */
  private[graft] def counter(): AtomicLong = new AtomicLong(0L)
}
