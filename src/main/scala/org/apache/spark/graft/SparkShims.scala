package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` surface (the core-side sibling of
  * `org.apache.spark.sql.graft.shims`): the listener bus is async, so
  * a benchmark snapshotting task-metric totals around a query must
  * drain it before reading — otherwise the tail stages' metrics land
  * in the NEXT query's delta.
  */
object SparkShims {
  /** Best-effort drain: `waitUntilEmpty()` throws TimeoutException if
    * the bus is still backlogged after its default timeout (plausible
    * under BENCH_ALL on a loaded box). A slow drain must degrade to
    * possibly-stale metric deltas for ONE query, not abort the whole
    * bench run and lose every recorded rep.
    */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Tungsten allocation mode ("ON_HEAP" | "OFF_HEAP") — fixed at
    * SparkContext construction (the UnifiedMemoryManager reads
    * spark.memory.offHeap.* exactly once), which is WHY the off-heap
    * regime gate lives in Verify's own-session mode and not in the
    * shared-JVM test sweeps: a runtime conf.set cannot flip it.
    */
  def tungstenMemoryMode(sc: SparkContext): String =
    sc.env.memoryManager.tungstenMemoryMode.toString

  /** Instantaneous off-heap execution memory in use — sampled by
    * Verify's off-heap mode to prove the regime actually allocated
    * pages outside the heap, not just that the mode flag was set.
    */
  def offHeapExecutionMemoryUsed(sc: SparkContext): Long =
    sc.env.memoryManager.offHeapExecutionMemoryUsed
}
