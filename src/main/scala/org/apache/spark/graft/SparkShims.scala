package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` surface (the core-side sibling of
  * `org.apache.spark.sql.graft.shims`): the listener bus is async, so
  * a benchmark snapshotting task-metric totals around a query must
  * drain it before reading — otherwise the tail stages' metrics land
  * in the NEXT query's delta.
  */
object SparkShims {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
