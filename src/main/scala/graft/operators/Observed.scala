package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Single-pass data-quality counters via `Dataset.observe`
  * (CollectMetrics): a 100 TB ingest cannot afford a second scan just
  * to count nulls and rule violations, and a cached-DataFrame double
  * pass is a second full materialization. Observed metrics ride the
  * data pass itself — accumulator-backed aggregates merged per task,
  * constant state, zero extra jobs — and surface through
  * `QueryExecution.observedMetrics` (batch) or
  * `StreamingQueryProgress.observedMetrics` (per micro-batch).
  *
  * The reference's quality audit recomputes each counter with its own
  * scan (dashboard/app.py:301-321 reruns aggregate queries per
  * metric); this is the Spark-native single-pass form q90's audit
  * report complements.
  */
object Observed {

  /** Attach named observed aggregates to a frame. Aggregates must be
    * deterministic and contain no distinct/filter clauses beyond
    * `count_if`-style conditionals (Spark's CollectMetrics contract).
    */
  def withMetrics(df: DataFrame, name: String,
      first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** Run `action` (any terminal op on the observed frame — write,
    * count, noop-sink foreach) and return its result plus the metrics
    * row recorded under `name` by the LAST query execution that
    * carried it. The listener bus is drained before reading, so the
    * row is the completed run's, not a straggler's.
    */
  def run[T](spark: SparkSession, name: String)(action: => T): (T, Row) = {
    val got = new java.util.concurrent.atomic.AtomicReference[Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach(got.set)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action
      org.apache.spark.graft.SparkShims.drainListenerBus(spark.sparkContext)
      val row = got.get()
      require(row != null,
        s"no observed metrics named '$name' were recorded — was the " +
          "observed frame actually executed by the action?")
      (result, row)
    } finally spark.listenerManager.unregister(listener)
  }
}
