package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Observed

/** Single-pass DQ counters (Dataset.observe / CollectMetrics): the
  * metrics must equal a direct second-scan computation WITHOUT adding
  * a scan or an exchange of their own — and in streams they must be
  * per-micro-batch, readable from the progress events.
  */
class ObservedMetricsSpec extends SparkSpec {

  test("batch: observed DQ counters equal the two-pass truth, zero extra exchanges") {
    val li = Tables.lineitem(spark, sf0001)
    val observed = Observed.withMetrics(
      li.filter(col("l_quantity") > 0), "dq",
      count(lit(1)).as("rows"),
      count_if(col("l_discount") > lit(0.05)).as("high_discount"),
      count_if(col("l_shipdate").isNull).as("null_shipdates"),
      max(col("l_extendedprice")).as("max_price"))
    // the observed frame feeds real downstream work (a rollup), and the
    // metrics ride that single pass
    val pipeline = observed.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val ((rollupRows, metrics), truth) = (
      Observed.run(spark, "dq") { pipeline.collect() },
      li.filter(col("l_quantity") > 0).agg(
        count(lit(1)), count_if(col("l_discount") > lit(0.05)),
        count_if(col("l_shipdate").isNull), max(col("l_extendedprice")))
        .head())
    assert(rollupRows.nonEmpty)
    assert(metrics.getAs[Long]("rows") === truth.getLong(0))
    assert(metrics.getAs[Long]("high_discount") === truth.getLong(1))
    assert(metrics.getAs[Long]("null_shipdates") === truth.getLong(2))
    assert(metrics.getAs[Double]("max_price") === truth.getDouble(3))
    // CollectMetrics is a pass-through node: same exchange fingerprint
    // as the un-observed pipeline (no second scan, no extra shuffle).
    // MUST compare under audit conf: with AQE on, executedPlan is an
    // AdaptiveSparkPlanExec LEAF and both sides would count (0,0) —
    // a comparison that can never fail (round-12 self-review catch).
    withAuditConf {
      // rebuild BOTH frames here: a Dataset caches its QueryExecution,
      // so the already-collected `pipeline` would replay its AQE plan
      val observed2 = Observed.withMetrics(
        li.filter(col("l_quantity") > 0), "dq2",
        count(lit(1)).as("rows"))
      val obs = observed2.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("qty"))
      val bare = li.filter(col("l_quantity") > 0)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("qty"))
      val obsFp = Explain.exchangeCounts(obs.queryExecution.executedPlan)
      val bareFp = Explain.exchangeCounts(bare.queryExecution.executedPlan)
      assert(bareFp._1 > 0, s"audit conf not in effect — bare plan " +
        s"counted $bareFp, the groupBy must show its shuffle")
      assert(obsFp === bareFp, "observe added exchanges to the plan")
    }
  }

  test("streaming: observed counters are per-micro-batch in the progress events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val observed = Observed.withMetrics(
      input.toDS().toDF("v"), "dq_stream",
      count(lit(1)).as("rows"),
      count_if(col("v") < 0L).as("negatives"))
    val q = observed
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => b.collect(); () }
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1L, -2L, 3L)
      q.processAllAvailable()
      input.addData(-4L)
      q.processAllAvailable()
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq_stream")))
        .map(r => (r.getAs[Long]("rows"), r.getAs[Long]("negatives")))
        .filter(_._1 > 0L)
      assert(perBatch === Seq((3L, 1L), (1L, 1L)),
        s"per-batch observed metrics wrong: $perBatch")
    } finally q.stop()
  }
}
