package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CarryForwardStream
import graft.streaming.ScoringStream.RawEvent

/** Streaming as-of carry-forward: parity against the batch window
  * replay (q51's last-ignoreNulls formulation) when event time
  * advances across microbatches, plus the pre-first-mark null
  * contract.
  */
class CarryForwardStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    RawEvent(1L, "a", "view", ts(10)),
    RawEvent(1L, "a", "purchase", ts(20)),
    RawEvent(1L, "a", "view", ts(25)),
    RawEvent(2L, "a", "view", ts(30)), // other key: never marked
    RawEvent(1L, "a", "purchase", ts(40)),
    RawEvent(1L, "a", "view", ts(55)))

  /** Batch replay: last preceding mark via the q51 window formulation. */
  private def batchExpected: Set[(Long, String, Long, Option[Long], Option[Long])] = {
    import spark.implicits._
    val w = Window.partitionBy(col("user"), col("item"))
      .orderBy(col("ts")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.toDS().toDF()
      .withColumn("mark_ms",
        last(when(col("action") === "purchase",
          unix_millis(col("ts"))), ignoreNulls = true).over(w))
      .select(col("user"), col("item"), unix_millis(col("ts")).as("t"),
        col("mark_ms"), (unix_millis(col("ts")) - col("mark_ms")).as("stale"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toSet
  }

  test("stream carry matches the batch as-of window replay across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val out = CarryForwardStream.enriched(input.toDS(), "purchase",
      watermark = "10 seconds", retentionMs = 3600 * 1000L)
    val q = out.writeStream.format("memory").queryName("carry")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 deliberately disordered WITHIN the batch; batch 2 later
      input.addData(events(2), events(0), events(1), events(3))
      q.processAllAvailable()
      input.addData(events(4), events(5))
      q.processAllAvailable()
      val got = spark.table("carry").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(3).getTime,
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))
        .toSet
      assert(got == batchExpected, s"got $got expected $batchExpected")
      // the unmarked key carries null, a mark enriches itself with 0
      assert(got.contains((2L, "a", 30000L, None, None)))
      assert(got.contains((1L, "a", 20000L, Some(20000L), Some(0L))))
    } finally q.stop()
  }

  test("transformWithState twin produces the same carries (API parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    val input = MemoryStream[RawEvent]
    val out = CarryForwardStream.enrichedTws(input.toDS(), "purchase")
    val q = out.writeStream.format("memory").queryName("carry_tws")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events(2), events(0), events(1), events(3))
      q.processAllAvailable()
      input.addData(events(4), events(5))
      q.processAllAvailable()
      val got = spark.table("carry_tws").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(3).getTime,
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))
        .toSet
      assert(got == batchExpected, s"got $got expected $batchExpected")
    } finally q.stop()
  }
}
