package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.FunnelStream
import graft.streaming.ScoringStream.RawEvent

/** Streaming strict-order funnel: final depths must match the batch
  * q78 join-chain formulation replayed over the same tape (two
  * independent algorithms), out-of-order stages must not advance,
  * and advances must be 1..depth with strictly increasing times.
  */
class FunnelStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // user 1 completes all four stages (with noise events interleaved);
  // user 2 stalls at view; user 3's click PRECEDES its view → depth 2
  // only (strict order); user 4 never signs up → depth 0
  private val tape = Seq(
    RawEvent(1L, "x", "signup", ts(10)),
    RawEvent(1L, "x", "error", ts(11)),
    RawEvent(1L, "x", "view", ts(12)),
    RawEvent(1L, "x", "click", ts(14)),
    RawEvent(1L, "x", "purchase", ts(20)),
    RawEvent(2L, "x", "signup", ts(10)),
    RawEvent(2L, "x", "view", ts(15)),
    RawEvent(3L, "x", "signup", ts(10)),
    RawEvent(3L, "x", "click", ts(11)),
    RawEvent(3L, "x", "view", ts(12)),
    RawEvent(4L, "x", "view", ts(10)),
    RawEvent(4L, "x", "purchase", ts(11)))

  /** Batch replay via q78's independent join-chain formulation. */
  private def batchDepths: Map[Long, Long] = {
    import spark.implicits._
    val ev = tape.toDS().toDF()
      .select(col("user").as("user_id"), col("action").as("event_type"),
        col("ts"))
    def stage(prev: DataFrame, prevCol: String, evType: String, out: String) =
      ev.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = stage(t1, "t1", "view", "t2")
    val t3 = stage(t2, "t2", "click", "t3")
    val t4 = stage(t3, "t3", "purchase", "t4")
    ev.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .join(t4, Seq("user_id"), "left")
      .select(col("user_id"),
        (col("t1").isNotNull.cast("long") + col("t2").isNotNull.cast("long") +
          col("t3").isNotNull.cast("long") + col("t4").isNotNull.cast("long"))
          .as("depth"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("streaming depths match the batch q78 join-chain replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val out = FunnelStream.advances(input.toDS(),
      watermark = "10 seconds", retentionMs = 3600 * 1000L)
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = tape.partition(_.ts.getTime <= 12000L)
      input.addData(b1.reverse) // intra-batch disorder
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val advances = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getTimestamp(3).getTime))
      val depths = advances.groupBy(_._1).view
        .mapValues(_.map(_._2).max.toLong).toMap
      val expected = batchDepths.filter(_._2 > 0L)
      assert(depths == expected, s"got $depths expected $expected")
      // advances per user are exactly 1..depth with increasing times
      advances.groupBy(_._1).foreach { case (_, as) =>
        val sorted = as.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
        assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
      }
      // the strict-order user stopped at depth 2, stage names correct
      assert(advances.filter(_._1 == 3L).map(_._3).toSet ==
        Set("signup", "view"))
    } finally q.stop()
  }
}
