package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Admit, MetricEvent, ThrottleStream}

/** Streaming token-bucket rate limiter: hand-computed admissions, and
  * disordered multi-batch == sequential replay.
  */
class ThrottleStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  // rate 1 token / 100 ms (10_000 micros/ms · 1e6 scale: use
  // 10_000 micros per ms = 1 token per 100 ms at cost 1_000_000),
  // capacity 2 tokens: a 3-burst admits 2, then refills gate the rest
  private val (rate, cap, cost) = (10000L, 2000000L, 1000000L)

  private val tape = Seq(
    MetricEvent("a", 0, ts(1000), 1), // full bucket: admit, 1 token left
    MetricEvent("a", 0, ts(1010), 2), // admit, ~0 left
    MetricEvent("a", 0, ts(1020), 3), // reject (only 0.1 token refilled)
    MetricEvent("a", 0, ts(1150), 4), // ~1.4 tokens: admit
    MetricEvent("b", 0, ts(1000), 5), // independent bucket: admit
    MetricEvent("a", 0, ts(1160), 6)) // ~0.5 tokens: reject

  test("hand-computed admissions on a burst") {
    val got = ThrottleStream.replay(tape, rate, cap, cost)
      .map(a => (a.key, a.seq, a.admitted))
    assert(got === Seq(
      ("a", 1L, true), ("b", 5L, true), ("a", 2L, true),
      ("a", 3L, false), ("a", 4L, true), ("a", 6L, false)))
  }

  test("disordered multi-batch stream equals the sequential replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val out = ThrottleStream.admissions(input.toDS(), rate, cap, cost,
      watermark = "10 seconds", retentionMs = 3600 * 1000L)
    val name = s"throttle_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = tape.partition(_.ts.getTime <= 1020L)
      input.addData(b1.reverse)
      q.processAllAvailable()
      input.addData(b2.reverse)
      q.processAllAvailable()
      val got = spark.table(name).as[Admit].collect().toSeq
        .map(a => (a.key, a.seq, a.admitted, a.tokens_micros))
        .sortBy(r => (r._1, r._2))
      val expected = ThrottleStream.replay(tape, rate, cap, cost)
        .map(a => (a.key, a.seq, a.admitted, a.tokens_micros))
        .sortBy(r => (r._1, r._2))
      assert(got === expected)
    } finally q.stop()
  }
}
