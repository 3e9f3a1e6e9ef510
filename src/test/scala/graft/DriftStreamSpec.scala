package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{DriftAlarm, DriftStream, MetricEvent}

/** Streaming Page-CUSUM drift monitor: multi-batch disordered stream
  * must equal the sequential replay; a hand-computed tape pins the
  * fold arithmetic independently; a stable series never alarms.
  */
class DriftStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // series "m": level 1.0 for 5 points, then shifts to 3.0 — with
  // μ0=1.0, k=0.5, h=3.0 the up-side accumulates 1.5/point after the
  // shift and must alarm on the SECOND shifted point (3.0 > h at
  // t=17: 1.5 + 1.5 = 3.0 — not yet > h — so on the THIRD at t=18);
  // series "q" holds level and must stay silent.
  private val tape = Seq(
    MetricEvent("m", 1.0, ts(10), 1), MetricEvent("q", 1.0, ts(10), 2),
    MetricEvent("m", 1.1, ts(11), 3), MetricEvent("q", 0.9, ts(11), 4),
    MetricEvent("m", 0.9, ts(12), 5), MetricEvent("q", 1.0, ts(12), 6),
    MetricEvent("m", 1.0, ts(13), 7), MetricEvent("q", 1.1, ts(13), 8),
    MetricEvent("m", 1.0, ts(14), 9), MetricEvent("q", 1.0, ts(14), 10),
    MetricEvent("m", 3.0, ts(16), 11), MetricEvent("q", 1.0, ts(16), 12),
    MetricEvent("m", 3.0, ts(17), 13), MetricEvent("q", 0.95, ts(17), 14),
    MetricEvent("m", 3.0, ts(18), 15), MetricEvent("q", 1.05, ts(18), 16),
    MetricEvent("m", 3.0, ts(19), 17), MetricEvent("q", 1.0, ts(19), 18))

  private val (mu, k, h) = (1000000L, 500000L, 3000000L)

  private def runStream(batches: Seq[Seq[MetricEvent]]): Seq[DriftAlarm] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val out = DriftStream.alarms(input.toDS(), mu, k, h,
      watermark = "10 seconds", retentionMs = 3600 * 1000L)
    val name = s"drift_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[DriftAlarm].collect().toSeq
        .sortBy(a => (a.key, a.ts.getTime, a.side))
    } finally q.stop()
  }

  test("hand-computed alarm: the shifted series fires once, the stable one never") {
    // after the shift, pos accumulates (3.0−1.0−0.5)=1.5 per point:
    // 1.5 (t16), 3.0 (t17, NOT > 3.0), 4.5 (t18 → alarm, reset), 1.5 (t19)
    val alarms = runStream(Seq(tape))
    assert(alarms.map(a => (a.key, a.ts.getTime / 1000L, a.side,
      a.stat_micros)) === Seq(("m", 18L, "up", 4500000L)))
  }

  test("multi-batch disordered stream equals the sequential replay; downward drift too") {
    // drop "m" to −1.0 late so the DOWN side also fires
    val extended = tape ++ Seq(
      MetricEvent("m", -1.0, ts(20), 19), MetricEvent("m", -1.0, ts(21), 20),
      MetricEvent("m", -1.0, ts(22), 21), MetricEvent("m", -1.0, ts(23), 22))
    val expected = DriftStream.replay(extended, mu, k, h)
      .sortBy(a => (a.key, a.ts.getTime, a.side))
    // three batch splits, each shuffled internally (intra-batch disorder)
    val batches = Seq(
      extended.filter(_.ts.getTime <= 13000L).reverse,
      extended.filter(e => e.ts.getTime > 13000L && e.ts.getTime <= 18000L).reverse,
      extended.filter(_.ts.getTime > 18000L).reverse)
    val got = runStream(batches)
    assert(got.map(a => (a.key, a.ts.getTime, a.side, a.stat_micros)) ===
      expected.map(a => (a.key, a.ts.getTime, a.side, a.stat_micros)))
    assert(got.exists(_.side == "down"), "down-side alarm expected")
  }
}
