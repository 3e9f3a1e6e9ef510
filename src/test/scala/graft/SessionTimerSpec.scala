package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{SessionClose, SessionStream}
import graft.streaming.ScoringStream.RawEvent

/** Event-time TIMER sessions (transformWithState): closed sessions
  * must equal the batch `session_window` aggregation over the same
  * disordered multi-batch tape, and intra-batch gap splits must emit
  * inline without waiting for the watermark.
  */
class SessionTimerSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val gapMs = 30000L // 30 s inactivity closes a session

  // user 1: two sessions (10-40 with events at 10/25/40; then 120);
  // user 2: one session (15-20); sentinel user 99 far ahead advances
  // the watermark so every real session's timer fires
  private val tape = Seq(
    RawEvent(1L, "a", "click", ts(10)), RawEvent(2L, "a", "view", ts(15)),
    RawEvent(1L, "b", "view", ts(25)), RawEvent(2L, "b", "click", ts(20)),
    RawEvent(1L, "a", "click", ts(40)), RawEvent(1L, "c", "view", ts(120)),
    RawEvent(99L, "z", "view", ts(100000)))

  private def runStream(batches: Seq[Seq[RawEvent]]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    try {
      val in = MemoryStream[RawEvent]
      val name = s"sess_${System.nanoTime()}"
      val q = SessionStream.sessionCloses(spark, in.toDS(), gapMs, "10 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        spark.table(name).as[SessionClose].collect().toSeq
          .filter(_.user != 99L)
          .map(c => (c.user, c.n_events, c.last_ts.getTime / 1000L))
          .sortBy(identity)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def batchSessions: Seq[(Long, Long, Long)] = {
    import spark.implicits._
    tape.filter(_.user != 99L).toDF()
      .groupBy(col("user"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("last"))
      .select(col("user"), col("n"), col("last").cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(identity)
  }

  test("timer-closed sessions equal batch session_window on a disordered tape") {
    val expected = batchSessions
    assert(expected.map(e => (e._1, e._2)).toSet ==
      Set((1L, 3L), (1L, 1L), (2L, 2L)), s"tape shape drifted: $expected")
    val got = runStream(Seq(
      tape.take(4).reverse, // intra-batch disorder
      tape.slice(4, 6),
      tape.drop(6)))
    assert(got == expected, s"stream $got vs batch $expected")
  }

  test("intra-batch gap splits emit inline; late-within-watermark events extend, not split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    try {
      val in = MemoryStream[RawEvent]
      val name = s"sess2_${System.nanoTime()}"
      val q = SessionStream.sessionCloses(spark, in.toDS(), gapMs, "10 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        // both sessions of user 1 arrive in ONE batch: the split is an
        // inline emit — no watermark advance needed for the first close
        in.addData(Seq(RawEvent(1L, "a", "click", ts(10)),
          RawEvent(1L, "b", "view", ts(20)), RawEvent(1L, "c", "view", ts(120))))
        q.processAllAvailable()
        val inline = spark.table(name).as[SessionClose].collect()
        assert(inline.map(c => (c.user, c.n_events, c.last_ts.getTime / 1000L))
          .toSeq == Seq((1L, 2L, 20L)), s"inline close missing: ${inline.toSeq}")
        // a late event (ts 115, within the 10 s watermark of max 120)
        // EXTENDS the open session rather than splitting it
        in.addData(Seq(RawEvent(1L, "d", "click", ts(115))))
        q.processAllAvailable()
        // sentinel fires the final timer
        in.addData(Seq(RawEvent(99L, "z", "view", ts(100000))))
        q.processAllAvailable()
        val all = spark.table(name).as[SessionClose].collect()
          .filter(_.user != 99L)
          .map(c => (c.user, c.n_events, c.last_ts.getTime / 1000L)).toSeq.sorted
        assert(all == Seq((1L, 2L, 20L), (1L, 2L, 120L)), s"got $all")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
