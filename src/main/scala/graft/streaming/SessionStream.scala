package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import ScoringStream.RawEvent

/** A closed inactivity session: the per-user event count and the
  * timestamp of the session's last event.
  */
final case class SessionClose(user: Long, n_events: Long, last_ts: Timestamp)

/** Inactivity-session close on Spark 4's transformWithState EVENT-TIME
  * TIMERS — the custom-state complement of ST12's native
  * `session_window` (q224 proved window-vs-manual parity in BATCH; this
  * operator is the streaming twin where the CLOSE itself is an event:
  * downstream wants one record the moment a session ends, not a table
  * of windows to diff).
  *
  * Per user key: a (count, last-event-ms) value state and ONE armed
  * timer at last + gap. Each batch folds its (ts-sorted) events into
  * the open session, splitting inline when an intra-batch gap exceeds
  * `gapMs` (those closes emit immediately); the timer is then re-armed
  * at the new session tail. `handleExpiredTimer` fires when the
  * WATERMARK passes last + gap — the same bound that admits late
  * events — so a watermark-respecting late event always arrives BEFORE
  * the close it would extend, and the operator's sessions coincide with
  * `session_window`'s merge semantics by construction
  * (SessionTimerSpec pins stream-vs-batch parity on a disordered
  * multi-batch tape).
  *
  * Scale: state is one (long, long) per ACTIVE user + one timer row —
  * RocksDB-resident, bounded by concurrent-session count, not history;
  * the only shuffle is the groupByKey on user.
  */
class SessionCloseProcessor(gapMs: Long)
    extends StatefulProcessor[Long, RawEvent, SessionClose] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)](
      "session", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[RawEvent],
      timerValues: TimerValues): Iterator[SessionClose] = {
    val ts = rows.map(_.ts.getTime).toSeq.sorted
    val out = Vector.newBuilder[SessionClose]
    var (n, last) = Option(st.get()).getOrElse((0L, Long.MinValue))
    ts.foreach { t =>
      if (n > 0L && t > last + gapMs) {
        out += SessionClose(key, n, new Timestamp(last))
        n = 0L
      }
      n += 1L
      last = math.max(last, t)
    }
    st.update((n, last))
    // exactly one armed timer per key: the open session's deadline
    getHandle.listTimers().foreach(e => getHandle.deleteTimer(e.asInstanceOf[Long]))
    getHandle.registerTimer(last + gapMs)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClose] = {
    val cur = Option(st.get()).filter(_._1 > 0L)
    st.clear()
    cur.map(c => SessionClose(key, c._1, new Timestamp(c._2))).iterator
  }
}

object SessionStream {

  /** The wired operator: watermarked events → per-user timer-closed
    * sessions. Requires the RocksDB state store (transformWithState's
    * provider contract — [[ScoringProcessor.configureRocksDb]]).
    */
  def sessionCloses(spark: SparkSession, events: Dataset[RawEvent],
      gapMs: Long, watermark: String): Dataset[SessionClose] = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
