package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

import graft.streaming.ScoringStream.RawEvent

/** An event enriched with the most recent preceding mark observation
  * on its key: `last_mark_ms` is the epoch-millis of the latest
  * `markAction` event with ts <= this event's ts (the as-of
  * convention — a mark enriches itself with staleness 0), null before
  * the first mark.
  */
final case class CarriedEvent(
    user: Long,
    item: String,
    action: String,
    ts: Timestamp,
    last_mark_ms: Option[Long],
    staleness_ms: Option[Long])

/** Carry state: the latest mark's event time for one (user, item). */
final case class LastMark(tsMs: Long)

/** STREAMING as-of enrichment — the streaming twin of the batch as-of
  * join (q51) and the gap-fill carry (q150), the way q36 has
  * [[NearDupStream]]: every event is decorated with the last preceding
  * observation on its key (here: the last `markAction` event's time,
  * plus the staleness age) from ONE long of keyed state.
  *
  * Scale/state contract: state is one timestamp per live (user, item)
  * and EXPIRES via event-time timeout at (max event time on the key +
  * retention) — bounded by the live-key rate times the horizon, never
  * by stream length (the [[NearDupStream]] contract). Within a
  * microbatch events process in (ts, action, user) order, so
  * intra-batch disorder is corrected exactly; an event arriving in a
  * LATER microbatch than a mark that post-dates it is enriched with
  * that newer mark — the documented at-least-once carry caveat of
  * every streaming as-of (exact retrospective as-of remains the batch
  * q51 contract, exactly as in production feature pipelines).
  */
object CarryForwardStream {

  /** The per-group carry fold shared by BOTH stateful APIs (ts-sorted,
    * mark update, per-event emit) — one definition so the
    * flatMapGroupsWithState and transformWithState paths can never
    * drift (the [[ScoringStream.processGroup]] rule).
    */
  private[streaming] def processCarry(last0: Option[Long],
      rows: Iterator[RawEvent], markAction: String)
      : (Vector[CarriedEvent], Option[Long], Long) = {
    val batch = rows.toVector.sortBy(e => (e.ts.getTime, e.action))
    val out = Vector.newBuilder[CarriedEvent]
    var last = last0
    var maxTs = 0L
    batch.foreach { e =>
      val t = e.ts.getTime
      maxTs = math.max(maxTs, t)
      if (e.action == markAction) last = Some(t)
      out += CarriedEvent(e.user, e.item, e.action, e.ts,
        last, last.map(t - _))
    }
    (out.result(), last, maxTs)
  }

  def enriched(events: Dataset[RawEvent], markAction: String,
      watermark: String, retentionMs: Long): Dataset[CarriedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user, e.item))
      .flatMapGroupsWithState[LastMark, CarriedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[LastMark]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (outs, last, maxTs) =
              processCarry(state.getOption.map(_.tsMs), rows, markAction)
            last.foreach(m => state.update(LastMark(m)))
            state.setTimeoutTimestamp(maxTs + retentionMs)
            outs.iterator
          }
      }
  }

  /** The same operator on Spark 4's `transformWithState` (RocksDB
    * state store; [[ScoringProcessor]] is the ST2 precedent). Key
    * expiry moves from the event-time timeout to [[TTLConfig]] —
    * the TWS-native bounded-state knob.
    */
  def enrichedTws(events: Dataset[RawEvent], markAction: String)
      : Dataset[CarriedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(e => (e.user, e.item))
      .transformWithState(new CarryForwardProcessor(markAction),
        TimeMode.None(), OutputMode.Append())
  }
}

/** transformWithState twin of [[CarryForwardStream.enriched]]. */
class CarryForwardProcessor(markAction: String)
    extends StatefulProcessor[(Long, String), RawEvent, CarriedEvent] {

  @transient private var state: ValueState[LastMark] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[LastMark](
      "lastMark", Encoders.product[LastMark], TTLConfig.NONE)

  override def handleInputRows(key: (Long, String), rows: Iterator[RawEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[CarriedEvent] = {
    val (outs, last, _) = CarryForwardStream.processCarry(
      Option(state.get()).map(_.tsMs), rows, markAction)
    last.foreach(m => state.update(LastMark(m)))
    outs.iterator
  }
}
