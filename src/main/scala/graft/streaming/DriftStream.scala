package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One metric observation: `key` is the monitored series (an event
  * type, a pipeline stage, a model's score stream), `seq` a unique
  * tiebreak (event id) so intra-batch ordering is total.
  */
final case class MetricEvent(key: String, value: Double, ts: Timestamp,
    seq: Long)

/** A drift alarm: the one-sided CUSUM crossed its threshold at `ts`.
  * `side` is "up" or "down"; `stat_micros` the crossing statistic.
  */
final case class DriftAlarm(key: String, ts: Timestamp, side: String,
    stat_micros: Long)

/** Two one-sided Page statistics, in integer micros. */
final case class DriftState(pos: Long, neg: Long)

/** STREAMING drift monitor — Page's online CUSUM (Page 1954), the
  * continuous twin of the batch retrospective change-point q202: q202
  * answers "where did the level shift, looking back", this answers
  * "has it shifted, RIGHT NOW" with O(1) state per monitored series.
  * Two one-sided statistics in integer micros (values quantized at
  * 10⁻⁶ so stream-vs-replay parity is exact, the repo's integer-state
  * rule):
  *
  *   pos ← max(0, pos + (x − μ₀ − k));  neg ← max(0, neg + (μ₀ − x − k))
  *
  * with reference level μ₀ and slack k; a side crossing threshold h
  * emits an alarm that microbatch and RESETS that side (the standard
  * restart-after-alarm protocol). Scale/state contract: TWO longs per
  * live key, expiring via event-time timeout; intra-batch disorder
  * sorts exactly on (ts, seq); an observation arriving a microbatch
  * late is the at-least-once caveat shared with [[CarryForwardStream]]
  * — the retrospective exact locator remains q202's batch contract.
  */
object DriftStream {

  def alarms(events: Dataset[MetricEvent], muMicros: Long, slackMicros: Long,
      thresholdMicros: Long, watermark: String,
      retentionMs: Long): Dataset[DriftAlarm] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[DriftState, DriftAlarm](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[DriftState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector.sortBy(e => (e.ts.getTime, e.seq))
            val out = Vector.newBuilder[DriftAlarm]
            var st = state.getOption.getOrElse(DriftState(0L, 0L))
            var maxTs = 0L
            batch.foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              val x = math.round(e.value * 1e6)
              val pos = math.max(0L, st.pos + (x - muMicros - slackMicros))
              val neg = math.max(0L, st.neg + (muMicros - x - slackMicros))
              var (nPos, nNeg) = (pos, neg)
              if (pos > thresholdMicros) {
                out += DriftAlarm(key, e.ts, "up", pos)
                nPos = 0L
              }
              if (neg > thresholdMicros) {
                out += DriftAlarm(key, e.ts, "down", neg)
                nNeg = 0L
              }
              st = DriftState(nPos, nNeg)
            }
            state.update(st)
            state.setTimeoutTimestamp(maxTs + retentionMs)
            out.result().iterator
          }
      }
  }

  /** The identical fold over an already-ordered tape — the sequential
    * reference the streaming spec compares against (and what a batch
    * backfill over history would compute).
    */
  def replay(tape: Seq[MetricEvent], muMicros: Long, slackMicros: Long,
      thresholdMicros: Long): Seq[DriftAlarm] = {
    val out = Vector.newBuilder[DriftAlarm]
    val st = scala.collection.mutable.Map.empty[String, DriftState]
    tape.sortBy(e => (e.ts.getTime, e.seq)).foreach { e =>
      val s = st.getOrElse(e.key, DriftState(0L, 0L))
      val x = math.round(e.value * 1e6)
      val pos = math.max(0L, s.pos + (x - muMicros - slackMicros))
      val neg = math.max(0L, s.neg + (muMicros - x - slackMicros))
      var (nPos, nNeg) = (pos, neg)
      if (pos > thresholdMicros) { out += DriftAlarm(e.key, e.ts, "up", pos); nPos = 0L }
      if (neg > thresholdMicros) { out += DriftAlarm(e.key, e.ts, "down", neg); nNeg = 0L }
      st(e.key) = DriftState(nPos, nNeg)
    }
    out.result()
  }
}
