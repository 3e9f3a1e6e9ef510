package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admission decision: `admitted` is the token-bucket verdict for
  * the event at `ts`; `tokens_micros` the bucket level AFTER it.
  */
final case class Admit(key: String, ts: Timestamp, seq: Long,
    admitted: Boolean, tokens_micros: Long)

/** Token-bucket state: micro-tokens + the last refill instant. */
final case class BucketState(tokensMicros: Long, lastMs: Long)

/** STREAMING token-bucket rate limiter — q216's clamped-balance
  * recurrence (min(cap, max-refill) with consumption) run as live
  * per-key state: the admission-control primitive in front of every
  * rate-limited ingest/scoring endpoint. Integer micro-tokens
  * throughout (refill = elapsed_ms · rate_micros_per_ms, clamped at
  * capacity; an admit consumes `costMicros`), so multi-batch replay
  * parity is exact. State: two longs per live key, event-time expiry
  * — an idle key's bucket dies and a fresh one starts FULL, which is
  * the standard burst-friendly cold-start. Intra-batch disorder sorts
  * on (ts, seq); cross-batch stragglers meet newer state — the
  * at-least-once caveat shared with [[CarryForwardStream]], and why
  * the batch replay ([[replay]]) stays the retrospective truth.
  */
object ThrottleStream {

  def admissions(events: Dataset[MetricEvent], ratePerMsMicros: Long,
      capMicros: Long, costMicros: Long, watermark: String,
      retentionMs: Long): Dataset[Admit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[BucketState, Admit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector.sortBy(e => (e.ts.getTime, e.seq))
            val out = Vector.newBuilder[Admit]
            var st = state.getOption.getOrElse(BucketState(capMicros, Long.MinValue))
            var maxTs = 0L
            batch.foreach { e =>
              val t = e.ts.getTime
              maxTs = math.max(maxTs, t)
              val refilled =
                if (st.lastMs == Long.MinValue) capMicros
                else math.min(capMicros,
                  st.tokensMicros + math.max(0L, t - st.lastMs) * ratePerMsMicros)
              val ok = refilled >= costMicros
              val left = if (ok) refilled - costMicros else refilled
              out += Admit(key, e.ts, e.seq, ok, left)
              st = BucketState(left, math.max(st.lastMs, t))
            }
            state.update(st)
            state.setTimeoutTimestamp(maxTs + retentionMs)
            out.result().iterator
          }
      }
  }

  /** The identical fold over an ordered tape — the sequential
    * reference for the streaming spec and the batch backfill.
    */
  def replay(tape: Seq[MetricEvent], ratePerMsMicros: Long, capMicros: Long,
      costMicros: Long): Seq[Admit] = {
    val out = Vector.newBuilder[Admit]
    val st = scala.collection.mutable.Map.empty[String, BucketState]
    tape.sortBy(e => (e.ts.getTime, e.seq)).foreach { e =>
      val s = st.getOrElse(e.key, BucketState(capMicros, Long.MinValue))
      val t = e.ts.getTime
      val refilled =
        if (s.lastMs == Long.MinValue) capMicros
        else math.min(capMicros,
          s.tokensMicros + math.max(0L, t - s.lastMs) * ratePerMsMicros)
      val ok = refilled >= costMicros
      val left = if (ok) refilled - costMicros else refilled
      out += Admit(e.key, e.ts, e.seq, ok, left)
      st(e.key) = BucketState(left, math.max(s.lastMs, t))
    }
    out.result()
  }
}
