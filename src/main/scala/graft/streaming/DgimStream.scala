package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One DGIM readout after an event: the estimated number of events in
  * the trailing window ending at `ts`, plus the state-size bookkeeping
  * the memory guarantee is about.
  */
final case class DgimReadout(key: String, ts: Timestamp, seq: Long,
    est: Long, n_buckets: Long, max_size: Long)

/** DGIM bucket: `ts` = the most recent event instant the bucket
  * covers (epoch ms), `size` = how many events it aggregates (a power
  * of two by construction).
  */
final case class DgimBucket(ts: Long, size: Long)

/** `hwm` = the key's high-water event instant (epoch ms), carried in
  * state so "now" is MONOTONE across batches: a batch whose events all
  * lag a previous batch's max must expire/estimate against the same
  * advanced clock [[DgimStream.replay]] uses, not a batch-local reset
  * (round-11 ADVICE fix — the old batch-local `var maxTs = 0L`
  * regressed `now` on all-straggler batches and counted newer
  * in-state buckets fully).
  */
final case class DgimState(buckets: List[DgimBucket], hwm: Long)

/** DGIM sliding-window counting (Datar, Gionis, Indyk & Motwani 2002)
  * — "how many events did this key produce in the last W?" maintained
  * in O(log²) bits per key instead of a per-event buffer: the sketch
  * every rate dashboard and per-key quota check needs at 100 TB/day,
  * where the exact answer would hold the full window of events as
  * state. Buckets of power-of-two sizes, AT MOST TWO per size (the
  * r=2 variant): each event enters as a size-1 bucket; when a third
  * bucket of any size appears, the two OLDEST of that size merge into
  * one of double size stamped with the newer timestamp; buckets whose
  * timestamp leaves the window drop whole. The estimate counts every
  * retained bucket fully except the OLDEST, which contributes half —
  * the classic bound: relative error ≤ 50% (at most half the oldest
  * bucket is actually inside the window, and the remaining buckets
  * sum to at least its size − 1).
  *
  * This is the time-based generalization (buckets carry timestamps,
  * the window is a duration — the paper's §7 extension), which is
  * what a production trailing-1h counter actually is. Event-time
  * discipline matches [[ThrottleStream]]: intra-batch disorder sorts
  * on (ts, seq), cross-batch stragglers meet newer state (the
  * at-least-once caveat), idle keys expire via event-time timeout,
  * and [[DgimStream.replay]] is the identical sequential fold the
  * spec replays as truth. DgimStreamSpec pins: estimate within the
  * 50% bound against the EXACT windowed count at every readout,
  * ≤ 2 buckets per size after every event, streamed == replay parity
  * across a disordered multi-batch tape, and the logarithmic state
  * bound (n_buckets ≤ 2·(log₂(total)+1)).
  */
object DgimStream {

  /** Fold one event instant into the bucket list (newest first). */
  private[graft] def insert(buckets: List[DgimBucket],
      ts: Long): List[DgimBucket] = {
    // cascade: walk the list newest-to-oldest; whenever three buckets
    // of one size exist, merge the two OLDEST of that size
    def cascade(bs: List[DgimBucket]): List[DgimBucket] = {
      val bySize = bs.groupBy(_.size)
      bySize.find(_._2.length > 2) match {
        case None => bs
        case Some((size, same)) =>
          // the two oldest of this size = the two with the smallest ts
          val oldestTwo = same.sortBy(_.ts).take(2)
          val merged = DgimBucket(oldestTwo.map(_.ts).max, size * 2)
          val remaining = bs.diff(oldestTwo)
          // insert the merged bucket keeping newest-first ts order
          val (newer, older) = remaining.partition(_.ts > merged.ts)
          cascade(newer ++ (merged :: older))
      }
    }
    cascade(DgimBucket(ts, 1L) :: buckets)
  }

  /** Standard DGIM estimate for the window (now − windowMs, now]:
    * every in-window bucket counts fully except the oldest, which
    * counts half (integer floor — deterministic on every engine).
    */
  private[graft] def estimate(buckets: List[DgimBucket], now: Long,
      windowMs: Long): Long = {
    val in = buckets.filter(_.ts > now - windowMs)
    if (in.isEmpty) 0L
    else {
      val oldest = in.minBy(b => (b.ts, -b.size))
      in.map(_.size).sum - oldest.size + (oldest.size + 1) / 2
    }
  }

  private def expire(buckets: List[DgimBucket], now: Long,
      windowMs: Long): List[DgimBucket] =
    buckets.filter(_.ts > now - windowMs)

  def readouts(events: Dataset[MetricEvent], windowMs: Long,
      watermark: String, retentionMs: Long): Dataset[DgimReadout] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[DgimState, DgimReadout](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[DgimState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector.sortBy(e => (e.ts.getTime, e.seq))
            val out = Vector.newBuilder[DgimReadout]
            var buckets = state.getOption.map(_.buckets).getOrElse(Nil)
            // fold FROM the persisted high-water mark, never a
            // batch-local zero: straggler batches must not regress "now"
            var maxTs = state.getOption.map(_.hwm).getOrElse(0L)
            batch.foreach { e =>
              val t = e.ts.getTime
              maxTs = math.max(maxTs, t)
              buckets = expire(insert(buckets, t), maxTs, windowMs)
              out += DgimReadout(key, e.ts, e.seq,
                estimate(buckets, maxTs, windowMs),
                buckets.length.toLong,
                if (buckets.isEmpty) 0L else buckets.map(_.size).max)
            }
            state.update(DgimState(buckets, maxTs))
            // clamp above the watermark: an all-straggler batch can put
            // maxTs + retention at/below it, and setTimeoutTimestamp
            // throws on a non-future event-time timeout
            state.setTimeoutTimestamp(
              math.max(maxTs + retentionMs,
                state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  /** The identical fold over an ordered tape — the sequential
    * reference for the streaming spec and the batch backfill.
    */
  def replay(tape: Seq[MetricEvent], windowMs: Long): Seq[DgimReadout] = {
    val st = scala.collection.mutable.Map.empty[String, List[DgimBucket]]
    val now = scala.collection.mutable.Map.empty[String, Long]
    tape.sortBy(e => (e.ts.getTime, e.seq)).map { e =>
      val t = e.ts.getTime
      val mx = math.max(now.getOrElse(e.key, 0L), t)
      now(e.key) = mx
      val buckets = expire(insert(st.getOrElse(e.key, Nil), t), mx, windowMs)
      st(e.key) = buckets
      DgimReadout(e.key, e.ts, e.seq, estimate(buckets, mx, windowMs),
        buckets.length.toLong,
        if (buckets.isEmpty) 0L else buckets.map(_.size).max)
    }
  }
}
