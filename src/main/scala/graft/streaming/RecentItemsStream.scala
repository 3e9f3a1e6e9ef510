package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.streaming.ScoringStream.RawEvent

/** Per-user RECENT-ITEMS state — the candidate-generation feature the
  * reference's consumer rebuilds from full history on every poll
  * (run_consumer.py:126-154 reloads the whole snapshot): keep each
  * user's last `k` DISTINCT items, most-recent-first, with stale
  * entries aging out under a real state TTL. Exercises the two
  * `transformWithState` surfaces the rest of the streaming layer does
  * not: [[ListState]] (order-preserving multi-value state — the other
  * operators use ValueState) and a NON-NONE [[TTLConfig]] (per-value
  * processing-time expiry enforced BY THE STATE STORE, not by operator
  * code — the bounded-state knob for abandoned keys: a user who stops
  * arriving costs nothing after the TTL, with no timer bookkeeping).
  *
  * Semantics per micro-batch, per user: events apply in (ts, item)
  * order; a re-seen item MOVES to the front (recency update, no
  * duplicate); the list trims to the newest `k`; one snapshot row
  * (user, items front-first joined with '|') emits per touched user
  * per batch. State is ≤ k strings per live user — bounded by
  * construction, and the TTL bounds "live".
  *
  * Scale: one user shuffle; RocksDB holds the lists; snapshots emit
  * only for users present in the batch (no full-state scans).
  */
object RecentItemsStream {

  case class RecentSnapshot(user: Long, items: String)

  def recentItems(events: Dataset[RawEvent], k: Int, ttl: Duration)
      : Dataset[RecentSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    // TTL state requires TimeMode.ProcessingTime (the TTL clock)
    events.groupByKey(_.user)
      .transformWithState(new RecentItemsProcessor(k, ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}

/** ListState + TTL processor behind [[RecentItemsStream.recentItems]]. */
class RecentItemsProcessor(k: Int, ttl: Duration)
    extends StatefulProcessor[Long, RawEvent,
      RecentItemsStream.RecentSnapshot] {

  @transient private var recent: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[String](
      "recent", Encoders.STRING, TTLConfig(ttl))

  override def handleInputRows(user: Long, rows: Iterator[RawEvent],
      timerValues: TimerValues)
      : Iterator[RecentItemsStream.RecentSnapshot] = {
    // oldest-first in state; expired values are already filtered by the
    // store's TTL on read
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    recent.get().foreach(buf += _)
    rows.toSeq.sortBy(e => (e.ts.getTime, e.item)).foreach { e =>
      val i = buf.indexOf(e.item)
      if (i >= 0) buf.remove(i)
      buf += e.item // newest at the tail
      if (buf.length > k) buf.remove(0)
    }
    recent.clear()
    recent.appendList(buf.toArray)
    Iterator.single(RecentItemsStream.RecentSnapshot(user,
      buf.reverse.mkString("|")))
  }
}
