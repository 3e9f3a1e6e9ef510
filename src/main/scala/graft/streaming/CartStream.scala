package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.streaming.ScoringStream.RawEvent

/** Per-user CART state — live per-item counters under `MapState`, the
  * one `transformWithState` state type the streaming layer did not yet
  * exercise (ValueState: ScoringProcessor/CarryForward; ListState+TTL:
  * RecentItems; timers: SessionStream). The reference's consumer keeps
  * exactly this per-user item tally in a Python dict rebuilt from the
  * snapshot on every poll (run_consumer.py:126-154); here it is keyed
  * RocksDB state with point lookups.
  *
  * MapState is the COMPOSITE-KEY surface: the store key is
  * (grouping key, user key) = (user, item), so `getValue`/
  * `updateValue`/`removeKey` are per-item point operations — no
  * read-modify-write of a whole collection as ListState forces — and a
  * NON-NONE [[TTLConfig]] applies PER ENTRY: each (user, item)
  * counter expires on its own last-update clock, so one stale item
  * ages out of a cart whose other entries a fresher batch refreshed
  * (per-entry granularity is the semantic difference vs a
  * whole-value TTL; CartStreamSpec pins it).
  *
  * Semantics per micro-batch, per user: events apply in (ts, action,
  * item) order; "view" increments the item's counter (creating it at
  * 1), "purchase" removes the item (the cart emptied of it), other
  * actions ignored; one snapshot row per touched user per batch —
  * items sorted, "item:count" joined with '|' ("" for an empty cart).
  *
  * Scale: one user shuffle; state is one RocksDB entry per LIVE
  * (user, item) — point-addressed, never scanned corpus-wide; the TTL
  * bounds abandoned entries with no timer bookkeeping.
  */
object CartStream {

  case class CartSnapshot(user: Long, items: String)

  def cartCounts(events: Dataset[RawEvent], ttl: Duration)
      : Dataset[CartSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    // TTL state requires TimeMode.ProcessingTime (the TTL clock)
    events.groupByKey(_.user)
      .transformWithState(new CartProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}

/** MapState + per-entry-TTL processor behind [[CartStream.cartCounts]]. */
class CartProcessor(ttl: Duration)
    extends StatefulProcessor[Long, RawEvent, CartStream.CartSnapshot] {

  @transient private var cart: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cart = getHandle.getMapState[String, Long](
      "cart", Encoders.STRING, Encoders.scalaLong, TTLConfig(ttl))

  override def handleInputRows(user: Long, rows: Iterator[RawEvent],
      timerValues: TimerValues)
      : Iterator[CartStream.CartSnapshot] = {
    // intra-batch order pinned by (ts, action, item) — disordered
    // arrival within a batch cannot change the fold (the tape-parity
    // discipline every stateful operator here follows)
    rows.toSeq.sortBy(e => (e.ts.getTime, e.action, e.item)).foreach { e =>
      e.action match {
        case "view" =>
          val n = if (cart.containsKey(e.item)) cart.getValue(e.item) else 0L
          cart.updateValue(e.item, n + 1L) // refreshes THIS entry's TTL
        case "purchase" => cart.removeKey(e.item)
        case _ => ()
      }
    }
    // expired entries are already filtered by the store's TTL on read
    val entries = cart.iterator().toSeq.sortBy(_._1)
    Iterator.single(CartStream.CartSnapshot(user,
      entries.map { case (k, v) => s"$k:$v" }.mkString("|")))
  }
}
