package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.streaming.CartStream
import graft.streaming.ScoringStream.RawEvent

/** MapState + per-entry-TTL cart operator. Like RecentItemsSpec: a TWS
  * operator in TimeMode.ProcessingTime never settles under
  * `processAllAvailable` (its TTL clock advances batch-by-batch), so
  * every test paces the query with a real ProcessingTime trigger and
  * polls the sink. The restart test therefore uses a foreachBatch
  * set-sink (the memory sink cannot recover from a checkpoint) and
  * awaits the final deterministic snapshot rather than counting
  * batches.
  */
class CartStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def withRocksDb[A](body: => A): A = {
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** foreachBatch sink collecting (user, items) rows into a set; the
    * set absorbs replayed batches idempotently (at-least-once half of
    * the contract), and polling for a snapshot string is the await.
    */
  private final class SetSink {
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    def await(want: (Long, String), timeoutMs: Long = 30000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!got.contains(want)) {
        assert(System.currentTimeMillis() < deadline,
          s"timed out waiting for $want in ${scala.jdk.CollectionConverters
            .SetHasAsScala(got).asScala.toSeq.sortBy(_._2)}")
        Thread.sleep(100)
      }
    }
  }

  private def start(input: MemoryStream[RawEvent], ttl: Duration,
      sink: SetSink, ckpt: String): StreamingQuery =
    CartStream.cartCounts(input.toDS(), ttl)
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[CartStream.CartSnapshot], _: Long) =>
          b.collect().foreach(s => sink.got.add((s.user, s.items))); ()
      }
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

  private def ckptDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("MapState point ops fold a disordered tape in (ts, action, item) order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[RawEvent]
      val sink = new SetSink
      val q = start(input, Duration.ofHours(1), sink, ckptDir("cart_dis"))
      try {
        // arrival order deliberately scrambles event time: an
        // arrival-order fold would leave x:2|y:1; the pinned
        // (ts, action, item) order ends with purchase(x) → y:1 only
        input.addData(
          RawEvent(5L, "x", "view", ts(3)),
          RawEvent(5L, "x", "purchase", ts(5)),
          RawEvent(5L, "x", "view", ts(1)),
          RawEvent(5L, "y", "view", ts(2)),
          RawEvent(5L, "x", "view", ts(4)))
        sink.await((5L, "y:1"))
        // re-view after the purchase: counter restarts at 1
        input.addData(RawEvent(5L, "x", "view", ts(6)))
        sink.await((5L, "x:1|y:1"))
      } finally q.stop()
    }
  }

  test("per-ENTRY TTL: a refreshed item survives while its sibling lapses") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[RawEvent]
      val sink = new SetSink
      // Expiry must be per (user, item) ENTRY, not per user key (a
      // whole-value TTL would drop both items or neither). The schedule
      // anchors on MEASURED boundaries, not fixed sleeps racing the TTL
      // (ADVICE r11: 2-4 s slack lost to one GC pause): `old`'s TTL
      // clock starts no later than tIns (await return ⇒ already
      // processed) and no earlier than its addData call, so
      //   - refresh at tIns+6s commits ≥9s before old can expire (T=16)
      //   - probing after tIns+T+1.5s guarantees old is PAST expiry
      //   - keep's clock restarts no earlier than tRefAdd, so the probe
      //     has until tRefAdd+T ≈ tIns+22s to process — ~4.5s of slack
      //     for a loaded CI batch, vs the old schedule's 2s
      val T = Duration.ofSeconds(16)
      val q = start(input, T, sink, ckptDir("cart_ttl"))
      try {
        val tAdd = System.currentTimeMillis() // old's TTL start >= tAdd
        input.addData(RawEvent(7L, "old", "view", ts(1)),
          RawEvent(7L, "keep", "view", ts(2)))
        sink.await((7L, "keep:1|old:1"))
        val tIns = System.currentTimeMillis() // old's TTL start <= tIns
        // old's TTL clock actually starts at batch-1 PLAN time, i.e.
        // somewhere in [tAdd, tIns] — the refresh margin below reasons
        // from tIns but expiry can come as early as tAdd+T. If the
        // first batch itself ate most of that slack (cold RocksDB on a
        // stalled machine), the schedule is inconclusive, not wrong:
        // cancel instead of racing (round-12 self-review catch).
        assume(tIns - tAdd < 6000,
          s"first batch took ${tIns - tAdd}ms — TTL schedule inconclusive")
        Thread.sleep(6000)
        val tRefAdd = System.currentTimeMillis() // keep's restart >= this
        input.addData(RawEvent(7L, "keep", "view", ts(10)))
        sink.await((7L, "keep:2|old:1")) // old alive at +6s, keep refreshed
        // wait out old's TTL against the measured anchor, then probe
        val wait = (tIns + T.toMillis + 1500) - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        // assume, not assert: like the first-batch guard above, a lost
        // keep-alive margin means the MACHINE stalled mid-schedule —
        // the test is inconclusive, not wrong, so cancel instead of
        // reporting a spurious red (ADVICE r12)
        assume(System.currentTimeMillis() < tRefAdd + T.toMillis - 3000,
          "schedule lost its keep-alive margin before the probe was sent " +
            "(machine stall?) — widen T")
        input.addData(RawEvent(7L, "probe", "view", ts(20)))
        sink.await((7L, "keep:2|probe:1")) // old aged out alone
      } finally q.stop()
    }
  }

  test("mid-tape kill+restart reaches the same final cart as a straight run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val b1 = Seq(RawEvent(9L, "a", "view", ts(1)),
        RawEvent(9L, "b", "view", ts(2)), RawEvent(9L, "a", "view", ts(3)))
      val b2 = Seq(RawEvent(9L, "b", "purchase", ts(4)),
        RawEvent(9L, "c", "view", ts(5)))
      val b3 = Seq(RawEvent(9L, "a", "view", ts(6))) // in flight at kill
      val b4 = Seq(RawEvent(9L, "d", "view", ts(7)))
      val finalSnap = (9L, "a:3|c:1|d:1")

      // interrupted run: b3 added but never awaited before stop; the
      // restarted query re-plans it from the checkpointed offsets
      val inR = MemoryStream[RawEvent]
      val sinkR = new SetSink
      val ckpt = ckptDir("cart_restart")
      val q1 = start(inR, Duration.ofHours(1), sinkR, ckpt)
      try {
        inR.addData(b1); sinkR.await((9L, "a:2|b:1"))
        inR.addData(b2); sinkR.await((9L, "a:2|c:1"))
        inR.addData(b3)
      } finally q1.stop()
      val q2 = start(inR, Duration.ofHours(1), sinkR, ckpt)
      try {
        inR.addData(b4)
        sinkR.await(finalSnap)
      } finally q2.stop()

      // straight run, same tape fully awaited
      val inS = MemoryStream[RawEvent]
      val sinkS = new SetSink
      val qS = start(inS, Duration.ofHours(1), sinkS, ckptDir("cart_straight"))
      try {
        inS.addData(b1); sinkS.await((9L, "a:2|b:1"))
        inS.addData(b2); sinkS.await((9L, "a:2|c:1"))
        inS.addData(b3); sinkS.await((9L, "a:3|c:1"))
        inS.addData(b4); sinkS.await(finalSnap)
      } finally qS.stop()

      import scala.jdk.CollectionConverters._
      val rSet = sinkR.got.asScala.toSet
      val sSet = sinkS.got.asScala.toSet
      // the interrupted run may merge b3+b4 into one re-planned batch
      // (its intermediate snapshot set is a subset); both runs MUST
      // agree on the final state and never emit a snapshot the
      // sequential fold cannot produce
      assert(rSet.contains(finalSnap) && sSet.contains(finalSnap))
      assert(rSet.subsetOf(sSet),
        s"restart emitted rows a straight run cannot: ${rSet.diff(sSet)}")
    }
  }
}
