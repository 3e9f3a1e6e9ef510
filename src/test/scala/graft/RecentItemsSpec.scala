package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.RecentItemsStream
import graft.streaming.ScoringStream.RawEvent

/** ListState + state-TTL recent-items operator. A TWS operator in
  * TimeMode.ProcessingTime always requests another batch (its TTL
  * clock only advances batch-by-batch), so `processAllAvailable` never
  * settles and even Trigger.AvailableNow keeps constructing batches —
  * the spec paces the query with a real ProcessingTime trigger and
  * polls the sink, which is exactly how such a query runs in
  * production.
  */
class RecentItemsSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def snaps(name: String): Seq[(Long, String)] =
    spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def awaitSnap(name: String, want: (Long, String),
      timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!snaps(name).contains(want)) {
      assert(System.currentTimeMillis() < deadline,
        s"timed out waiting for $want in ${snaps(name)}")
      Thread.sleep(100)
    }
  }

  private def start(input: MemoryStream[RawEvent], k: Int, ttl: Duration,
      name: String): StreamingQuery =
    RecentItemsStream.recentItems(input.toDS(), k, ttl)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

  test("recency list is bounded at k, distinct, most-recent-first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    val input = MemoryStream[RawEvent]
    val q = start(input, k = 3, ttl = Duration.ofHours(1), "recent")
    try {
      input.addData(RawEvent(1L, "a", "view", ts(1)),
        RawEvent(1L, "b", "view", ts(2)),
        RawEvent(1L, "c", "view", ts(3)),
        RawEvent(1L, "d", "view", ts(4)))
      awaitSnap("recent", (1L, "d|c|b"))
      // b re-seen: moves to front, no duplicate, k bound holds
      input.addData(RawEvent(1L, "b", "view", ts(5)))
      awaitSnap("recent", (1L, "b|d|c"))
    } finally q.stop()
  }

  test("state TTL ages out idle items without operator code or timers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.ScoringProcessor.configureRocksDb(spark)
    val input = MemoryStream[RawEvent]
    val q = start(input, k = 5, ttl = Duration.ofSeconds(2), "recent_ttl")
    try {
      input.addData(RawEvent(7L, "old1", "view", ts(1)),
        RawEvent(7L, "old2", "view", ts(2)))
      awaitSnap("recent_ttl", (7L, "old2|old1"))
      Thread.sleep(3000) // strictly past the 2s TTL
      input.addData(RawEvent(7L, "fresh", "view", ts(10)))
      // the store filtered the expired values on read — no operator
      // code, no timers: the fresh event sees an empty list
      awaitSnap("recent_ttl", (7L, "fresh"))
    } finally q.stop()
  }
}
