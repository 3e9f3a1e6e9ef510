package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.ScoringStream
import graft.streaming.ScoringStream.RawEvent

/** Event-time streaming parity against an NTZ-SOURCED batch replay.
  *
  * The r6 fixture regeneration switched events.parquet to
  * TIMESTAMP_MICROS(isAdjustedToUTC=0) and every StreamingSpec test kept
  * passing — because MemoryStream inputs there are constructed as
  * java.sql.Timestamp (LTZ) and never touch the parquet reader. This spec
  * closes that blind spot: rows are READ from the committed NTZ fixture
  * through the production `Tables.events` normalization, replayed through
  * the watermarked 1-minute-window operator (ST9/W4), and the emitted
  * window counts are asserted equal to the batch groupBy over the very
  * same normalized frame. If a future fixture encoding flows NTZ (or raw
  * longs) past the normalizer, the replay's `as[RawEvent]` encoder or the
  * window arithmetic diverges here first.
  */
class NtzReplaySpec extends SparkSpec {

  private val ntzDir = "src/test/resources/tsfixtures/ts_ntz"

  test("NTZ-sourced events replay through eventsPerMinute matches batch windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // production read path: NTZ micros -> TimestampType micros (UTC session)
    val batch = Tables.events(spark, ntzDir)
      .selectExpr("event_id AS user", "'c' AS item", "'click' AS action", "ts")
      .as[RawEvent]
    val rows = batch.collect().toSeq
    assert(rows.nonEmpty && rows.forall(_.ts != null))

    val input = MemoryStream[RawEvent]
    val q = ScoringStream.eventsPerMinute(spark, input.toDS())
      .writeStream.format("memory").queryName("ntz_rates")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // watermark driver: a far-future event closes every fixture window
      val flush = new Timestamp(rows.map(_.ts.getTime).max + 3600L * 1000L)
      input.addData(RawEvent(99L, "c", "click", flush))
      q.processAllAvailable()
      input.addData(RawEvent(99L, "c", "click",
        new Timestamp(flush.getTime + 3600L * 1000L)))
      q.processAllAvailable()

      val streamed = spark.table("ntz_rates").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      val batchWindows = Tables.events(spark, ntzDir)
        .selectExpr("date_trunc('minute', ts) AS minute")
        .groupBy("minute").count()
        .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      for ((minute, n) <- batchWindows)
        assert(streamed.get(minute).contains(n),
          s"window $minute: streamed ${streamed.get(minute)} vs batch $n " +
            s"(all streamed: $streamed)")
    } finally q.stop()
  }
}
