package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.CountMin
import graft.streaming.ScoringStream.RawEvent
import graft.streaming.SketchStream

/** The streaming Count-Min day table must be indistinguishable from a
  * batch-built one — per-day counters, and counters after a cross-day
  * merge (the linear-sketch addition law) — fed a disordered tape
  * split across microbatches. Estimates from the merged counters must
  * keep the one-sided-error guarantee against exact per-user counts.
  */
class CmStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long): java.sql.Timestamp =
    new java.sql.Timestamp(s * 1000L)

  private val day = 86400L

  test("streamed day counters equal batch counters per day and after merge") {
    implicit val sqlCtx = spark.sqlContext

    val batch1 = (1L to 40L).map(u => RawEvent(u % 7, "a", "click", ts(100 + u)))
    val batch2 = (1L to 30L).map(u => RawEvent(u % 5, "a", "view", ts(day + 100 + u)))
    val batch3 = Seq(
      RawEvent(11L, "b", "click", ts(500)),        // late day-1 arrival
      RawEvent(11L, "b", "view", ts(day + 500)))
    val all = batch1 ++ batch2 ++ batch3

    val in = MemoryStream[RawEvent]
    val latest = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    val q = SketchStream.dayCountMin(in.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          latest((r.getTimestamp(0).getTime / 1000L, r.getLong(1),
            r.getLong(2))) = r.getLong(3)
        }
      }.start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    // batch reference: same cells over the full tape
    val batchCells = all.toDF()
      .select(expr(s"CAST(ts AS LONG) div $day * $day").as("day_start"),
        col("user"), CountMin.rows.as("i"))
      .select(col("day_start"), col("i"),
        CountMin.cell(col("user"), col("i")).as("cell"))
      .groupBy(col("day_start"), col("i"), col("cell"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(latest.toMap == batchCells,
      s"per-day cells diverge: streamed ${latest.size} batch ${batchCells.size}")

    // cross-day merge = counter addition; estimates keep est >= exact
    val merged = latest.toSeq.map { case ((_, i, cell), c) => (i, cell, c) }
      .groupBy(t => (t._1, t._2)).map { case ((i, cell), xs) =>
        (i, cell) -> xs.map(_._3).sum }
    val exact = all.groupBy(_.user).map { case (u, xs) => u -> xs.size.toLong }
    exact.foreach { case (u, n) =>
      val est = (0L until 4L).map { i =>
        val cell = Seq(u).toDF("k")
          .select(CountMin.cell(col("k"), lit(i)).as("cell"))
          .head().getLong(0)
        merged.getOrElse((i, cell), 0L)
      }.min
      assert(est >= n, s"user $u: merged est $est < exact $n")
    }
  }

  test("day counters run on the RocksDB state store (production provider)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[RawEvent]
      val latest = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
      val q = SketchStream.dayCountMin(in.toDS())
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            latest((r.getTimestamp(0).getTime / 1000L, r.getLong(1),
              r.getLong(2))) = r.getLong(3)
          }
        }.start()
      try {
        in.addData((1L to 20L).map(u => RawEvent(u % 3, "a", "click", ts(100 + u))))
        q.processAllAvailable()
        in.addData((1L to 10L).map(u => RawEvent(u % 3, "a", "view", ts(200 + u))))
        q.processAllAvailable()
      } finally q.stop()
      // 30 events over day 0: every hash row's counters sum to 30
      val perRow = latest.toSeq.groupBy(_._1._2)
        .map { case (i, xs) => i -> xs.map(_._2).sum }
      assert(perRow == (0L until 4L).map(_ -> 30L).toMap, s"rows: $perRow")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
