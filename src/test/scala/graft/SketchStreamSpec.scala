package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.ScoringStream.RawEvent
import graft.streaming.SketchStream

/** The streaming day-sketch table must be indistinguishable from a
  * batch-built one: same per-day estimates, same union estimates —
  * fed a disordered tape split across microbatches (HLL union
  * losslessness is what makes incremental maintenance sound at all).
  */
class SketchStreamSpec extends SparkSpec {

  private def ts(s: Long): java.sql.Timestamp =
    new java.sql.Timestamp(s * 1000L)

  private val day = 86400L

  test("streamed day sketches equal batch sketches per day and after union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two days of events, users overlapping across days, delivered in
    // three disordered microbatches (day-2 rows arrive before late
    // day-1 rows — inside the 1-day watermark, so they must still fold)
    val batch1 = Seq(
      RawEvent(1L, "a", "click", ts(100)),
      RawEvent(2L, "a", "view", ts(200)),
      RawEvent(1L, "b", "click", ts(300)))
    val batch2 = Seq(
      RawEvent(3L, "a", "click", ts(day + 100)),
      RawEvent(1L, "a", "view", ts(day + 200))) // user 1 active both days
    val batch3 = Seq(
      RawEvent(4L, "b", "click", ts(400)),      // late day-1 arrival
      RawEvent(2L, "b", "view", ts(day + 300)))
    val all = batch1 ++ batch2 ++ batch3

    val in = MemoryStream[RawEvent]
    // update mode: keep the LATEST emitted sketch per day
    val latest = scala.collection.mutable.Map.empty[Long, Array[Byte]]
    val q = SketchStream.daySketches(in.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          latest(r.getTimestamp(0).getTime / 1000L) = r.getAs[Array[Byte]](1)
        }
      }.start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    assert(latest.keySet == Set(0L, day), s"days: ${latest.keySet}")

    val streamed = latest.toSeq.toDF("day_start", "sk")
    val streamedPerDay = streamed
      .select(col("day_start"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch reference over the full tape
    val tape = all.toDF()
      .select(expr(s"CAST(ts AS LONG) div $day").as("d"), col("user"))
    val batchPerDay = tape.groupBy(col("d"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"))).as("est"))
      .collect().map(r => r.getLong(0) * day -> r.getLong(1)).toMap
    assert(streamedPerDay == batchPerDay,
      s"per-day: streamed $streamedPerDay batch $batchPerDay")

    // exactness sanity on this small tape: day 1 has users {1,2,4},
    // day 2 has {1,2,3}
    assert(streamedPerDay(0L) == 3L && streamedPerDay(day) == 3L)

    // union of the streamed day sketches == one batch sketch of the
    // whole tape (users {1,2,3,4})
    val streamedUnion = streamed
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val batchDirect = all.toDF()
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"))).as("est"))
      .head().getLong(0)
    assert(streamedUnion == batchDirect && streamedUnion == 4L,
      s"union: streamed $streamedUnion direct $batchDirect")
  }

  test("day sketches run on the RocksDB state store (production provider)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[RawEvent]
      val latest = scala.collection.mutable.Map.empty[Long, Array[Byte]]
      val q = SketchStream.daySketches(in.toDS())
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            latest(r.getTimestamp(0).getTime / 1000L) = r.getAs[Array[Byte]](1)
          }
        }.start()
      try {
        in.addData(RawEvent(1L, "a", "click", ts(100)),
          RawEvent(2L, "a", "view", ts(200)))
        q.processAllAvailable()
        in.addData(RawEvent(3L, "a", "click", ts(300)),
          RawEvent(1L, "a", "view", ts(400))) // dup user folds into state
        q.processAllAvailable()
      } finally q.stop()
      // the HLL buffer round-tripped through RocksDB across batches:
      // estimate over day 0 must see users {1,2,3} exactly
      val est = latest.toSeq.toDF("day", "sk")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
      assert(est == 3L, s"got $est")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("theta segment sketches stream as state and intersect downstream") {
    import graft.functions.ThetaSketch
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // same user in both segments on day 1 → intersection must see it
    val batch1 = Seq(
      RawEvent(1L, "a", "click", ts(100)),
      RawEvent(2L, "a", "click", ts(200)),
      RawEvent(1L, "a", "view", ts(300)))
    val batch2 = Seq(
      RawEvent(3L, "a", "view", ts(400)),
      RawEvent(2L, "a", "click", ts(500))) // dup (segment, user) pair

    val in = MemoryStream[RawEvent]
    val latest = scala.collection.mutable.Map.empty[(String, Long), Array[Byte]]
    val q = SketchStream.segmentDaySketches(in.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          latest((r.getString(0), r.getTimestamp(1).getTime / 1000L)) =
            r.getAs[Array[Byte]](2)
        }
      }.start()
    try {
      Seq(batch1, batch2).foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()

    assert(latest.keySet == Set(("click", 0L), ("view", 0L)))
    val df = latest.toSeq.map { case ((seg, d), sk) => (seg, d, sk) }
      .toDF("seg", "day", "sk")
    val ests = df.select(col("seg"), ThetaSketch.estimate(col("sk")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ests == Map("click" -> 2.0, "view" -> 2.0), s"got $ests")
    // overlap: click users {1,2} ∩ view users {1,3} = {1} — the
    // set operation the HLL day-sketch table cannot answer
    val inter = df.filter(col("seg") === "click").select(col("sk").as("a"))
      .crossJoin(df.filter(col("seg") === "view").select(col("sk").as("b")))
      .select(ThetaSketch.intersectEstimate(col("a"), col("b")).as("i"))
      .head().getDouble(0)
    assert(inter == 1.0, s"intersection $inter")
  }
}
