package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.MinHashBands
import graft.streaming.NearDupStream

/** Streaming MinHash-LSH near-dup detection: candidate parity against
  * the batch band computation on the same docs, owner semantics across
  * microbatches, and event-time state expiry.
  */
class NearDupStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // near-identical pair (a/b: one word differs) + an unrelated doc
  private val textA = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town tonight"
  private val textB = "the quick brown fox jumps over the lazy cat while rain falls on the quiet town tonight"
  private val textC = "completely different subject matter discussing spark shuffles partitions and aggregate pushdown at scale"

  /** Expected candidates replayed from the BATCH band computation: for
    * every band key with 2+ docs, the earliest (ts, doc_id) owns the
    * bucket and every other doc pairs with it.
    */
  private def batchExpected(rows: Seq[(Long, String, Timestamp)]): Set[(Long, Long, Int)] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "ts")
    val bands = MinHashBands.bandRows(df, "doc_id", "text", "ts", 4)
      .selectExpr("band_key", "band", "doc_id", "CAST(ts AS LONG) AS t")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    bands.groupBy(_._1).values.flatMap { hits =>
      val sorted = hits.sortBy(h => (h._4, h._3))
      val owner = sorted.head._3
      sorted.tail.filter(_._3 != owner).map(h => (h._3, owner, h._2))
    }.toSet
  }

  test("band keys are deterministic and collide for near-identical docs only") {
    import spark.implicits._
    val df = Seq((1L, textA, ts(10)), (2L, textB, ts(20)), (3L, textC, ts(30)))
      .toDF("doc_id", "text", "ts")
    val bands = MinHashBands.bandRows(df, "doc_id", "text", "ts", 4)
      .selectExpr("band_key", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byKey = bands.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val abShared = byKey.values.count(s => s == Set(1L, 2L))
    assert(abShared >= 1, s"near-identical docs share no band: $byKey")
    assert(!byKey.values.exists(s => s.contains(3L) && s.size > 1),
      s"unrelated doc collided: $byKey")
    // 4 band rows per doc, always
    assert(bands.length == 12)
  }

  test("streaming candidates match the batch band replay across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Seq((1L, textA, ts(10)), (3L, textC, ts(15)), (2L, textB, ts(20)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = NearDupStream.candidates(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts",
      watermark = "10 seconds", retentionMs = 3600 * 1000L, parallelism = 4)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, textA, ts(10)), (3L, textC, ts(15)))
      q.processAllAvailable()
      input.addData((2L, textB, ts(20)))
      q.processAllAvailable()
      val got = spark.table("neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batchExpected(docs), s"got $got expected ${batchExpected(docs)}")
      // the near-identical pair was detected, with the earlier doc as owner
      assert(got.map(c => (c._1, c._2)).contains((2L, 1L)))
    } finally q.stop()
  }

  test("bucket state expires at the event-time horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, Timestamp)]
    val out = NearDupStream.candidates(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts",
      watermark = "5 seconds", retentionMs = 60 * 1000L, parallelism = 4)
    val q = out.writeStream.format("memory").queryName("neardup_exp")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, textA, ts(10)))
      q.processAllAvailable()
      // push the watermark far past doc 1's 60 s retention horizon
      input.addData((9L, textC, ts(10000)))
      q.processAllAvailable()
      input.addData((9L, textC, ts(10001))) // extra batch so the watermark advances
      q.processAllAvailable()
      // doc 2 (near-dup of 1) arrives after expiry: no candidate emitted
      input.addData((2L, textB, ts(10050)))
      q.processAllAvailable()
      val got = spark.table("neardup_exp").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.contains((2L, 1L)), s"expired bucket still paired: $got")
    } finally q.stop()
  }
}
