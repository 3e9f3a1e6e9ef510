package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.MediaMetaStream

final case class MediaRow(media_id: Long, ts: Timestamp, payload: Array[Byte])

/** Streaming media-header decode: parse-on-arrival + dead-letter
  * routing (the q119/q123 decode as a continuous stage).
  */
class MediaMetaStreamSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // 1x1 RGBA PNG signature+IHDR (same fixture as ImageHeadersSpec)
  private val png = bytes(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
    0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
    0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89)

  // 8 kHz mono μ-law AU header (same fixture as ExtensionsSpec)
  private val au = bytes(
    '.', 's', 'n', 'd', 0, 0, 0, 24, 0xff, 0xff, 0xff, 0xff,
    0, 0, 0, 1, 0, 0, 0x1f, 0x40, 0, 0, 0, 1)

  test("decodes on arrival and dead-letters garbage (streaming dual sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    val input = MemoryStream[MediaRow]
    input.addData(
      MediaRow(1L, Timestamp.valueOf("2024-01-01 00:00:01"), png),
      MediaRow(2L, Timestamp.valueOf("2024-01-01 00:00:02"), au),
      MediaRow(3L, Timestamp.valueOf("2024-01-01 00:00:03"),
        "not a media file".getBytes),
      MediaRow(4L, Timestamp.valueOf("2024-01-01 00:00:04"), null))
    val q = MediaMetaStream.route(input.toDF(), s"$dir/meta", s"$dir/dead")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val meta = spark.read.parquet(s"$dir/meta")
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kind"), r.getAs[String]("fmt"),
          r.getAs[Int]("dim1"), r.getAs[Int]("dim2"),
          r.getAs[Int]("channels")))).toMap
    assert(meta == Map(
      1L -> (("image", "png", 1, 1, 4)),
      2L -> (("audio", "au", 8000, 8, 1))))

    val dead = spark.read.parquet(s"$dir/dead")
      .select(col("media_id")).as[Long].collect().sorted
    assert(dead.toSeq == Seq(3L, 4L))
  }

  test("decode is the same projection on a batch frame (replay parity)") {
    import spark.implicits._
    val batch = Seq(
      MediaRow(10L, Timestamp.valueOf("2024-01-01 00:00:01"), png),
      MediaRow(11L, Timestamp.valueOf("2024-01-01 00:00:02"), au))
      .toDF()
    val out = MediaMetaStream.decode(batch)
      .select(col("media_id"), col("kind"), col("fmt")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((10L, "image", "png"), (11L, "audio", "au")))
  }
}
