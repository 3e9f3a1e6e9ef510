package graft

import org.apache.spark.sql.functions._

import graft.multimodal.VideoHeaders
import graft.multimodal.VideoHeaders.Meta

/** Byte-level tests for the ISO-BMFF (MP4) box walk: length-prefixed
  * tree traversal, unknown-box skipping, moov→mvhd / moov→trak→tkhd
  * recursion, 16.16 fixed-point geometry, and the malformed-box abort
  * paths — plus the codegen expression end to end.
  */
class VideoHeadersSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def be32b(v: Long): Seq[Int] =
    Seq(((v >>> 24) & 0xff).toInt, ((v >>> 16) & 0xff).toInt,
      ((v >>> 8) & 0xff).toInt, (v & 0xff).toInt)
  private def cc(s: String): Seq[Int] = s.map(_.toInt)

  private def box(typ: String, payload: Seq[Int]): Seq[Int] =
    be32b(8L + payload.size) ++ cc(typ) ++ payload

  private def ftyp(brand: String = "isom"): Seq[Int] =
    box("ftyp", cc(brand) ++ be32b(0x200))

  private def mvhd(ts: Long, dur: Long, version: Int = 0): Seq[Int] =
    box("mvhd", Seq(version, 0, 0, 0) ++ be32b(0) ++ be32b(0) ++
      be32b(ts) ++ be32b(dur) ++ Seq.fill(80)(0))

  private def tkhd(w: Int, h: Int, frac: Int = 0): Seq[Int] =
    box("tkhd", Seq(0, 0, 0, 7) ++ Seq.fill(72)(0) ++
      be32b((w.toLong << 16) | frac) ++ be32b((h.toLong << 16) | frac))

  private def trak(w: Int, h: Int): Seq[Int] = box("trak", tkhd(w, h))

  private def mp4(tracks: Seq[(Int, Int)], ts: Long = 600, dur: Long = 1200,
      pre: Seq[Int] = Nil, post: Seq[Int] = Nil): Array[Byte] = {
    val moov = box("moov", mvhd(ts, dur) ++ tracks.flatMap(t => trak(t._1, t._2)))
    bytes((ftyp() ++ pre ++ moov ++ post): _*)
  }

  test("single video track: brand, timescale, duration, geometry") {
    assert(VideoHeaders.parse(mp4(Seq((640, 480)))) ==
      Meta("isom", 600, 1200, 1, 640, 480))
    assert(VideoHeaders.parse(mp4(Seq((1920, 1080)), ts = 90000, dur = 4500000)) ==
      Meta("isom", 90000, 4500000, 1, 1920, 1080))
  }

  test("unknown boxes skip by declared size; audio trak is dimensionless") {
    val free = box("free", Seq(1, 2, 3, 4))
    val mdat = box("mdat", Seq.fill(16)(0xAB))
    // free before moov, mdat after; audio trak (0x0) first — geometry
    // must come from the FIRST trak with nonzero width, track count 2
    assert(VideoHeaders.parse(mp4(Seq((0, 0), (320, 240)),
      pre = free, post = mdat)) == Meta("isom", 600, 1200, 2, 320, 240))
  }

  test("16.16 fixed point truncates the fractional half") {
    val b = bytes((ftyp() ++ box("moov",
      mvhd(600, 600) ++ box("trak", tkhd(640, 360, frac = 0x8000)))): _*)
    assert(VideoHeaders.parse(b) == Meta("isom", 600, 600, 1, 640, 360))
  }

  test("malformed structures abort to null, never throw") {
    assert(VideoHeaders.parse(null) == null)
    assert(VideoHeaders.parse(Array.emptyByteArray) == null)
    assert(VideoHeaders.parse("plain text, not a container".getBytes) == null)
    // must OPEN with ftyp
    assert(VideoHeaders.parse(bytes((box("free", Nil) ++ ftyp()): _*)) == null)
    // child box overruns its parent
    val badChild = bytes((ftyp() ++ box("moov", be32b(9999) ++ cc("mvhd"))): _*)
    assert(VideoHeaders.parse(badChild) == null)
    // declared size < 8 (a largesize/0 marker this walk doesn't claim)
    val tiny = bytes((ftyp() ++ be32b(4) ++ cc("moov")): _*)
    assert(VideoHeaders.parse(tiny) == null)
    // 64-bit (version 1) mvhd is out of scope, not misread
    val v1 = bytes((ftyp() ++ box("moov",
      mvhd(600, 600, version = 1) ++ trak(64, 64))): _*)
    assert(VideoHeaders.parse(v1) == null)
    // truncated mid-box
    assert(VideoHeaders.parse(mp4(Seq((640, 480))).take(40)) == null)
    // moov without mvhd → no timescale → null
    val noMvhd = bytes((ftyp() ++ box("moov", trak(64, 64))): _*)
    assert(VideoHeaders.parse(noMvhd) == null)
  }

  test("mp4Meta expression decodes distributively inside codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, mp4(Seq((640, 480)))),
      (2L, mp4(Seq((0, 0), (320, 240)), pre = box("free", Seq(0)).map(identity))),
      (3L, "garbage".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = df.select(col("media_id"),
        VideoHeaders.mp4Meta(col("payload")).as("m"))
      .select(col("media_id"), col("m.brand"), col("m.width"), col("m.n_tracks"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out(1L) == ("isom", 640, 1))
    assert(out(2L) == ("isom", 320, 2))
    assert(out(3L) == null)
    assert(out(4L) == null)
  }
}
