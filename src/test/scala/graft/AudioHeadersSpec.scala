package graft

import org.apache.spark.sql.functions._

import graft.multimodal.AudioHeaders
import graft.multimodal.AudioHeaders.Meta

/** Byte-level tests for the real audio-header decode (RIFF/WAVE chunk
  * scan with little-endian fmt fields, Sun AU big-endian header with
  * encoding→bits map) plus the codegen expression.
  */
class AudioHeadersSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def le16b(v: Int): Seq[Int] = Seq(v & 0xff, (v >>> 8) & 0xff)
  private def le32b(v: Int): Seq[Int] =
    Seq(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)
  private def be32b(v: Int): Seq[Int] =
    Seq((v >>> 24) & 0xff, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)

  private def wav(rate: Int, ch: Int, bits: Int,
      leading: Seq[Int] = Nil, fmtCode: Int = 1): Array[Byte] = {
    val fmtData = le16b(fmtCode) ++ le16b(ch) ++ le32b(rate) ++
      le32b(rate * ch * bits / 8) ++ le16b(ch * bits / 8) ++ le16b(bits)
    val xs = Seq('R'.toInt, 'I', 'F', 'F') ++ le32b(36) ++
      Seq('W'.toInt, 'A', 'V', 'E') ++ leading ++
      Seq('f'.toInt, 'm', 't', ' ') ++ le32b(16) ++ fmtData
    bytes(xs: _*)
  }

  private def au(rate: Int, ch: Int, enc: Int): Array[Byte] =
    bytes((Seq('.'.toInt, 's', 'n', 'd') ++ be32b(24) ++ be32b(-1) ++
      be32b(enc) ++ be32b(rate) ++ be32b(ch)): _*)

  test("wav: fmt chunk fields, little-endian") {
    assert(AudioHeaders.parse(wav(44100, 2, 16)) == Meta("wav", 44100, 2, 16))
    assert(AudioHeaders.parse(wav(8000, 1, 8)) == Meta("wav", 8000, 1, 8))
    // IEEE float (format 3) and WAVE_FORMAT_EXTENSIBLE pass through
    assert(AudioHeaders.parse(wav(96000, 6, 32, fmtCode = 3)) ==
      Meta("wav", 96000, 6, 32))
    assert(AudioHeaders.parse(wav(48000, 2, 24, fmtCode = 0xfffe)) ==
      Meta("wav", 48000, 2, 24))
    // ADPCM and friends are not a layout this stage claims to know
    assert(AudioHeaders.parse(wav(8000, 1, 4, fmtCode = 2)) == null)
    assert(AudioHeaders.parse(wav(8000, 0, 8)) == null) // zero channels
  }

  test("wav: chunk scan skips unknown chunks and pads odd sizes") {
    // LIST chunk (even size) before fmt
    val list = Seq('L'.toInt, 'I', 'S', 'T') ++ le32b(4) ++ Seq(1, 2, 3, 4)
    assert(AudioHeaders.parse(wav(22050, 1, 16, leading = list)) ==
      Meta("wav", 22050, 1, 16))
    // JUNK chunk with ODD size: next chunk starts after a pad byte
    val junk = Seq('J'.toInt, 'U', 'N', 'K') ++ le32b(3) ++ Seq(9, 9, 9, 0)
    assert(AudioHeaders.parse(wav(32000, 4, 24, leading = junk)) ==
      Meta("wav", 32000, 4, 24))
    // no fmt chunk at all
    val noFmt = bytes((Seq('R'.toInt, 'I', 'F', 'F') ++ le32b(36) ++
      Seq('W'.toInt, 'A', 'V', 'E') ++
      Seq('d'.toInt, 'a', 't', 'a') ++ le32b(4) ++ Seq(0, 0, 0, 0)): _*)
    assert(AudioHeaders.parse(noFmt) == null)
    // fmt chunk whose declared size runs past the payload
    val truncated = wav(44100, 2, 16).dropRight(10)
    assert(AudioHeaders.parse(truncated) == null)
  }

  test("au: big-endian header and encoding→bits map") {
    assert(AudioHeaders.parse(au(8000, 1, 1)) == Meta("au", 8000, 1, 8)) // μ-law
    assert(AudioHeaders.parse(au(44100, 2, 3)) == Meta("au", 44100, 2, 16))
    assert(AudioHeaders.parse(au(48000, 6, 5)) == Meta("au", 48000, 6, 32))
    assert(AudioHeaders.parse(au(8000, 1, 27)) == null) // unknown encoding
    assert(AudioHeaders.parse(au(0, 1, 2)) == null)     // zero rate
    assert(AudioHeaders.parse(au(8000, 0, 2)) == null)  // zero channels
    // data offset below the 24-byte header is structurally invalid
    val short = au(8000, 1, 2); short(7) = 8
    assert(AudioHeaders.parse(short) == null)
  }

  test("flac: bit-packed STREAMINFO word under shifts/masks; gates and truncation") {
    def flac(rate: Int, ch: Int, bps: Int, blockType: Int = 0): Array[Byte] = {
      val word = (rate.toLong << 12) | ((ch - 1) << 9) | ((bps - 1) << 4)
      bytes(Seq[Int]('f'.toInt, 'L'.toInt, 'a'.toInt, 'C'.toInt,
        blockType, 0x00, 0x00, 0x22,
        0x10, 0x00, 0x10, 0x00, 0, 0, 0, 0, 0, 0,
        ((word >>> 24) & 0xff).toInt, ((word >>> 16) & 0xff).toInt,
        ((word >>> 8) & 0xff).toInt, (word & 0xff).toInt,
        0, 0, 0, 0): _*)
    }
    assert(AudioHeaders.parse(flac(44100, 2, 16)) == Meta("flac", 44100, 2, 16))
    // extremes of every packed field
    assert(AudioHeaders.parse(flac(655350, 8, 32)) == Meta("flac", 655350, 8, 32))
    assert(AudioHeaders.parse(flac(1, 1, 4)) == Meta("flac", 1, 1, 4))
    // first block not STREAMINFO → null; rate 0 (non-audio) → null
    assert(AudioHeaders.parse(flac(44100, 2, 16, blockType = 4)) == null)
    assert(AudioHeaders.parse(flac(0, 2, 16)) == null)
    // truncated before the packed word → null, never a throw
    assert(AudioHeaders.parse(flac(44100, 2, 16).take(20)) == null)
  }

  test("garbage payloads yield null, never throw") {
    assert(AudioHeaders.parse(null) == null)
    assert(AudioHeaders.parse(Array.emptyByteArray) == null)
    assert(AudioHeaders.parse(bytes(0x52, 0x49)) == null) // truncated RIFF
    assert(AudioHeaders.parse("not audio at all, just text".getBytes) == null)
    // RIFF but not WAVE (e.g. an AVI) is not claimed
    val avi = bytes((Seq('R'.toInt, 'I', 'F', 'F') ++ le32b(100) ++
      Seq('A'.toInt, 'V', 'I', ' ') ++ Seq.fill(20)(0)): _*)
    assert(AudioHeaders.parse(avi) == null)
  }

  test("audioMeta expression decodes distributively inside codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, wav(44100, 2, 16)),
      (2L, au(8000, 1, 1)),
      (3L, "garbage".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = df.select(col("media_id"),
        AudioHeaders.audioMeta(col("payload")).as("m"))
      .select(col("media_id"), col("m.fmt"), col("m.sample_rate"),
        col("m.channels"), col("m.bits_per_sample"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out(1L) == "wav")
    assert(out(2L) == "au")
    assert(out(3L) == null)
    assert(out(4L) == null)
  }
}
