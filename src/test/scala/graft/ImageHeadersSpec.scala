package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{BinaryPipeline, ImageHeaders}
import graft.multimodal.ImageHeaders.Meta

/** Byte-level tests for the real image-header decode (PNG IHDR, JPEG
  * marker scan, GIF little-endian screen descriptor, BMP info header)
  * plus the codegen expression and the MediaDecoder wiring.
  */
class ImageHeadersSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // canonical header of a real 1x1 RGBA PNG (sig + IHDR incl. CRC)
  private val png1x1 = bytes(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
    0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
    0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89)

  private def png(w: Int, h: Int, colorType: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      8, colorType)

  test("png: real 1x1 RGBA header and channel map") {
    assert(ImageHeaders.parse(png1x1) == Meta("png", 1, 1, 4))
    assert(ImageHeaders.parse(png(640, 480, 2)) == Meta("png", 640, 480, 3))
    assert(ImageHeaders.parse(png(70000, 3, 0)) == Meta("png", 70000, 3, 1))
    assert(ImageHeaders.parse(png(9, 9, 3)) == Meta("png", 9, 9, 1)) // palette
    assert(ImageHeaders.parse(png(9, 9, 4)) == Meta("png", 9, 9, 2)) // grey+alpha
    assert(ImageHeaders.parse(png(9, 9, 5)) == null) // invalid color type
    assert(ImageHeaders.parse(png(0, 9, 2)) == null) // zero dimension
    // wrong chunk tag after the signature
    val bad = png(9, 9, 2); bad(12) = 'X'.toByte
    assert(ImageHeaders.parse(bad) == null)
  }

  test("jpeg: marker scan skips APP/COM/DHT segments to the first SOFn") {
    // SOI | APP0 jfif (16B) | COM (5B) | SOF2 progressive 257x300, 1 comp
    val j = bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xfe, 0x00, 0x05, 'n', 'o', 't',
      0xff, 0xc2, 0x00, 0x0b, 8, 0x01, 0x2c, 0x01, 0x01, 0x01)
    assert(ImageHeaders.parse(j) == Meta("jpeg", 257, 300, 1))
    // DHT (C4) is NOT a SOF: must be skipped, then SOF0 3-component read
    val withDht = bytes(0xff, 0xd8,
      0xff, 0xc4, 0x00, 0x04, 0, 0,
      0xff, 0xc0, 0x00, 0x11, 8, 0x00, 0x10, 0x00, 0x20, 3)
    assert(ImageHeaders.parse(withDht) == Meta("jpeg", 32, 16, 3))
    // fill bytes before a marker (FF FF FF C0) are legal padding
    val filled = bytes(0xff, 0xd8,
      0xff, 0xff, 0xff, 0xc0, 0x00, 0x11, 8, 0x00, 0x08, 0x00, 0x09, 3)
    assert(ImageHeaders.parse(filled) == Meta("jpeg", 9, 8, 3))
    // SOS before any SOF: geometry unavailable
    val scanFirst = bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02, 0x01, 0x02)
    assert(ImageHeaders.parse(scanFirst) == null)
    // truncated mid-segment
    assert(ImageHeaders.parse(bytes(0xff, 0xd8, 0xff, 0xe0, 0x00)) == null)
  }

  test("gif and bmp: little-endian geometry") {
    val gif = bytes('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, 0xf0, 0x00, 0xf7, 0, 0) // 320 x 240
    assert(ImageHeaders.parse(gif) == Meta("gif", 320, 240, 3))
    val gif87 = bytes('G', 'I', 'F', '8', '7', 'a', 2, 0, 3, 0, 0, 0, 0)
    assert(ImageHeaders.parse(gif87) == Meta("gif", 2, 3, 3))
    assert(ImageHeaders.parse(
      bytes('G', 'I', 'F', '8', '8', 'a', 2, 0, 3, 0, 0, 0, 0)) == null)

    def bmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
      val b = new Array[Byte](54)
      b(0) = 'B'; b(1) = 'M'
      b(14) = 40 // BITMAPINFOHEADER size
      def le32(i: Int, v: Int): Unit = (0 until 4).foreach(k => b(i + k) = ((v >>> (8 * k)) & 0xff).toByte)
      le32(18, w); le32(22, h)
      b(28) = (bpp & 0xff).toByte; b(29) = ((bpp >>> 8) & 0xff).toByte
      b
    }
    assert(ImageHeaders.parse(bmp(800, 600, 24)) == Meta("bmp", 800, 600, 3))
    assert(ImageHeaders.parse(bmp(31, -17, 32)) == Meta("bmp", 31, 17, 4)) // top-down
    assert(ImageHeaders.parse(bmp(8, 8, 8)) == Meta("bmp", 8, 8, 1))
    assert(ImageHeaders.parse(bmp(8, 8, 16)) == null) // 5-6-5 unsupported
  }

  test("webp: all three frame kinds (lossy sync code, lossless packed word, extended canvas)") {
    def riff(fourcc: String, tail: Int*): Array[Byte] =
      ("RIFF".getBytes ++ bytes(0x24, 0, 0, 0) ++ "WEBP".getBytes ++
        fourcc.getBytes ++ bytes(0x0d, 0, 0, 0) ++ bytes(tail: _*))
    // VP8 lossy: 3-byte frame tag, sync 9D 01 2A, 14-bit LE dims
    val lossy = riff("VP8 ", 0, 0, 0, 0x9d, 0x01, 0x2a,
      0x20, 0x01, 0xf0, 0x00) // w=0x120=288, h=0xf0=240
    assert(ImageHeaders.parse(lossy) == Meta("webp", 288, 240, 3))
    // VP8L lossless: 0x2F then packed (w-1) | (h-1)<<14 | alpha<<28
    def vp8l(w: Int, h: Int, alpha: Int): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
      riff("VP8L", 0x2f, bits & 0xff, (bits >> 8) & 0xff,
        (bits >> 16) & 0xff, (bits >>> 24) & 0xff)
    }
    assert(ImageHeaders.parse(vp8l(800, 600, 0)) == Meta("webp", 800, 600, 3))
    assert(ImageHeaders.parse(vp8l(16383, 1, 1)) == Meta("webp", 16383, 1, 4))
    // VP8X extended: flags byte (bit 4 = alpha), 24-bit LE canvas-1
    def vp8x(w: Int, h: Int, flags: Int): Array[Byte] =
      riff("VP8X", flags, 0, 0, 0,
        (w - 1) & 0xff, ((w - 1) >> 8) & 0xff, ((w - 1) >> 16) & 0xff,
        (h - 1) & 0xff, ((h - 1) >> 8) & 0xff, ((h - 1) >> 16) & 0xff)
    assert(ImageHeaders.parse(vp8x(100000, 2, 0x10)) == Meta("webp", 100000, 2, 4))
    assert(ImageHeaders.parse(vp8x(5, 5, 0x00)) == Meta("webp", 5, 5, 3))
    // broken sync code → null, no throw
    val badSync = riff("VP8 ", 0, 0, 0, 0x9d, 0x01, 0x2b, 1, 0, 1, 0)
    assert(ImageHeaders.parse(badSync) == null)
  }

  test("tiff: IFD walk under both byte orders; truncation never throws") {
    def entryLe(tag: Int, v: Int) = bytes(tag & 0xff, tag >> 8, 3, 0,
      1, 0, 0, 0, v & 0xff, v >> 8, 0, 0)
    def entryBe(tag: Int, v: Int) = bytes(tag >> 8, tag & 0xff, 0, 3,
      0, 0, 0, 1, v >> 8, v & 0xff, 0, 0)
    val le = "II".getBytes ++ bytes(42, 0, 8, 0, 0, 0, 3, 0) ++
      entryLe(256, 321) ++ entryLe(257, 123) ++ entryLe(277, 3) ++
      bytes(0, 0, 0, 0)
    assert(ImageHeaders.parse(le) == Meta("tiff", 321, 123, 3))
    val be = "MM".getBytes ++ bytes(0, 42, 0, 0, 0, 8, 0, 3) ++
      entryBe(256, 321) ++ entryBe(257, 123) ++ entryBe(277, 1) ++
      bytes(0, 0, 0, 0)
    assert(ImageHeaders.parse(be) == Meta("tiff", 321, 123, 1))
    // SamplesPerPixel absent → defaults to 1
    val noSpp = "II".getBytes ++ bytes(42, 0, 8, 0, 0, 0, 2, 0) ++
      entryLe(256, 9) ++ entryLe(257, 7) ++ bytes(0, 0, 0, 0)
    assert(ImageHeaders.parse(noSpp) == Meta("tiff", 9, 7, 1))
    // IFD pointing past the buffer / entry count overrunning → null
    val badIfd = "II".getBytes ++ bytes(42, 0, 0xff, 0, 0, 0)
    assert(ImageHeaders.parse(badIfd ++ bytes(0, 0, 0, 0, 0, 0, 0, 0)) == null)
    val overrun = "II".getBytes ++ bytes(42, 0, 8, 0, 0, 0, 9, 0) ++
      entryLe(256, 9)
    assert(ImageHeaders.parse(overrun) == null)
    // wrong magic → null
    val badMagic = "II".getBytes ++ bytes(41, 0, 8, 0, 0, 0, 0, 0) ++
      bytes(0, 0, 0, 0)
    assert(ImageHeaders.parse(badMagic) == null)
  }

  test("garbage never throws") {
    assert(ImageHeaders.parse(null) == null)
    assert(ImageHeaders.parse(Array.empty[Byte]) == null)
    assert(ImageHeaders.parse("plain text payload".getBytes) == null)
    assert(ImageHeaders.parse(png1x1.take(20)) == null) // truncated IHDR
  }

  test("ImageHeaderMeta expression decodes through codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, png(12, 34, 6)),
      (2L, "not an image".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = df.select(col("id"), ImageHeaders.imageMeta(col("payload")).as("m"))
      .select(col("id"), col("m.fmt"), col("m.width"), col("m.height"), col("m.channels"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "png" && out(0).getInt(2) == 12 &&
      out(0).getInt(3) == 34 && out(0).getInt(4) == 4)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("HeaderDecoder emits real geometry through decodeFrames") {
    import spark.implicits._
    val media = Seq(
      (1L, "image/png", png(100, 50, 2)),
      (2L, "image/gif", bytes('G', 'I', 'F', '8', '9', 'a', 7, 0, 5, 0, 0, 0, 0)),
      (3L, "text/plain", "garbage row".getBytes))
      .toDF("media_id", "mime", "payload")
    val frames = BinaryPipeline.decodeFrames(media, new BinaryPipeline.HeaderDecoder(4))
      .orderBy("media_id").collect()
    assert(frames.length == 2) // garbage row dropped, not fatal
    assert(frames(0).getInt(2) == 100 && frames(0).getInt(3) == 50 && frames(0).getInt(4) == 3)
    assert(frames(1).getInt(2) == 7 && frames(1).getInt(3) == 5 && frames(1).getInt(4) == 3)
    assert(frames(0).getSeq[Float](5).length == 4)
  }
}
