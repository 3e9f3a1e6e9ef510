package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.multimodal.{BinaryPipeline, BmpFixture, PixelDecode}

/** Real pixel decode ([[graft.multimodal.PixelDecode]]): the JDK codec
  * must recover EXACTLY the pixel statistics the independent
  * [[BmpFixture]] byte-assembler encoded (two implementations of the
  * BMP layout meeting in the middle), round-trip ImageIO's own
  * PNG/JPEG encodes, walk concatenated-BMP streams frame-exactly, and
  * never throw on garbage.
  */
class PixelDecodeSpec extends SparkSpec {

  /** Formula-side expectation, computed directly (no image code). */
  private def expected(docId: Long, frame: Int, w: Int, h: Int): PixelDecode.Stats = {
    var sr = 0L; var sg = 0L; var sb = 0L; var qr = 0L; var qg = 0L; var qb = 0L
    for (p <- 0 until w * h) {
      val r = BmpFixture.value(docId, frame, p, 0)
      val g = BmpFixture.value(docId, frame, p, 1)
      val b = BmpFixture.value(docId, frame, p, 2)
      sr += r; sg += g; sb += b
      qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
    }
    PixelDecode.Stats(w, h, 3, sr, sg, sb, qr, qg, qb)
  }

  test("hand-assembled BMP decodes to the exact formula statistics") {
    for (docId <- Seq(0L, 1L, 7L, 999L); (w, h) <- Seq((1, 1), (2, 3), (5, 4), (7, 5))) {
      val got = PixelDecode.decode(BmpFixture.bmp(docId, 0, w, h))
      assert(got == expected(docId, 0, w, h), s"doc=$docId ${w}x$h")
    }
  }

  test("row padding: widths whose 3w is not 4-aligned decode exactly") {
    // w ∈ {1,2,3,5,6,7} exercise every padding residue 3w % 4
    for (w <- 1 to 7) {
      val got = PixelDecode.decode(BmpFixture.bmp(42L, 3, w, 3))
      assert(got == expected(42L, 3, w, 3), s"w=$w")
    }
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def formulaImage(docId: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = y * w + x
      img.setRGB(x, y, (BmpFixture.value(docId, 0, p, 0) << 16) |
        (BmpFixture.value(docId, 0, p, 1) << 8) | BmpFixture.value(docId, 0, p, 2))
    }
    img
  }

  test("ImageIO-encoded PNG and BMP round-trip statistics losslessly") {
    for (fmt <- Seq("png", "bmp"); (w, h) <- Seq((3, 2), (8, 5))) {
      val img = formulaImage(11L, w, h)
      val got = PixelDecode.decode(encode(img, fmt))
      assert(got == PixelDecode.statsOf(img), s"$fmt ${w}x$h")
      assert(got == expected(11L, 0, w, h), s"$fmt vs formula")
    }
  }

  test("JPEG: exact geometry, lossy-but-close statistics") {
    val img = formulaImage(5L, 16, 12)
    val got = PixelDecode.decode(encode(img, "jpg"))
    assert(got != null && got.width == 16 && got.height == 12)
    val want = PixelDecode.statsOf(img)
    val n = 16 * 12
    // DCT quantization moves means by a few intensity levels at most
    assert(math.abs(got.sumR - want.sumR).toDouble / n < 16, s"$got vs $want")
    assert(math.abs(got.sumB - want.sumB).toDouble / n < 16)
  }

  test("concatenated-BMP stream walks every frame; corrupt tail drops") {
    val s = BmpFixture.stream(9L, 3, 4, 3)
    val frames = PixelDecode.decodeBmpStream(s).toVector
    assert(frames == (0 until 3).map(f => expected(9L, f, 4, 3)).toVector)
    // a frame-sized garbage tail is dropped, prior frames survive
    val withTail = s ++ Array.fill[Byte](20)(0x5a)
    assert(PixelDecode.decodeBmpStream(withTail).toVector == frames)
    // truncated final frame: the walk stops before it
    val truncated = java.util.Arrays.copyOfRange(s, 0, s.length - 7)
    assert(PixelDecode.decodeBmpStream(truncated).toVector == frames.dropRight(1))
  }

  test("garbage never throws: null stats / empty stream") {
    assert(PixelDecode.decode(null) == null)
    assert(PixelDecode.decode(Array.emptyByteArray) == null)
    assert(PixelDecode.decode("not an image at all".getBytes) == null)
    assert(PixelDecode.decode(Array.fill[Byte](1000)(0x42)) == null)
    assert(PixelDecode.decodeBmpStream("BMxx".getBytes).isEmpty)
  }

  test("pixelStats is exact end-to-end through the Spark plumbing") {
    import spark.implicits._
    val media = Seq(1L, 2L, 3L).toDF("media_id")
      .as[Long].map(id => (id, BmpFixture.stream(id, 1 + (id % 3).toInt, 3, 2)))
      .toDF("media_id", "payload")
    val rows = PixelDecode.pixelStats(media, multiFrame = true)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        PixelDecode.Stats(r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))).toMap
    assert(rows.size == 2 + 3 + 1) // 1+(id%3) frames each
    for (id <- 1L to 3L; f <- 0 until (1 + (id % 3).toInt))
      assert(rows((id, f)) == expected(id, f, 3, 2), s"id=$id f=$f")
  }

  test("ImageIoDecoder emits mean/std features through decodeFrames") {
    import spark.implicits._
    val media = Seq(4L).toDF("media_id")
      .as[Long].map(id => (id, "application/x-bmp-stream", BmpFixture.stream(id, 2, 4, 4)))
      .toDF("media_id", "mime", "payload")
    val frames = BinaryPipeline.decodeFrames(media, new PixelDecode.ImageIoDecoder)
      .collect().sortBy(_.getInt(1))
    assert(frames.length == 2)
    val e = expected(4L, 0, 4, 4)
    val feats = frames(0).getSeq[Float](5)
    assert(frames(0).getInt(2) == 4 && frames(0).getInt(3) == 4 && frames(0).getInt(4) == 3)
    assert(math.abs(feats(0) - e.sumR / 16.0f) < 1e-4)
    val meanR = e.sumR / 16.0
    assert(math.abs(feats(3) - math.sqrt(e.sumSqR / 16.0 - meanR * meanR)) < 1e-3)
  }
}
