package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL pixel decode with zero new dependencies: `javax.imageio`
  * ships in the JDK (java.desktop) and decodes PNG/JPEG/GIF/BMP
  * headlessly. This closes the last stubbed stage of the multimodal
  * pipeline — [[ImageHeaders]] already parses container GEOMETRY
  * byte-for-byte; this decodes the PIXELS and reduces them to exact
  * integer sufficient statistics per channel.
  *
  * Statistics are per-channel SUM and SUM-OF-SQUARES over 8-bit
  * samples, as BIGINT — callers derive mean/std; emitting the
  * rationals keeps the repo's no-rounded-floats oracle contract and
  * BIGINT headroom is ample at any image size (255² · pixels < 2^63
  * up to ~10^14 pixels — no realistic frame approaches it; a float
  * feature vector would lose integer exactness past 2^24/255² ≈ 258
  * pixels, which is why the exact path does NOT ride
  * [[BinaryPipeline.frameSchema]]'s float features).
  *
  * Multi-frame payloads use a concatenated-BMP stream (the MJPEG
  * idea applied to the one uncompressed format both a SQL expression
  * and the JDK can produce): each frame is a complete, genuine BMP
  * whose header's u32le file-size field at offset 2 delimits it, so
  * the walk is a real container scan, and every frame goes through
  * the real `ImageIO` decode.
  *
  * Garbage payloads yield null/no rows, never throw — same contract
  * as the header parsers (a crawler's media column always carries
  * garbage; a throwing decode kills the task instead of the row).
  *
  * Reference scope: media URLs ride beside interaction rows in the
  * reference's tables (`sql/init.sql`); here the payload itself is
  * decoded distributively.
  */
object PixelDecode {

  // ImageIO decodes rasters without a display, but only if AWT never
  // tries to connect one — set before the first toolkit touch.
  System.setProperty("java.awt.headless", "true")

  /** Exact per-channel pixel statistics of one decoded frame. */
  final case class Stats(
      width: Int, height: Int, channels: Int,
      sumR: Long, sumG: Long, sumB: Long,
      sumSqR: Long, sumSqG: Long, sumSqB: Long)

  /** Decode one image payload (PNG/JPEG/GIF/BMP); null on anything
    * ImageIO cannot parse. Channel count comes from the color model
    * (3 = opaque, 4 = with alpha); statistics cover R/G/B.
    */
  def decode(payload: Array[Byte]): Stats = {
    if (payload == null || payload.length == 0) return null
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Throwable => null } // corrupt stream mid-decode
    if (img == null) return null
    statsOf(img)
  }

  /** Statistics of an in-memory image (spec round-trips share it). */
  def statsOf(img: BufferedImage): Stats = {
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    // one row at a time through the ARGB accessor: format-independent
    // (palette GIFs, 24-bit BMPs, ARGB PNGs all normalize to sRGB ints)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        val r = (p >>> 16) & 0xff; val g = (p >>> 8) & 0xff; val b = p & 0xff
        sr += r; sg += g; sb += b
        qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
        x += 1
      }
      y += 1
    }
    val ch = if (img.getColorModel.hasAlpha) 4 else img.getColorModel.getNumComponents
    Stats(w, h, ch, sr, sg, sb, qr, qg, qb)
  }

  /** Walk a concatenated-BMP stream: each frame starts with "BM" and
    * carries its total byte length u32le at offset +2; slice, decode
    * via ImageIO, advance. Stops (drops the tail) at the first
    * malformed frame — never throws.
    */
  def decodeBmpStream(payload: Array[Byte]): Iterator[Stats] = {
    if (payload == null) return Iterator.empty
    val out = Vector.newBuilder[Stats]
    var off = 0L
    var ok = true
    while (ok && off + 6 <= payload.length) {
      val p = off.toInt
      if (payload(p) != 'B' || payload(p + 1) != 'M') ok = false
      else {
        val size = ((payload(p + 5) & 0xffL) << 24) | ((payload(p + 4) & 0xffL) << 16) |
          ((payload(p + 3) & 0xffL) << 8) | (payload(p + 2) & 0xffL)
        if (size < 54 || off + size > payload.length) ok = false
        else {
          val s = decode(java.util.Arrays.copyOfRange(payload, p, (off + size).toInt))
          if (s == null) ok = false
          else { out += s; off += size }
        }
      }
    }
    out.result().iterator
  }

  /** Output schema of [[pixelStats]]: geometry + exact BIGINT sums. */
  val statsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("ssq_r", LongType, nullable = false),
    StructField("ssq_g", LongType, nullable = false),
    StructField("ssq_b", LongType, nullable = false)))

  /** Distributed exact pixel statistics over a (media_id, payload)
    * table — one row per decoded frame. Same scale shape as
    * [[BinaryPipeline.decodeFrames]]: repartition by id so decode
    * parallelism is independent of source layout, mapPartitions so a
    * real codec's per-task init is amortized; decode is the classic
    * CPU-heavy embarrassingly-parallel stage, zero shuffle beyond the
    * task-sizing repartition.
    */
  def pixelStats(media: DataFrame, multiFrame: Boolean): DataFrame = {
    val enc = RowEncoder.encoderFor(statsSchema)
    media.select(col("media_id"), col("payload"))
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val frames =
            if (multiFrame) decodeBmpStream(payload)
            else Option(decode(payload)).iterator
          frames.zipWithIndex.map { case (s, i) =>
            Row(id, i, s.width, s.height, s.channels,
              s.sumR, s.sumG, s.sumB, s.sumSqR, s.sumSqG, s.sumSqB)
          }
        }
      }(enc)
  }

  /** [[BinaryPipeline.MediaDecoder]] backed by the real ImageIO path:
    * frames from a concatenated-BMP stream (or any single
    * PNG/JPEG/GIF/BMP payload), features = per-channel [mean, std]
    * as floats — the production feature shape, derived from the exact
    * sums (the exact path is [[pixelStats]]).
    */
  class ImageIoDecoder extends BinaryPipeline.MediaDecoder {
    override def decode(payload: Array[Byte]): Iterator[(Int, Int, Int, Int, Array[Float])] = {
      val frames =
        if (payload != null && payload.length >= 2 &&
          payload(0) == 'B' && payload(1) == 'M') decodeBmpStream(payload)
        else Option(PixelDecode.decode(payload)).iterator
      frames.zipWithIndex.map { case (s, i) =>
        val n = s.width.toLong * s.height
        def mean(sum: Long) = (sum.toDouble / n).toFloat
        def std(sum: Long, ssq: Long) = {
          val m = sum.toDouble / n
          math.sqrt(math.max(ssq.toDouble / n - m * m, 0.0)).toFloat
        }
        (i, s.width, s.height, s.channels,
          Array(mean(s.sumR), mean(s.sumG), mean(s.sumB),
            std(s.sumR, s.sumSqR), std(s.sumG, s.sumSqG), std(s.sumB, s.sumSqB)))
      }
    }
  }
}
