package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real, dependency-free image-header decode over an opaque `binary`
  * column — the metadata half of the multimodal decode stage (pixel
  * decode still needs a codec; header geometry does not). Parses the
  * actual on-disk container layouts:
  *
  *  - PNG: 8-byte signature, IHDR chunk — width/height as big-endian
  *    u32 at offsets 16/20, bit depth + color type at 24/25; channels
  *    derive from the color type (grey 1, RGB 3, palette 1, grey+α 2,
  *    RGBA 4).
  *  - JPEG (JFIF/EXIF): marker scan from SOI — segments are
  *    `FF <marker> <u16be length>`; standalone markers (RSTn/TEM) have
  *    no length; the frame geometry lives in the first SOFn segment
  *    (C0–CF minus C4/C8/CC): precision u8, height u16be, width u16be,
  *    component count u8.
  *  - GIF (87a/89a): logical-screen width/height as LITTLE-endian u16
  *    at offsets 6/8; emitted as 3 channels (palette RGB).
  *  - BMP (BITMAPINFOHEADER): width/height as little-endian i32 at
  *    18/22 (height may be negative = top-down), bits-per-pixel u16le
  *    at 28 → channels = bpp/8 for the common 8/24/32 cases.
  *
  * Malformed or unrecognized payloads yield null (never throw) — at
  * 100 TB a crawler's media column always carries garbage rows, and a
  * decode stage that throws kills the task instead of the row.
  *
  * Reference scope: multimodal payloads ride beside metadata the same
  * way the reference stores media URLs beside interaction rows
  * (`sql/init.sql` course/user tables); here the payload itself is
  * decoded distributively.
  */
object ImageHeaders {

  /** Parsed header geometry. `fmt` ∈ png|jpeg|gif|bmp|webp|tiff. */
  final case class Meta(fmt: String, width: Int, height: Int, channels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Null on anything unparseable; never throws. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 10) return null
    if (b.length >= 26 && java.util.Arrays.equals(b.slice(0, 8), PngSig)) parsePng(b)
    else if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) parseJpeg(b)
    else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') parseGif(b)
    else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') parseBmp(b)
    else if (b.length >= 25 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
      b(11) == 'P') parseWebp(b)
    else if (b.length >= 14 &&
      ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M')))
      parseTiff(b)
    else null
  }

  private def parsePng(b: Array[Byte]): Meta = {
    // signature(8) | IHDR length(4BE) | "IHDR"(4) | w(4BE) h(4BE) depth(1) color(1)
    if (be32(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    val channels = u8(b, 25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return null
    }
    Meta("png", w.toInt, h.toInt, channels)
  }

  private def parseJpeg(b: Array[Byte]): Meta = {
    var i = 2 // past SOI
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return null // lost marker sync
      var m = u8(b, i + 1)
      // fill bytes: consecutive FFs pad before a marker
      var j = i + 1
      while (m == 0xff && j + 1 < b.length) { j += 1; m = u8(b, j) }
      val at = j - 1 // position of the FF introducing marker m
      if (m == 0xd9 || m == 0xda) return null // EOI / SOS before any SOF
      if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) { // RSTn / TEM: standalone
        i = at + 2
      } else {
        if (at + 3 >= b.length) return null
        val len = be16(b, at + 2)
        if (len < 2) return null
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          // len(2) precision(1) height(2BE) width(2BE) ncomp(1)
          if (at + 9 >= b.length) return null
          val h = be16(b, at + 5)
          val w = be16(b, at + 7)
          val ncomp = u8(b, at + 9)
          if (w == 0 || h == 0 || ncomp == 0) return null
          return Meta("jpeg", w, h, ncomp)
        }
        i = at + 2 + len
      }
    }
    null
  }

  private def parseGif(b: Array[Byte]): Meta = {
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w == 0 || h == 0) null else Meta("gif", w, h, 3)
  }

  private def parseBmp(b: Array[Byte]): Meta = {
    if (le32(b, 14) < 40) return null // BITMAPCOREHEADER not supported
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22)) // negative = top-down row order
    val bpp = le16(b, 28)
    if (w <= 0 || h <= 0) return null
    val channels = bpp match {
      case 8 => 1
      case 24 => 3
      case 32 => 4
      case _ => return null
    }
    Meta("bmp", w, h, channels)
  }

  /** WebP = RIFF container; all three frame kinds: lossy VP8 (sync-coded
    * 14-bit dims), lossless VP8L (a packed LE u32: width−1 in bits
    * 0-13, height−1 in 14-27, alpha hint bit 28), extended VP8X
    * (24-bit LE canvas−1 fields, alpha = flags bit 4).
    */
  private def parseWebp(b: Array[Byte]): Meta = {
    val cc = (b(12), b(13), b(14), b(15))
    cc match {
      case ('V', 'P', '8', ' ') if b.length >= 30 &&
          u8(b, 23) == 0x9d && u8(b, 24) == 0x01 && u8(b, 25) == 0x2a =>
        val w = le16(b, 26) & 0x3fff
        val h = le16(b, 28) & 0x3fff
        if (w == 0 || h == 0) null else Meta("webp", w, h, 3)
      case ('V', 'P', '8', 'L') if u8(b, 20) == 0x2f =>
        val bits = le32(b, 21).toLong & 0xffffffffL
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        Meta("webp", w, h, if (((bits >> 28) & 1L) == 1L) 4 else 3)
      case ('V', 'P', '8', 'X') if b.length >= 30 =>
        val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)) + 1
        val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)) + 1
        Meta("webp", w, h, if ((u8(b, 20) & 0x10) != 0) 4 else 3)
      case _ => null
    }
  }

  /** TIFF: endian tag (II little / MM big) + magic 42 + IFD walk over
    * 12-byte entries — ImageWidth (256), ImageLength (257),
    * SamplesPerPixel (277, default 1); inline SHORT values sit in the
    * FIRST two bytes of the value field under both endiannesses
    * (left-justified per the spec). Every offset bounds-checked; null
    * on any violation, never a throw.
    */
  private def parseTiff(b: Array[Byte]): Meta = {
    val le = b(0) == 'I'
    def r16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
    def r32(i: Int): Long =
      if (le) le32(b, i).toLong & 0xffffffffL else be32(b, i)
    if (r16(2) != 42) return null
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = r16(ifd.toInt)
    var w = -1; var h = -1; var spp = 1
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      if (e + 12 > b.length) return null
      val tag = r16(e)
      val v = r16(e + 2) match {
        case 3 => r16(e + 8)          // SHORT, inline
        case 4 => r32(e + 8).toInt    // LONG, inline
        case _ => -1                  // other types: not a geometry tag
      }
      tag match {
        case 256 => w = v
        case 257 => h = v
        case 277 => spp = v
        case _ => ()
      }
      i += 1
    }
    if (w <= 0 || h <= 0 || spp <= 0) null else Meta("tiff", w, h, spp)
  }

  /** Struct row for the Catalyst expression (shared by interpreted and
    * generated paths, like [[graft.functions.AsciiPolyHash.hash]]).
    */
  def metaRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(m.fmt), m.width, m.height, m.channels))
  }

  val metaType: StructType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** Column API: parse a binary column's image header into a struct
    * `(fmt, width, height, channels)`; null when unparseable.
    */
  def imageMeta(c: Column): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(ImageHeaderMeta(S.expression(c)))
  }
}

/** Catalyst expression wrapping [[ImageHeaders.parse]] — stays inside
  * whole-stage codegen (a static call, no lambda dispatch, no UDF
  * serialization), so header decode over a billion-row media table is
  * a map-only codegen stage.
  */
case class ImageHeaderMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageHeaders.metaType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_image_meta expects binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageHeaders.metaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.multimodal.ImageHeaders.metaRow($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderMeta =
    copy(child = newChild)
}
