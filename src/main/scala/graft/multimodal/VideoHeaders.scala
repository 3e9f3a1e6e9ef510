package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real, dependency-free ISO-BMFF (MP4/MOV) container walk over an
  * opaque `binary` column — the video third of the multimodal header
  * family ([[ImageHeaders]] images, [[AudioHeaders]] audio). The
  * ISO base-media layout is a tree of length-prefixed boxes
  * (`u32be size | 4cc type | payload`), so "decode" here is a bounded
  * tree walk, not a codec:
  *
  *  - `ftyp` (top-level): major brand 4cc at +8.
  *  - `moov` (top-level container): walked child by child.
  *  - `moov/mvhd` v0: timescale u32be at +20, duration u32be at +24
  *    (after 8 header + 1 version + 3 flags + 4 ctime + 4 mtime).
  *  - `moov/trak/tkhd` v0: presentation width/height as 16.16
  *    fixed-point u32be at +84/+88 (8 header + 4 ver/flags + 20
  *    times/ids + 16 layer block + 36 matrix). Track count = number
  *    of `trak` children; geometry comes from the first trak with a
  *    nonzero width (video tracks carry dimensions, audio traks 0×0).
  *
  * Unknown boxes (`free`, `mdat`, vendor 4ccs) are skipped by their
  * declared size — the property that makes the format streamable and
  * the walk O(#boxes). A box whose declared size is < 8, overruns the
  * buffer, or is a truncated `largesize` marker (size == 1) aborts
  * that level; anything unparseable yields null, never a throw (the
  * [[ImageHeaders]] garbage-row rule — a crawler's media column always
  * carries junk and a decode stage must drop the row, not the task).
  *
  * Like the image/audio twins this is a Catalyst `UnaryExpression`
  * with codegen (a static call inside whole-stage codegen — no UDF
  * serialization), so container inspection over a billion-row media
  * table stays a map-only codegen stage.
  */
object VideoHeaders {

  /** Parsed container metadata: major brand, mvhd timescale/duration
    * (u32 as Long), trak count, first video trak's integer pixel
    * geometry (16.16 fixed point truncated).
    */
  final case class Meta(brand: String, timescale: Long, duration: Long,
      nTracks: Int, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Null on anything unparseable; never throws. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 16) return null
    // An ISO-BMFF stream must open with a well-formed box; require ftyp
    // first (the spec's recommendation and every real muxer's output).
    if (be32(b, 0) < 8 || fourcc(b, 4) != "ftyp") return null
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var w = 0
    var h = 0
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size < 8 || i + size > b.length) return null
      val typ = fourcc(b, i + 4)
      if (typ == "ftyp") {
        if (size < 16) return null
        brand = fourcc(b, i + 8)
      } else if (typ == "moov") {
        // walk children of moov: [i+8, i+size)
        var j = i + 8
        val end = i + size.toInt
        while (j + 8 <= end) {
          val csize = be32(b, j)
          if (csize < 8 || j + csize > end) return null
          val ctyp = fourcc(b, j + 4)
          if (ctyp == "mvhd") {
            if (csize < 28 || u8(b, j + 8) != 0) return null // v1 (64-bit) out of scope
            timescale = be32(b, j + 20)
            duration = be32(b, j + 24)
          } else if (ctyp == "trak") {
            nTracks += 1
            // walk trak children for tkhd
            var k = j + 8
            val tend = j + csize.toInt
            while (k + 8 <= tend) {
              val tsize = be32(b, k)
              if (tsize < 8 || k + tsize > tend) return null
              if (fourcc(b, k + 4) == "tkhd") {
                if (tsize < 92 || u8(b, k + 8) != 0) return null
                val tw = (be32(b, k + 84) >> 16).toInt
                val th = (be32(b, k + 88) >> 16).toInt
                if (w == 0 && tw > 0) { w = tw; h = th }
              }
              k += tsize.toInt
            }
          }
          j += csize.toInt
        }
      }
      i += size.toInt
    }
    if (brand == null || timescale < 0) null
    else Meta(brand, timescale, duration, nTracks, w, h)
  }

  /** Struct row shared by the interpreted and generated paths. */
  def metaRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.brand), m.timescale, m.duration,
      m.nTracks, m.width, m.height))
  }

  val metaType: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column API: parse a binary column's ISO-BMFF structure into a
    * struct `(brand, timescale, duration, n_tracks, width, height)`;
    * null when unparseable.
    */
  def mp4Meta(c: Column): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(Mp4Meta(S.expression(c)))
  }
}

/** Catalyst expression wrapping [[VideoHeaders.parse]] — codegen'd
  * static call, the [[ImageHeaderMeta]] pattern.
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoHeaders.metaType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mp4_meta expects binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VideoHeaders.metaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.multimodal.VideoHeaders.metaRow($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}
