package graft.multimodal

/** Deterministic, genuine BMP payload assembly for the pixel-decode
  * oracle path — the q119/q123 fixture idea one level deeper: those
  * assemble container HEADERS per row; this assembles complete
  * 24-bit BMP files (header + BITMAPINFOHEADER + bottom-up padded
  * pixel rows) whose every pixel value derives from an arithmetic
  * formula a DuckDB oracle recomputes independently:
  *
  *   v(doc, frame, x, y, c) = (doc·7 + frame·131 + (y·w + x)·3 + c) % 256
  *
  * with c ∈ {0=R, 1=G, 2=B} and (x, y) in IMAGE coordinates (top-left
  * origin — the assembler writes rows bottom-up and mirrors y, per the
  * BMP spec's positive-height convention). BMP because it is the one
  * real format that is byte-assemblable without a compressor — the
  * JDK's own ImageIO then decodes it, so the assembly and the decode
  * are fully independent implementations of the on-disk layout.
  *
  * Multi-frame payloads are concatenated complete BMPs (see
  * [[PixelDecode.decodeBmpStream]]).
  */
object BmpFixture {

  /** Pixel formula shared by assembly, specs, and oracle SQL. */
  def value(docId: Long, frame: Int, p: Int, c: Int): Int =
    ((docId * 7 + frame.toLong * 131 + p.toLong * 3 + c) % 256).toInt

  /** Near-duplicate pixel family for PERCEPTUAL hashing (q311): four
    * consecutive doc ids share the base image (base = docId div 4,
    * same formula pixels) and each perturbs exactly ONE pixel — the
    * pixel at index docId mod 64 — by +96 mod 256 on every channel.
    * Same closed form on both engines, so the oracle replays pixels,
    * grayscales, means, hash bits and hamming distances exactly.
    */
  def nearDupValue(docId: Long, p: Int, c: Int): Int = {
    // the base*p cross term gives every base a DIFFERENT gradient
    // slope: aHash is (by design) invariant to uniform brightness
    // shifts, so a base-only additive term would make all bases
    // near-identical to the hash — measured 20k cross-group pairs on
    // the first cut; the structural term collapses that to the
    // planted groups
    val base = docId / 4
    val v = ((base * 7 + p.toLong * p * 3 + base * p * 11 + c) % 256).toInt
    if (p == (docId % 64).toInt) ((v + 96) % 256) else v
  }

  /** One 8×8 single-frame near-dup-family BMP (the q311 fixture). */
  def nearDupBmp(docId: Long): Array[Byte] =
    assemble(8, 8)((p, c) => nearDupValue(docId, p, c))

  /** One complete 24-bit bottom-up BMP of w×h formula pixels. */
  def bmp(docId: Long, frame: Int, w: Int, h: Int): Array[Byte] =
    assemble(w, h)((p, c) => value(docId, frame, p, c))

  /** Shared 24-bit bottom-up BMP assembly over any (p, c) → value. */
  private def assemble(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"degenerate geometry ${w}x$h")
    val rowBytes = (3 * w + 3) & ~3 // rows pad to 4-byte alignment
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    var i = 0
    def u8(v: Int): Unit = { b(i) = v.toByte; i += 1 }
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >>> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
    u8('B'); u8('M'); u32(size); u32(0); u32(54) // file header
    u32(40); u32(w); u32(h) // positive height = bottom-up rows
    u16(1); u16(24); u32(0); u32(rowBytes * h)
    u32(0); u32(0); u32(0); u32(0)
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy // file row 0 is the BOTTOM image row
      i = 54 + fy * rowBytes
      var x = 0
      while (x < w) {
        val p = y * w + x
        u8(px(p, 2)) // BMP stores B,G,R
        u8(px(p, 1))
        u8(px(p, 0))
        x += 1
      }
      fy += 1
    }
    b
  }

  /** `nFrames` complete BMPs back to back — the multi-frame stream. */
  def stream(docId: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val frames = (0 until nFrames).map(f => bmp(docId, f, w, h))
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { f =>
      System.arraycopy(f, 0, out, off, f.length); off += f.length
    }
    out
  }
}
