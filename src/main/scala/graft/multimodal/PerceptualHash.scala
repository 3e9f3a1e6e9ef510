package graft.multimodal

/** Perceptual AVERAGE HASH (aHash — the classic pHash-family
  * primitive: grayscale, compare each cell to the image mean, one bit
  * per cell) over a REAL decode: `javax.imageio` reads the payload,
  * integer grayscale g = (r+g+b) div 3 per pixel, mean = Σg div 64
  * (floor — deterministic), bit_p = g_p > mean. The 64 bits ship as
  * two NON-NEGATIVE 32-bit halves (hi = bits 32..63, lo = bits 0..31)
  * so every downstream comparison — band extraction, xor, bit_count —
  * is plain BIGINT arithmetic both engines replay exactly.
  *
  * The 8×8 geometry is the aHash contract here: production prepends a
  * downscale kernel (resampling choices are codec-specific and would
  * put float filtering inside the cross-engine contract); the q311
  * fixture renders 8×8 natively, so the decode is real and the hash
  * arithmetic is exact.
  */
object PerceptualHash {

  def aHash8x8(payload: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null && img.getWidth == 8 && img.getHeight == 8,
      "aHash8x8 expects a decodable 8x8 image")
    val g = new Array[Long](64)
    var sum = 0L
    var p = 0
    while (p < 64) {
      val rgb = img.getRGB(p % 8, p / 8)
      val r = (rgb >> 16) & 0xff
      val gg = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      g(p) = (r + gg + b) / 3
      sum += g(p)
      p += 1
    }
    val mean = sum / 64
    var hi = 0L
    var lo = 0L
    p = 0
    while (p < 64) {
      if (g(p) > mean) {
        if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
      }
      p += 1
    }
    (hi, lo)
  }
}
