package graft

import graft.multimodal.{BmpFixture, PerceptualHash}

/** aHash over the real JDK decode: hand-computed bits from the fixture
  * formula, halves stay in their 32-bit ranges, the planted
  * perturbation moves only a few bits, and distinct bases are far.
  */
class PerceptualHashSpec extends SparkSpec {

  private def refHash(docId: Long): (Long, Long) = {
    // independent closed-form replay of the oracle arithmetic
    val g = (0 until 64).map { p =>
      (0 to 2).map(c => BmpFixture.nearDupValue(docId, p, c).toLong).sum / 3
    }
    val mean = g.sum / 64
    var hi = 0L; var lo = 0L
    (0 until 64).foreach { p =>
      if (g(p) > mean) {
        if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
      }
    }
    (hi, lo)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("decoded hash equals the closed-form replay for many ids") {
    (0L until 64L).foreach { id =>
      val got = PerceptualHash.aHash8x8(BmpFixture.nearDupBmp(id))
      assert(got === refHash(id), s"doc $id: codec path diverged from formula")
      assert(got._1 >= 0L && got._1 < (1L << 32), s"hi out of 32-bit range")
      assert(got._2 >= 0L && got._2 < (1L << 32), s"lo out of 32-bit range")
    }
  }

  test("planted near-dups are close, distinct bases are far") {
    // same base (docs 8..11 share base 2): one perturbed pixel each
    val group = (8L to 11L).map(id => PerceptualHash.aHash8x8(BmpFixture.nearDupBmp(id)))
    for (i <- group.indices; j <- group.indices if i < j)
      assert(hamming(group(i), group(j)) <= 8,
        s"intra-group hamming ${hamming(group(i), group(j))} too large")
    // different bases: the base*p cross term separates the patterns
    val far = Seq(0L, 40L, 80L, 120L).map(id =>
      PerceptualHash.aHash8x8(BmpFixture.nearDupBmp(id)))
    for (i <- far.indices; j <- far.indices if i < j)
      assert(hamming(far(i), far(j)) > 8,
        s"cross-base hamming ${hamming(far(i), far(j))} suspiciously small")
  }

  test("non-8x8 or undecodable payloads are refused") {
    intercept[IllegalArgumentException] {
      PerceptualHash.aHash8x8(BmpFixture.bmp(1L, 0, 4, 4))
    }
    intercept[IllegalArgumentException] {
      PerceptualHash.aHash8x8(Array[Byte](1, 2, 3))
    }
  }
}
