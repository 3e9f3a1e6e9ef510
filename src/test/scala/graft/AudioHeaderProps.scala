package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.multimodal.AudioHeaders
import graft.multimodal.AudioHeaders.Meta

/** Property tests: any well-formed WAV/AU container round-trips
  * through the parser (build bytes from arbitrary valid geometry →
  * parse recovers it exactly), with arbitrary junk chunks in the WAV
  * chunk stream, and random byte blobs never throw.
  */
object AudioHeaderProps extends Properties("graft.audioheaders") {

  private def le16(v: Int): Seq[Int] = Seq(v & 0xff, (v >>> 8) & 0xff)
  private def le32(v: Int): Seq[Int] =
    Seq(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)
  private def be32(v: Int): Seq[Int] =
    Seq((v >>> 24) & 0xff, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
  private def bytes(xs: Seq[Int]): Array[Byte] = xs.map(_.toByte).toArray

  private val rateGen = Gen.choose(1, 1000000)
  private val chGen = Gen.choose(1, 64)
  private val bitsIdx = Gen.choose(1, 4) // ×8 → 8/16/24/32

  // 0-3 junk chunks, each with arbitrary tag and 0-7 data bytes (odd
  // sizes exercise the even-offset pad rule)
  private val junkChunks: Gen[Seq[Int]] =
    Gen.listOfN(3, for {
      use <- Gen.oneOf(true, false)
      tag <- Gen.listOfN(4, Gen.choose('A'.toInt, 'Z'.toInt))
        .suchThat(t => t.map(_.toChar).mkString != "fmt ")
      n <- Gen.choose(0, 7)
      data <- Gen.listOfN(n, Gen.choose(0, 255))
    } yield if (use) tag ++ le32(n) ++ data ++
      (if (n % 2 == 1) Seq(0) else Nil) else Nil).map(_.flatten)

  property("wav roundtrip with arbitrary leading chunks") =
    Prop.forAll(rateGen, chGen, bitsIdx, junkChunks) { (rate, ch, bi, junk) =>
      val bits = bi * 8
      val fmtData = le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(0) ++ le16(0) ++ le16(bits)
      val payload = bytes(Seq('R'.toInt, 'I', 'F', 'F') ++ le32(36) ++
        Seq('W'.toInt, 'A', 'V', 'E') ++ junk ++
        Seq('f'.toInt, 'm', 't', ' ') ++ le32(16) ++ fmtData)
      AudioHeaders.parse(payload) == Meta("wav", rate, ch, bits)
    }

  property("au roundtrip across all PCM encodings") =
    Prop.forAll(rateGen, chGen, Gen.choose(2, 5)) { (rate, ch, enc) =>
      val payload = bytes(Seq('.'.toInt, 's', 'n', 'd') ++ be32(24) ++
        be32(-1) ++ be32(enc) ++ be32(rate) ++ be32(ch))
      AudioHeaders.parse(payload) == Meta("au", rate, ch, (enc - 1) * 8)
    }

  property("huge chunk sizes near 2^31 never throw") =
    Prop.forAll(Gen.choose(Int.MaxValue - 16, Int.MaxValue),
      Gen.choose(0, 63)) { (size, pad) =>
      // A crafted chunk whose u32le size is near 2^31: advancing an Int
      // cursor by 8+size would wrap negative and index out of bounds.
      val payload = bytes(Seq('R'.toInt, 'I', 'F', 'F') ++ le32(36) ++
        Seq('W'.toInt, 'A', 'V', 'E') ++
        Seq('J'.toInt, 'U', 'N', 'K') ++ le32(size) ++
        Seq.fill(pad)(0xab))
      AudioHeaders.parse(payload) == null
    }

  property("random blobs never throw") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 255))) { blob =>
      AudioHeaders.parse(bytes(blob)) match {
        case null => true
        case Meta(f, r, c, b) =>
          (f == "wav" || f == "au") && r > 0 && c > 0 && b > 0
      }
    }
}
