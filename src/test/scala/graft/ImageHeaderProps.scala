package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.multimodal.ImageHeaders
import graft.multimodal.ImageHeaders.Meta

/** Property tests: well-formed PNG/GIF/BMP containers round-trip
  * through the parser for arbitrary valid geometry (the JPEG marker
  * scan is covered example-based in ImageHeadersSpec — its segment
  * grammar has too many stand-alone cases for a single generator to
  * add value), and random byte blobs never throw.
  */
object ImageHeaderProps extends Properties("graft.imageheaders") {

  private def be32(v: Int): Seq[Int] =
    Seq((v >>> 24) & 0xff, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
  private def le16(v: Int): Seq[Int] = Seq(v & 0xff, (v >>> 8) & 0xff)
  private def le32(v: Int): Seq[Int] =
    Seq(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)
  private def bytes(xs: Seq[Int]): Array[Byte] = xs.map(_.toByte).toArray

  private val dimGen = Gen.choose(1, 100000)
  // (colorType, channels) pairs from the PNG spec
  private val colorGen = Gen.oneOf((0, 1), (2, 3), (3, 1), (4, 2), (6, 4))

  property("png roundtrip across all color types") =
    Prop.forAll(dimGen, dimGen, colorGen) { case (w, h, (color, ch)) =>
      val payload = bytes(
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
          be32(13) ++ Seq('I'.toInt, 'H', 'D', 'R') ++
          be32(w) ++ be32(h) ++ Seq(8, color))
      ImageHeaders.parse(payload) == Meta("png", w, h, ch)
    }

  property("gif roundtrip (little-endian u16 screen descriptor)") =
    Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535),
      Gen.oneOf('7'.toInt, '9'.toInt)) { (w, h, ver) =>
      val payload = bytes(
        Seq('G'.toInt, 'I', 'F', '8', ver, 'a') ++
          le16(w) ++ le16(h) ++ Seq(0xf7, 0, 0))
      ImageHeaders.parse(payload) == Meta("gif", w, h, 3)
    }

  property("bmp roundtrip incl. top-down negative heights") =
    Prop.forAll(Gen.choose(1, 100000), Gen.choose(1, 100000),
      Gen.oneOf((8, 1), (24, 3), (32, 4)), Gen.oneOf(true, false)) {
      case (w, h, (bpp, ch), topDown) =>
        val payload = bytes(
          Seq('B'.toInt, 'M') ++ le32(0) ++ le32(0) ++ le32(54) ++
            le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
            le16(1) ++ le16(bpp) ++ Seq.fill(4)(0))
        ImageHeaders.parse(payload) == Meta("bmp", w, h, ch)
    }

  property("random blobs never throw") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 255))) { blob =>
      ImageHeaders.parse(bytes(blob)) match {
        case null => true
        case Meta(f, w, h, c) =>
          Set("png", "jpeg", "gif", "bmp")(f) && w > 0 && h > 0 && c > 0
      }
    }
}
