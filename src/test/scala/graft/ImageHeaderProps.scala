package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.ImageHeaders

/** ScalaCheck properties for the image-header sniffer: decode runs over
  * arbitrary untrusted blobs at corpus scale, so `parse` must be total —
  * any byte soup yields None or a sane ImageMeta, never a throw. */
object ImageHeaderProps extends Properties("ImageHeaders") {

  private val rawBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  // byte soup that starts with a real magic (the adversarial case:
  // signature present, body garbage/truncated)
  private val magics = Seq(
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
    "BM".getBytes, "GIF89a".getBytes, "GIF87a".getBytes,
    Array(0xff, 0xd8).map(_.toByte))
  private val magicPrefixed: Gen[Array[Byte]] =
    for { m <- Gen.oneOf(magics); rest <- rawBytes } yield m ++ rest

  property("total on arbitrary bytes: no throw, sane meta when recognized") =
    forAll(rawBytes) { b =>
      ImageHeaders.parse(b) match {
        case None => true
        case Some(m) => m.width > 0 && m.height > 0 && m.channels >= 1 &&
          Set("png", "bmp", "gif", "jpeg").contains(m.format)
      }
    }

  property("BMP height Int.MinValue (abs-proof negative) parses as None") = {
    // 'B','M', DIB size 40 at offset 14, width 10 at 18, height 0x80000000
    // at 22, bpp 24 at 28 — math.abs(Int.MinValue) stays negative, so the
    // old code emitted a negative-height ImageMeta for this header
    val b = new Array[Byte](32)
    b(0) = 'B'; b(1) = 'M'
    b(14) = 40; b(18) = 10
    b(25) = 0x80.toByte // LE int at 22 = 0x80000000 = Int.MinValue
    b(28) = 24
    ImageHeaders.parse(b).isEmpty
  }

  property("total on magic-prefixed garbage (truncated/corrupt headers)") =
    forAll(magicPrefixed) { b =>
      ImageHeaders.parse(b) match {
        case None => true
        case Some(m) => m.width > 0 && m.height > 0 && m.channels >= 1
      }
    }

  property("deterministic") = forAll(magicPrefixed) { b =>
    ImageHeaders.parse(b) == ImageHeaders.parse(b)
  }
}
