package graft.ops

/** Pure-JVM image metadata sniffing from public container-format headers —
  * no pixel decode, no dependencies, O(header) bytes inspected:
  *
  *  - PNG: 8-byte signature + IHDR chunk (W3C PNG spec §5.2/§11.2.2 —
  *    big-endian width/height, colour type → channel count);
  *  - BMP: `BM` magic + BITMAPINFOHEADER (little-endian; height may be
  *    negative for top-down rows — reported absolute);
  *  - GIF: `GIF87a`/`GIF89a` + logical screen descriptor (little-endian);
  *  - JPEG: marker-segment scan to the first SOFn frame header
  *    (big-endian height/width, component count; C4/C8/CC are not SOF).
  *
  * This is the corpus-metadata pass that must be cheap at 100 TB: "what
  * resolutions/formats are in this bucket" should read a few dozen bytes
  * per object, not decode pixels. Validated against real `ImageIO` encoder
  * output and a hand-pinned PNG byte literal in RuntimeExtrasSpec.
  */
object ImageHeaders {

  /** Parsed header metadata; `channels` is the decoded-sample channel
    * count (palette formats report their expanded channel count). */
  final case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Sniff `bytes` for a recognized image container; None if it isn't one
    * (caller decides the fallback). Total per row — malformed/truncated
    * headers yield None, never a throw. */
  def parse(bytes: Array[Byte]): Option[ImageMeta] =
    try parsePng(bytes).orElse(parseBmp(bytes)).orElse(parseGif(bytes))
      .orElse(parseJpeg(bytes))
    catch { case _: IndexOutOfBoundsException => None }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    // signature, then the IHDR chunk is required first: 4-byte length (13),
    // "IHDR", width, height (both BE32), bit depth, colour type
    if (b.length < 29 || !PngSig.indices.forall(i => u8(b, i) == PngSig(i))) None
    else if (be32(b, 8) != 13 || u8(b, 12) != 'I' || u8(b, 13) != 'H' ||
             u8(b, 14) != 'D' || u8(b, 15) != 'R') None
    else {
      val w = be32(b, 16); val h = be32(b, 20)
      val channels = u8(b, 25) match { // colour type (spec §11.2.2)
        case 0 => 1 // greyscale
        case 2 => 3 // truecolour
        case 3 => 3 // indexed — palette entries are RGB
        case 4 => 2 // greyscale + alpha
        case 6 => 4 // truecolour + alpha
        case _ => return None
      }
      if (w <= 0 || h <= 0) None else Some(ImageMeta(w, h, channels, "png"))
    }
  }

  private def parseBmp(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 30 || u8(b, 0) != 'B' || u8(b, 1) != 'M') None
    else if (le32(b, 14) < 40) None // only BITMAPINFOHEADER-family DIBs
    else {
      val w = le32(b, 18)
      val rawH = le32(b, 22) // negative = top-down row order
      // math.abs(Int.MinValue) stays negative — treat it as malformed
      if (rawH == Int.MinValue) return None
      val h = math.abs(rawH)
      val bpp = le16(b, 28)
      if (w <= 0 || h == 0 || bpp <= 0) None
      else Some(ImageMeta(w, h, math.max(1, bpp / 8), "bmp"))
    }
  }

  private def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    val sig = b.length >= 10 && u8(b, 0) == 'G' && u8(b, 1) == 'I' &&
      u8(b, 2) == 'F' && u8(b, 3) == '8' &&
      (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a'
    if (!sig) None
    else {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) None else Some(ImageMeta(w, h, 3, "gif"))
    }
  }

  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) None
    else {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None // lost marker sync
        var marker = u8(b, i + 1)
        while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) }
        marker match {
          case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            // SOFn: length(2) precision(1) height(2) width(2) ncomponents(1)
            if (i + 9 >= b.length) return None
            val h = be16(b, i + 5); val w = be16(b, i + 7); val nc = u8(b, i + 9)
            return if (w <= 0 || h <= 0 || nc <= 0) None
                   else Some(ImageMeta(w, h, nc, "jpeg"))
          case m if (m >= 0xd0 && m <= 0xd9) || m == 0x01 =>
            i += 2 // standalone marker, no length field
          case _ =>
            if (i + 3 >= b.length) return None
            i += 2 + be16(b, i + 2) // segment length includes its own 2 bytes
        }
      }
      None
    }
  }
}
