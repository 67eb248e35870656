package graft.ops

/** Pure-JVM audio/video metadata sniffing from public container headers —
  * the WAV/FLAC/Ogg/MP4 sibling of [[ImageHeaders]]: no sample decode, no
  * dependencies, O(header) bytes inspected per object.
  *
  *  - WAV: `RIFF`/`WAVE` magic + chunk scan for `fmt ` (PCM layout:
  *    channels, sample rate, bits per sample — all little-endian, per the
  *    public RIFF/WAVE spec) and `data` (payload size → duration via the
  *    byte rate). Chunks are word-aligned; odd sizes carry a pad byte.
  *  - FLAC: `fLaC` magic + the mandatory STREAMINFO block (rate /
  *    channels / bits / total samples bit-packed big-endian).
  *  - Ogg: `OggS` first page + codec id packet (Vorbis-I or RFC 7845
  *    OpusHead) for channels/rate; container identified even for other
  *    codecs.
  *  - MP4 (ISO BMFF): top-level box scan for `ftyp` (format = major
  *    brand family) then `moov`→`mvhd` (timescale + duration, version 0
  *    and 1 layouts) and `moov`→`trak`→`tkhd` (16.16 fixed-point
  *    presentation width/height; a track with nonzero dims marks the
  *    file as video, else audio).
  *
  * Same contract as the image sniffer: total per row — malformed or
  * truncated headers yield None, never a throw. The duration arithmetic
  * is integer (floor) so it is engine-mirrorable in oracle SQL.
  */
object AvHeaders {

  /** Parsed container metadata. `kind` ∈ audio/video; image payloads are
    * [[ImageHeaders]]' job. Fields that a format does not carry are 0. */
  final case class AvMeta(format: String, kind: String, channels: Int,
                          sampleRate: Int, bitsPerSample: Int,
                          durationMs: Long, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    ((be16(b, i).toLong << 16) | be16(b, i + 2)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i).toLong | (le16(b, i + 2).toLong << 16)) & 0xffffffffL
  private def fourCC(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "ISO-8859-1")

  /** Sniff `bytes` for a recognized audio/video container; None if it
    * isn't one (caller decides the fallback). */
  def parse(bytes: Array[Byte]): Option[AvMeta] =
    try parseWav(bytes).orElse(parseFlac(bytes)).orElse(parseOgg(bytes))
      .orElse(parseMp4(bytes))
    catch { case _: IndexOutOfBoundsException => None }

  private def parseWav(b: Array[Byte]): Option[AvMeta] = {
    if (b.length < 44 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "WAVE") return None
    // cursor in Long arithmetic with an explicit bound check per step —
    // a hostile declared chunk size near UInt32 max must end the scan,
    // not wrap the index negative and lean on the catch-all in parse()
    var i = 12L
    var channels = 0; var rate = 0; var bits = 0; var byteRate = 0L
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val id = fourCC(b, ii); val size = le32(b, ii + 4)
      val d = ii + 8
      if (id == "fmt " && size >= 16 && d + 16 <= b.length) {
        channels = le16(b, d + 2)
        rate = le32(b, d + 4).toInt
        byteRate = le32(b, d + 8)
        bits = le16(b, d + 14)
      } else if (id == "data") {
        // trust the declared size (metadata pass — the payload may be
        // truncated on disk; duration reports the DECLARED extent)
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i = d.toLong + size + (size & 1)
    }
    if (channels <= 0 || rate <= 0 || dataSize < 0) None
    else {
      val durMs = if (byteRate > 0) dataSize * 1000L / byteRate else 0L
      Some(AvMeta("wav", "audio", channels, rate, bits, durMs, 0, 0))
    }
  }

  /** FLAC: `fLaC` magic + the mandatory first STREAMINFO metadata block
    * (type 0, 34 bytes — public FLAC format spec): sample rate (20 bits),
    * channels−1 (3 bits), bits-per-sample−1 (5 bits), and total samples
    * (36 bits) packed big-endian in STREAMINFO bytes 10..17. Duration is
    * floor(totalSamples·1000 / rate) — 0 when the encoder wrote total
    * samples as 0 (unknown, per spec). */
  private def parseFlac(b: Array[Byte]): Option[AvMeta] = {
    if (b.length < 42 || fourCC(b, 0) != "fLaC") return None
    val blockType = u8(b, 4) & 0x7f // high bit = last-block flag
    val blockLen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (blockType != 0 || blockLen < 34) return None // STREAMINFO must be first
    val d = 8
    val packed = be64(b, d + 10)
    val rate = (packed >>> 44).toInt & 0xfffff
    val channels = ((packed >>> 41).toInt & 0x7) + 1
    val bits = ((packed >>> 36).toInt & 0x1f) + 1
    val totalSamples = packed & 0xfffffffffL // 36 bits
    if (rate <= 0) return None // spec: 0 is invalid
    val durMs = totalSamples * 1000L / rate
    Some(AvMeta("flac", "audio", channels, rate, bits, durMs, 0, 0))
  }

  /** Ogg: `OggS` page header (version 0), then the first packet on the
    * first page names the codec — `vorbis` (channels u8 at +11,
    * rate LE32 at +12) or `OpusHead` (channels u8 at +9, input rate LE32
    * at +12) per the public Vorbis-I / RFC 7845 id-header layouts.
    * Duration needs the LAST page's granule position (a tail read, not a
    * header sniff) — reported 0 here by design. Unrecognized first
    * packets still identify the container (`ogg`). */
  private def parseOgg(b: Array[Byte]): Option[AvMeta] = {
    if (b.length < 28 || fourCC(b, 0) != "OggS" || u8(b, 4) != 0) return None
    val nsegs = u8(b, 26)
    val d = 27 + nsegs // first packet data starts after the segment table
    if (d > b.length) return Some(AvMeta("ogg", "audio", 0, 0, 0, 0L, 0, 0))
    if (d + 16 <= b.length && u8(b, d) == 1 &&
        new String(b, d + 1, 6, "ISO-8859-1") == "vorbis") {
      val channels = u8(b, d + 11)
      val rate = le32(b, d + 12).toInt
      Some(AvMeta("ogg/vorbis", "audio", channels, rate, 0, 0L, 0, 0))
    } else if (d + 16 <= b.length &&
        new String(b, d, 8, "ISO-8859-1") == "OpusHead") {
      val channels = u8(b, d + 9)
      val rate = le32(b, d + 12).toInt // input rate; Opus decodes at 48k
      Some(AvMeta("ogg/opus", "audio", channels, rate, 0, 0L, 0, 0))
    } else Some(AvMeta("ogg", "audio", 0, 0, 0, 0L, 0, 0))
  }

  /** Walk one level of ISO-BMFF boxes in [from, to), invoking `f` with
    * (type, dataStart, dataEnd) per box. Size 0 = to end; size 1 =
    * 64-bit extended size. Stops on any inconsistent size. */
  private def boxes(b: Array[Byte], from: Int, to: Int)
                   (f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val typ = fourCC(b, i + 4)
      var dataStart = i + 8
      val size: Long =
        if (size32 == 1L) { if (i + 16 > to) return; dataStart = i + 16; be64(b, i + 8) }
        else if (size32 == 0L) (to - i).toLong
        else size32
      if (size < (dataStart - i) || i + size > to) return
      val end = (i + size).toInt
      f(typ, dataStart, end)
      i = end
    }
  }

  private def parseMp4(b: Array[Byte]): Option[AvMeta] = {
    if (b.length < 12 || be32(b, 0) < 8 || fourCC(b, 4) != "ftyp") return None
    var brand: String = null
    var timescale = 0L; var duration = 0L
    var width = 0; var height = 0
    boxes(b, 0, b.length) { (typ, d, end) =>
      typ match {
        case "ftyp" if end - d >= 4 => brand = fourCC(b, d).trim
        case "moov" =>
          boxes(b, d, end) { (t2, d2, end2) =>
            t2 match {
              case "mvhd" if end2 - d2 >= 20 =>
                val v = u8(b, d2)
                if (v == 1 && end2 - d2 >= 32) {
                  timescale = be32(b, d2 + 20); duration = be64(b, d2 + 24)
                } else if (v == 0) {
                  timescale = be32(b, d2 + 12); duration = be32(b, d2 + 16)
                }
              case "trak" =>
                boxes(b, d2, end2) { (t3, d3, end3) =>
                  if (t3 == "tkhd") {
                    val v = u8(b, d3)
                    val off = if (v == 1) 88 else 76 // 16.16 fixed-point dims
                    if (end3 - d3 >= off + 8) {
                      val w = (be32(b, d3 + off) >> 16).toInt
                      val h = (be32(b, d3 + off + 4) >> 16).toInt
                      if (w > 0 && h > 0) { width = math.max(width, w); height = math.max(height, h) }
                    }
                  }
                }
              case _ =>
            }
          }
        case _ =>
      }
    }
    if (brand == null) None
    else {
      // a hostile 64-bit mvhd duration > Long.MaxValue/1000 would wrap
      // `duration * 1000L` negative — treat it as absent rather than
      // poisoning downstream duration aggregates with garbage
      val durMs =
        if (timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000L)
          duration * 1000L / timescale
        else 0L
      val kind = if (width > 0) "video" else "audio"
      Some(AvMeta(if (brand.isEmpty) "mp4" else "mp4/" + brand, kind,
        0, 0, 0, durMs, width, height))
    }
  }
}
