package graft.functions

/** Pure-Scala BLAKE2b (RFC 7693), unkeyed, arbitrary digest length.
  *
  * The reference engine uses blake2b-256 hex digests as its canonical
  * content address (see reference `src/catenae/utils.py:42-49` — the
  * `blake2b_256` / `blake2b_512` helpers — and `utils.py:60-61` where the
  * node uid is `blake2b_256(uuid4)[:12]`). The JDK has no BLAKE2 provider
  * and the offline jar set excludes BouncyCastle, so this is a from-spec
  * implementation validated against precomputed Python `hashlib` vectors
  * in `HashingSpec`.
  *
  * Thread-safe: all state is local to `hash`.
  */
object Blake2b {
  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      val o = off + i * 8
      m(i) = (block(o) & 0xffL) |
        ((block(o + 1) & 0xffL) << 8) |
        ((block(o + 2) & 0xffL) << 16) |
        ((block(o + 3) & 0xffL) << 24) |
        ((block(o + 4) & 0xffL) << 32) |
        ((block(o + 5) & 0xffL) << 40) |
        ((block(o + 6) & 0xffL) << 48) |
        ((block(o + 7) & 0xffL) << 56)
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // message length fits a Long; high word stays 0
    if (last) v(14) = ~v(14)

    @inline def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x
      v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 63)
    }

    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Digest of `input`, `outLen` bytes (1..64). */
  def hash(input: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64, s"digest size $outLen out of range")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong
    val n = input.length
    // All full blocks except the last (the final block, full or partial,
    // is always compressed with the finalization flag).
    var off = 0
    while (n - off > 128) {
      compress(h, input, off, (off + 128).toLong, last = false)
      off += 128
    }
    val lastBlock = new Array[Byte](128)
    System.arraycopy(input, off, lastBlock, 0, n - off)
    compress(h, lastBlock, 0, n.toLong, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private val HEX = "0123456789abcdef".toCharArray
  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(HEX(b >>> 4)).append(HEX(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Hex digest of raw bytes — codegen entry point for [[Blake2bHash]]. */
  def hexOfBytes(bytes: Array[Byte], outLen: Int): String =
    toHex(hash(bytes, outLen))

  def hex256(s: String): String =
    toHex(hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 32))
  def hex512(s: String): String =
    toHex(hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 64))
}
