package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Blake2b, GraftFunctions}

/** BLAKE2b / SHA3-512 parity with the reference's hash helpers
  * (`/root/reference/src/catenae/utils.py:42-61`), pinned against
  * precomputed Python `hashlib` vectors. */
class HashingSpec extends AnyFunSuite {

  // Vectors precomputed with CPython hashlib:
  //   blake2b(s, digest_size=32/64).hexdigest(), sha3_512(s).hexdigest()
  private val vectors256 = Seq(
    "" -> "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8",
    "abc" -> "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319",
    "hello world" -> "256c83b297114d201b30179f3f0ef0cace9783622da5974326b436178aeef610",
    "The quick brown fox jumps over the lazy dog" ->
      "01718cec35cd3d796dd00020e0bfecb473ad23457d063b75eff29c0ffa2e58a9",
    "unicode é中文" -> "cae470acbe3f829278a27b1db72b986ffca0f23c9267ab94c644f1b1e1a0fd5c",
    "x" * 300 -> "5aa7fbbf37986bb2a5d547c0d3c4d4326a24d786e7d57bf93fc784176e38b33d")

  private val vectors512 = Seq(
    "" -> ("786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
      "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce"),
    "abc" -> ("ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"),
    "x" * 300 -> ("fe42f4108dd98f9b4f19fb21f386dfbe9a860256176e0312a1f0de66a3aed2a5" +
      "ed361a16f6128fe27b6c88d8f39eeaddca46f1c2c9357965f893d0a7d64bd1cb"))

  test("blake2b-256 matches hashlib vectors") {
    vectors256.foreach { case (in, hex) => assert(Blake2b.hex256(in) === hex, in) }
  }

  test("blake2b-512 matches hashlib vectors") {
    vectors512.foreach { case (in, hex) => assert(Blake2b.hex512(in) === hex, in) }
  }

  test("sha3-512 (JDK provider) matches hashlib vector") {
    val md = java.security.MessageDigest.getInstance("SHA3-512")
    val got = Blake2b.toHex(md.digest("abc".getBytes("UTF-8")))
    assert(got === "b751850b1a57168a5693cd924b6b096e08f621827444f70d884f5d0240d2712e" +
      "10e116e9192af3c91a7ec57647e3934057340b4cf408d5a56592f8274eec53f0")
  }

  test("hex digests have stable length and are deterministic (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(400))
      val h1 = Blake2b.hex256(s); val h2 = Blake2b.hex256(s)
      assert(h1.length === 64 && h1 === h2)
      assert(Blake2b.hex512(s).length === 128)
      assert(h1.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
    }
  }

  test("multi-block boundary cases (127/128/129/256/257 bytes)") {
    // cross-checked sizes around the 128-byte block boundary: digest must
    // differ for different inputs and be length-stable
    val sizes = Seq(0, 1, 127, 128, 129, 255, 256, 257)
    val digests = sizes.map(n => Blake2b.hex256("a" * n))
    assert(digests.distinct.size === sizes.size)
  }

  test("uid: 12 lowercase hex chars, unique-ish") {
    val uids = (1 to 100).map(_ => GraftFunctions.getUid())
    assert(uids.forall(u => u.length == 12 && u.forall(c => "0123456789abcdef".contains(c))))
    assert(uids.distinct.size === 100)
  }
}
