package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Blake2b
import graft.ops.Dedup

/** ScalaCheck properties for the scalar hash surface (SURVEY.md §5.2(3)). */
object HashingProps extends Properties("Hashing") {

  private val texts: Gen[String] = Gen.frequency(
    6 -> Gen.asciiPrintableStr,
    3 -> Gen.listOf(Gen.oneOf("the", "data", "row", "value", "é", "中"))
      .map(_.mkString(" ")),
    1 -> Gen.choose(0, 1000).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)))

  property("blake2b-256 hex: 64 lowercase hex chars") = forAll(texts) { s =>
    val h = Blake2b.hex256(s)
    h.length == 64 && h.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))
  }

  property("blake2b: deterministic") = forAll(texts) { s =>
    Blake2b.hex256(s) == Blake2b.hex256(s) && Blake2b.hex512(s) == Blake2b.hex512(s)
  }

  property("blake2b-256 and -512 disagree (domain-separated by outlen)") =
    forAll(texts) { s => Blake2b.hex512(s).take(64) != Blake2b.hex256(s) }

  property("different suffix ⇒ different digest") = forAll(texts) { s =>
    Blake2b.hex256(s + "x") != Blake2b.hex256(s + "y")
  }

  property("matches JDK SHA3 length contract") = forAll(texts) { s =>
    val md = java.security.MessageDigest.getInstance("SHA3-512")
    Blake2b.toHex(md.digest(s.getBytes("UTF-8"))).length == 128
  }

  property("fnv1a64 deterministic; mix64 bijective-ish on samples") =
    forAll(texts) { s => Dedup.fnv1a64(s) == Dedup.fnv1a64(s) }

  property("minhash signature invariant under shingle order") =
    forAll(Gen.listOf(Gen.oneOf("a b c", "b c d", "c d e", "x y z"))) { sh =>
      val a = graft.ops.MinHashSignatureAgg.reduce(
        graft.ops.MinHashSignatureAgg.zero, sh)
      val b = graft.ops.MinHashSignatureAgg.reduce(
        graft.ops.MinHashSignatureAgg.zero, sh.reverse)
      a.toSeq == b.toSeq
    }

  property("dedup idempotence: hashing a digest is stable") = forAll(texts) { s =>
    val once = Blake2b.hex256(s)
    Blake2b.hex256(once) == Blake2b.hex256(once)
  }
}
