package graft

import org.apache.spark.sql.functions._
import graft.ops.Warc

/** WARC cursor hardening + synthesis round-trip. */
class WarcSpec extends SparkSpec {

  private def rec(uri: String, body: String,
                  lenOverride: Option[String] = None): String = {
    val len = lenOverride.getOrElse(
      body.getBytes("UTF-8").length.toString)
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Type: text/plain\r\nContent-Length: $len\r\n\r\n" +
      body + "\r\n\r\n"
  }

  test("multi-record chunk parses in order; multi-byte bodies keep sync") {
    val bytes = (rec("u/1", "plain body") + rec("u/2", "héllo wörld ünïcode") +
      rec("u/3", "after multibyte")).getBytes("UTF-8")
    val got = Warc.parseChunk(7L, bytes)
    assert(got.map(_.target_uri) === Seq("u/1", "u/2", "u/3"))
    assert(got.forall(_.valid))
    assert(got(1).content_length ===
      "héllo wörld ünïcode".getBytes("UTF-8").length.toLong)
    assert(got.map(_.rec_idx) === Seq(0L, 1L, 2L))
  }

  test("hostile inputs: truncated header, oversized length, garbage " +
    "version — each surfaces as an invalid row, never throws") {
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Tar".getBytes("UTF-8")
    val t = Warc.parseChunk(1L, truncated)
    assert(t.size === 1 && !t.head.valid && t.head.warc_type === "truncated")

    val oversized = rec("u/x", "tiny", lenOverride = Some("999999")).getBytes("UTF-8")
    val o = Warc.parseChunk(2L, oversized)
    assert(o.size === 1 && !o.head.valid && o.head.warc_type === "malformed")
    assert(o.head.content_length === 999999L)

    val negative = rec("u/y", "tiny", lenOverride = Some("-5")).getBytes("UTF-8")
    val neg = Warc.parseChunk(4L, negative)
    assert(neg.size === 1 && !neg.head.valid)

    val garbage = "HTTP/1.1 200 OK\r\n\r\nnot a warc".getBytes("UTF-8")
    val g = Warc.parseChunk(3L, garbage)
    assert(g.size === 1 && !g.head.valid && g.head.warc_type === "malformed")

    assert(Warc.parseChunk(5L, Array.emptyByteArray).isEmpty)
  }

  test("good records before a bad one survive; parse stops at the bad length") {
    val bytes = (rec("u/ok", "good body") +
      rec("u/bad", "x", lenOverride = Some("12345"))).getBytes("UTF-8")
    val got = Warc.parseChunk(9L, bytes)
    assert(got.size === 2)
    assert(got.head.valid && got.head.target_uri === "u/ok")
    assert(!got(1).valid)
  }

  test("synthesis round-trip on the fixture — every field reconstructed") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text").limit(40)
    val parsed = Warc.parseWarc(spark, Warc.syntheticWarcChunks(docs)).toDF()
    val expected = docs.select(
      concat(lit("http://example.com/doc/"), col("doc_id")).as("target_uri"),
      length(encode(col("text"), "UTF-8")).cast("long").as("content_length"),
      md5(col("text")).as("body_md5"))
    assert(parsed.filter(!col("valid")).count() === 0)
    val joined = parsed.join(expected, Seq("target_uri", "content_length",
      "body_md5"))
    assert(joined.count() === docs.count())
  }
}
