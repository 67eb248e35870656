package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record: envelope headers + body digest/length.
  * `valid = false` rows carry the failure mode in `warc_type`
  * (`"truncated"` / `"malformed"`) so corrupt crawl chunks surface as
  * data, not exceptions. */
case class WarcRecord(chunk_id: Long, rec_idx: Long, warc_type: String,
                      target_uri: String, content_type: String,
                      content_length: Long, body_md5: String,
                      valid: Boolean)

/** WARC (ISO 28500) crawl-archive ingestion — the container format
  * CommonCrawl-class corpora arrive in. A WARC file is a concatenation
  * of records, each `WARC/1.x\r\n` + header lines + CRLFCRLF + exactly
  * `Content-Length` body bytes + CRLFCRLF. The parser walks that grammar
  * with a hostile-input-hardened cursor (the `AvHeaders` discipline:
  * lengths are clamped against the remaining buffer, a bad record
  * surfaces as an `valid = false` row and parsing resynchronizes at the
  * next record boundary rather than throwing).
  *
  * Scale shape: `mapPartitions` over (chunk_id, payload) — one parser
  * per partition, O(bytes) per chunk, no shuffle; at 100 TB the chunks
  * are the crawl's own ~1 GB WARC segments and parallelism is the
  * file-split count. Parsing emits envelope metadata + the body's md5
  * (8-byte-class columns), so everything downstream (dedup, URL
  * canonicalization, quality gates) joins on small keys — raw bodies
  * stay in the scan stage. */
object Warc {

  private val Crlf = "\r\n"

  /** Deterministic WARC response-record synthesis from the `documents`
    * fixture — the [[Multimodal.syntheticImagePayloads]] idiom: the spec
    * and the DuckDB oracle can RECONSTRUCT every parsed field from the
    * source row (uri from doc_id, content_length from the text, body md5
    * from the text), so the parser gets a full value oracle without any
    * binary fixture on disk. `groupSize` docs concatenate into one chunk
    * payload to exercise multi-record cursor walking. */
  def syntheticWarcChunks(docs: DataFrame, groupSize: Int = 8): DataFrame = {
    require(groupSize >= 1, s"groupSize >= 1, got $groupSize")
    val rec = concat(
      lit("WARC/1.0" + Crlf),
      lit("WARC-Type: response" + Crlf),
      lit("WARC-Target-URI: http://example.com/doc/"), col("doc_id"), lit(Crlf),
      lit("Content-Type: text/plain" + Crlf),
      // BYTE length (Content-Length is octets): length() on a string
      // counts characters, which desyncs the cursor on non-ASCII text
      lit("Content-Length: "), length(encode(col("text"), "UTF-8"))
        .cast("string"), lit(Crlf),
      lit(Crlf), col("text"), lit(Crlf + Crlf))
    docs.select((col("doc_id") / groupSize).cast("long").as("chunk_id"),
        col("doc_id"), rec.as("rec"))
      .groupBy("chunk_id")
      // deterministic record order inside the chunk: sort by doc_id
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("doc_id"), col("rec")))),
        s => s.getField("rec")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
  }

  /** Parse every record out of each chunk payload. */
  def parseWarc(spark: SparkSession, chunks: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    Spread.cpu(chunks)
      .select(col("chunk_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseChunk(id, bytes) })
  }

  /** Cursor walk over one chunk. Package-visible for direct spec use. */
  private[graft] def parseChunk(chunkId: Long,
                                bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0L
    val n = bytes.length
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    while (pos < n) {
      // resynchronize: skip inter-record padding to the next "WARC/"
      while (pos < n && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= n) return out.result()
      val le = lineEnd(pos)
      val version =
        if (le < 0) "" else new String(bytes, pos, le - pos, StandardCharsets.UTF_8)
      if (!version.startsWith("WARC/")) {
        out += WarcRecord(chunkId, idx, "malformed", "", "", -1L, "", false)
        return out.result() // no record boundary left to trust
      }
      pos = le + 2
      // headers until the blank line
      var wtype = ""; var uri = ""; var ctype = ""; var clen = -1L
      var truncated = false
      var headersDone = false
      while (!headersDone && !truncated) {
        val he = lineEnd(pos)
        if (he < 0) truncated = true
        else if (he == pos) { headersDone = true; pos += 2 } // CRLFCRLF
        else {
          val line = new String(bytes, pos, he - pos, StandardCharsets.UTF_8)
          val ci = line.indexOf(':')
          if (ci > 0) {
            val k = line.substring(0, ci).trim.toLowerCase
            val v = line.substring(ci + 1).trim
            k match {
              case "warc-type"       => wtype = v
              case "warc-target-uri" => uri = v
              case "content-type"    => ctype = v
              case "content-length"  =>
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          pos = he + 2
        }
      }
      // body: exactly clen bytes, clamped against the remaining buffer
      if (truncated || clen < 0 || clen > (n - pos).toLong) {
        out += WarcRecord(chunkId, idx, if (truncated) "truncated" else "malformed",
          uri, ctype, clen, "", false)
        return out.result() // cannot trust the cursor past a bad length
      }
      val md5hex = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(java.util.Arrays.copyOfRange(bytes, pos, pos + clen.toInt))
          .map("%02x".format(_)).mkString
      }
      out += WarcRecord(chunkId, idx, wtype, uri, ctype, clen, md5hex, true)
      pos += clen.toInt
      idx += 1
    }
    out.result()
  }
}
