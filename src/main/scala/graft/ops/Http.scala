package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP response payload splitting — the layer between WARC ingestion
  * and text processing that a real CommonCrawl reader cannot skip: a
  * WARC `response` record's block is the FULL captured HTTP response
  * (status line + headers + CRLFCRLF + entity body), so feeding record
  * bodies straight into text ops would prepend every document with its
  * HTTP headers. These are pure codegen'd regexp/CASE column chains
  * (the [[WebText]] discipline: Java-regex∩RE2 subset — `(?is)`/`(?im)`
  * flags, non-greedy spans, no backreferences, no lookaround — so the
  * DuckDB oracles run the LITERAL same transforms), zero shuffle,
  * scan-stage compute at any corpus size. */
object Http {

  /** The header block of an HTTP response payload (status line included,
    * terminating blank line excluded); empty string when the payload has
    * no CRLFCRLF split or no HTTP status line. */
  private def headerBlock(p: Column): Column =
    when(p.rlike("^HTTP/[0-9.]+ [0-9]{3}"),
      regexp_extract(p, "(?s)^(.*?)\r\n\r\n", 1)).otherwise(lit(""))

  /** Status code of the response (`200`, `404`, …), null when the
    * payload does not start with an HTTP status line. */
  def statusCode(p: Column): Column = {
    val s = regexp_extract(p, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    when(s === "", lit(null).cast("int")).otherwise(s.cast("int"))
  }

  /** Lowercased media type of the `Content-Type` header (parameters
    * stripped), empty when absent. `(?im)` anchors each header line. */
  def contentType(p: Column): Column =
    lower(trim(regexp_extract(headerBlock(p),
      "(?im)^content-type:\\s*([^;\r\n]+)", 1)))

  /** Lowercased `charset=` parameter of the Content-Type header, empty
    * when absent — the signal that routes a body to the right decoder
    * before [[TextAnalysis.encodingSignals]] audits the result. */
  def charset(p: Column): Column =
    lower(regexp_extract(headerBlock(p),
      "(?im)^content-type:[^\r\n]*charset=\"?([A-Za-z0-9_+.:-]+)\"?", 1))

  /** The `Location` header value (redirect target of a 3xx response),
    * empty when absent — the edge of the redirect graph
    * [[WebText.resolveRedirects]] walks. */
  def location(p: Column): Column =
    trim(regexp_extract(headerBlock(p), "(?im)^location:\\s*([^\r\n]+)", 1))

  /** The `ETag` header value (quotes and any weak `W/` prefix kept —
    * `If-None-Match` echoes the tag verbatim), empty when absent — the
    * strong validator [[WebText.revalidationPlan]] prefers. */
  def etag(p: Column): Column =
    trim(regexp_extract(headerBlock(p), "(?im)^etag:\\s*([^\r\n]+)", 1))

  /** The `Last-Modified` header value (HTTP-date, verbatim for
    * `If-Modified-Since`), empty when absent. */
  def lastModified(p: Column): Column =
    trim(regexp_extract(headerBlock(p),
      "(?im)^last-modified:\\s*([^\r\n]+)", 1))

  /** Lowercased `Content-Encoding` header value, empty when absent —
    * the representation-layer coding [[splitResponseBytes]] reverses
    * (gzip/deflate) before charset decode; exposed here so a corpus
    * audit can count what share of captures still carries an encoding
    * the byte path had to undo (or an unsupported one it passed
    * through). */
  def contentEncoding(p: Column): Column =
    lower(trim(regexp_extract(headerBlock(p),
      "(?im)^content-encoding:\\s*([^\r\n]+)", 1)))

  /** Lowercased `Transfer-Encoding` header value, empty when absent
    * (the transfer-layer framing — `chunked` — that
    * [[splitResponseBytes]] strips FIRST, per RFC 9112 §6.1 layering:
    * transfer coding wraps the content coding on the wire). */
  def transferEncoding(p: Column): Column =
    lower(trim(regexp_extract(headerBlock(p),
      "(?im)^transfer-encoding:\\s*([^\r\n]+)", 1)))

  /** ALL `X-Robots-Tag` header values of the response, in header
    * order, trimmed and verbatim otherwise (a response may carry the
    * header several times — each is an independent rule line). This is
    * the HTTP-layer sibling of the `<meta name=robots>` tag and the
    * ONLY robots channel a non-HTML resource (PDF, image, feed) has;
    * [[WebText.headerRobotsSignals]] parses the agent-scoped grammar.
    * Empty array when absent. */
  def xRobotsTags(p: Column): Column =
    transform(regexp_extract_all(headerBlock(p),
      lit("(?im)^x-robots-tag:\\s*([^\r\n]+)"), lit(1)), v => trim(v))

  /** The `Retry-After` header value verbatim (RFC 9110 §10.2.3 — a
    * 429/503's explicit back-off demand), empty when absent. Both
    * legal forms pass through: delta-seconds and HTTP-date
    * ([[retryAfterMs]] converts the numeric form). */
  def retryAfter(p: Column): Column =
    trim(regexp_extract(headerBlock(p), "(?im)^retry-after:\\s*([^\r\n]+)", 1))

  /** `Retry-After` as a delay in ms: the delta-seconds form × 1000,
    * null for the HTTP-date form (converting it needs a reference
    * clock — the caller subtracts its own fetch timestamp) and for
    * absent/malformed values. A scheduler treats null as
    * no-explicit-demand and falls back to its error-rate backoff
    * ([[graft.ops.Robots.backoffSchedule]]). */
  def retryAfterMs(p: Column): Column = {
    val v = retryAfter(p)
    when(v.rlike("^[0-9]{1,9}$"), v.cast("long") * 1000L)
      .otherwise(lit(null).cast("long"))
  }

  /** The entity body: everything past the first CRLFCRLF when the
    * payload carries an HTTP status line, the whole payload otherwise
    * (a WARC `resource` record or a pre-split corpus passes through
    * unharmed). Header blocks are ASCII so the character-based substr
    * agrees with the byte cursor in both engines. */
  def body(p: Column): Column = {
    val hdr = headerBlock(p)
    when(hdr === "", p).otherwise(p.substr(length(hdr) + 5, length(p)))
  }

  /** Byte-level sibling of the column splitters, for callers that hold
    * the RAW response octets (the WARC record block): finds the
    * CRLFCRLF header/body split in BYTES, reads status / media type /
    * charset from the ASCII header block, and decodes the body with the
    * DECLARED charset — the step the column path cannot do, because a
    * payload that was eagerly UTF-8-decoded has already corrupted any
    * latin-1/windows bytes. When the Content-Type header carries NO
    * charset parameter, the first [[MetaSniffBytes]] body bytes are
    * scanned (ASCII-superset decode) for the HTML-level declaration —
    * `<meta charset=…>` or `http-equiv="Content-Type"` in either
    * attribute order — the way real pages overwhelmingly declare their
    * encoding (the WHATWG prescan, bounded); the sniffed token is
    * reported in `charset` for auditing. Unknown or unsupported charset
    * names fall back to UTF-8 (the reported `charset` keeps the raw
    * lowercased token); malformed byte sequences decode to U+FFFD
    * replacement chars (the java.lang.String REPLACE policy —
    * deterministic, and exactly what `TextAnalysis.encodingSignals`
    * audits downstream). Degenerate cases mirror [[splitResponse]]:
    * no status line ⇒ whole payload is the body (UTF-8); status line
    * but no blank line ⇒ header-less pass-through.
    *
    * @return (status_code or null, content_type, charset, text) */
  private[graft] def splitResponseBytes(
      body: Array[Byte]): (Integer, String, String, String) = {
    val n = body.length
    def utf8(b: Array[Byte]) = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    val prefix = new String(body, 0, math.min(n, 64),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val sm = StatusRe.findFirstMatchIn(prefix)
    if (sm.isEmpty) return (null, "", "", utf8(body))
    val status: Integer = sm.get.group(1).toInt
    var i = 0; var split = -1
    while (i + 3 < n && split < 0) {
      if (body(i) == '\r' && body(i + 1) == '\n' &&
        body(i + 2) == '\r' && body(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (status, "", "", utf8(body))
    val hdr = new String(body, 0, split,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val ct = CtRe.findFirstMatchIn(hdr).map(_.group(1).trim.toLowerCase)
      .getOrElse("")
    // layered entity decode (RFC 9112 §6.1): the TRANSFER coding wraps
    // the CONTENT coding on the wire, so chunked framing is stripped
    // first, then gzip/deflate reversed — only THEN is the charset
    // sniff/decode meaningful (a meta-charset prescan over compressed
    // octets reads noise). Each layer that fails to parse falls back to
    // its input bytes (deterministic, lossless — the capture may have
    // been pre-decoded by the crawler, which is exactly what a raw
    // fallback handles); an UNSUPPORTED content coding (br, zstd — not
    // in the JDK) passes through raw for the same reason, and
    // [[contentEncoding]] lets an audit count those rows. (buf, off,
    // len) threading keeps the common no-coding path copy-free.
    val te = TeRe.findFirstMatchIn(hdr).map(_.group(1).trim.toLowerCase)
      .getOrElse("")
    val ce = CeRe.findFirstMatchIn(hdr).map(_.group(1).trim.toLowerCase)
      .getOrElse("")
    var buf = body; var off = split + 4; var len = n - split - 4
    if (te.contains("chunked")) dechunk(buf, off, len).foreach { d =>
      buf = d; off = 0; len = d.length
    }
    if (ce == "gzip" || ce == "x-gzip") gunzipAll(buf, off, len).foreach { d =>
      buf = d; off = 0; len = d.length
    } else if (ce == "deflate") inflateZlib(buf, off, len).foreach { d =>
      buf = d; off = 0; len = d.length
    }
    // WHATWG byte-order-mark sniff on the DECODED entity's first bytes
    // — a BOM outranks BOTH the header declaration and the meta
    // prescan (the page's own leading bytes are the strongest
    // evidence; real captures carry stale/wrong header charsets over
    // BOM'd bodies constantly), and the BOM bytes are CONSUMED so a
    // U+FEFF never leaks into the decoded text head, where it would
    // pollute tokens, dedup keys, and sentence boundaries. Also the
    // only way a UTF-16 page decodes at all: a meta prescan over
    // UTF-16 octets reads interleaved NULs, never a charset token.
    val (bomCs, bomSkip) =
      if (len >= 3 && buf(off) == 0xEF.toByte &&
          buf(off + 1) == 0xBB.toByte && buf(off + 2) == 0xBF.toByte)
        ("utf-8", 3)
      else if (len >= 2 && buf(off) == 0xFE.toByte &&
          buf(off + 1) == 0xFF.toByte) ("utf-16be", 2)
      else if (len >= 2 && buf(off) == 0xFF.toByte &&
          buf(off + 1) == 0xFE.toByte) ("utf-16le", 2)
      else ("", 0)
    val hdrCs =
      CsRe.findFirstMatchIn(hdr).map(_.group(1).toLowerCase).getOrElse("")
    val cs = if (bomCs.nonEmpty) bomCs
    else if (hdrCs.nonEmpty) hdrCs
    else {
      // bounded prescan of the body head, ISO-8859-1 (every byte maps to
      // a char, so the scan itself can never throw or lose ASCII markup)
      val head = new String(buf, off, math.min(MetaSniffBytes, len),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      MetaCsRes.iterator
        .flatMap(_.findFirstMatchIn(head))
        .map(_.group(1).toLowerCase)
        .nextOption().getOrElse("")
    }
    val decoder =
      if (cs.isEmpty) java.nio.charset.StandardCharsets.UTF_8
      else
        try java.nio.charset.Charset.forName(cs)
        catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    val text = new String(buf, off + bomSkip, len - bomSkip, decoder)
    (status, ct, cs, text)
  }

  /** RFC 9112 §7.1 chunked-framing removal: `hex-size[;ext]CRLF data
    * CRLF` repeated, terminated by a zero-size chunk (trailers
    * ignored). Returns None — caller keeps the raw bytes — on any
    * framing violation (bad hex, chunk running past the buffer,
    * missing CRLF), so a capture whose framing was already stripped by
    * the crawler round-trips unharmed. */
  private def dechunk(b: Array[Byte], off: Int,
                      len: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(len)
    var i = off
    val end = off + len
    while (true) {
      var j = i
      while (j + 1 < end && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      if (j + 1 >= end) return None
      val line = new String(b, i, j - i,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val hexStr = line.takeWhile(_ != ';').trim
      val size =
        try java.lang.Long.parseLong(hexStr, 16)
        catch { case _: Exception => return None }
      if (size < 0 || size > len) return None
      i = j + 2
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (i + size > end) return None
      out.write(b, i, size.toInt)
      i += size.toInt
      if (i + 1 >= end || b(i) != '\r' || b(i + 1) != '\n') return None
      i += 2
    }
    None
  }

  /** `Content-Encoding: gzip` removal — the full RFC 1952 member walk
    * ([[Warc.inflateMember]]: header flags, bomb clamp, truncation
    * checks), looped over back-to-back members (multi-member gzip
    * entities are legal). None on a corrupt/truncated stream. The
    * CUMULATIVE output is clamped to [[Warc.MaxInflatedMember]] like
    * [[inflateZlib]]'s total — each member is individually clamped
    * inside inflateMember, but a crafted entity of many small members
    * could otherwise accumulate past the bomb budget. */
  private def gunzipAll(b: Array[Byte], off: Int,
                        len: Int): Option[Array[Byte]] = {
    val slice =
      if (off == 0 && len == b.length) b
      else java.util.Arrays.copyOfRange(b, off, off + len)
    val out = new java.io.ByteArrayOutputStream(len * 2 + 64)
    var pos = 0
    while (pos < slice.length) {
      Warc.inflateMember(slice, pos) match {
        case Some((data, endPos)) =>
          out.write(data, 0, data.length); pos = endPos
          if (out.size() > Warc.MaxInflatedMember) return None
        case None => return None
      }
    }
    Some(out.toByteArray)
  }

  /** `Content-Encoding: deflate` removal: zlib-wrapped first (the
    * spec's meaning), raw-deflate retry on failure (the historical
    * server bug every browser tolerates). None when neither parses. */
  private def inflateZlib(b: Array[Byte], off: Int,
                          len: Int): Option[Array[Byte]] = {
    def tryInflate(raw: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(b, off, len)
        val out = new java.io.ByteArrayOutputStream(len * 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!inf.finished()) {
          val k =
            try inf.inflate(tmp)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (k == 0 && !inf.finished()) return None // truncated
          out.write(tmp, 0, k)
          if (out.size() > Warc.MaxInflatedMember) return None
        }
        Some(out.toByteArray)
      } finally inf.end()
    }
    tryInflate(raw = false).orElse(tryInflate(raw = true))
  }

  // the same patterns the column splitters compile, precompiled once per
  // JVM for the byte path
  private val StatusRe = "^HTTP/[0-9.]+ ([0-9]{3})".r
  private val CtRe = "(?im)^content-type:\\s*([^;\r\n]+)".r
  private val CsRe =
    "(?im)^content-type:[^\r\n]*charset=\"?([A-Za-z0-9_+.:-]+)\"?".r
  private val TeRe = "(?im)^transfer-encoding:\\s*([^\r\n]+)".r
  private val CeRe = "(?im)^content-encoding:\\s*([^\r\n]+)".r

  /** Prescan window for the HTML meta-charset fallback: the WHATWG
    * prescan convention (declarations are required to sit in the first
    * 1024 bytes of the document). */
  private[graft] val MetaSniffBytes = 1024

  /** The three HTML charset-declaration shapes, tried in order: the
    * HTML5 `<meta charset=…>` (charset as the attribute NAME — anchored
    * right after `<meta`, so a `charset=` inside some other attribute's
    * VALUE can never match), then the legacy `http-equiv` form in both
    * attribute orders (the `charset=` must sit inside the `content`
    * attribute of a tag that really says http-equiv). */
  private val MetaCsRes = Seq(
    "(?is)<meta\\s+charset\\s*=\\s*[\"']?([A-Za-z0-9_+.:-]+)".r,
    ("(?is)<meta\\s[^>]*?http-equiv\\s*=\\s*[\"']?content-type[\"']?" +
      "[^>]*?content\\s*=\\s*[\"'][^\"'>]*?charset=([A-Za-z0-9_+.:-]+)").r,
    ("(?is)<meta\\s[^>]*?content\\s*=\\s*[\"'][^\"'>]*?" +
      "charset=([A-Za-z0-9_+.:-]+)[^>]*?" +
      "http-equiv\\s*=\\s*[\"']?content-type").r)

  /** One-call projection: `(status_code, content_type, charset, body,
    * is_http)` appended to `df` from the payload in `payloadCol`. */
  def splitResponse(df: org.apache.spark.sql.DataFrame,
                    payloadCol: String): org.apache.spark.sql.DataFrame = {
    val p = col(payloadCol)
    df.withColumn("status_code", statusCode(p))
      .withColumn("content_type", contentType(p))
      .withColumn("charset", charset(p))
      .withColumn("is_http", p.rlike("^HTTP/[0-9.]+ [0-9]{3}"))
      .withColumn("body", body(p))
  }
}
