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
    val hdrCs =
      CsRe.findFirstMatchIn(hdr).map(_.group(1).toLowerCase).getOrElse("")
    val cs = if (hdrCs.nonEmpty) hdrCs else {
      // bounded prescan of the body head, ISO-8859-1 (every byte maps to
      // a char, so the scan itself can never throw or lose ASCII markup)
      val head = new String(body, split + 4,
        math.min(MetaSniffBytes, n - split - 4),
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
    val text = new String(body, split + 4, n - split - 4, decoder)
    (status, ct, cs, text)
  }

  // the same patterns the column splitters compile, precompiled once per
  // JVM for the byte path
  private val StatusRe = "^HTTP/[0-9.]+ ([0-9]{3})".r
  private val CtRe = "(?im)^content-type:\\s*([^;\r\n]+)".r
  private val CsRe =
    "(?im)^content-type:[^\r\n]*charset=\"?([A-Za-z0-9_+.:-]+)\"?".r

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
