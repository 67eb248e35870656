package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record: envelope headers + body digest/length.
  * `valid = false` rows carry the failure mode in `warc_type`
  * (`"truncated"` / `"malformed"`) so corrupt crawl chunks surface as
  * data, not exceptions. */
case class WarcRecord(chunk_id: Long, rec_idx: Long, warc_type: String,
                      target_uri: String, content_type: String,
                      content_length: Long, body_md5: String,
                      valid: Boolean, truncated_reason: String)

/** [[WarcRecord]] with the decoded body carried as text instead of its
  * md5 — the shape the downstream curation surface (quality gates,
  * dedup, URL canonicalization) consumes directly. Emitted only by
  * [[Warc.parseWarcText]]; the md5-only [[Warc.parseWarc]] stays the
  * metadata path whose shuffle keys are 8-byte-class columns. */
case class WarcDoc(chunk_id: Long, rec_idx: Long, warc_type: String,
                   target_uri: String, content_type: String,
                   content_length: Long, body: String, valid: Boolean)

/** A fully decoded crawl document: WARC envelope + the HTTP layer a
  * `response` record's block actually carries (status, media type,
  * declared charset) + the body TEXT decoded with that charset.
  * Emitted by [[Warc.parseWarcHttpDocs]] — the end of the bytes→text
  * path; everything downstream is string-typed curation. */
case class WarcHttpDoc(chunk_id: Long, rec_idx: Long, target_uri: String,
                       status_code: Integer, content_type: String,
                       charset: String, text: String, valid: Boolean)

/** WARC (ISO 28500) crawl-archive ingestion — the container format
  * CommonCrawl-class corpora arrive in. A WARC file is a concatenation
  * of records, each `WARC/1.x\r\n` + header lines + CRLFCRLF + exactly
  * `Content-Length` body bytes + CRLFCRLF. Real crawl segments ship as
  * `.warc.gz` with ONE gzip member per record (the CommonCrawl layout —
  * members are independently decompressible so readers can seek);
  * `parseChunk` sniffs the gzip magic on the chunk's first bytes and
  * inflates member-by-member before the cursor walk, so both plain and
  * gzip'd chunks parse through one grammar. The cursor is
  * hostile-input-hardened (the `AvHeaders` discipline: lengths are
  * clamped against the remaining buffer, inflated member size is
  * clamped against decompression bombs, a bad record or member surfaces
  * as a `valid = false` row and parsing resynchronizes at the next
  * trustable boundary rather than throwing).
  *
  * Scale shape: `mapPartitions` over (chunk_id, payload) — one parser
  * per partition, O(bytes) per chunk, no shuffle; at 100 TB the chunks
  * are the crawl's own ~1 GB WARC segments and parallelism is the
  * file-split count. Parsing emits envelope metadata + the body's md5
  * (8-byte-class columns), so everything downstream (dedup, URL
  * canonicalization, quality gates) joins on small keys — raw bodies
  * stay in the scan stage ([[parseWarcText]] opts into carrying the
  * decoded body when the NEXT stage is the text pipeline itself). */
object Warc {

  private val Crlf = "\r\n"

  /** Decompression-bomb clamp: one gzip member may inflate to at most
    * this many bytes (a real WARC record is a page — MBs, not GBs). A
    * member that exceeds it is reported as a malformed row, never
    * materialized. */
  private[ops] val MaxInflatedMember: Int = 256 << 20

  /** Default synthetic target URI: reconstructable from doc_id alone. */
  def defaultUri: Column = concat(lit("http://example.com/doc/"), col("doc_id"))

  /** The shared record-synthesis expression of [[syntheticWarcChunks]] /
    * [[syntheticWarcGzipChunks]]: one WARC response record per doc, every
    * envelope field reconstructable from the source row (uri from
    * `uri` — doc_id by default, Content-Length as UTF-8 octets,
    * body = text). */
  private def recordExpr(uri: Column): Column = concat(
    lit("WARC/1.0" + Crlf),
    lit("WARC-Type: response" + Crlf),
    lit("WARC-Target-URI: "), uri, lit(Crlf),
    // a WARC-Truncated cohort (every 8th doc): the crawler-cut-this-
    // capture marker real crawls carry (WARC 1.1 §5.13) — the parse
    // must surface it so curation can drop/flag partial captures
    when(col("doc_id") % 8 === 3, lit("WARC-Truncated: length" + Crlf))
      .otherwise(lit("")),
    lit("Content-Type: text/plain" + Crlf),
    // BYTE length (Content-Length is octets): length() on a string
    // counts characters, which desyncs the cursor on non-ASCII text
    lit("Content-Length: "), length(encode(col("text"), "UTF-8"))
      .cast("string"), lit(Crlf),
    lit(Crlf), col("text"), lit(Crlf + Crlf))

  /** Deterministic WARC response-record synthesis from the `documents`
    * fixture — the [[Multimodal.syntheticImagePayloads]] idiom: the spec
    * and the DuckDB oracle can RECONSTRUCT every parsed field from the
    * source row (uri from doc_id, content_length from the text, body md5
    * from the text), so the parser gets a full value oracle without any
    * binary fixture on disk. `groupSize` docs concatenate into one chunk
    * payload to exercise multi-record cursor walking. Null-text rows are
    * dropped (a null record string would silently vanish from the
    * `array_join` below while still LOOKING like an input doc — any
    * oracle over the synthesis must filter `text IS NOT NULL` the same
    * way). */
  def syntheticWarcChunks(docs: DataFrame, groupSize: Int = 8,
                          uri: Column = defaultUri): DataFrame = {
    require(groupSize >= 1, s"groupSize >= 1, got $groupSize")
    docs.filter(col("text").isNotNull)
      .select((col("doc_id") / groupSize).cast("long").as("chunk_id"),
        col("doc_id"), recordExpr(uri).as("rec"))
      .groupBy("chunk_id")
      // deterministic record order inside the chunk: sort by doc_id
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("doc_id"), col("rec")))),
        s => s.getField("rec")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
  }

  /** The `.warc.gz` sibling of [[syntheticWarcChunks]]: every record is
    * its own gzip member (the CommonCrawl per-record-member layout) and
    * a chunk is the byte concatenation of its members in doc_id order.
    * Java's gzip header is fixed (MTIME 0, no flags) and DEFLATE is
    * deterministic for a given input, so the chunks — and therefore the
    * parse — are run-stable. Parsed output is byte-identical to the
    * plain-chunk parse of the same docs, which is exactly what the q188
    * oracle checks. */
  def syntheticWarcGzipChunks(spark: SparkSession, docs: DataFrame,
                              groupSize: Int = 8,
                              uri: Column = defaultUri): DataFrame = {
    import spark.implicits._
    require(groupSize >= 1, s"groupSize >= 1, got $groupSize")
    val gz = docs.filter(col("text").isNotNull)
      .select((col("doc_id") / groupSize).cast("long").as("chunk_id"),
        col("doc_id"), encode(recordExpr(uri), "UTF-8").as("rec"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (cid, did, rec) =>
        val out = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(rec); g.close()
        (cid, did, out.toByteArray)
      })
      .toDF("chunk_id", "doc_id", "gz")
    gz.groupBy("chunk_id")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("gz"))))
        .as("members"))
      .select(col("chunk_id"),
        aggregate(col("members"), lit(Array.emptyByteArray),
          (acc, m) => concat(acc, m.getField("gz"))).as("payload"))
  }

  /** Inflate a gzip(-member-stream) BINARY column to UTF-8 text — the
    * generic fetched-file decompressor for crawl sidecars that ship
    * overwhelmingly gzipped (sitemaps are the canonical case: the
    * protocol recommends `.xml.gz` and large sites use nothing else).
    * Reuses the RFC 1952 member walk ([[inflateMember]]: all optional
    * FLG fields, bomb clamp) and concatenates multi-member streams;
    * payloads that do NOT start with the gzip magic pass through as
    * UTF-8 text (the [[parseChunk]] sniffing precedent — a frontier
    * mixing `.xml` and `.xml.gz` fetches needs no routing). `valid` is
    * false when a gzip payload is truncated/corrupt (text keeps the
    * members inflated before the fault). Output: `(keyCol, outCol,
    * valid)`.
    *
    * Scale shape: per-partition byte decoder (the library's accepted
    * mapPartitions class) — embarrassingly parallel, no shuffle. */
  def gunzipTextColumn(spark: SparkSession, df: DataFrame, keyCol: String,
                       bytesCol: String,
                       outCol: String = "text"): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (k, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
          (k, new String(b, java.nio.charset.StandardCharsets.UTF_8), true)
        else {
          val out = new java.io.ByteArrayOutputStream(b.length * 3)
          var pos = 0
          var ok = true
          while (ok && pos < b.length) {
            inflateMember(b, pos) match {
              case Some((m, end)) => out.write(m, 0, m.length); pos = end
              case None           => ok = false
            }
          }
          (k, new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8), ok)
        }
      })
      .toDF(keyCol, outCol, "valid")
  }

  /** Parse every record out of each chunk payload (plain or `.warc.gz`
    * member-stream chunks — sniffed per chunk). */
  def parseWarc(spark: SparkSession, chunks: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    Spread.cpu(chunks)
      .select(col("chunk_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseChunk(id, bytes) })
  }

  /** [[parseWarc]] carrying the decoded UTF-8 body instead of its md5 —
    * the crawl→corpus entry point: feed the result straight into
    * `WebText.canonicalUrl` / `Curation.qualityGates` / `Dedup`. Only
    * use when the next stage consumes the text itself; the md5 variant
    * is the join-key path. */
  def parseWarcText(spark: SparkSession, chunks: DataFrame): Dataset[WarcDoc] = {
    import spark.implicits._
    Spread.cpu(chunks)
      .select(col("chunk_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseRecords(id, bytes).map { p =>
          WarcDoc(p.rec.chunk_id, p.rec.rec_idx, p.rec.warc_type,
            p.rec.target_uri, p.rec.content_type, p.rec.content_length,
            new String(p.body, StandardCharsets.UTF_8), p.rec.valid)
        }
      })
  }

  /** WET conversion-record EXPORT — the CommonCrawl plain-text
    * artifact as a writable column, closing the ingest→curate→export
    * loop in the corpus's own interchange format: one `WARC/1.0`
    * conversion record per doc (version line, WARC-Type /
    * WARC-Target-URI / WARC-Date headers, `text/plain` Content-Type,
    * Content-Length in UTF-8 OCTETS — `length()` counts characters
    * and desyncs every downstream cursor on non-ASCII text), CRLFCRLF,
    * body, CRLFCRLF. Concatenated records ARE a valid WET file: the
    * round-trip through [[parseWarcText]] is the format contract
    * (q253 pins it record-field-for-record-field). `date` is a
    * caller-supplied column (the capture/export timestamp — export
    * jobs pass their run date; the default keeps test plans
    * deterministic). Null-text AND null-uri rows are dropped — either
    * null makes the whole concat null, a record string that would
    * silently vanish from downstream concatenation.
    * Output: the doc columns + `wet_record`.
    *
    * Scale shape: scan-stage concat projection, no shuffle; shard
    * sizing and ordering are the caller's export policy (the
    * q131/q206 shard machinery), and the registry's `text` format
    * sink writes the records as-is. */
  def wetRecords(docs: DataFrame, uriCol: String = "url",
                 textCol: String = "text",
                 date: Column = lit("2026-01-01T00:00:00Z")): DataFrame =
    docs.filter(col(textCol).isNotNull && col(uriCol).isNotNull)
      .withColumn("wet_record", concat(
        lit("WARC/1.0" + Crlf),
        lit("WARC-Type: conversion" + Crlf),
        lit("WARC-Target-URI: "), col(uriCol), lit(Crlf),
        lit("WARC-Date: "), date, lit(Crlf),
        lit("Content-Type: text/plain" + Crlf),
        lit("Content-Length: "),
        length(encode(col(textCol), "UTF-8")).cast("string"), lit(Crlf),
        lit(Crlf), col(textCol), lit(Crlf + Crlf)))

  /** Per-page WAT metadata records — CommonCrawl's THIRD artifact
    * (WARC = captures, WET = extracted text, WAT = per-page JSON
    * metadata): one `WARC-Type: metadata` record per page whose JSON
    * payload carries the page's head metadata (title, description —
    * the [[graft.ops.WebText.pageMetadata]] extraction, entities
    * decoded), its out-link hrefs in document order RAW
    * ([[graft.ops.WebText.extractHrefs]] — WAT records the reference
    * as written; resolution is the consumer's choice, unlike the
    * frontier path), and the response Content-Type, nested in the
    * CommonCrawl envelope shape
    * (`Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata`).
    * Header framing mirrors [[wetRecords]]: Content-Length counts the
    * JSON's UTF-8 OCTETS, and concatenated records ARE a valid WAT
    * file — the [[parseWarcText]] round-trip plus a `from_json`
    * re-derivation of every payload field is the format contract
    * (q257). Null-html and null-uri rows are dropped (either would
    * null the record string — the [[wetRecords]] vanishing-row rule).
    * `contentTypeCol` names the page's response media-type column
    * ('' ⇒ a text/html literal). Output: the page columns +
    * `wat_record`.
    *
    * Scale shape: scan-stage regex/JSON projection, no shuffle — the
    * link array stays a per-page column (never exploded), so the only
    * cost is the page's own tag scan. */
  def watRecords(pages: DataFrame, uriCol: String = "url",
                 htmlCol: String = "html", contentTypeCol: String = "",
                 date: Column = lit("2026-01-01T00:00:00Z")): DataFrame = {
    val ct = if (contentTypeCol.nonEmpty) col(contentTypeCol)
             else lit("text/html")
    val payload = to_json(struct(struct(
      struct(col(uriCol).as("WARC-Target-URI"))
        .as("WARC-Header-Metadata"),
      struct(struct(
        struct(ct.as("Content-Type")).as("Headers"),
        struct(
          struct(col("title").as("Title"),
            col("description").as("Description")).as("Head"),
          transform(WebText.extractHrefs(col(htmlCol)),
            h => struct(lit("A@/href").as("path"), h.as("url")))
            .as("Links")).as("HTML-Metadata"))
        .as("HTTP-Response-Metadata")).as("Payload-Metadata"))
      .as("Envelope")))
    WebText.pageMetadata(
        pages.filter(col(htmlCol).isNotNull && col(uriCol).isNotNull),
        htmlCol)
      .withColumn("wat_record", concat(
        lit("WARC/1.0" + Crlf),
        lit("WARC-Type: metadata" + Crlf),
        lit("WARC-Target-URI: "), col(uriCol), lit(Crlf),
        lit("WARC-Date: "), date, lit(Crlf),
        lit("Content-Type: application/json" + Crlf),
        lit("Content-Length: "),
        length(encode(payload, "UTF-8")).cast("string"), lit(Crlf),
        lit(Crlf), payload, lit(Crlf + Crlf)))
      .drop("title", "description", "og_title", "og_description")
  }

  /** Random access into archived segments BY INDEX LOCATOR — the
    * READER half of the CDX contract ([[parseWarcIndex]] /
    * [[cdxjLines]] are the writer half): given the chunk payloads and
    * (a subset of) their index rows, slice each record's
    * `[rec_offset, rec_offset + rec_bytes)` span out of its chunk and
    * re-parse EXACTLY that record — fetching N documents out of a
    * 100 TB archive touches the N slices' chunks and nothing else,
    * which is the entire point of shipping an index beside the
    * segments. Works on both layouts the locators encode: a plain
    * chunk's slice is the record's own bytes, a `.warc.gz` chunk's
    * slice is ONE compressed member (the cursor sniffs the gzip magic
    * per slice and inflates just that member). A slice that fails to
    * parse to exactly one valid record — a drifted or foreign
    * locator — surfaces as a `valid = false` row, never an exception
    * (the invalid-row convention of this file), and so does a locator
    * whose chunk is MISSING from the chunk frame or whose payload is
    * null (a deleted/compacted segment, a foreign index): the join is
    * LEFT from the index side, so the output is always one
    * [[WarcDoc]] per index row, carrying the INDEX's chunk_id/rec_idx
    * (the archive coordinates being dereferenced) — a caller counting
    * on one row per requested locator never loses a failure
    * silently.
    *
    * Scale shape: the hit path is an INNER equi-join whose small
    * locator side stays broadcastable (a LEFT join from the index
    * side would force the payload-carrying chunk table to be the
    * build side — Spark can only broadcast the non-preserved side of
    * an outer join, so an archive-sized chunk table would shuffle
    * every segment payload, exactly the full-archive touch this op
    * exists to avoid); the missing-chunk rows come from an anti-join
    * against the chunk_id-only projection (~8 bytes per chunk,
    * broadcastable) and union in as invalid rows. Then a scan-stage
    * binary substring and a per-row cursor over slice-sized byte
    * arrays; no full-segment parse. */
  def fetchByLocator(spark: SparkSession, chunks: DataFrame,
                     index: DataFrame): Dataset[WarcDoc] = {
    import spark.implicits._
    val (hits, missing) = locatorSlices(spark, chunks, index)
    val fetched = hits.map { case (cid, ridx, bytes) =>
      val parsed = if (bytes == null) Nil else parseRecords(cid, bytes)
      parsed match {
        case Seq(p) if p.rec.valid =>
          WarcDoc(cid, ridx, p.rec.warc_type, p.rec.target_uri,
            p.rec.content_type, p.rec.content_length,
            new String(p.body, StandardCharsets.UTF_8), valid = true)
        case _ => WarcDoc(cid, ridx, "malformed", "", "", 0L, "",
          valid = false)
      }
    }
    fetched.union(missing.map { case (cid, ridx) =>
      WarcDoc(cid, ridx, "malformed", "", "", 0L, "", valid = false)
    })
  }

  /** [[fetchByLocator]] continued through the HTTP layer — random
    * access that returns DECODED documents: each fetched record's
    * block goes through the [[parseWarcHttpDocs]] byte-level split
    * (status line, media type, declared-charset body decode), so a
    * reader dereferencing a full-fidelity archive
    * ([[responseRecord]]'s `application/http` blocks) gets the page
    * TEXT, not the raw HTTP message. Non-HTTP blocks pass through as
    * UTF-8 with a null status (the parseWarcHttpDocs rule); failed or
    * missing locators surface as `valid = false` rows keyed by the
    * index coordinates, exactly like [[fetchByLocator]]. Same
    * broadcast-the-locator-side join shape. */
  def fetchHttpByLocator(spark: SparkSession, chunks: DataFrame,
                         index: DataFrame): Dataset[WarcHttpDoc] = {
    import spark.implicits._
    val (hits, missing) = locatorSlices(spark, chunks, index)
    val fetched = hits.map { case (cid, ridx, bytes) =>
      val parsed = if (bytes == null) Nil else parseRecords(cid, bytes)
      parsed match {
        case Seq(p) if p.rec.valid =>
          val (status, ct, cs, text) = Http.splitResponseBytes(p.body)
          WarcHttpDoc(cid, ridx, p.rec.target_uri, status, ct, cs, text,
            valid = true)
        case _ =>
          WarcHttpDoc(cid, ridx, "", null, "", "", "", valid = false)
      }
    }
    fetched.union(missing.map { case (cid, ridx) =>
      WarcHttpDoc(cid, ridx, "", null, "", "", "", valid = false)
    })
  }

  /** The shared random-access machinery of [[fetchByLocator]] /
    * [[fetchHttpByLocator]]: per valid index row, the
    * `[rec_offset, rec_offset + rec_bytes)` slice of its chunk
    * (hit path — an INNER equi-join that keeps the SMALL locator side
    * broadcastable; a LEFT join from the index side would force the
    * payload-carrying chunk table to be the build side), plus the
    * locators whose chunk is missing from the chunk frame (anti-join
    * against the chunk_id-only projection — ~8 bytes per chunk,
    * broadcastable). */
  private def locatorSlices(spark: SparkSession, chunks: DataFrame,
                            index: DataFrame)
      : (Dataset[(Long, Long, Array[Byte])], Dataset[(Long, Long)]) = {
    import spark.implicits._
    val locs = index.filter(col("valid"))
      .select(col("chunk_id").cast("long").as("chunk_id"),
        col("rec_idx").cast("long").as("rec_idx"),
        col("rec_offset"), col("rec_bytes"))
    val keyed = chunks.select(col("chunk_id").cast("long").as("chunk_id"),
      col("payload"))
    val hits = locs.join(keyed, Seq("chunk_id"))
      .select(col("chunk_id"), col("rec_idx"),
        call_function("substring", col("payload"),
          (col("rec_offset") + 1).cast("int"), col("rec_bytes").cast("int"))
          .as("slice"))
      .as[(Long, Long, Array[Byte])]
    val missing = locs
      .join(keyed.select("chunk_id"), Seq("chunk_id"), "left_anti")
      .select(col("chunk_id"), col("rec_idx"))
      .as[(Long, Long)]
    (hits, missing)
  }

  /** Segments-per-shard headroom of [[packSegments]]' segment ids:
    * `segment_id = shard · 2²⁰ + seg_in_shard` — at 1 GB targets that
    * is a petabyte of archive per shard before ids would collide
    * (guarded per row, never silent). */
  private[graft] val SegmentsPerShard: Long = 1L << 20

  /** Hard cap on [[packSegments]]' `targetSegmentBytes` (1.5 GiB):
    * [[segmentPayloads]]/[[segmentPayloadsGzip]] materialize one
    * `Array[Byte]` row per segment, bounded at 2 GiB by the JVM —
    * and a segment may overrun its target by one record, so the cap
    * keeps headroom. Fails at pack time, not mid-assembly. */
  val MaxTargetSegmentBytes: Long = (3L << 29) // 1.5 GiB

  /** PACK record strings into target-sized archive segments — the
    * writer-side sibling of [[parseWarcIndex]]'s reader contract: real
    * corpora ship as ~1 GB segment files plus an index, and everything
    * upstream here ([[wetRecords]], [[watRecords]], [[revisitDedup]])
    * emits RECORD COLUMNS that still need segment assignment and
    * locators before they are an archive. Per shard (`shardCol` — the
    * caller's NUMERIC distribution key: a host bucket, a day number,
    * a q131-style shard id; a null or non-numeric shard raises — a
    * null would otherwise collapse its rows into one unbounded
    * null-id segment), records pack in `ordCol` order into segments of
    * `targetSegmentBytes` TARGET size (a record never splits; the
    * CommonCrawl convention is target-sized, not hard-capped — a
    * segment may overrun by less than one record). Output: the input
    * columns + `rec_bytes` (UTF-8 octets), `segment_id`
    * (`shard · 2²⁰ + floor(cum_before / target)` — unique, long,
    * directly usable as [[fetchByLocator]]'s chunk key), `rec_idx`
    * (position within the segment) and `rec_offset` (byte offset
    * within the PLAIN segment payload — [[segmentPayloads]]'
    * concatenation; the `.warc.gz` layout derives its compressed
    * locators from [[parseWarcIndex]] over [[segmentPayloadsGzip]]
    * instead, exactly like real CDX builds). Every value is
    * re-derivable by running-sum windows, so q271 pins the whole
    * packing against ground truth. `ordCol` need not be unique: both
    * windows (the octet running sum and the index/offset assignment)
    * share the `(ordCol, recCol)` ordering, so duplicate ord keys
    * with different record lengths still pair each record's
    * `rec_idx` with its OWN cumulative offset — two non-stable sorts
    * ordered by ord alone could swap equal-ord records between the
    * windows and silently cross-wire their locators.
    *
    * `targetSegmentBytes` is capped at 1.5 GiB: [[segmentPayloads]] /
    * [[segmentPayloadsGzip]] materialize ONE `Array[Byte]` row per
    * segment, and a target past ~2 GiB (the JVM array / Spark binary
    * row bound) would fail deep inside the payload assembly instead
    * of here — a segment may overrun its target by one record, so
    * the cap leaves headroom under the hard limit.
    *
    * Scale shape: two windows per shard (running octet sum, then the
    * per-segment offset rebase) — per-partition cardinality is one
    * shard's records, never corpus-shaped; the caller picks shards
    * accordingly (one shard = one window partition = one writer's
    * worth of archive). */
  def packSegments(records: DataFrame, shardCol: String = "shard",
                   ordCol: String = "ord",
                   recCol: String = "warc_record",
                   targetSegmentBytes: Long = 1L << 30): DataFrame = {
    require(targetSegmentBytes >= 1,
      s"targetSegmentBytes >= 1, got $targetSegmentBytes")
    require(targetSegmentBytes <= MaxTargetSegmentBytes,
      s"targetSegmentBytes $targetSegmentBytes exceeds " +
        s"$MaxTargetSegmentBytes (1.5 GiB): segment payloads " +
        "materialize as one Array[Byte] row each, and the 2 GiB JVM " +
        "array bound would fail later, in the payload assembly — " +
        "split the archive across more segments instead")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(shardCol)
      .orderBy(col(ordCol), col(recCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = records
      .filter(col(recCol).isNotNull)
      .withColumn("rec_bytes",
        length(encode(col(recCol), "UTF-8")).cast("long"))
      .withColumn("graft_before",
        coalesce(sum(col("rec_bytes")).over(wCum), lit(0L)))
      .withColumn("graft_seg", call_function("div",
        col("graft_before"), lit(targetSegmentBytes)))
    val wSeg = Window.partitionBy(col(shardCol), col("graft_seg"))
    val wIdx = wSeg.orderBy(col(ordCol), col(recCol))
    withCum
      // both guards ride INSIDE segment_id so no projection prune can
      // optimize them away: a null shard would silently collapse its
      // rows into one unbounded null-id segment, and a shard past 2^20
      // segments would collide ids
      .withColumn("segment_id",
        when(col(shardCol).isNull,
          raise_error(lit("packSegments: null shard — assign every " +
            "record a numeric shard id")))
        .when(col("graft_seg") >= SegmentsPerShard,
          raise_error(concat(lit("packSegments: shard "),
            col(shardCol).cast("string"),
            lit(s" exceeds $SegmentsPerShard segments — re-shard"))))
          .otherwise(
            col(shardCol).cast("long") * SegmentsPerShard +
              col("graft_seg")))
      .withColumn("rec_idx",
        (row_number().over(wIdx) - 1).cast("long"))
      .withColumn("rec_offset",
        col("graft_before") - min(col("graft_before")).over(wSeg))
      .drop("graft_before", "graft_seg")
  }

  /** The PLAIN segment payloads of a [[packSegments]] frame: per
    * `segment_id`, the records concatenated in `rec_idx` order and
    * encoded as UTF-8 — `(chunk_id, payload)`, directly consumable by
    * [[parseWarc]]/[[fetchByLocator]], with [[packSegments]]'
    * `rec_offset`/`rec_bytes` as the byte-exact locators. One
    * segment-keyed aggregate; a segment is one writer's worth of
    * bytes by construction. */
  def segmentPayloads(packed: DataFrame,
                      recCol: String = "warc_record"): DataFrame =
    packed.groupBy(col("segment_id").as("chunk_id"))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("rec_idx"), col(recCol).as("rec")))),
        s => s.getField("rec")), "").as("graft_chunk"))
      .select(col("chunk_id"),
        encode(col("graft_chunk"), "UTF-8").as("payload"))

  /** The `.warc.gz` sibling of [[segmentPayloads]]: every record
    * becomes its own gzip member (the CommonCrawl per-record-member
    * layout — members are independently decompressible, which is what
    * makes [[fetchByLocator]] work on compressed segments) and the
    * segment is the byte concatenation of its members in `rec_idx`
    * order. Compressed locators are NOT [[packSegments]]' plain
    * offsets — rebuild them with [[parseWarcIndex]] over this output
    * (exactly how real CDX indexes are built, and what the spec's
    * fetch round-trip drives).
    *
    * Assembly is a `mapGroups` with ONE linear ByteArrayOutputStream
    * pass per segment — a fold of SQL `concat` over the member array
    * (the small-fixture [[syntheticWarcGzipChunks]] idiom) re-copies
    * the accumulated prefix per member, O(members · segment_bytes) at
    * the 1 GB default target, and this is the PRODUCTION writer path.
    * One segment materializes per group — segment-sized by
    * construction (one writer's worth of bytes). */
  def segmentPayloadsGzip(spark: SparkSession, packed: DataFrame,
                          recCol: String = "warc_record"): DataFrame = {
    import spark.implicits._
    packed
      .select(col("segment_id"), col("rec_idx"),
        encode(col(recCol), "UTF-8").as("rec"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (sid, ridx, rec) =>
        val out = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(rec); g.close()
        (sid, ridx, out.toByteArray)
      })
      .groupByKey(_._1)
      .mapGroups { (sid, it) =>
        val members = it.toArray.sortBy(_._2)
        val out = new java.io.ByteArrayOutputStream(
          members.iterator.map(_._3.length).sum)
        members.foreach(m => out.write(m._3))
        (sid, out.toByteArray)
      }
      .toDF("chunk_id", "payload")
  }

  /** Revisit RESOLUTION — the reader that turns a deduplicated archive
    * back into a full corpus, the inverse of [[revisitDedup]]: every
    * `revisit` stub is dereferenced through the index — `refers_to` →
    * the EARLIEST `response` capture of that URI (archive order, the
    * deterministic choice the q260 docstring promises) →
    * [[fetchHttpByLocator]] slice — and the resolved text is VERIFIED
    * against the stub's `WARC-Payload-Digest`: a stub whose first
    * capture is missing from the index or chunks, whose locator
    * fails, or whose resolved payload hashes differently surfaces as
    * `valid = false`, never silently. Verification covers the digest
    * forms recomputable from the decoded text's UTF-8 octets —
    * `md5:<hex>` (this library's stubs) and `sha1:<lowercase hex>`;
    * other forms (real archives' `sha1:<base32>` over RAW payload
    * octets) resolve on the locator alone rather than flagging every
    * correctly-resolved payload invalid.
    * `resolveRevisits(revisitDedup(corpus))` is the identity on the
    * corpus — q268's byte-exact oracle.
    *
    * Output: one row per archive record — `(chunk_id, rec_idx,
    * target_uri, is_revisit, refers_to, text, valid)`; response rows
    * carry their own HTTP-decoded text ([[parseWarcHttpDocs]]).
    *
    * Scale shape: resolving the stubs touches the stub rows, one
    * uri-keyed window over the INDEX (index-shaped — the index is the
    * artifact built for exactly this job), and the referred slices'
    * chunks, each dereferenced ONCE however many stubs name it —
    * never a full-archive re-parse beyond the input records
    * themselves. */
  def resolveRevisits(spark: SparkSession, chunks: DataFrame,
                      index: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = parseWarcHttpDocs(spark, chunks).toDF()
    val stubs = parseWarcRevisits(spark, chunks)
      .select(col("chunk_id"), col("rec_idx"),
        col("refers_to").as("graft_ref"), col("payload_digest"))
    // the record a stub names: the earliest RESPONSE capture of the
    // referred uri (a same-url recrawl's stub shares its uri with the
    // response — the warc_type filter is what disambiguates them)
    val w = Window.partitionBy("target_uri")
      .orderBy(col("chunk_id").asc, col("rec_idx").asc)
    val firsts = index
      .filter(col("valid") && col("warc_type") === "response")
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .select(col("target_uri").as("graft_ref"), col("chunk_id"),
        col("rec_idx"), col("rec_offset"), col("rec_bytes"))
    // distinct referred captures, each dereferenced once
    val wanted = stubs.select("graft_ref").distinct()
      .join(firsts, Seq("graft_ref"))
      .withColumn("valid", lit(true))
    val resolved = fetchHttpByLocator(spark, chunks, wanted).toDF()
      .join(wanted.select("graft_ref", "chunk_id", "rec_idx"),
        Seq("chunk_id", "rec_idx"))
      .select(col("graft_ref"), col("text").as("graft_text"),
        col("valid").as("graft_ok"))
    // digest verification applies only to forms this reader can
    // recompute over the resolved text's UTF-8 octets — md5:<hex> (the
    // library's own stubs) and sha1:<lowercase hex>. Real archives
    // also carry sha1:<base32> (RFC 4648) digests of the RAW payload
    // octets, which a charset-decoded text cannot reproduce — those
    // stubs resolve on the locator alone (a hardcoded md5 check would
    // flag 100% of a foreign archive's revisits invalid while
    // returning the CORRECT payloads).
    val bytes = encode(col("graft_text"), "UTF-8")
    val verified =
      when(col("payload_digest").startsWith("md5:"),
        col("payload_digest") === concat(lit("md5:"), md5(bytes)))
      .when(col("payload_digest").rlike("^sha1:[0-9a-f]{40}$"),
        col("payload_digest") === concat(lit("sha1:"), sha1(bytes)))
      .otherwise(lit(true))
    docs
      .join(stubs, Seq("chunk_id", "rec_idx"), "left")
      .join(resolved, Seq("graft_ref"), "left")
      .select(col("chunk_id"), col("rec_idx"), col("target_uri"),
        col("graft_ref").isNotNull.as("is_revisit"),
        coalesce(col("graft_ref"), lit("")).as("refers_to"),
        when(col("graft_ref").isNull, col("text"))
          .otherwise(coalesce(col("graft_text"), lit(""))).as("text"),
        when(col("graft_ref").isNull, col("valid"))
          .otherwise(coalesce(col("graft_ok"), lit(false)) && verified)
          .as("valid"))
  }

  /** Archive-side payload dedup via WARC `revisit` records (ISO 28500
    * §6.7.2, the `identical-payload-digest` profile): per distinct
    * body digest the FIRST capture (lowest `uriCol`, deterministic)
    * stays a full `response` record; every LATER capture of the same
    * payload becomes a ~200-byte revisit STUB — `WARC-Type: revisit`,
    * `WARC-Refers-To-Target-URI` naming the first capture,
    * `WARC-Payload-Digest`, `Content-Length: 0` — which is how web
    * archives store recrawls without re-storing bodies: at crawl scale
    * the duplicate share of captures collapses from payload-sized to
    * header-sized, ON the archive format's own terms (any WARC reader
    * understands the stub). Readers resolve a revisit by digest or by
    * the refers-to URI against the index (q260).
    *
    * Output: the doc columns + `digest` (body md5, the [[WarcRecord]]
    * convention), `is_revisit`, `refers_to` ('' on first captures),
    * `warc_record`. Concatenated records ARE a valid WARC file — q262
    * round-trips them through [[parseWarcText]], and first captures
    * are FULL-FIDELITY `application/http; msgtype=response` records
    * ([[responseRecord]]) that round-trip through
    * [[parseWarcHttpDocs]] (q267). `status`/`mediaType` carry the
    * capture's HTTP layer into the written block (columns, so a frame
    * that kept its real response metadata writes it back; the
    * defaults are the curated-corpus convention).
    *
    * Scale shape: ONE digest-keyed window (the exact-dedup shuffle —
    * this IS the dedup job) + a scan-stage concat projection. Null
    * text/uri rows are dropped (the [[wetRecords]] vanishing-record
    * rule). */
  def revisitDedup(docs: DataFrame, uriCol: String = "url",
                   textCol: String = "text",
                   date: Column = lit("2026-01-01T00:00:00Z"),
                   status: Column = lit(200),
                   mediaType: Column = lit("text/html")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("digest").orderBy(col(uriCol).asc)
    val first = min(col(uriCol)).over(Window.partitionBy("digest"))
    docs.filter(col(textCol).isNotNull && col(uriCol).isNotNull)
      .withColumn("digest", md5(encode(col(textCol), "UTF-8")))
      .withColumn("graft_rn", row_number().over(w))
      .withColumn("is_revisit", col("graft_rn") > 1)
      .withColumn("refers_to", when(col("is_revisit"), first).otherwise(lit("")))
      .withColumn("warc_record",
        when(col("is_revisit"),
          revisitStub(col(uriCol), col("refers_to"), col("digest"), date))
        .otherwise(responseRecord(col(uriCol), col(textCol), date,
          status, mediaType)))
      .drop("graft_rn")
  }

  /** The reason phrase of the status codes a crawl archive writes
    * (RFC 9110 §15's registered phrases; empty for anything else —
    * the phrase is decorative per spec, the status line stays valid). */
  private def reasonPhrase(status: Column): Column =
    when(status === 200, lit("OK"))
      .when(status === 301, lit("Moved Permanently"))
      .when(status === 302, lit("Found"))
      .when(status === 304, lit("Not Modified"))
      .when(status === 404, lit("Not Found"))
      .when(status === 410, lit("Gone"))
      .when(status === 429, lit("Too Many Requests"))
      .when(status === 500, lit("Internal Server Error"))
      .when(status === 503, lit("Service Unavailable"))
      .otherwise(lit(""))

  /** One FULL-FIDELITY `response` record string (the [[revisitDedup]] /
    * [[RevisitGateLink]] first-capture form): the record block is a
    * complete `application/http; msgtype=response` message — status
    * line (with its RFC 9110 reason phrase), Content-Type /
    * Content-Length headers, CRLFCRLF, entity — exactly what real
    * crawls store, so written archives round-trip through
    * [[parseWarcHttpDocs]] (the reader has always handled real HTTP
    * blocks; a text/plain writer could never feed it). The HTTP layer
    * declares `charset=utf-8` unconditionally: the text column is
    * re-encoded as UTF-8 octets here, whatever the original capture's
    * charset was — declaring anything else would corrupt the
    * round-trip decode. Both Content-Lengths count UTF-8 OCTETS (the
    * [[wetRecords]] rule): the HTTP header the entity's, the WARC
    * envelope the whole HTTP block's. */
  private[graft] def responseRecord(uri: Column, text: Column,
                                    date: Column,
                                    status: Column = lit(200),
                                    mediaType: Column = lit("text/html")): Column = {
    // the media TYPE only: any parameters the caller's column carries
    // (a real capture's 'text/html; charset=iso-8859-1') are stripped —
    // the body is re-encoded as UTF-8 here, so echoing the original
    // charset (or doubling the parameter) would mojibake every
    // standard reader that honors the first charset it sees
    val bareType = trim(regexp_extract(mediaType, "^([^;]*)", 1))
    val http = concat(
      lit("HTTP/1.1 "), status.cast("string"), lit(" "),
      reasonPhrase(status), lit(Crlf),
      lit("Content-Type: "), bareType, lit("; charset=utf-8" + Crlf),
      lit("Content-Length: "),
      length(encode(text, "UTF-8")).cast("string"), lit(Crlf),
      lit(Crlf), text)
    concat(
      lit("WARC/1.0" + Crlf),
      lit("WARC-Type: response" + Crlf),
      lit("WARC-Target-URI: "), uri, lit(Crlf),
      lit("WARC-Date: "), date, lit(Crlf),
      lit("Content-Type: application/http; msgtype=response" + Crlf),
      lit("Content-Length: "),
      length(encode(http, "UTF-8")).cast("string"), lit(Crlf),
      lit(Crlf), http, lit(Crlf + Crlf))
  }

  /** One ~200-byte `revisit` stub string naming the first capture
    * (ISO 28500 identical-payload-digest profile). */
  private[graft] def revisitStub(uri: Column, refersTo: Column,
                                 digest: Column, date: Column): Column = concat(
    lit("WARC/1.0" + Crlf),
    lit("WARC-Type: revisit" + Crlf),
    lit("WARC-Target-URI: "), uri, lit(Crlf),
    lit("WARC-Date: "), date, lit(Crlf),
    lit("WARC-Refers-To-Target-URI: "), refersTo, lit(Crlf),
    lit("WARC-Payload-Digest: md5:"), digest, lit(Crlf),
    lit("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
      "identical-payload-digest" + Crlf),
    lit("Content-Length: 0" + Crlf),
    lit(Crlf + Crlf + Crlf))

  /** CDXJ index lines over a [[parseWarcIndex]] frame — the THIRD
    * per-segment artifact (WET text, WAT metadata, CDX random-access
    * index): one line per VALID record,
    * `"<urlkey> <timestamp14> {json}"`, where the urlkey is the
    * [[graft.ops.WebText.surtKey]] of the record's target URI and the
    * JSON carries url / digest / length / offset / filename — length
    * and offset as STRINGS, the CommonCrawl cdx-*.gz convention. The
    * lines of a segment, SORTED by urlkey, are the binary-searchable
    * index that fetches `[offset, offset+length)` of the segment and
    * inflates exactly one record. Sorting/sharding is the caller's
    * export policy (the q131/q206 shard machinery); q260 pins the
    * line grammar, the SURT key, and every locator field against a
    * ground-truth reconstruction. Invalid rows are dropped — a
    * corrupt record has no usable locator, and a null line would
    * vanish from concatenation (the [[wetRecords]] rule). Output: the
    * index columns + `urlkey` + `cdxj_line`. Scan-stage projection,
    * no shuffle. */
  def cdxjLines(index: DataFrame, filename: Column,
                uriCol: String = "target_uri",
                timestamp: Column = lit("20260101000000")): DataFrame =
    index.filter(col("valid") && col(uriCol).isNotNull)
      .withColumn("urlkey", WebText.surtKey(col(uriCol)))
      .withColumn("cdxj_line", concat(
        col("urlkey"), lit(" "), timestamp, lit(" "),
        to_json(struct(
          col(uriCol).as("url"),
          col("body_md5").as("digest"),
          col("rec_bytes").cast("string").as("length"),
          col("rec_offset").cast("string").as("offset"),
          filename.as("filename")))))

  /** The TERMINAL CDX sort — [[cdxjLines]]' deferred "binary-search
    * contract" made concrete: the accumulated index lines in GLOBAL
    * `(urlkey, line)` order, cut into fixed-size blocks of
    * `linesPerBlock` lines (the pywb/CommonCrawl `cluster.idx`
    * layout: the index ships as sorted blocks plus a tiny
    * entry table — [[cdxClusterSummaries]] — naming each block's
    * first key, and a lookup binary-searches the SUMMARIES, fetches
    * ONE block, and scans ≤ linesPerBlock lines). Output: the input
    * columns + `rank` (1-based global position), `block`
    * (`(rank−1) / linesPerBlock`) and `block_pos` (position inside
    * the block) — every value re-derivable as `row_number` windows by
    * the q272 oracle.
    *
    * Scale shape: ONE range-shuffle + per-partition sort
    * (`repartitionByRange` — sampled boundaries, so no partition
    * sees more than ~corpus/numPartitions lines regardless of key
    * skew; a reversed-domain keyspace is heavily skewed toward
    * `com,…`, which is why prefix banding would NOT be safe here)
    * followed by `zipWithIndex`'s per-partition count + offset pass —
    * the two-phase global rank, never a single-partition corpus
    * window. The sampled boundaries affect only which task holds
    * which range; ranks are determined by the total order alone, so
    * the output is deterministic. The returned frame's lineage
    * includes the sort AND zipWithIndex's extra count job —
    * checkpoint/persist it (or write it out) before running MORE THAN
    * ONE action over it (the summaries-then-lookup flow does exactly
    * that), or each action re-runs both. */
  def cdxClusterIndex(spark: SparkSession, lines: DataFrame,
                      linesPerBlock: Long = 3000L,
                      urlkeyCol: String = "urlkey",
                      lineCol: String = "cdxj_line",
                      numPartitions: Int = 0): DataFrame = {
    require(linesPerBlock >= 1, s"linesPerBlock >= 1, got $linesPerBlock")
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sorted = lines
      .repartitionByRange(parts, col(urlkeyCol), col(lineCol))
      .sortWithinPartitions(col(urlkeyCol), col(lineCol))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
    ranked
      .withColumn("block", call_function("div",
        col("rank") - 1, lit(linesPerBlock)))
      .withColumn("block_pos", col("rank") - 1 - col("block") * linesPerBlock)
  }

  /** The `cluster.idx`-shaped entry table over a [[cdxClusterIndex]]
    * frame: one row per block — `(block, first_urlkey, first_line,
    * n_lines)` — tiny (corpus/linesPerBlock rows), broadcastable, the
    * thing a reader binary-searches to find which block can hold a
    * key (`first_urlkey ≤ key <` the next block's `first_urlkey`)
    * before fetching exactly that block. One block-keyed min-struct
    * aggregate. */
  def cdxClusterSummaries(blocked: DataFrame,
                          urlkeyCol: String = "urlkey",
                          lineCol: String = "cdxj_line"): DataFrame =
    blocked.groupBy("block")
      .agg(min(struct(col("rank"), col(urlkeyCol).as("k"),
          col(lineCol).as("l"))).as("graft_first"),
        count(lit(1)).as("n_lines"))
      .select(col("block"),
        col("graft_first").getField("k").as("first_urlkey"),
        col("graft_first").getField("l").as("first_line"),
        col("n_lines"))

  /** The `from_json` schema of a [[watRecords]] payload — the reader
    * half of the WAT contract, shared by the q257 round-trip oracle
    * and any consumer re-deriving fields from the artifact. */
  val WatPayloadSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", StructType(Seq(
        StructField("WARC-Target-URI", StringType)))),
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("Headers", StructType(Seq(
            StructField("Content-Type", StringType)))),
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Head", StructType(Seq(
              StructField("Title", StringType),
              StructField("Description", StringType)))),
            StructField("Links", ArrayType(StructType(Seq(
              StructField("path", StringType),
              StructField("url", StringType)))))))))))))))))))
  }

  /** The real-CommonCrawl bytes→text path in ONE cursor pass: WARC
    * envelope parse + HTTP response split + charset-declared body
    * decode ([[Http.splitResponseBytes]] — the byte-level split, which
    * MUST run before any UTF-8 assumption: a latin-1 page decoded
    * eagerly as UTF-8 is already corrupted by the time a column op
    * sees it). Records whose block is not an HTTP response (resource
    * records, pre-split corpora) pass their body through as UTF-8 text
    * with a null status. Invalid envelope rows surface as
    * `valid = false` with empty text, as everywhere in this file.
    * `http_content_type` is the HTTP layer's media type; the WARC
    * envelope's Content-Type is dropped here (it is `application/
    * http; msgtype=response` on real crawls — metadata about the
    * container, not the document). */
  def parseWarcHttpDocs(spark: SparkSession,
                        chunks: DataFrame): Dataset[WarcHttpDoc] = {
    import spark.implicits._
    Spread.cpu(chunks)
      .select(col("chunk_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseRecords(id, bytes).map { p =>
          val (status, ct, cs, text) =
            if (p.rec.valid) Http.splitResponseBytes(p.body)
            else (null: Integer, "", "", "")
          WarcHttpDoc(p.rec.chunk_id, p.rec.rec_idx, p.rec.target_uri,
            status, ct, cs, text, p.rec.valid)
        }
      })
  }

  /** CDX-style record index over the chunk stream: one row per record
    * with its byte locator inside the chunk payload — `rec_offset` /
    * `rec_bytes` are the record's own span in a plain chunk and the
    * COMPRESSED gzip member's span in a `.warc.gz` chunk (the
    * CommonCrawl CDX convention: a reader fetches `[offset,
    * offset+length)` of the segment and inflates exactly one record —
    * random access into a 1 GB segment without scanning it). Same
    * stateless mapPartitions shape as [[parseWarc]]; at 100 TB this IS
    * the index-build job, with the output partitioned/sorted by URI key
    * downstream. */
  def parseWarcIndex(spark: SparkSession, chunks: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.cpu(chunks)
      .select(col("chunk_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseRecords(id, bytes, keepBody = false).map(p =>
          (p.rec.chunk_id, p.rec.rec_idx, p.rec.warc_type, p.rec.target_uri,
            p.offset, p.recBytes, p.rec.body_md5, p.rec.valid))
      })
      .toDF("chunk_id", "rec_idx", "warc_type", "target_uri", "rec_offset",
        "rec_bytes", "body_md5", "valid")
  }

  /** The revisit stubs of an archive, with their resolution headers —
    * one row per VALID `WARC-Type: revisit` record:
    * `(chunk_id, rec_idx, target_uri, refers_to, payload_digest)`
    * (`refers_to` = `WARC-Refers-To-Target-URI`, `payload_digest` =
    * `WARC-Payload-Digest` verbatim with its algorithm prefix). The
    * metadata half of [[resolveRevisits]]; same stateless
    * mapPartitions shape as [[parseWarcIndex]]. */
  def parseWarcRevisits(spark: SparkSession, chunks: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.cpu(chunks)
      .select(col("chunk_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseRecords(id, bytes, keepBody = false).collect {
          case p if p.rec.valid && p.rec.warc_type == "revisit" =>
            (p.rec.chunk_id, p.rec.rec_idx, p.rec.target_uri, p.refersTo,
              p.payloadDigest)
        }
      })
      .toDF("chunk_id", "rec_idx", "target_uri", "refers_to",
        "payload_digest")
  }

  /** Cursor walk over one chunk (gzip member stream or plain WARC).
    * Package-visible for direct spec use. */
  private[graft] def parseChunk(chunkId: Long,
                                bytes: Array[Byte]): Seq[WarcRecord] =
    parseRecords(chunkId, bytes, keepBody = false).map(_.rec)

  /** `offset`/`recBytes` locate the record inside the chunk payload —
    * for a plain chunk the record's own byte span (start of the version
    * line to the start of the next record, trailing CRLFCRLF included);
    * for a `.warc.gz` chunk the COMPRESSED gzip member's span (the CDX
    * convention: offset+length let a reader fetch and inflate one
    * record without touching the rest of the segment).
    * `refersTo`/`payloadDigest` carry the revisit-resolution headers
    * (`WARC-Refers-To-Target-URI`, `WARC-Payload-Digest` — algorithm
    * prefix kept verbatim), '' when absent. */
  private[graft] final case class Parsed(rec: WarcRecord, body: Array[Byte],
                                         offset: Long, recBytes: Long,
                                         refersTo: String = "",
                                         payloadDigest: String = "")

  /** `keepBody = false` (the md5-only metadata paths: [[parseWarc]],
    * [[parseWarcIndex]]) digests each body inside the cursor loop and
    * stores no copy, so per-task memory stays O(chunk) instead of
    * retaining every record body until the chunk finishes; the text
    * paths ([[parseWarcText]], [[parseWarcHttpDocs]]) opt into carrying
    * the body slices they are about to emit. */
  private[graft] def parseRecords(chunkId: Long, bytes: Array[Byte],
                                  keepBody: Boolean = true): Seq[Parsed] = {
    // .warc.gz chunk: a back-to-back gzip member stream (sniffed on the
    // first two bytes only — a magic mid-chunk is plain-body content).
    // Each member is inflated and parsed on its own so records carry
    // their member's COMPRESSED span; record-level corruption aborts
    // the chunk like the plain path (conservative — later members'
    // content could be fine, but a desynced record stream upstream of
    // curation is worse than a short chunk flagged loudly).
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
      val out = Seq.newBuilder[Parsed]
      var pos = 0
      var idx = 0L
      var bad = false
      while (!bad && pos < bytes.length) {
        inflateMember(bytes, pos) match {
          case Some((member, end)) =>
            val rs = parsePlain(chunkId, member, idx, keepBody).map(p =>
              p.copy(offset = pos.toLong, recBytes = (end - pos).toLong))
            out ++= rs
            idx += rs.count(_.rec.valid)
            if (rs.exists(!_.rec.valid)) bad = true
            pos = end
          case None =>
            out += Parsed(
              WarcRecord(chunkId, idx, "malformed", "", "", -1L, "", false, ""),
              Array.emptyByteArray, pos.toLong, (bytes.length - pos).toLong)
            bad = true
        }
      }
      out.result()
    } else parsePlain(chunkId, bytes, 0L, keepBody)
  }

  /** Inflate ONE gzip member starting at `pos`: RFC 1952 header (all
    * optional FLG fields handled), raw-DEFLATE inflate with the
    * [[MaxInflatedMember]] bomb clamp, 8-byte trailer skip. Returns the
    * inflated bytes and the offset one past the member, or None when the
    * member is truncated or corrupt. */
  private[graft] def inflateMember(bytes: Array[Byte],
                                   pos: Int): Option[(Array[Byte], Int)] = {
    val n = bytes.length
    if (pos + 10 > n || (bytes(pos) & 0xff) != 0x1f ||
        (bytes(pos + 1) & 0xff) != 0x8b || bytes(pos + 2) != 8) return None
    val flg = bytes(pos + 3) & 0xff
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
      if (p + 2 > n) return None
      p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
      if (p > n) return None
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      while (p < n && bytes(p) != 0) p += 1
      if (p >= n) return None else p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      while (p < n && bytes(p) != 0) p += 1
      if (p >= n) return None else p += 1
    }
    if ((flg & 2) != 0) { p += 2; if (p > n) return None } // FHCRC
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, n - p)
      val out = new java.io.ByteArrayOutputStream(8192)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (k == 0 && !inf.finished()) return None // truncated stream
        out.write(buf, 0, k)
        if (out.size() > MaxInflatedMember) return None // bomb clamp
      }
      val end = p + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE trailer
      if (end > n) None else Some((out.toByteArray, end))
    } finally inf.end()
  }

  private def parsePlain(chunkId: Long, bytes: Array[Byte],
                         startIdx: Long, keepBody: Boolean): Seq[Parsed] = {
    // (record, body, startPos, refersTo, payloadDigest) tuples; spans
    // are patched in afterwards (a record's byte span runs to the NEXT
    // record's start, so the trailing CRLFCRLF padding belongs to the
    // record that wrote it)
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(WarcRecord, Array[Byte], Int, String, String)]
    var pos = 0
    var idx = startIdx
    val n = bytes.length
    val noBody = Array.emptyByteArray
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    def spans(): Seq[Parsed] = acc.toSeq.zipWithIndex.map {
      case ((r, b, s, rt, pd), i) =>
        val end = if (i + 1 < acc.length) acc(i + 1)._3 else n
        Parsed(r, b, s.toLong, (end - s).toLong, rt, pd)
    }
    while (pos < n) {
      // resynchronize: skip inter-record padding to the next "WARC/"
      while (pos < n && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= n) return spans()
      val start = pos
      val le = lineEnd(pos)
      val version =
        if (le < 0) "" else new String(bytes, pos, le - pos, StandardCharsets.UTF_8)
      if (!version.startsWith("WARC/")) {
        acc += ((WarcRecord(chunkId, idx, "malformed", "", "", -1L, "", false,
          ""), noBody, start, "", ""))
        return spans() // no record boundary left to trust
      }
      pos = le + 2
      // headers until the blank line
      var wtype = ""; var uri = ""; var ctype = ""; var clen = -1L
      var trunc = ""
      var refersTo = ""; var payloadDigest = ""
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
              case "warc-truncated"  =>
                // WARC 1.1 §5.13: the crawler cut this capture short;
                // reasons are length/time/disconnect/unspecified. A
                // valueless header still marks truncation.
                trunc = if (v.isEmpty) "unspecified" else v.toLowerCase
              case "warc-refers-to-target-uri" => refersTo = v
              case "warc-payload-digest"       => payloadDigest = v
              case _ => ()
            }
          }
          pos = he + 2
        }
      }
      // body: exactly clen bytes, clamped against the remaining buffer
      if (truncated || clen < 0 || clen > (n - pos).toLong) {
        acc += ((WarcRecord(chunkId, idx,
          if (truncated) "truncated" else "malformed",
          uri, ctype, clen, "", false, trunc), noBody, start, refersTo,
          payloadDigest))
        return spans() // cannot trust the cursor past a bad length
      }
      val md5hex = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.update(bytes, pos, clen.toInt)
        d.digest().map("%02x".format(_)).mkString
      }
      val body =
        if (keepBody) java.util.Arrays.copyOfRange(bytes, pos, pos + clen.toInt)
        else noBody
      acc += ((WarcRecord(chunkId, idx, wtype, uri, ctype, clen, md5hex,
        true, trunc), body, start, refersTo, payloadDigest))
      pos += clen.toInt
      idx += 1
    }
    spans()
  }
}
