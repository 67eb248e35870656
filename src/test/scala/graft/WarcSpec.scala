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

  test("WARC-Truncated surfaces as truncated_reason: valued, valueless " +
    "-> unspecified, case-folded, absent -> empty") {
    def trec(hdr: String): String =
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u/t\r\n" +
        hdr + "Content-Type: text/plain\r\nContent-Length: 4\r\n\r\n" +
        "body\r\n\r\n"
    val bytes = (trec("WARC-Truncated: length\r\n") +
      trec("WARC-Truncated:\r\n") + trec("Warc-Truncated: TIME\r\n") +
      trec("")).getBytes("UTF-8")
    val got = Warc.parseChunk(9L, bytes)
    assert(got.map(_.truncated_reason) ===
      Seq("length", "unspecified", "time", ""))
    assert(got.forall(_.valid)) // a truncated CAPTURE is a valid RECORD
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

  private def gzipBytes(plain: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(plain); g.close()
    out.toByteArray
  }

  test("gzip member stream: parse equals the plain parse of the same " +
    "records; multi-byte bodies keep sync across member boundaries") {
    val recs = Seq(rec("u/1", "plain body"), rec("u/2", "héllo wörld ünïcode"),
      rec("u/3", "after multibyte"))
    val gz = recs.flatMap(r => gzipBytes(r.getBytes("UTF-8"))).toArray
    val plain = Warc.parseChunk(7L, recs.mkString.getBytes("UTF-8"))
    val got = Warc.parseChunk(7L, gz)
    assert(got === plain && got.size === 3 && got.forall(_.valid))
  }

  test("gzip hostile inputs: truncated member, garbage between members, " +
    "FLG header fields, bad CM — flagged rows, never throws") {
    val one = gzipBytes(rec("u/ok", "good body").getBytes("UTF-8"))
    // truncated mid-member: good record survives, then one malformed row
    val trunc = one ++ gzipBytes(rec("u/2", "lost").getBytes("UTF-8"))
      .dropRight(12)
    val t = Warc.parseChunk(1L, trunc)
    assert(t.size === 2 && t.head.valid && t.head.target_uri === "u/ok" &&
      !t(1).valid && t(1).warc_type === "malformed")
    // garbage where the next member should start
    val gap = one ++ "NOT-GZIP".getBytes("UTF-8")
    val g = Warc.parseChunk(2L, gap)
    assert(g.size === 2 && g.head.valid && !g(1).valid)
    // gzip magic but unsupported compression method
    val badCm = one.clone(); badCm(2) = 9
    val b = Warc.parseChunk(3L, badCm)
    assert(b.size === 1 && !b.head.valid && b.head.warc_type === "malformed")
    // FLG optional fields (FEXTRA + FNAME + FCOMMENT + FHCRC) are skipped:
    // rebuild the member with a hand-rolled header carrying all of them
    val plain = rec("u/flg", "flagged header body").getBytes("UTF-8")
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(plain); deflater.finish()
    val compBuf = new Array[Byte](plain.length + 64)
    val compLen = deflater.deflate(compBuf); deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(plain)
    val header = Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16 | 2).toByte,
        0, 0, 0, 0, 0, 0) ++
      Array[Byte](3, 0) ++ Array[Byte](1, 2, 3) ++          // FEXTRA len+data
      "name.warc".getBytes("UTF-8") ++ Array[Byte](0) ++    // FNAME
      "comment".getBytes("UTF-8") ++ Array[Byte](0) ++      // FCOMMENT
      Array[Byte](0x11, 0x22)                               // FHCRC (unchecked)
    val trailer = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).putInt(plain.length).array()
    val flagged = header ++ compBuf.take(compLen) ++ trailer ++ one
    val f = Warc.parseChunk(4L, flagged)
    assert(f.size === 2 && f.forall(_.valid) &&
      f.map(_.target_uri) === Seq("u/flg", "u/ok"))
  }

  test("gzip synthesis parses byte-identically to plain synthesis; messy " +
    "URIs ride the envelope") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text").limit(24)
    val plain = Warc.parseWarc(spark, Warc.syntheticWarcChunks(docs))
      .toDF().orderBy("chunk_id", "rec_idx").collect().toSeq
    val gz = Warc.parseWarc(spark, Warc.syntheticWarcGzipChunks(spark, docs))
      .toDF().orderBy("chunk_id", "rec_idx").collect().toSeq
    assert(gz === plain && gz.nonEmpty)
    val uri = concat(lit("HTTP://X.org/"), col("doc_id"))
    val messy = Warc.parseWarcText(spark,
        Warc.syntheticWarcGzipChunks(spark, docs, uri = uri)).toDF()
    assert(messy.filter(col("target_uri").startsWith("HTTP://X.org/")).count()
      === docs.count())
    // parseWarcText bodies round-trip the original text exactly
    val bodies = messy.select(
      regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long")
        .as("doc_id"), col("body"))
    assert(bodies.join(docs, Seq("doc_id"))
      .filter(col("body") =!= col("text")).count() === 0)
  }

  test("parseWarcIndex gzip locators: each record's span is its COMPRESSED " +
    "member — slicing the payload at the locator re-inflates the record") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text").limit(16)
    val chunks = Warc.syntheticWarcGzipChunks(spark, docs).collect()
      .map(r => r.getAs[Long]("chunk_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    val idx = Warc.parseWarcIndex(spark,
        Warc.syntheticWarcGzipChunks(spark, docs)).collect()
    assert(idx.nonEmpty && idx.forall(_.getAs[Boolean]("valid")))
    for (r <- idx) {
      val payload = chunks(r.getAs[Long]("chunk_id"))
      val off = r.getAs[Long]("rec_offset").toInt
      val len = r.getAs[Long]("rec_bytes").toInt
      // the member slice inflates standalone to exactly one record whose
      // parse matches the indexed row
      val slice = java.util.Arrays.copyOfRange(payload, off, off + len)
      val Some((member, end)) = Warc.inflateMember(slice, 0)
      assert(end === len, "member span must cover the slice exactly")
      val one = Warc.parseChunk(-1L, member)
      assert(one.size === 1 && one.head.valid &&
        one.head.target_uri === r.getAs[String]("target_uri") &&
        one.head.body_md5 === r.getAs[String]("body_md5"))
    }
    // spans tile each chunk: offsets sorted, contiguous, summing to size
    idx.groupBy(_.getAs[Long]("chunk_id")).foreach { case (cid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rec_idx"))
        .map(r => (r.getAs[Long]("rec_offset"), r.getAs[Long]("rec_bytes")))
      assert(sorted.head._1 === 0L)
      sorted.sliding(2).foreach {
        case Array((o1, b1), (o2, _)) => assert(o1 + b1 === o2)
        case _ => ()
      }
      assert(sorted.last._1 + sorted.last._2 === chunks(cid).length.toLong)
    }
  }

  test("parseWarcIndex plain locators agree with the record-string spans") {
    val bytes = (rec("u/1", "first body") + rec("u/2", "sécond bödy"))
      .getBytes("UTF-8")
    val got = Warc.parseRecords(5L, bytes)
    val r1len = rec("u/1", "first body").getBytes("UTF-8").length.toLong
    assert(got.map(p => (p.offset, p.recBytes)) ===
      Seq((0L, r1len), (r1len, bytes.length - r1len)))
  }

  test("gunzipTextColumn: multi-member concatenation, plain pass-through, " +
    "corrupt-tail flag") {
    def gz(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(s.getBytes("UTF-8")); g.close()
      out.toByteArray
    }
    val rows = Seq(
      ("two_members", gz("<url>a</url>") ++ gz("<url>b</url>")),
      ("plain", "<url>p</url>".getBytes("UTF-8")),
      ("empty", Array.emptyByteArray),
      ("corrupt_tail", gz("<url>c</url>") ++ Array[Byte](0x1f, 0x8b.toByte, 8)))
    val df = spark.createDataFrame(rows).toDF("k", "b")
    val got = Warc.gunzipTextColumn(spark, df, "k", "b", "xml")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(got("two_members") === (("<url>a</url><url>b</url>", true)))
    assert(got("plain") === (("<url>p</url>", true)))
    assert(got("empty") === (("", true)))
    assert(got("corrupt_tail") === (("<url>c</url>", false)))
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

  test("wetRecords: conversion records round-trip through the cursor, " +
    "Content-Length counts UTF-8 octets on non-ASCII text, null texts " +
    "and null uris drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://a.org/1", "plain ascii"),
      (2L, "http://a.org/2", "café à l'été"), // octets > chars
      (3L, "http://a.org/3", null),
      (4L, null, "orphan text")) // null uri nulls the concat — drop it too
      .toDF("doc_id", "url", "text")
    val recs = Warc.wetRecords(docs,
      date = lit("2026-08-16T00:00:00Z"))
    assert(recs.count() === 2) // the null-text AND null-uri rows dropped
    assert(recs.filter(col("wet_record").isNull).count() === 0)
    val rec2 = recs.filter(col("doc_id") === 2)
      .select("wet_record").as[String].head()
    val bodyOctets = "café à l'été"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(rec2.contains(s"Content-Length: $bodyOctets\r\n"))
    assert(rec2.contains("WARC-Type: conversion\r\n"))
    assert(rec2.contains("WARC-Date: 2026-08-16T00:00:00Z\r\n"))
    // concatenated records ARE a WET file: the library's own cursor
    // recovers every field
    val chunk = recs.orderBy("doc_id")
      .agg(concat_ws("", collect_list(col("wet_record"))).as("c"))
      .select(encode(col("c"), "UTF-8").as("payload"))
      .withColumn("chunk_id", lit(0L))
    val back = Warc.parseWarcText(spark, chunk).toDF()
      .orderBy("rec_idx")
      .select("warc_type", "target_uri", "content_length", "body", "valid")
      .as[(String, String, Long, String, Boolean)].collect().toList
    assert(back === List(
      ("conversion", "http://a.org/1", 11L, "plain ascii", true),
      ("conversion", "http://a.org/2", bodyOctets.toLong,
        "café à l'été", true)))
  }

  test("fetchByLocator: gzip locators dereference to exactly their " +
    "record (distributed random access); a drifted locator surfaces as " +
    "an invalid row, never an exception") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text").limit(16)
    val gz = Warc.syntheticWarcGzipChunks(spark, docs).localCheckpoint()
    val idx = Warc.parseWarcIndex(spark, gz).localCheckpoint()
    val fetched = Warc.fetchByLocator(spark, gz, idx).toDF()
    // every locator dereferences to a valid record whose uri/length
    // match the whole-chunk parse of the same coordinates
    val whole = Warc.parseWarcText(spark, gz).toDF()
      .select("chunk_id", "rec_idx", "warc_type", "target_uri",
        "content_type", "content_length", "body", "valid")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(fetched) === rows(whole))
    assert(fetched.filter(!col("valid")).count() === 0)
    // a subset fetch touches only its rows
    val some = Warc.fetchByLocator(spark, gz,
      idx.filter(col("rec_idx") === 1L)).toDF()
    assert(rows(some) === rows(whole.filter(col("rec_idx") === 1L)))
    // drift every offset by one byte: the slice no longer starts on a
    // gzip member / version line — flagged rows, no exception
    val drifted = Warc.fetchByLocator(spark, gz,
      idx.withColumn("rec_offset", col("rec_offset") + 1)).toDF()
    assert(drifted.count() === idx.count())
    assert(drifted.filter(col("valid")).count() === 0)
    // a locator whose chunk is MISSING still yields its row (invalid),
    // never a silently shorter result
    val foreign = Warc.fetchByLocator(spark, gz,
      idx.limit(1).withColumn("chunk_id", lit(999L))).toDF()
    assert(foreign.count() === 1)
    assert(foreign.filter(col("valid")).count() === 0)
  }

  test("revisitDedup: first capture per digest stays a response, later " +
    "captures become 0-length revisit stubs naming the first; a stub " +
    "mid-chunk never desyncs the cursor; non-ASCII octets counted") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://a.org/1", "café dup"), // digest group A, first (min uri)
      (2L, "http://a.org/2", "café dup"), // group A, revisit
      (3L, "http://a.org/3", "unique"),   // its own group
      (4L, "http://a.org/4", "café dup")  // group A, revisit
    ).toDF("doc_id", "url", "text")
    val out = Warc.revisitDedup(docs).orderBy("doc_id")
    val rows = out.select("doc_id", "is_revisit", "refers_to").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(rows === Seq((1L, false, ""), (2L, true, "http://a.org/1"),
      (3L, false, ""), (4L, true, "http://a.org/1")))
    // one chunk holding response, stub, response, stub IN ORDER: the
    // stub's 0-length framing must hand the cursor cleanly to the next
    val chunk = out.orderBy("doc_id")
      .agg(concat_ws("", collect_list(col("warc_record"))).as("c"))
      .select(encode(col("c"), "UTF-8").as("payload"))
      .withColumn("chunk_id", lit(0L))
    val back = Warc.parseWarcText(spark, chunk).toDF().orderBy("rec_idx")
      .select("warc_type", "target_uri", "content_length", "body", "valid")
      .collect().map(_.toSeq)
    // first captures are FULL application/http response blocks (the r15
    // fidelity upgrade): the envelope's body IS the HTTP message
    def http(body: String): String = {
      val o = body.getBytes("UTF-8").length
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: $o\r\n\r\n$body"
    }
    def octets(s0: String): Long = s0.getBytes("UTF-8").length.toLong
    assert(back.toSeq === Seq(
      Seq("response", "http://a.org/1", octets(http("café dup")),
        http("café dup"), true),
      Seq("revisit", "http://a.org/2", 0L, "", true),
      Seq("response", "http://a.org/3", octets(http("unique")),
        http("unique"), true),
      Seq("revisit", "http://a.org/4", 0L, "", true)))
    // ...and the HTTP layer decodes back to the original text
    val decoded = Warc.parseWarcHttpDocs(spark, chunk).toDF()
      .orderBy("rec_idx")
      .select("status_code", "content_type", "charset", "text")
      .collect().map(_.toSeq)
    assert(decoded.toSeq === Seq(
      Seq(200, "text/html", "utf-8", "café dup"),
      Seq(null, "", "", ""), // a stub's empty block has no HTTP layer
      Seq(200, "text/html", "utf-8", "unique"),
      Seq(null, "", "", "")))
  }

  test("packSegments: target-sized segments whose locators round-trip " +
    "through fetchByLocator — plain offsets byte-exact, gzip locators " +
    "rebuilt via parseWarcIndex (the real CDX build), record sets " +
    "identical across both layouts") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .filter(col("text").isNotNull).limit(30)
      .select(col("doc_id"), (col("doc_id") % 3).cast("int").as("shard"),
        concat(lit("http://p.org/"), col("doc_id").cast("string"))
          .as("url"),
        col("text"))
    val packed = Warc.packSegments(
        Warc.wetRecords(docs).withColumnRenamed("wet_record", "warc_record"),
        shardCol = "shard", ordCol = "doc_id",
        targetSegmentBytes = 1500L)
      .localCheckpoint()
    // floor-division packing invariant: every record STARTS inside its
    // segment's target window (offsets < target; overrun is bounded by
    // one record, the documented target-size semantic)
    assert(packed.filter(col("rec_offset") >= 1500L).count() === 0)
    assert(packed.select("segment_id").distinct().count() > 3,
      "the fixture must actually span several segments")
    // plain layout: packSegments' own offsets ARE the locators
    val plain = Warc.segmentPayloads(packed).localCheckpoint()
    val locs = packed.select(col("segment_id").as("chunk_id"),
      col("rec_idx"), col("rec_offset"), col("rec_bytes"),
      lit(true).as("valid"))
    val fetched = Warc.fetchByLocator(spark, plain, locs).toDF()
    assert(fetched.filter(!col("valid")).count() === 0)
    val texts = docs.select(col("url").as("target_uri"), col("text"))
    assert(fetched.join(texts, Seq("target_uri"))
      .filter(col("body") =!= col("text")).count() === 0)
    assert(fetched.count() === 30)
    // gzip layout: per-record members; compressed locators come from
    // the index builder over the packed payloads
    val gz = Warc.segmentPayloadsGzip(spark, packed).localCheckpoint()
    val idx = Warc.parseWarcIndex(spark, gz)
    assert(idx.filter(!col("valid")).count() === 0)
    val fetchedGz = Warc.fetchByLocator(spark, gz, idx).toDF()
    def recs(df: org.apache.spark.sql.DataFrame) = df
      .select("warc_type", "target_uri", "content_length", "body", "valid")
      .collect().map(_.toSeq).toSet
    assert(recs(fetchedGz) === recs(fetched))
  }

  test("packSegments: duplicate ord keys pair each record's rec_idx " +
    "with its OWN cumulative offset (shared (ord, record) tiebreaker " +
    "across both windows) — locators round-trip byte-exact; target " +
    "size is fail-fast capped at 1.5 GiB") {
    val s = spark
    import s.implicits._
    // every row shares ONE ord key; record lengths all differ, so a
    // cross-wired pairing (rec_idx from one sort order, rec_offset
    // from another) would place locators mid-record and garble fetches
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .filter(col("text").isNotNull).limit(20)
      .select(col("doc_id"), lit(0).as("shard"), lit(0L).as("ord"),
        concat(lit("http://d.org/"), col("doc_id").cast("string"))
          .as("url"),
        col("text"))
    val packed = Warc.packSegments(
        Warc.wetRecords(docs).withColumnRenamed("wet_record", "warc_record"),
        shardCol = "shard", ordCol = "ord", targetSegmentBytes = 1200L)
      .localCheckpoint()
    assert(packed.select("segment_id").distinct().count() > 1)
    // per segment, offsets must be EXACTLY the running sum of
    // rec_bytes in rec_idx order (any swap between the two windows
    // breaks this for unequal lengths)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("segment_id").orderBy("rec_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    assert(packed.withColumn("graft_exp",
        coalesce(sum("rec_bytes").over(w), lit(0L)))
      .filter(col("rec_offset") =!= col("graft_exp")).count() === 0)
    // and the locators dereference to the right documents
    val fetched = Warc.fetchByLocator(spark, Warc.segmentPayloads(packed),
      packed.select(col("segment_id").as("chunk_id"), col("rec_idx"),
        col("rec_offset"), col("rec_bytes"), lit(true).as("valid"))).toDF()
    assert(fetched.filter(!col("valid")).count() === 0)
    assert(fetched.join(docs.select(col("url").as("target_uri"),
        col("text")), Seq("target_uri"))
      .filter(col("body") =!= col("text")).count() === 0)
    assert(fetched.count() === 20)
    // fail-fast guard: the boundary passes, one byte past it raises at
    // PACK time (the 2 GiB per-row array bound would otherwise fail
    // deep inside payload assembly)
    Warc.packSegments(packed.select(col("shard"), col("ord"),
      col("warc_record")), targetSegmentBytes = Warc.MaxTargetSegmentBytes)
    val ex = intercept[IllegalArgumentException] {
      Warc.packSegments(packed.select(col("shard"), col("ord"),
        col("warc_record")),
        targetSegmentBytes = Warc.MaxTargetSegmentBytes + 1)
    }
    assert(ex.getMessage.contains("1.5 GiB"))
  }

  test("cdxClusterIndex: globally sorted fixed-size blocks whose " +
    "summaries drive the cluster.idx lookup — binary-search the entry " +
    "table, fetch ONE block, find the line") {
    val s = spark
    import s.implicits._
    val lines = Tables.documents(spark, SparkSpec.sf0001)
      .select(col("doc_id"),
        concat(lit("org,h"), (col("doc_id") % 5).cast("string"),
          lit(")/p/"), col("doc_id").cast("string")).as("urlkey"))
      .withColumn("cdxj_line", concat(col("urlkey"), lit(" 2026 {}")))
    val blocked = Warc.cdxClusterIndex(spark, lines, linesPerBlock = 8L)
      .localCheckpoint()
    val n = blocked.count()
    // block layout invariants: every block but the last holds exactly
    // 8 lines, ranks are a permutation of 1..n, and consecutive blocks
    // never interleave key ranges
    val sizes = blocked.groupBy("block").count().orderBy("block")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.init.forall(_._2 == 8L) && sizes.last._2 <= 8L)
    assert(blocked.select("rank").distinct().count() === n)
    val summaries = Warc.cdxClusterSummaries(blocked).orderBy("block")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(summaries.map(_._3).sum === n)
    val maxPerBlock = blocked.groupBy("block")
      .agg(max("urlkey").as("mx")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    summaries.sliding(2).foreach {
      case Array((b1, _, _), (_, k2, _)) =>
        assert(maxPerBlock(b1) <= k2,
          s"block $b1 range overlaps the next block's first key")
      case _ => ()
    }
    // the lookup path: binary-search the (tiny, collected) entry table
    // for the LAST block whose first_urlkey <= probe, fetch that one
    // block, scan <= linesPerBlock lines
    val probeId = 37L
    val probe = s"org,h${probeId % 5})/p/$probeId"
    val keys = summaries.map(_._2)
    val bi = {
      var lo = 0; var hi = keys.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (keys(mid) <= probe) lo = mid else hi = mid - 1
      }
      summaries(lo)._1
    }
    val hit = blocked.filter(col("block") === bi &&
        col("urlkey") === probe)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(probeId), s"probe $probe must resolve in block $bi")
  }

  test("resolveRevisits: stubs dereference through the index to their " +
    "first capture's decoded payload (digest-verified); a missing first " +
    "capture or a lying digest surfaces as valid=false; a same-url " +
    "recrawl stub resolves to the RESPONSE at its own uri") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://a.org/1", "café dup"),
      (2L, "http://a.org/2", "café dup"),   // stub → a.org/1
      (3L, "http://a.org/3", "unique"),
      (4L, "http://a.org/4", "café dup"))   // stub → a.org/1
      .toDF("doc_id", "url", "text")
    val out = Warc.revisitDedup(docs)
    // deterministic record order inside the chunk: sort by `ord`
    def chunksOf(df: org.apache.spark.sql.DataFrame, cid: Long) = df
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("ord"), col("warc_record")))),
        x => x.getField("warc_record")), "").as("c"))
      .select(encode(col("c"), "UTF-8").as("payload"))
      .withColumn("chunk_id", lit(cid))
    val chunk = chunksOf(out.select(col("doc_id").as("ord"),
      col("warc_record")), 0L).localCheckpoint()
    val idx = Warc.parseWarcIndex(spark, chunk).localCheckpoint()
    val got = Warc.resolveRevisits(spark, chunk, idx)
      .select("target_uri", "is_revisit", "refers_to", "text", "valid")
      .collect().map(_.toSeq).toSet
    assert(got === Set(
      Seq("http://a.org/1", false, "", "café dup", true),
      Seq("http://a.org/2", true, "http://a.org/1", "café dup", true),
      Seq("http://a.org/3", false, "", "unique", true),
      Seq("http://a.org/4", true, "http://a.org/1", "café dup", true)))
    // same-url recrawl (the RevisitGateLink shape): a stub whose uri ==
    // refers_to must resolve to the RESPONSE record at that uri, not
    // itself — the index's warc_type is what disambiguates
    val recrawl = out.filter(!col("is_revisit") && col("doc_id") === 1L)
      .select(lit(99L).as("ord"), Warc.revisitStub(col("url"), col("url"),
        col("digest"), lit("2026-01-02T00:00:00Z")).as("warc_record"))
    val chunk2 = chunksOf(out.select(col("doc_id").as("ord"),
      col("warc_record")).unionByName(recrawl), 0L).localCheckpoint()
    val idx2 = Warc.parseWarcIndex(spark, chunk2).localCheckpoint()
    val got2 = Warc.resolveRevisits(spark, chunk2, idx2)
      .filter(col("rec_idx") === 4L)
      .select("target_uri", "refers_to", "text", "valid")
      .collect().map(_.toSeq).toSeq
    assert(got2 === Seq(
      Seq("http://a.org/1", "http://a.org/1", "café dup", true)))
    // drop the first capture from the archive: its stubs CANNOT resolve
    // and must say so (valid=false, empty text), never silently
    val noFirst = chunksOf(out.filter(col("url") =!= "http://a.org/1")
      .select(col("doc_id").as("ord"), col("warc_record")), 0L)
      .localCheckpoint()
    val idx3 = Warc.parseWarcIndex(spark, noFirst).localCheckpoint()
    val got3 = Warc.resolveRevisits(spark, noFirst, idx3)
      .filter(col("is_revisit"))
      .select("target_uri", "text", "valid")
      .collect().map(_.toSeq).toSet
    assert(got3 === Set(
      Seq("http://a.org/2", "", false),
      Seq("http://a.org/4", "", false)))
    // a lying digest fails verification even when the locator resolves
    val lying = chunksOf(out.filter(!col("is_revisit"))
      .select(col("doc_id").as("ord"), col("warc_record"))
      .unionByName(out.filter(col("doc_id") === 2L)
        .select(lit(99L).as("ord"),
          Warc.revisitStub(col("url"), col("refers_to"),
            lit("0123456789abcdef0123456789abcdef"),
            lit("2026-01-01T00:00:00Z")).as("warc_record"))), 0L)
      .localCheckpoint()
    val idx4 = Warc.parseWarcIndex(spark, lying).localCheckpoint()
    val got4 = Warc.resolveRevisits(spark, lying, idx4)
      .filter(col("is_revisit"))
      .select("valid").collect().map(_.getBoolean(0)).toSeq
    assert(got4 === Seq(false))
  }
}
