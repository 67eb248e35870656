package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.runtime.{Link, NearDupGateLink, StreamRegistry}

/** Capstone integration: the reference's Link microservice surface running
  * the LLM-curation operators as a STREAMING pipeline — the deployment
  * shape a reference user migrating a curation microservice would build
  * (docs MIGRATION.md §1 + SURVEY.md §2.3 composed).
  *
  * The link consumes a raw documents stream, applies the quality gate as
  * a row-level streaming filter, content-addresses each survivor with
  * blake2b-256 (the reference's canonical hash), and drops exact
  * duplicates ACROSS batches with streaming dropDuplicates state — the
  * incremental form of exact dedup, with the dedup ledger living in the
  * link's exactly-once checkpoint rather than a side table. */
class StreamingCurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  object CurationLink extends Link {
    val inputs = Seq("docs_raw"); val output = Some("docs_clean")
    override def transform(df: DataFrame): DataFrame = {
      val toks = split(col("text"), " ")
      df.filter(size(toks) >= 3 &&
          (size(array_distinct(toks)).cast("double") / size(toks)) >= 0.5)
        .withColumn("content_hash", GraftFunctions.blake2b_256(col("text")))
        .dropDuplicates("content_hash")
    }
  }

  test("streaming curation link: gates + cross-batch exact dedup, exactly once") {
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-cur-stream").toString)
    reg.write(docs(
      1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox jumps", // exact dup of 1 (same batch)
      3L -> "ok ok ok ok ok ok",         // fails uniq-ratio gate
      4L -> "too short",                 // fails min-token gate
      5L -> "a genuinely different document body"), "docs_raw")
    CurationLink.start(spark, reg).awaitTermination()
    val round1 = reg.read("docs_clean").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // gates dropped 3 and 4; the dup pair collapsed to one survivor
    assert(round1.keySet.subsetOf(Set(1L, 2L, 5L)) && round1.size === 2)
    assert(round1.values.toSet ===
      Set("the quick brown fox jumps", "a genuinely different document body"))

    // batch 2: one doc already seen in batch 1, one new — the dedup state
    // in the checkpoint must suppress the re-send across restarts
    reg.write(docs(
      6L -> "the quick brown fox jumps", // cross-batch exact dup
      7L -> "fresh unseen content arrives here"), "docs_raw")
    CurationLink.start(spark, reg).awaitTermination()
    val round2 = reg.read("docs_clean").collect().map(_.getAs[String]("text"))
    assert(round2.length === 3, round2.mkString("; "))
    assert(round2.count(_ == "the quick brown fox jumps") === 1,
      "cross-batch duplicate must not be re-emitted")
    assert(round2.contains("fresh unseen content arrives here"))

    // replaying with no new input emits nothing (exactly-once offsets)
    CurationLink.start(spark, reg).awaitTermination()
    assert(reg.read("docs_clean").count() === 3)
  }

  test("streaming WARC ingestion link: batch/streaming record parity " +
    "across plain and gzip chunks, exactly-once on replay") {
    import graft.ops.Warc
    import graft.runtime.WarcIngestLink
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-warc-stream").toString)
    val fixture = Tables.documents(spark, SparkSpec.sf0001)
      .select("doc_id", "text").limit(32)
    val plainChunks = Warc.syntheticWarcChunks(
      fixture.filter(col("doc_id") < 16))
    val gzipChunks = Warc.syntheticWarcGzipChunks(spark,
      fixture.filter(col("doc_id") >= 16))
    val link = new WarcIngestLink("warc_chunks", "warc_records")

    // batch 1: plain chunks
    reg.write(plainChunks, "warc_chunks")
    link.start(spark, reg).awaitTermination()
    // batch 2: gzip member-stream chunks through the SAME link
    reg.write(gzipChunks, "warc_chunks")
    link.start(spark, reg).awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val streamed = rows(reg.read("warc_records"))
    val batch = rows(
      Warc.parseWarc(spark, plainChunks.union(gzipChunks)).toDF())
    assert(streamed.nonEmpty && streamed === batch,
      "streaming parse must equal the batch parse of the same chunks")
    // replay with no new chunks: exactly-once offsets append nothing
    link.start(spark, reg).awaitTermination()
    assert(reg.read("warc_records").count() === batch.size.toLong)

    // the bytes→text link decodes the SAME chunks to documents with
    // batch parity (UTF-8 synthetic bodies → pass-through decode)
    import graft.runtime.WarcHttpIngestLink
    val httpLink = new WarcHttpIngestLink("warc_chunks", "warc_docs")
    httpLink.start(spark, reg).awaitTermination()
    val streamedDocs = rows(reg.read("warc_docs"))
    val batchDocs = rows(
      Warc.parseWarcHttpDocs(spark, plainChunks.union(gzipChunks)).toDF())
    assert(streamedDocs.nonEmpty && streamedDocs === batchDocs)
  }

  test("composed crawl loop: WARC ingest → quality gate → near-dup gate " +
    "as ONE multi-link pipeline — batch parity per stage, incremental " +
    "corpus across batches, exactly-once replay") {
    import graft.ops.{Curation, Warc, WebText}
    import graft.runtime.{Pipeline, WarcHttpIngestLink}
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val b = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val c = "red orange yellow green blue indigo violet crimson amber teal " +
      "magenta cyan maroon olive navy coral salmon ivory jade pearl"
    // 10/20 near-dup their earlier siblings; 12/22 must die at the gate
    val batch1 = Seq(10L -> (a + " uniform"), 11L -> b,
      12L -> "ok ok ok ok ok ok")
    val batch2 = Seq(20L -> (b + " extra"), 21L -> c, 22L -> "too short")
    // the q189 messy-URI synthesis: canonicalization must recover the
    // clean doc URL before gating/dedup keys off it
    val messyUri = concat(lit("HTTP://WWW.Example.COM:80//doc//"),
      col("doc_id"), lit("?utm_source=warc#frag"))

    object GateLink extends Link {
      val inputs = Seq("crawl_docs"); val output = Some("crawl_gated")
      override def transform(df: DataFrame): DataFrame = {
        val canon = df.filter(col("valid"))
          .select(WebText.canonicalUrl(col("target_uri")).as("url"),
            col("text"))
        Curation.qualityGates(canon).filter(col("passes"))
          .select(regexp_extract(col("url"), "([0-9]+)$", 1).cast("long")
            .as("doc_id"), col("url"), col("text"))
      }
    }
    val ndLink = new NearDupGateLink("crawl_gated", "crawl_corpus",
      "crawl_pairs", minJaccard = 0.8)
    val pipeline = new Pipeline(Seq(
      new WarcHttpIngestLink("crawl_chunks", "crawl_docs"),
      GateLink, ndLink))

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-crawl-loop").toString)
    reg.write(docs(1L -> a), "crawl_corpus") // pre-seeded corpus
    val chunks1 = Warc.syntheticWarcChunks(docs(batch1: _*), uri = messyUri)
    val chunks2 = Warc.syntheticWarcGzipChunks(spark, docs(batch2: _*),
      uri = messyUri)
    reg.write(chunks1, "crawl_chunks")
    pipeline.runOnce(spark, reg)
    reg.write(chunks2, "crawl_chunks")
    pipeline.runOnce(spark, reg)

    // stage parity 1+2: the streamed gated rows equal the batch
    // parse → canonicalize → gate plan over the SAME chunks (plain +
    // gzip), i.e. q189's front half
    def gatedBatch(chunks: DataFrame): DataFrame =
      GateLink.transform(Warc.parseWarcHttpDocs(spark, chunks).toDF())
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val gatedStreamed = rows(reg.read("crawl_gated"))
    assert(gatedStreamed === rows(gatedBatch(chunks1.union(chunks2))))
    assert(gatedStreamed.map(_.head) === Set(10L, 11L, 20L, 21L),
      "gate must pass exactly the four quality docs")

    // stage parity 3: pairs equal the batch replication of the
    // incremental screen-then-admit protocol over the same two batches
    def pairsOf(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_corpus"),
        r.getAs[Double]("jaccard"))).toSet
    var corpus = docs(1L -> a)
    val expected = scala.collection.mutable.Set[(Long, Long, Double)]()
    for (chunks <- Seq(chunks1, chunks2)) {
      val bdf = gatedBatch(chunks).select("doc_id", "text")
      val p = graft.ops.Dedup.minHashLshAgainstCorpus(corpus, bdf, 0.8)
      expected ++= pairsOf(p)
      corpus = corpus.union(bdf.join(
        p.select(col("doc_new").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti"))
    }
    val streamedPairs = pairsOf(reg.read("crawl_pairs"))
    assert(streamedPairs === expected.toSet)
    // 20 matched 11 — admitted one batch earlier THROUGH the pipeline:
    // the loop genuinely accumulates its own output as screening corpus
    assert(streamedPairs.exists(p => p._1 == 20L && p._2 == 11L))
    assert(streamedPairs.exists(p => p._1 == 10L && p._2 == 1L))
    assert(reg.read("crawl_corpus").collect().map(_.getAs[Long]("doc_id"))
      .sorted === Array(1L, 11L, 21L))

    // replay with no new chunks: every stage appends nothing
    val before = Seq("crawl_docs", "crawl_gated", "crawl_corpus",
      "crawl_pairs").map(s => reg.read(s).count())
    pipeline.runOnce(spark, reg)
    val after = Seq("crawl_docs", "crawl_gated", "crawl_corpus",
      "crawl_pairs").map(s => reg.read(s).count())
    assert(after === before, "exactly-once replay must be a no-op")
  }

  test("streaming main-content link: per-batch window parity with the " +
    "batch extractor, exactly-once replay") {
    import graft.ops.WebText
    import graft.runtime.MainContentLink
    val s = spark
    import s.implicits._
    val prose = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    def page(u: String): (String, String) = u ->
      ("<div><a href='/1'>Home</a> <a href='/2'>About</a></div>" +
        s"<h1>$u</h1><p>$prose about $u</p>" +
        "<div><a href='/t'>Terms</a> <a href='/p'>Privacy</a></div>")
    val b1 = Seq(page("u1"), page("u2"))
    val b2 = Seq(page("u3"))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-mc-stream").toString)
    val link = new MainContentLink("mc_pages", "mc_out")
    reg.write(b1.toDF("url", "html"), "mc_pages")
    link.start(spark, reg).awaitTermination()
    reg.write(b2.toDF("url", "html"), "mc_pages")
    link.start(spark, reg).awaitTermination()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val streamed = rows(reg.read("mc_out"))
    val batch = rows(WebText.mainContent((b1 ++ b2).toDF("url", "html")))
    assert(streamed.size === 3 && streamed === batch)
    // chrome dropped, body kept — the extraction genuinely ran
    val texts = reg.read("mc_out").select("main_text")
      .as[String].collect()
    assert(texts.forall(t => t.contains(prose) && !t.contains("Privacy")))
    link.start(spark, reg).awaitTermination() // replay: no new input
    assert(reg.read("mc_out").count() === 3)
  }

  test("streaming near-dup gate link: pair parity with the batch " +
    "incremental path; survivors accumulate into the screening corpus") {
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val b = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val c = "red orange yellow green blue indigo violet crimson amber teal " +
      "magenta cyan maroon olive navy coral salmon ivory jade pearl"
    // +1 trailing word: 18 shared shingles of 19 → jaccard ≈ 0.947 ≥ 0.8
    val batch1 = Seq(10L -> (a + " uniform"), 11L -> b)
    val batch2 = Seq(20L -> (b + " extra"), 21L -> c)

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-neardup-stream").toString)
    reg.write(docs(1L -> a), "nd_corpus") // seed corpus
    val link = new NearDupGateLink("nd_in", "nd_corpus", "nd_pairs",
      minJaccard = 0.8)
    reg.write(docs(batch1: _*), "nd_in")
    link.start(spark, reg).awaitTermination()
    reg.write(docs(batch2: _*), "nd_in")
    link.start(spark, reg).awaitTermination()

    def pairsOf(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_corpus"),
        r.getAs[Double]("jaccard"))).toSet
    val streamed = pairsOf(reg.read("nd_pairs"))

    // batch replication of the same incremental protocol over the same
    // splits: screen, append survivors, repeat
    var corpus = docs(1L -> a)
    val expected = scala.collection.mutable.Set[(Long, Long, Double)]()
    for (batch <- Seq(batch1, batch2)) {
      val bdf = docs(batch: _*)
      val p = graft.ops.Dedup.minHashLshAgainstCorpus(corpus, bdf, 0.8)
      expected ++= pairsOf(p)
      val survivors = bdf.join(
        p.select(col("doc_new").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      corpus = corpus.union(survivors)
    }
    assert(streamed.nonEmpty && streamed === expected.toSet)
    // doc 20 must have matched doc 11 — admitted only one batch earlier:
    // the corpus genuinely accumulates survivors across batches
    assert(streamed.exists(p => p._1 == 20L && p._2 == 11L))
    // gate semantics: matched arrivals (10, 20) never entered the corpus
    assert(reg.read("nd_corpus").collect().map(_.getAs[Long]("doc_id")).sorted
      === Array(1L, 11L, 21L))
    // the persisted band index tracks the corpus EXACTLY: the seed doc
    // back-filled once at gate start, plus each survivor's 32 bands
    // appended alongside its admission — the amortized-prep invariant
    val bands = reg.read(link.bandsStream)
    assert(bands.select("doc_id").distinct().collect()
      .map(_.getAs[Long]("doc_id")).sorted === Array(1L, 11L, 21L))
    assert(bands.count() === 3 * 32)
    // replaying with no new input appends nothing (exactly-once offsets),
    // to the band index included
    link.start(spark, reg).awaitTermination()
    assert(reg.read("nd_pairs").count() === streamed.size)
    assert(reg.read("nd_corpus").count() === 3)
    assert(reg.read(link.bandsStream).count() === 3 * 32)
  }

  test("composed discovery loop: WARC ingest → page adapter → frontier — " +
    "the crawl loop feeds itself (frontier of batch N is the fetch list " +
    "for batch N+1)") {
    import graft.ops.{Warc, WebText}
    import graft.runtime.{FrontierLink, Pipeline, WarcHttpIngestLink}
    val s = spark
    import s.implicits._
    // pages at example.org link the NEXT page (rooted relative) plus a
    // cross-host mirror — the discovery loop must surface both
    def html(n: Int): String =
      s"<a href='/doc/${n + 1}'>next</a>" +
        s"<a href='http://mirror.net/m/$n'>m</a>"
    def docs(rows: (Long, String)*): DataFrame =
      rows.toSeq.toDF("doc_id", "text")
    val uriOf = concat(lit("http://example.org/doc/"), col("doc_id"))
    // doc text IS the page html (parseWarcHttpDocs decodes it back)
    val chunks1 = Warc.syntheticWarcChunks(
      docs(1L -> html(1), 2L -> html(2)), uri = uriOf)
    val chunks2 = Warc.syntheticWarcChunks(docs(3L -> html(3)), uri = uriOf)

    object PageAdapter extends Link {
      val inputs = Seq("loop_docs"); val output = Some("loop_pages")
      override def transform(df: DataFrame): DataFrame =
        df.filter(col("valid"))
          .select(col("target_uri").as("url"), col("text").as("html"))
    }
    val frontier = new FrontierLink("loop_pages", "loop_crawled",
      "loop_links", "loop_frontier", topKPerDomain = 5)
    val pipeline = new Pipeline(Seq(
      new WarcHttpIngestLink("loop_chunks", "loop_docs"), PageAdapter,
      frontier))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-discovery-loop").toString)
    reg.write(chunks1, "loop_chunks")
    pipeline.runOnce(spark, reg)

    def urls(df: DataFrame) = df.collect()
      .map(_.getAs[String]("url")).toSet
    val f1 = urls(reg.read("loop_frontier"))
    // batch-1 pages 1,2 link doc/2 (already crawled — must be evicted),
    // doc/3 (fresh), and the two mirror pages
    assert(f1 === Set("http://example.org/doc/3",
      "http://mirror.net/m/1", "http://mirror.net/m/2"))

    // fetch ONE url the frontier proposed — the loop feeding itself
    reg.write(chunks2, "loop_chunks")
    pipeline.runOnce(spark, reg)
    val f2 = urls(reg.read("loop_frontier"))
    assert(!f2.contains("http://example.org/doc/3"), "fetched url evicted")
    assert(f2.contains("http://example.org/doc/4") &&
      f2.contains("http://mirror.net/m/3"))
    // parity with the batch plan over ALL pages fetched so far
    val pages = Warc.parseWarcHttpDocs(spark, chunks1.union(chunks2)).toDF()
      .filter(col("valid"))
      .select(col("target_uri").as("url"), col("text").as("html"))
    val expected = FrontierLink.frontierPlan(
      WebText.resolvedLinkRows(pages, "url", "html").select("link"),
      pages.select("url"), None, "graftbot", 5)
    assert(f2 === urls(expected))
  }

  test("streaming frontier link: frontier after each batch equals the " +
    "batch plan over the accumulated pages; crawled and disallowed " +
    "targets excluded; relative links resolved; replay no-op") {
    import graft.ops.WebText
    import graft.runtime.FrontierLink
    val s = spark
    import s.implicits._
    // pages link absolute cross-host targets, a rooted relative (must
    // resolve against the page host), and a robots-disallowed path
    def page(host: String, n: Int): (String, String) =
      (s"http://$host.org/p/$n",
        s"<a href='http://peer$n.net/x'>a</a>" +
          "<a href=\"/local/next\">r</a>" +
          s"<a href='http://$host.org/l/3'>blocked</a>" +
          s"<a href='http://hub.com/popular'>h</a>")
    val b1 = Seq(page("alpha", 1), page("beta", 2))
    val b2 = Seq(page("alpha", 3), // re-links peer3 + alpha.org/local/next
      ("http://hub.com/popular", "<a href='http://peer1.net/x'>back</a>"))

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-frontier-stream").toString)
    // robots: every host disallows /l/3 (the q195 gate)
    reg.write(Seq(("alpha.org", "User-agent: *\nDisallow: /l/\n"),
        ("beta.org", "User-agent: *\nDisallow: /l/\n"),
        ("hub.com", "User-agent: *\nDisallow: /l/\n"),
        ("peer1.net", "User-agent: *\nDisallow: /l/\n"),
        ("peer2.net", "User-agent: *\nDisallow: /l/\n"),
        ("peer3.net", "User-agent: *\nDisallow: /l/\n"))
        .toDF("host", "robots_txt"), "fr_robots")
    val link = new FrontierLink("fr_pages", "fr_crawled", "fr_links",
      "fr_frontier", robotsStream = "fr_robots", topKPerDomain = 2)

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(pages: Seq[(String, String)]): DataFrame = {
      val pdf = pages.toDF("url", "html")
      FrontierLink.frontierPlan(
        WebText.resolvedLinkRows(pdf, "url", "html").select("link"),
        pdf.select("url"), Some(reg.read("fr_robots")), "graftbot", 2)
    }

    reg.write(b1.toDF("url", "html"), "fr_pages")
    link.start(spark, reg).awaitTermination()
    val f1 = rows(reg.read("fr_frontier").drop("bucket"))
    assert(f1 === rows(expected(b1)))
    // the rooted relative resolved against its page host
    assert(f1.exists(_(1) === "http://alpha.org/local/next"))
    // the disallowed path never enters the frontier
    assert(!f1.exists(_(1).toString.contains("/l/3")))

    reg.write(b2.toDF("url", "html"), "fr_pages")
    link.start(spark, reg).awaitTermination()
    val f2 = rows(reg.read("fr_frontier").drop("bucket"))
    assert(f2 === rows(expected(b1 ++ b2)))
    // hub.com/popular was linked in batch 1 but CRAWLED in batch 2:
    // the refresh must evict it from the frontier
    assert(f1.exists(_(1) === "http://hub.com/popular") &&
      !f2.exists(_(1) === "http://hub.com/popular"))
    // replay with no new input: offsets are exactly-once, frontier and
    // the accumulated streams stay put
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("fr_frontier").drop("bucket")) === f2)
    assert(reg.read("fr_crawled").count() === 4)
  }

  test("incremental frontier refresh: the count table merges per batch, " +
    "the refresh plan never re-scans the link log, politeness slots come " +
    "from crawl-delay × back-off, replay is a no-op on view AND counts") {
    import graft.ops.WebText
    import graft.runtime.FrontierLink
    val s = spark
    import s.implicits._
    val b1 = Seq(
      ("http://src1.org/p",
        "<a href='http://alpha.org/a'>1</a><a href='http://peer1.net/x'>2</a>"),
      ("http://src2.org/p",
        "<a href='http://alpha.org/a'>1</a><a href='http://alpha.org/b'>3</a>" +
          "<a href='http://hub.com/h'>4</a>"))
    // batch 2 links alpha.org/b twice more: b (3) must overtake a (2) —
    // only possible if the batch counts MERGED into the running table
    val b2 = Seq(("http://src3.org/p",
      "<a href='http://alpha.org/b'>1</a><a href='http://alpha.org/b'>2</a>"))

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-frontier-inc").toString)
    // alpha.org asks for 2s spacing; peer1.net's history is 50% 5xx →
    // back-off multiplier 8; hub.com rides the 1s default BUT carries
    // an explicit 5s Retry-After demand (which must also silence a
    // ladder, if it had one — the q270 override rule)
    reg.write(Seq(("alpha.org", "User-agent: *\nCrawl-delay: 2\n"))
      .toDF("host", "robots_txt"), "fi_robots")
    reg.write(Seq(("peer1.net", 500), ("peer1.net", 503),
        ("peer1.net", 200), ("peer1.net", 200))
      .toDF("host", "status_code"), "fi_hist")
    reg.write(Seq(("hub.com", 5000L))
      .toDF("host", "retry_after_ms"), "fi_retry")
    val link = new FrontierLink("fi_pages", "fi_crawled", "fi_linklog",
      "fi_frontier", robotsStream = "fi_robots", topKPerDomain = 2,
      historyStream = "fi_hist", retryStream = "fi_retry")

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(pages: Seq[(String, String)]): DataFrame = {
      val pdf = pages.toDF("url", "html")
      FrontierLink.frontierPlan(
        WebText.resolvedLinkRows(pdf, "url", "html").select("link"),
        pdf.select("url"), Some(reg.read("fi_robots")), "graftbot", 2,
        Some(reg.read("fi_hist")),
        retry = Some(reg.read("fi_retry")))
    }

    reg.write(b1.toDF("url", "html"), "fi_pages")
    link.start(spark, reg).awaitTermination()
    val f1 = rows(reg.read("fi_frontier").drop("bucket"))
    assert(f1 === rows(expected(b1)))
    // the schedule contract: not_before_ms = (rank−1) × effective delay
    assert(f1.exists(r => r(1) === "http://alpha.org/b" &&
      r(3) === 2L && r(4) === 2000L && r(5) === 2000L))
    assert(f1.exists(r => r(1) === "http://peer1.net/x" &&
      r(4) === 8000L && r(5) === 0L))
    // the explicit demand: spacing max(1000, 5000) and the FIRST slot
    // waits the demand out (not_before starts at 5000, not 0)
    assert(f1.exists(r => r(1) === "http://hub.com/h" &&
      r(4) === 5000L && r(5) === 5000L))
    // the merged count table equals the aggregate of the audit log
    // (bucket is merge-path layout; the log's batch column likewise)
    assert(rows(reg.read("fi_frontier_counts")
        .select("link", "host", "inlinks")) ===
      rows(FrontierLink.linkCounts(reg.read("fi_linklog"))))

    reg.write(b2.toDF("url", "html"), "fi_pages")
    link.start(spark, reg).awaitTermination()
    val f2 = rows(reg.read("fi_frontier").drop("bucket"))
    assert(f2 === rows(expected(b1 ++ b2)))
    // cross-batch accumulation through the merge: b now leads alpha.org
    assert(f2.exists(r => r(1) === "http://alpha.org/b" &&
      r(2) === 3L && r(3) === 1L && r(5) === 0L))
    assert(f2.exists(r => r(1) === "http://alpha.org/a" && r(3) === 2L))
    val c2 = rows(reg.read("fi_frontier_counts")
      .select("link", "host", "inlinks"))
    assert(c2 === rows(FrontierLink.linkCounts(reg.read("fi_linklog"))))
    // each bucket's merge high-water mark rode ITS OWN rotate: batch 1
    // touched only alpha.org's bucket; buckets batch 0 touched and
    // batch 1 didn't still carry mark 0
    def bucketOf(host: String): Int =
      Seq(host).toDF("h")
        .select(FrontierLink.bucketOf(col("h"), 16)).head().getInt(0)
    assert(reg.refreshPartitionMeta("fi_frontier_counts",
      bucketOf("alpha.org"), "batch") === Some("1"))
    Seq("peer1.net", "hub.com").filter(bucketOf(_) != bucketOf("alpha.org"))
      .foreach { h =>
        assert(reg.refreshPartitionMeta("fi_frontier_counts",
          bucketOf(h), "batch") === Some("0"), h)
      }
    // the audit log is batch-partitioned: replay REWRITES a batch's
    // directory instead of appending (exactly-once log contents)
    assert(reg.read("fi_linklog").select("batch").distinct()
      .collect().map(_.getLong(0)).toSet === Set(0L, 1L))

    // the 100 TB shape pin: the refresh plan scans the COUNT table and
    // the bounded side streams — never the raw accumulated link log
    // (root paths collected from the relations themselves: the plan
    // STRING truncates long paths)
    val scanPaths = FrontierLink.refreshPlan(reg, "fi_frontier_counts", Nil,
        "fi_crawled", "fi_robots", "fi_hist", "graftbot", 2, 1000L)
      .queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
    assert(scanPaths.nonEmpty)
    assert(!scanPaths.exists(_.contains("fi_linklog")), scanPaths)
    assert(scanPaths.exists(_.contains("fi_frontier_counts")), scanPaths)

    // replay with no new input: frontier AND count table stay put
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("fi_frontier").drop("bucket")) === f2)
    assert(rows(reg.read("fi_frontier_counts")
      .select("link", "host", "inlinks")) === c2)

    // SIDE-STREAM propagation: a new Retry-After demand for alpha.org
    // lands between batches; batch 3's links touch an unrelated host
    // in a DIFFERENT bucket — alpha's bucket must still refresh (the
    // side-signature path), not serve the stale 2s cadence forever
    val alphaBucket = bucketOf("alpha.org")
    val zeta = Seq("zeta.org", "yank.net", "xray.com", "wolf.io")
      .find(bucketOf(_) != alphaBucket).get
    reg.write(Seq(("alpha.org", 9000L))
      .toDF("host", "retry_after_ms"), "fi_retry")
    val b3 = Seq((s"http://src9.org/p", s"<a href='http://$zeta/z'>1</a>"))
    reg.write(b3.toDF("url", "html"), "fi_pages")
    link.start(spark, reg).awaitTermination()
    val f3 = rows(reg.read("fi_frontier").drop("bucket"))
    assert(f3 === rows(expected(b1 ++ b2 ++ b3)))
    // the demand reached alpha's rows: spacing max(2000, 9000), first
    // slot at the demand
    assert(f3.exists(r => r(1) === "http://alpha.org/b" &&
      r(4) === 9000L && r(5) === 9000L))
  }

  test("bucketed count store: a batch touching one host rewrites ONLY " +
    "that host's bucket — file-level walk, untouched bucket directories " +
    "byte-identical across the batch") {
    import graft.runtime.FrontierLink
    val s = spark
    import s.implicits._
    // find a second host in a DIFFERENT bucket than alpha.org (16-way
    // host-hash; computed, not assumed — the modulus is the contract)
    def bucketOf(host: String): Int =
      Seq(host).toDF("h")
        .select(FrontierLink.bucketOf(col("h"), 16)).head().getInt(0)
    val alphaB = bucketOf("alpha.org")
    val other = Seq("bravo.net", "carol.com", "delta.io", "echo.org")
      .find(bucketOf(_) != alphaB).get
    val otherB = bucketOf(other)

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-frontier-buckets").toString)
    val link = new FrontierLink("fb_pages", "fb_crawled", "fb_links",
      "fb_frontier", topKPerDomain = 3)
    // batch 1 links into BOTH buckets
    reg.write(Seq(("http://seed.org/p",
      s"<a href='http://alpha.org/a'>1</a><a href='http://$other/x'>2</a>"))
      .toDF("url", "html"), "fb_pages")
    link.start(spark, reg).awaitTermination()
    def bucketFiles(b: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(
        s"${reg.root}/streams/fb_frontier_counts/bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().map(f =>
        f.getName -> (f.length(), f.lastModified())).toMap
    }
    val otherBefore = bucketFiles(otherB)
    val alphaBefore = bucketFiles(alphaB)
    assert(otherBefore.nonEmpty && alphaBefore.nonEmpty)
    // batch 2 links ONLY into alpha.org's bucket
    reg.write(Seq(("http://seed2.org/p",
      "<a href='http://alpha.org/a'>1</a><a href='http://alpha.org/b'>2</a>"))
      .toDF("url", "html"), "fb_pages")
    link.start(spark, reg).awaitTermination()
    // the walk, not the plan: the other host's bucket directory is
    // byte-for-byte the files batch 1 wrote; alpha's bucket rotated
    assert(bucketFiles(otherB) === otherBefore)
    assert(bucketFiles(alphaB) !== alphaBefore)
    assert(reg.refreshPartitionMeta("fb_frontier_counts", alphaB,
      "batch") === Some("1"))
    assert(reg.refreshPartitionMeta("fb_frontier_counts", otherB,
      "batch") === Some("0"))
    // and the merged table is still exactly the audit-log aggregate
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(reg.read("fb_frontier_counts")
        .select("link", "host", "inlinks")) ===
      rows(FrontierLink.linkCounts(reg.read("fb_links"))))
  }

  test("incremental frontier VIEW: a batch touching one host rewrites " +
    "ONLY that host's frontier bucket — untouched frontier bucket " +
    "directories byte-identical — and the bucketed view equals the " +
    "whole-plan reference") {
    import graft.runtime.FrontierLink
    val s = spark
    import s.implicits._
    def bucketOf(host: String): Int =
      Seq(host).toDF("h")
        .select(FrontierLink.bucketOf(col("h"), 16)).head().getInt(0)
    val alphaB = bucketOf("alpha.org")
    val other = Seq("bravo.net", "carol.com", "delta.io", "echo.org")
      .find(bucketOf(_) != alphaB).get
    val otherB = bucketOf(other)
    // batch 2's CRAWLED host must also avoid the other bucket — a
    // crawled host's bucket legitimately refreshes (its rows must
    // leave the view), so the ride-through claim needs a seed whose
    // own hash stays clear of it
    val seed2 = Seq("seed2.org", "seed3.net", "seed4.com", "seed5.io")
      .find(bucketOf(_) != otherB).get

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-frontier-view").toString)
    val link = new FrontierLink("ff_pages", "ff_crawled", "ff_links",
      "ff_frontier", topKPerDomain = 3)
    // batch 1 links into BOTH buckets (both frontier partitions exist)
    reg.write(Seq(("http://seed.org/p",
      s"<a href='http://alpha.org/a'>1</a><a href='http://$other/x'>2</a>"))
      .toDF("url", "html"), "ff_pages")
    link.start(spark, reg).awaitTermination()
    def bucketFiles(b: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(
        s"${reg.root}/streams/ff_frontier/bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().map(f =>
        f.getName -> (f.length(), f.lastModified())).toMap
    }
    val otherBefore = bucketFiles(otherB)
    val alphaBefore = bucketFiles(alphaB)
    assert(otherBefore.nonEmpty && alphaBefore.nonEmpty)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val f1 = rows(reg.read("ff_frontier").drop("bucket"))
    assert(f1.exists(_(1) === s"http://$other/x"))
    // batch 2: links AND crawled host avoid the other bucket entirely
    reg.write(Seq((s"http://$seed2/p",
      "<a href='http://alpha.org/a'>1</a><a href='http://alpha.org/b'>2</a>"))
      .toDF("url", "html"), "ff_pages")
    link.start(spark, reg).awaitTermination()
    // the walk, not the plan: the other host's FRONTIER bucket is
    // byte-for-byte the files batch 1 wrote; alpha's bucket rotated
    assert(bucketFiles(otherB) === otherBefore)
    assert(bucketFiles(alphaB) !== alphaBefore)
    assert(reg.refreshPartitionMeta("ff_frontier", alphaB,
      "batch") === Some("1"))
    assert(reg.refreshPartitionMeta("ff_frontier", otherB,
      "batch") === Some("0"))
    // the crawled SET merged the same way (bucket-pruned, marked)
    assert(reg.refreshPartitionMeta("ff_frontier_crawled_set",
      bucketOf(seed2), "batch") === Some("1"))
    // parity: the union of per-bucket refreshes IS the whole-view
    // reference plan over the same registry state
    assert(rows(reg.read("ff_frontier").drop("bucket")) ===
      rows(FrontierLink.refreshPlan(reg, "ff_frontier_counts", Nil,
        "ff_crawled", "", "", "graftbot", 3, 1000L)))
    // and the per-BUCKET plan reads count/crawled-set PARTITIONS, not
    // the whole tables and never the link log (the 100 TB read shape)
    val scanPaths = FrontierLink.refreshBucketPlan(reg,
        "ff_frontier_counts", "ff_frontier_crawled_set", alphaB, 16, Nil,
        "", "", "graftbot", 3, 1000L)
      .queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
    assert(scanPaths.nonEmpty)
    assert(!scanPaths.exists(_.contains("ff_links")), scanPaths)
    assert(scanPaths.forall(p =>
      p.contains(s"ff_frontier_counts/bucket=$alphaB") ||
        p.contains(s"ff_frontier_crawled_set/bucket=$alphaB")), scanPaths)
  }

  test("revisit gate link: the first capture EVER SEEN stays canonical " +
    "across batches (later recrawls stub to it), within-batch dups stub " +
    "to the batch first, state merges per digest bucket, replay never " +
    "flips the canonical capture") {
    import graft.ops.Warc
    import graft.runtime.RevisitGateLink
    val s = spark
    import s.implicits._
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-revisit-stream").toString)
    val link = new RevisitGateLink("rg_docs", "rg_out", "rg_seen",
      date = "2026-08-16T00:00:00Z")
    def outRows = reg.read("rg_out")
      .select("url", "is_revisit", "refers_to").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet

    // batch 1: two distinct payloads
    reg.write(Seq(("http://a.org/1", "payload X"),
      ("http://a.org/2", "payload Y")).toDF("url", "text"), "rg_docs")
    link.start(spark, reg).awaitTermination()
    assert(outRows === Set(("http://a.org/1", false, ""),
      ("http://a.org/2", false, "")))
    assert(reg.read("rg_seen").count() === 2)

    // batch 2: a RECRAWL of payload X from a lexicographically SMALLER
    // url — arrival order wins, so it must stub to a.org/1, not become
    // canonical; plus a new payload captured twice in the batch
    reg.write(Seq(("http://a.org/0", "payload X"),
      ("http://b.org/1", "payload Z"), ("http://b.org/2", "payload Z"))
      .toDF("url", "text"), "rg_docs")
    link.start(spark, reg).awaitTermination()
    assert(outRows === Set(
      ("http://a.org/1", false, ""), ("http://a.org/2", false, ""),
      ("http://a.org/0", true, "http://a.org/1"), // cross-batch stub
      ("http://b.org/1", false, ""),              // batch first
      ("http://b.org/2", true, "http://b.org/1"))) // within-batch stub
    // the state holds ONE row per digest, the arrival-first url
    val seen = reg.read("rg_seen").select("digest", "first_url").collect()
      .map(r => r.getString(1)).toSet
    assert(seen === Set("http://a.org/1", "http://a.org/2", "http://b.org/1"))

    // batch 3: a SAME-url recrawl of an unchanged payload (the most
    // common crawl event) must stub to its own earlier capture, and an
    // identical duplicate pair yields one response + one stub
    reg.write(Seq(("http://a.org/1", "payload X"),
      ("http://b.org/9", "payload W"), ("http://b.org/9", "payload W"))
      .toDF("url", "text"), "rg_docs")
    link.start(spark, reg).awaitTermination()
    assert(outRows === Set(
      ("http://a.org/1", false, ""), ("http://a.org/2", false, ""),
      ("http://a.org/0", true, "http://a.org/1"),
      ("http://b.org/1", false, ""),
      ("http://b.org/2", true, "http://b.org/1"),
      ("http://a.org/1", true, "http://a.org/1"), // same-url recrawl stub
      ("http://b.org/9", false, ""),
      ("http://b.org/9", true, "http://b.org/9")))
    assert(reg.read("rg_seen").count() === 4) // payload W registered once
    // the emitted records parse: stubs are 0-length revisits
    val chunk = reg.read("rg_out").orderBy("url")
      .agg(concat_ws("", collect_list(col("warc_record"))).as("c"))
      .select(encode(col("c"), "UTF-8").as("payload"))
      .withColumn("chunk_id", lit(0L))
    val back = Warc.parseWarcText(spark, chunk).toDF()
    assert(back.filter(!col("valid")).count() === 0)
    assert(back.filter(col("warc_type") === "revisit")
      .select("content_length").collect().forall(_.getLong(0) === 0L))
    assert(back.count() === 8)
    assert(back.filter(col("warc_type") === "response").count() === 4)

    // replay with no new input: output and state stay put
    val (o, c) = (outRows, reg.read("rg_seen").count())
    link.start(spark, reg).awaitTermination()
    assert(outRows === o)
    assert(reg.read("rg_seen").count() === c)
  }

  test("cdx index link: per-batch index lines equal the batch plan over " +
    "the same chunks, locators round-trip (slicing the payload at a " +
    "line's offset/length re-parses exactly that record), replay no-op, " +
    "crash-replay rewrites its batch partition (zero dups)") {
    import graft.ops.Warc
    import graft.runtime.CdxIndexLink
    val s = spark
    import s.implicits._
    def chunks(ids: Seq[Long]): DataFrame =
      Warc.syntheticWarcChunks(
        ids.map(i => (i, s"body text $i café")).toDF("doc_id", "text"),
        uri = concat(lit("HTTP://WWW.S"), col("doc_id").cast("string"),
          lit(".ORG:80/a?b=2&a=1")))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-cdx-stream").toString)
    val link = new CdxIndexLink("cx_chunks", "cx_index")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(ids: Seq[Long]) = rows(Warc.cdxjLines(
        Warc.parseWarcIndex(spark, chunks(ids)),
        filename = concat(lit("seg-"), col("chunk_id").cast("string"),
          lit(".warc")))
      .select("urlkey", "chunk_id", "rec_idx", "cdxj_line"))

    reg.write(chunks(Seq(1L, 2L)), "cx_chunks")
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("cx_index").drop("batch")) === expected(Seq(1L, 2L)))
    reg.write(chunks(Seq(17L)), "cx_chunks") // a later segment arrives
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("cx_index").drop("batch")) ===
      expected(Seq(1L, 2L)) ++ expected(Seq(17L)))
    // the locator contract: slice the chunk payload at one line's
    // (offset, length) and the cursor re-parses exactly that record
    val line = reg.read("cx_index").filter(col("chunk_id") === 0L)
      .orderBy("rec_idx").select("cdxj_line").as[String].head()
    val json = line.split(" ", 3)(2)
    def jfield(k: String): String = Seq(json).toDF("j")
      .select(get_json_object(col("j"), s"$$.$k")).as[String].head()
    val (off, len) = (jfield("offset").toInt, jfield("length").toInt)
    assert(jfield("filename") === "seg-0.warc")
    val payload = chunks(Seq(1L, 2L)).filter(col("chunk_id") === 0L)
      .select("payload").as[Array[Byte]].head()
    val sliced = Seq((0L, payload.slice(off, off + len)))
      .toDF("chunk_id", "payload")
    val back = Warc.parseWarcText(spark, sliced).toDF()
    assert(back.count() === 1)
    assert(back.select("target_uri").as[String].head() ===
      "HTTP://WWW.S1.ORG:80/a?b=2&a=1")
    // replay with no new input appends nothing
    link.start(spark, reg).awaitTermination()
    assert(reg.read("cx_index").count() === 3)
    // CRASH-replay: re-execute batch 1 (commit mark dropped) — the
    // batch=1 partition rewrites, zero duplicate index lines
    val commits = new java.io.File(
      reg.checkpointDir(link.name, "cx_index"), "commits")
    assert(new java.io.File(commits, "1").delete())
    new java.io.File(commits, ".1.crc").delete()
    link.start(spark, reg).awaitTermination()
    assert(reg.read("cx_index").count() === 3)
    assert(rows(reg.read("cx_index").drop("batch")) ===
      expected(Seq(1L, 2L)) ++ expected(Seq(17L)))
  }

  test("clusterMembers: an x-default href that IS a concrete page joins " +
    "its cluster ONCE, under its real lang — x-default is a role, not a " +
    "language (no degenerate self-pair memberships)") {
    import graft.runtime.BitextHarvestLink
    val s = spark
    import s.implicits._
    // the common real-site layout: the x-default member IS the en page
    val enUrl = "http://h.org/a/9" // doubles as the cluster key
    val deUrl = "http://h.org/de/a/9"
    val html = "<link rel=\"alternate\" hreflang=\"en\" href=\"" + enUrl +
      "\"><link rel=\"alternate\" hreflang=\"de\" href=\"" + deUrl +
      "\"><link rel=\"alternate\" hreflang=\"x-default\" href=\"" +
      enUrl + "\">"
    val pages = Seq((enUrl, html, "En text."), (deUrl, html, "De text."))
      .toDF("url", "html", "text")
    val got = BitextHarvestLink.clusterMembers(pages)
      .as[(String, String, String, String)].collect().toSet
    // the en page appears once (lang en), never a second 'x-default' row
    // whose identical text bitextAlign would pair against itself
    assert(got === Set((enUrl, "en", enUrl, "En text."),
      (enUrl, "de", deUrl, "De text.")))
  }

  test("bitext harvest link: translations arriving in DIFFERENT batches " +
    "join their cluster (cross-batch state), only touched clusters " +
    "re-align (untouched bucket files byte-identical), recrawl replaces " +
    "a member, replay no-op") {
    import graft.ops.TextAnalysis
    import graft.runtime.BitextHarvestLink
    val s = spark
    import s.implicits._
    def cluster(n: Int) = s"http://h.org/a/$n"
    def bucketOf(c: String): Int = Seq(c).toDF("c")
      .select(BitextHarvestLink.bucketOf(col("c"), 16)).head().getInt(0)
    // three clusters in pairwise DIFFERENT buckets (computed, not
    // assumed — the modulus is the contract)
    val ids = (1 to 64).toList
      .groupBy(n => bucketOf(cluster(n))).values.map(_.head).take(3).toList
    val Seq(ca, cb, cc) = ids.map(_.toInt)
    def enText(n: Int) = s"Aa $n bb. Cc dd ee ff gg."
    def deText(n: Int) = s"Xx $n yy. Zz ww vv uu tt ss."
    def page(n: Int, lang: String, text: String): (String, String, String) = {
      val url = s"http://h.org/$lang/a/$n"
      val html = s"<link rel=\"alternate\" hreflang=\"en\" " +
        s"href=\"http://h.org/en/a/$n\">" +
        s"<link rel=\"alternate\" hreflang=\"de\" " +
        s"href=\"http://h.org/de/a/$n\">" +
        s"<link rel=\"alternate\" hreflang=\"x-default\" " +
        s"href=\"${cluster(n)}\">"
      (url, html, text)
    }
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-bitext-harvest").toString)
    val link = new BitextHarvestLink("bh_pages", "bh_members", "bh_pairs")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def pairRows = rows(reg.read("bh_pairs").drop("bucket"))
    def expected(pages: Seq[(String, String, String)]) = {
      val members = BitextHarvestLink.clusterMembers(
        pages.toDF("url", "html", "text"))
      rows(TextAnalysis.bitextAlign(members
        .groupBy("cluster_key", "lang")
        .agg(min(struct(col("url"), col("text"))).as("w"))
        .select(col("cluster_key"), col("lang"),
          col("w").getField("text").as("text"))))
    }

    // batch 1: the en half of cluster A alone — no pairs yet
    val b1 = Seq(page(ca, "en", enText(ca)))
    reg.write(b1.toDF("url", "html", "text"), "bh_pages")
    link.start(spark, reg).awaitTermination()
    assert(reg.read("bh_members").count() === 1)
    assert(pairRows.isEmpty)

    // batch 2: A's de half arrives (cross-batch!) plus both halves of B
    val b2 = Seq(page(ca, "de", deText(ca)),
      page(cb, "en", enText(cb)), page(cb, "de", deText(cb)))
    reg.write(b2.toDF("url", "html", "text"), "bh_pages")
    link.start(spark, reg).awaitTermination()
    assert(pairRows === expected(b1 ++ b2))
    assert(pairRows.exists(_.head === cluster(ca))) // the cross-batch join
    def bucketFiles(stream: String, b: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"${reg.root}/streams/$stream/bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().map(f =>
        f.getName -> (f.length(), f.lastModified())).toMap
    }
    val aPairsBefore = bucketFiles("bh_pairs", bucketOf(cluster(ca)))
    val bPairsBefore = bucketFiles("bh_pairs", bucketOf(cluster(cb)))

    // batch 3: cluster C only — A's and B's pair buckets never rewrite
    val b3 = Seq(page(cc, "en", enText(cc)), page(cc, "de", deText(cc)))
    reg.write(b3.toDF("url", "html", "text"), "bh_pages")
    link.start(spark, reg).awaitTermination()
    assert(pairRows === expected(b1 ++ b2 ++ b3))
    assert(bucketFiles("bh_pairs", bucketOf(cluster(ca))) === aPairsBefore)
    assert(bucketFiles("bh_pairs", bucketOf(cluster(cb))) === bPairsBefore)

    // batch 4: A's de page recrawled with NEW text — the member row is
    // REPLACED (count unchanged) and A re-aligns against the new text
    val newDe = s"Xx $ca neu. Zz ww vv uu tt ss."
    val b4 = Seq(page(ca, "de", newDe))
    reg.write(b4.toDF("url", "html", "text"), "bh_pages")
    link.start(spark, reg).awaitTermination()
    assert(reg.read("bh_members").count() === 6)
    assert(pairRows === expected(Seq(page(ca, "en", enText(ca))) ++
      b2.tail ++ b3 ++ b4))
    assert(pairRows.exists(r => r.head === cluster(ca) &&
      r.toString.contains("neu")))

    // replay with no new input: members AND pairs stay put
    val mBefore = rows(reg.read("bh_members"))
    val pBefore = pairRows
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("bh_members")) === mBefore)
    assert(pairRows === pBefore)
  }

  test("hint-blended frontier link: changefreq/date/reputation streams " +
    "reorder the frontier within a host (the fresher low-inlink page " +
    "overtakes), batch parity with the hinted plan, absent hints score " +
    "neutral") {
    import graft.ops.WebText
    import graft.runtime.FrontierLink
    val s = spark
    import s.implicits._
    val now = 1755300000000L
    // alpha.org/a gets TWO in-links, /b one — inlink-only ranking puts
    // a first; b's hints (changefreq=always, published today) must
    // overtake: score(a) = (2·62500·4 + 5e5·2 + 5e5 + 5e5·3)/10 =
    // 350000 < score(b) = (62500·4 + 1e6·2 + 1e6 + 5e5·3)/10 = 475000
    val b1 = Seq(
      ("http://src1.org/p", "<a href='http://alpha.org/a'>1</a>"),
      ("http://src2.org/p",
        "<a href='http://alpha.org/a'>1</a><a href='http://alpha.org/b'>2</a>"))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-frontier-hints").toString)
    // /b is listed in TWO sitemaps (weekly + always): the freshest
    // hint must win and the frontier must NOT fan out to two rows
    reg.write(Seq(("http://alpha.org/b", "weekly"),
        ("http://alpha.org/b", "always"))
      .toDF("url", "changefreq"), "fh_hints")
    reg.write(Seq(("http://alpha.org/b", now))
      .toDF("url", "published_ms"), "fh_dates")
    // the reputation stream EXISTS but measures a different host:
    // alpha.org must score neutral, never zero
    reg.write(Seq(("elsewhere.net", 900000L))
      .toDF("host", "pass_rate_micros"), "fh_rep")
    val link = new FrontierLink("fh_pages", "fh_crawled", "fh_links",
      "fh_frontier", topKPerDomain = 2,
      hintsStream = "fh_hints", datesStream = "fh_dates",
      reputationStream = "fh_rep", nowMs = now)
    reg.write(b1.toDF("url", "html"), "fh_pages")
    link.start(spark, reg).awaitTermination()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val f1 = rows(reg.read("fh_frontier").drop("bucket"))
    // the flip: b rank 1 despite fewer in-links; a rank 2 (neutral on
    // every hint it lacks — including the unmeasured-host reputation)
    assert(f1.exists(r => r(1) === "http://alpha.org/b" && r(3) === 1L))
    assert(f1.exists(r => r(1) === "http://alpha.org/a" && r(3) === 2L &&
      r(2) === 2L))
    // the double-hinted URL appears ONCE (pre-aggregated, no fan-out)
    assert(f1.count(_(1) === "http://alpha.org/b") === 1)
    // batch parity with the hinted reference plan
    val pdf = b1.toDF("url", "html")
    assert(f1 === rows(FrontierLink.frontierPlan(
      WebText.resolvedLinkRows(pdf, "url", "html").select("link"),
      pdf.select("url"), None, "graftbot", 2, None, 1000L,
      Some(reg.read("fh_hints")), Some(reg.read("fh_dates")),
      Some(reg.read("fh_rep")), now)))
  }

  test("feed discovery link + frontier extra sources: feed entries rank " +
    "in the same frontier as page links; relative Atom hrefs resolve; " +
    "replay no-op") {
    import graft.ops.WebText
    import graft.runtime.{FeedDiscoveryLink, FrontierLink}
    val s = spark
    import s.implicits._
    def rss(host: String, ns: Int*): String =
      "<rss><channel><title>c</title>" + ns.map(n =>
        s"<item><title>t$n</title><link>http://$host.org/a/$n</link></item>")
        .mkString + "</channel></rss>"
    // Atom feed with a RELATIVE entry href — must resolve against the
    // feed URL — plus a mailto: entry that must be dropped
    val atom = "<feed><title>f</title>" +
      "<entry><title>e</title><link href=\"/a/9\"/></entry>" +
      "<entry><title>m</title><link href='mailto:x@y.z'/></entry></feed>"
    val feedsB1 = Seq(("http://alpha.org/feed.xml", rss("alpha", 1, 2)),
      ("http://beta.org/feed.xml", atom))
    val feedsB2 = Seq(("http://alpha.org/feed.xml", rss("alpha", 2, 3)))
    val pagesB1 = Seq(("http://alpha.org/p/0",
      "<a href='http://alpha.org/a/2'>x</a><a href='http://hub.com/h'>y</a>"))

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-feed-stream").toString)
    val feedLink = new FeedDiscoveryLink("fd_feeds", "fd_links")
    val frontier = new FrontierLink("fd_pages", "fd_crawled", "fd_page_links",
      "fd_frontier", topKPerDomain = 5,
      extraLinksStreams = Seq("fd_links"))

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(pages: Seq[(String, String)],
                 feeds: Seq[(String, String)]): DataFrame = {
      val pdf = pages.toDF("url", "html")
      FrontierLink.frontierPlan(
        WebText.resolvedLinkRows(pdf, "url", "html").select("link")
          .unionAll(FeedDiscoveryLink.entryLinks(feeds.toDF("url", "xml"))),
        pdf.select("url"), None, "graftbot", 5)
    }

    reg.write(feedsB1.toDF("url", "xml"), "fd_feeds")
    feedLink.start(spark, reg).awaitTermination()
    reg.write(pagesB1.toDF("url", "html"), "fd_pages")
    frontier.start(spark, reg).awaitTermination()
    val f1 = rows(reg.read("fd_frontier").drop("bucket"))
    assert(f1 === rows(expected(pagesB1, feedsB1)))
    // the relative Atom href resolved against its feed URL
    assert(f1.exists(_(1) === "http://beta.org/a/9"))
    // the mailto entry never enters
    assert(!f1.exists(_(1).toString.startsWith("mailto:")))
    // alpha.org/a/2 is seen by BOTH channels: 2 in-links
    assert(f1.exists(r => r(1) === "http://alpha.org/a/2" && r(2) === 2L))

    // batch 2: the feed re-surfaces a/2 and discovers a/3; the frontier
    // refresh (triggered by an empty page batch) must re-rank
    reg.write(feedsB2.toDF("url", "xml"), "fd_feeds")
    feedLink.start(spark, reg).awaitTermination()
    reg.write(Seq.empty[(String, String)].toDF("url", "html"), "fd_pages")
    frontier.start(spark, reg).awaitTermination()
    val f2 = rows(reg.read("fd_frontier").drop("bucket"))
    assert(f2 === rows(expected(pagesB1, feedsB1 ++ feedsB2)))
    assert(f2.exists(r => r(1) === "http://alpha.org/a/2" && r(2) === 3L))
    assert(f2.exists(_(1) === "http://alpha.org/a/3"))

    // an UNCHANGED extras channel must not rewrite any frontier
    // bucket: batch 3 is empty pages + no feed change, so every
    // frontier bucket directory rides through byte-identical (extras
    // force-touch only buckets with no partition yet; thereafter the
    // graft_extras side signature drives refreshes on change)
    def frontierFiles(): Map[String, (Long, Long)] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (!d.exists()) Nil
        else d.listFiles().toSeq.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(s"${reg.root}/streams/fd_frontier"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val beforeIdle = frontierFiles()
    reg.write(Seq.empty[(String, String)].toDF("url", "html"), "fd_pages")
    frontier.start(spark, reg).awaitTermination()
    assert(frontierFiles() === beforeIdle,
      "idle batch with unchanged extras rewrote a frontier bucket")

    // replay with no new input on either stream: everything stays put
    feedLink.start(spark, reg).awaitTermination()
    frontier.start(spark, reg).awaitTermination()
    assert(rows(reg.read("fd_frontier").drop("bucket")) === f2)
    assert(reg.read("fd_links").count() === 5)

    // CRASH-replay of feed batch 1 (commit mark dropped): the
    // batch=1 partition REWRITES — an append here would have inflated
    // the replayed entries' in-link evidence on the next refresh
    val commits = new java.io.File(
      reg.checkpointDir(feedLink.name, "fd_links"), "commits")
    assert(new java.io.File(commits, "1").delete())
    new java.io.File(commits, ".1.crc").delete()
    feedLink.start(spark, reg).awaitTermination()
    assert(reg.read("fd_links").count() === 5) // zero duplicates
    reg.write(Seq.empty[(String, String)].toDF("url", "html"), "fd_pages")
    frontier.start(spark, reg).awaitTermination()
    assert(rows(reg.read("fd_frontier").drop("bucket")) === f2)
    assert(rows(reg.read("fd_frontier").drop("bucket"))
      .exists(r => r(1) === "http://alpha.org/a/2" && r(2) === 3L))
  }

  test("wet export link: the streamed records equal the batch plan, " +
    "concatenated output round-trips through the WARC cursor, replay " +
    "no-op, crash-replay rewrites its batch partition (zero dups)") {
    import graft.ops.Warc
    import graft.runtime.WetExportLink
    val s = spark
    import s.implicits._
    val b1 = Seq(("http://w.org/1", "doc one"), ("http://w.org/2", "café"))
    val b2 = Seq(("http://w.org/3", "doc three"))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-wet-stream").toString)
    val link = new WetExportLink("we_docs", "we_wet",
      date = "2026-08-16T00:00:00Z")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(docs: Seq[(String, String)]) =
      Warc.wetRecords(docs.toDF("url", "text"),
          date = lit("2026-08-16T00:00:00Z"))
        .select(col("url"), col("wet_record"))

    reg.write(b1.toDF("url", "text"), "we_docs")
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("we_wet").drop("batch")) === rows(expected(b1)))
    reg.write(b2.toDF("url", "text"), "we_docs")
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("we_wet").drop("batch")) ===
      rows(expected(b1 ++ b2)))
    // the accumulated stream IS a WET file: concatenate and re-parse
    val chunk = reg.read("we_wet").orderBy("url")
      .agg(concat_ws("", collect_list(col("wet_record"))).as("c"))
      .select(encode(col("c"), "UTF-8").as("payload"))
      .withColumn("chunk_id", lit(0L))
    val back = Warc.parseWarcText(spark, chunk).toDF()
      .select("target_uri", "body", "warc_type", "valid")
      .collect().map(_.toSeq).toSet
    assert(back === (b1 ++ b2).map { case (u, t) =>
      Seq(u, t, "conversion", true) }.toSet)
    // replay with no new input appends nothing
    link.start(spark, reg).awaitTermination()
    assert(reg.read("we_wet").count() === 3)
    // CRASH-replay: drop batch 1's commit mark (crash after the output
    // write, before the checkpoint commit) — the restart re-executes
    // batch 1 with the same id, which must REWRITE batch=1 instead of
    // appending duplicate records into the published artifact
    def batchFiles(b: Long): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"${reg.root}/streams/we_wet/batch=$b")
      dir.listFiles().map(f =>
        f.getName -> (f.length(), f.lastModified())).toMap
    }
    val b0Before = batchFiles(0L)
    val commits = new java.io.File(
      reg.checkpointDir(link.name, "we_wet"), "commits")
    val latest = commits.listFiles()
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toInt)
    assert(latest.getName === "1" && latest.delete())
    // the local FS is a ChecksumFileSystem: the stale .crc sibling
    // would fail the re-created commit's rename
    new java.io.File(commits, ".1.crc").delete()
    link.start(spark, reg).awaitTermination()
    assert(reg.read("we_wet").count() === 3) // zero duplicates
    assert(rows(reg.read("we_wet").drop("batch")) ===
      rows(expected(b1 ++ b2)))
    // file-walk: only the replayed batch's partition rotated
    assert(batchFiles(0L) === b0Before)
  }

  test("wat export link: the streamed records equal the batch plan, " +
    "concatenated output round-trips through the cursor with every " +
    "JSON payload field re-derived, replay no-op, crash-replay " +
    "rewrites its batch partition (zero dups)") {
    import graft.ops.Warc
    import graft.runtime.WatExportLink
    val s = spark
    import s.implicits._
    def page(n: Int): (String, String) = (s"http://w.org/$n",
      s"<html><head><title>T$n &amp; é</title>" +
        s"<meta name=\"description\" content=\"D$n\"></head>" +
        s"<body><a href=\"http://peer$n.net/?a=1&amp;b=2\">x</a>" +
        s"<a href=\"/rel/$n\">y</a></body></html>")
    val b1 = Seq(page(1), page(2))
    val b2 = Seq(page(3))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-wat-stream").toString)
    val link = new WatExportLink("wa_docs", "wa_wat",
      date = "2026-08-16T00:00:00Z")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(docs: Seq[(String, String)]) =
      Warc.watRecords(docs.toDF("url", "html"),
          date = lit("2026-08-16T00:00:00Z"))
        .select(col("url"), col("wat_record"))

    reg.write(b1.toDF("url", "html"), "wa_docs")
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("wa_wat").drop("batch")) === rows(expected(b1)))
    reg.write(b2.toDF("url", "html"), "wa_docs")
    link.start(spark, reg).awaitTermination()
    assert(rows(reg.read("wa_wat").drop("batch")) ===
      rows(expected(b1 ++ b2)))
    // the accumulated stream IS a WAT file: concatenate, re-parse,
    // and re-derive the payload fields through the shared reader
    val chunk = reg.read("wa_wat").orderBy("url")
      .agg(concat_ws("", collect_list(col("wat_record"))).as("c"))
      .select(encode(col("c"), "UTF-8").as("payload"))
      .withColumn("chunk_id", lit(0L))
    val pj = from_json(col("body"), Warc.WatPayloadSchema)
    val head = pj.getField("Envelope").getField("Payload-Metadata")
      .getField("HTTP-Response-Metadata")
    val back = Warc.parseWarcText(spark, chunk).toDF()
      .select(col("target_uri"), col("warc_type"), col("content_type"),
        col("valid"),
        head.getField("HTML-Metadata").getField("Head").getField("Title")
          .as("title"),
        array_join(transform(
          head.getField("HTML-Metadata").getField("Links"),
          l => l.getField("url")), ",").as("links"))
      .collect().map(_.toSeq).toSet
    assert(back === (1 to 3).map { n =>
      Seq(s"http://w.org/$n", "metadata", "application/json", true,
        s"T$n & é", s"http://peer$n.net/?a=1&b=2,/rel/$n")
    }.toSet)
    // replay with no new input appends nothing
    link.start(spark, reg).awaitTermination()
    assert(reg.read("wa_wat").count() === 3)
    // CRASH-replay: re-execute batch 1 (commit mark dropped) — the
    // batch=1 partition rewrites, zero duplicate records
    val commits = new java.io.File(
      reg.checkpointDir(link.name, "wa_wat"), "commits")
    assert(new java.io.File(commits, "1").delete())
    new java.io.File(commits, ".1.crc").delete()
    link.start(spark, reg).awaitTermination()
    assert(reg.read("wa_wat").count() === 3)
    assert(rows(reg.read("wa_wat").drop("batch")) ===
      rows(expected(b1 ++ b2)))
  }

  test("robots page gate link: noindex pages never reach the corpus " +
    "split, nofollow pages never reach the frontier split (and their " +
    "links never seed a frontier fed from it), crash-replay rewrites " +
    "both outputs (zero dups)") {
    import graft.runtime.{FrontierLink, RobotsPageGateLink}
    val s = spark
    import s.implicits._
    // m=0 clean; m=1 meta noindex; m=2 header nofollow (links to a
    // host that must never surface); m=3 header `none` (both)
    def page(i: Int): (String, String, String) = {
      val m = i % 4
      val meta = if (m == 1) "<meta name=\"robots\" content=\"noindex\">"
        else ""
      val hdr = m match {
        case 2 => "X-Robots-Tag: nofollow\r\n"
        case 3 => "X-Robots-Tag: none\r\n"
        case _ => ""
      }
      val target = if (m == 2 || m == 3) s"http://hidden$m.net/x"
        else s"http://ok$i.org/next"
      (s"http://rp.org/$i",
        s"<html><head>$meta</head><body><a href='$target'>l</a></body></html>",
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$hdr\r\nbody")
    }
    val b1 = (0 until 8).map(page)
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-robots-gate").toString)
    val link = new RobotsPageGateLink("rp_pages", "rp_corpus",
      "rp_frontier_feed")
    reg.write(b1.toDF("url", "html", "payload"), "rp_pages")
    link.start(spark, reg).awaitTermination()
    def urls(name: String) = reg.read(name).select("url").collect()
      .map(_.getString(0)).toSet
    val corpus = urls("rp_corpus")
    val feed = urls("rp_frontier_feed")
    // noindex (m=1) and none (m=3) are excluded from the corpus;
    // nofollow (m=2) and none (m=3) from the frontier feed
    assert(corpus === (0 until 8).filter(i => i % 4 == 0 || i % 4 == 2)
      .map(i => s"http://rp.org/$i").toSet)
    assert(feed === (0 until 8).filter(i => i % 4 == 0 || i % 4 == 1)
      .map(i => s"http://rp.org/$i").toSet)
    // batch parity with the shared gate, audit columns included
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val expected = RobotsPageGateLink.gate(
      b1.toDF("url", "html", "payload"))
    assert(rows(reg.read("rp_corpus").drop("batch")) ===
      rows(expected.filter(!col("noindex")).drop("noindex", "nofollow")))
    assert(rows(reg.read("rp_frontier_feed").drop("batch")) ===
      rows(expected.filter(!col("nofollow")).drop("noindex", "nofollow")))
    // a frontier fed from the split never sees a nofollow page's links
    val frontier = new FrontierLink("rp_frontier_feed", "rp_crawled",
      "rp_links", "rp_frontier", topKPerDomain = 3)
    frontier.start(spark, reg).awaitTermination()
    val fUrls = reg.read("rp_frontier").select("url").collect()
      .map(_.getString(0)).toSet
    assert(!fUrls.exists(_.contains("hidden")),
      s"nofollow links leaked into the frontier: $fUrls")
    assert(fUrls.exists(_.startsWith("http://ok")))
    // crash-replay: batch 0 re-executes and REWRITES both outputs
    val commits = new java.io.File(
      reg.checkpointDir(link.name, "rp_corpus"), "commits")
    assert(new java.io.File(commits, "0").delete())
    new java.io.File(commits, ".0.crc").delete()
    link.start(spark, reg).awaitTermination()
    assert(urls("rp_corpus") === corpus)
    assert(reg.read("rp_corpus").count() === corpus.size)
    assert(urls("rp_frontier_feed") === feed)
    assert(reg.read("rp_frontier_feed").count() === feed.size)
  }

  test("segment export link: batches pack into target-sized segments " +
    "with a CDXJ index whose locators round-trip through " +
    "fetchByLocator — both layouts, ids unique across batches, " +
    "crash-replay rewrites its partitions (zero dups)") {
    import graft.ops.Warc
    import graft.runtime.SegmentExportLink
    val s = spark
    import s.implicits._
    def docs(ids: Range) = ids.map(i =>
      (s"http://seg.org/$i", s"body text $i café " + ("x" * (i % 40))))
    val b1 = docs(0 until 12)
    val b2 = docs(12 until 20)
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-segment-export").toString)
    val link = new SegmentExportLink("se_docs", "se_segments", "se_index",
      targetSegmentBytes = 400L, shardsPerBatch = 2,
      date = "2026-08-16T00:00:00Z")

    reg.write(b1.toDF("url", "text"), "se_docs")
    link.start(spark, reg).awaitTermination()
    reg.write(b2.toDF("url", "text"), "se_docs")
    link.start(spark, reg).awaitTermination()

    val segs = reg.read("se_segments")
    val idx = reg.read("se_index")
    // record-level parity: parsing every written segment recovers
    // exactly the corpus as WET conversion records
    val parsed = Warc.parseWarcText(spark,
        segs.select("chunk_id", "payload")).toDF()
    assert(parsed.filter(!col("valid")).count() === 0)
    val got = parsed.select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === (b1 ++ b2).toSet)
    // several segments per batch (the 400-byte target is real) and ids
    // unique across batches (batch-scoped shards can never collide)
    assert(segs.select("chunk_id").distinct().count() === segs.count())
    assert(segs.count() > 4)
    // the index IS the random-access contract: dereference every line's
    // json locator against the written segments
    val locs = idx.select(col("chunk_id"), col("rec_idx"),
      get_json_object(regexp_extract(col("cdxj_line"),
        "^(\\S+) (\\S+) (.*)$", 3), "$.offset").cast("long")
        .as("rec_offset"),
      get_json_object(regexp_extract(col("cdxj_line"),
        "^(\\S+) (\\S+) (.*)$", 3), "$.length").cast("long")
        .as("rec_bytes"),
      lit(true).as("valid"))
    val fetched = Warc.fetchByLocator(spark,
      segs.select("chunk_id", "payload"), locs).toDF()
    assert(fetched.count() === 20)
    assert(fetched.filter(!col("valid")).count() === 0)
    assert(fetched.select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet === got)
    // crash-replay: drop batch 1's commit mark — the restart
    // re-executes it and REWRITES batch=1 of both outputs
    val (sc, ic) = (segs.count(), idx.count())
    val commits = new java.io.File(
      reg.checkpointDir(link.name, "se_segments"), "commits")
    assert(new java.io.File(commits, "1").delete())
    new java.io.File(commits, ".1.crc").delete()
    link.start(spark, reg).awaitTermination()
    assert(reg.read("se_segments").count() === sc)
    assert(reg.read("se_index").count() === ic)

    // the .warc.gz layout: per-record members, compressed locators from
    // the index builder — same corpus back through the same contract
    val gzLink = new SegmentExportLink("se_docs", "se_gz_segments",
      "se_gz_index", targetSegmentBytes = 400L, shardsPerBatch = 2,
      gzip = true, date = "2026-08-16T00:00:00Z")
    gzLink.start(spark, reg).awaitTermination()
    val gsegs = reg.read("se_gz_segments")
    val gidx = reg.read("se_gz_index")
    val glocs = gidx.select(col("chunk_id"), col("rec_idx"),
      get_json_object(regexp_extract(col("cdxj_line"),
        "^(\\S+) (\\S+) (.*)$", 3), "$.offset").cast("long")
        .as("rec_offset"),
      get_json_object(regexp_extract(col("cdxj_line"),
        "^(\\S+) (\\S+) (.*)$", 3), "$.length").cast("long")
        .as("rec_bytes"),
      lit(true).as("valid"))
    val gfetched = Warc.fetchByLocator(spark,
      gsegs.select("chunk_id", "payload"), glocs).toDF()
    assert(gfetched.filter(!col("valid")).count() === 0)
    assert(gfetched.select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet === got)
  }

  test("canonical gate link: one survivor per declared target, earlier " +
    "batches win, fallback targets gate refetches, replay no-op") {
    import graft.runtime.CanonicalGateLink
    val s = spark
    import s.implicits._
    def art(u: String, target: String): (String, String) =
      (u, s"<link rel=\"canonical\" href=\"$target\"><p>body of $u</p>")
    val tA = "http://a.org/art/1"
    val b1 = Seq(
      art("http://a.org/art/1", tA),           // the canonical page itself
      art("http://a.org/art/1?page=2", tA),    // variant — loses (url order)
      art("http://a.org/amp/1", tA),           // variant — loses
      ("http://b.org/plain", "<p>no canonical</p>")) // fallback target
    val b2 = Seq(
      art("http://c.org/syndicated/1", tA),    // target seen in batch 1
      ("http://b.org/plain", "<p>refetch</p>"), // refetch — fallback gates
      art("http://d.org/new", "http://d.org/new"), // genuinely new
      // a DUPLICATE capture of the same URL within one batch (two WARC
      // records of one fetch): exactly one survivor row may emerge
      art("http://d.org/new", "http://d.org/new"))

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-canonical-gate").toString)
    val link = new CanonicalGateLink("cg_pages", "cg_survivors", "cg_targets")

    reg.write(b1.toDF("url", "html"), "cg_pages")
    link.start(spark, reg).awaitTermination()
    val s1 = reg.read("cg_survivors")
      .select("url", "canonical_target")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // min url per target: "http://a.org/amp/1" < "http://a.org/art/1"
    assert(s1 === Set(("http://a.org/amp/1", tA),
      ("http://b.org/plain", "http://b.org/plain")))
    // batch parity with the shared gate over an empty seen set
    val expected1 = CanonicalGateLink.gate(b1.toDF("url", "html"),
        Seq.empty[String].toDF("canonical_target"))
      .select("url", "canonical_target")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s1 === expected1)

    reg.write(b2.toDF("url", "html"), "cg_pages")
    link.start(spark, reg).awaitTermination()
    val s2 = reg.read("cg_survivors")
      .select("url", "canonical_target")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the syndicated copy and the refetch are gated; only d.org enters
    assert(s2 === s1 + (("http://d.org/new", "http://d.org/new")))
    assert(reg.read("cg_targets").count() === 3)

    // replay: exactly-once offsets, nothing appended
    link.start(spark, reg).awaitTermination()
    assert(reg.read("cg_survivors").count() === 3)
    assert(reg.read("cg_targets").count() === 3)
  }

  test("full streaming loop: WARC ingest → canonical gate → main " +
    "content → frontier as ONE pipeline — variants collapse before " +
    "extraction, per-stage batch parity, replay no-op") {
    import graft.ops.{Warc, WebText}
    import graft.runtime.{CanonicalGateLink, FrontierLink, MainContentLink,
      Pipeline, WarcHttpIngestLink}
    val body = "The quick brown fox jumps over the lazy dog near the " +
      "riverbank while curious onlookers take photographs of the scene."
    def page(art: Int, variant: String): String =
      s"<html><head><link rel=\"canonical\" " +
        s"href=\"http://site.org/art/$art\"></head><body>" +
        "<div><a href=\"http://site.org/\">Home</a> " +
        "<a href=\"http://site.org/about\">About</a></div>" +
        s"<p>$body Article $art as $variant.</p>" +
        s"<a href=\"http://peer$art.net/ref\">source</a></body></html>"
    // article 1 arrives as canonical + ?page=2 variant in batch 1, and
    // AGAIN as an /amp/ variant in batch 2 (must be gated); article 2
    // is batch-2-only
    val b1 = Seq(101L -> page(1, "canonical"), 102L -> page(1, "paged"))
    val b2 = Seq(201L -> page(1, "amp"), 202L -> page(2, "fresh"))
    // URI synthesis: doc_id selects the variant URL shape
    val uri = when(col("doc_id") === 101L, lit("http://site.org/art/1"))
      .when(col("doc_id") === 102L, lit("http://site.org/art/1?page=2"))
      .when(col("doc_id") === 201L, lit("http://site.org/amp/1"))
      .otherwise(lit("http://site.org/art/2"))

    object PageAdapter extends Link {
      val inputs = Seq("full_docs"); val output = Some("full_pages")
      override def transform(df: DataFrame): DataFrame =
        df.filter(col("valid"))
          .select(col("target_uri").as("url"), col("text").as("html"))
    }
    val pipeline = new Pipeline(Seq(
      new WarcHttpIngestLink("full_chunks", "full_docs"),
      PageAdapter,
      new CanonicalGateLink("full_pages", "full_survivors", "full_targets"),
      new MainContentLink("full_survivors", "full_main"),
      new FrontierLink("full_survivors", "full_crawled", "full_links",
        "full_frontier", topKPerDomain = 3)))
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-full-loop").toString)

    def html(rows: Seq[(Long, String)]): DataFrame = {
      val s = spark; import s.implicits._
      rows.toDF("doc_id", "text")
    }
    reg.write(Warc.syntheticWarcChunks(html(b1), uri = uri), "full_chunks")
    pipeline.runOnce(spark, reg)
    reg.write(Warc.syntheticWarcChunks(html(b2), uri = uri), "full_chunks")
    pipeline.runOnce(spark, reg)

    // canonical stage: ONE survivor per article — the batch-1 winner of
    // article 1 (min url), article 2 from batch 2; the amp re-arrival
    // never reaches extraction
    val survivors = reg.read("full_survivors")
      .select("url", "canonical_target").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(survivors === Set(
      ("http://site.org/art/1", "http://site.org/art/1"),
      ("http://site.org/art/2", "http://site.org/art/2")))

    // main-content stage: parity with the batch extractor over exactly
    // the survivors; the nav chrome is gone, the article text is kept
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val mainStreamed = rows(reg.read("full_main"))
    assert(mainStreamed === rows(WebText.mainContent(
      reg.read("full_survivors").select("url", "html"))))
    val texts = reg.read("full_main").select("main_text")
      .collect().map(_.getString(0))
    assert(texts.forall(t => t.contains("quick brown fox") &&
      !t.contains("Home")))

    // frontier stage: parity with the batch plan over the survivors'
    // resolved links minus the crawled set
    assert(rows(reg.read("full_frontier").drop("bucket")) === rows(
      FrontierLink.frontierPlan(
        WebText.resolvedLinkRows(reg.read("full_survivors")
          .select("url", "html"), "url", "html").select("link"),
        reg.read("full_crawled"), None, "graftbot", 3)))

    // replay: every stage appends nothing
    val streams = Seq("full_docs", "full_pages", "full_survivors",
      "full_targets", "full_main", "full_crawled", "full_links")
    val before = streams.map(s => reg.read(s).count())
    pipeline.runOnce(spark, reg)
    assert(streams.map(s => reg.read(s).count()) === before)
  }

  test("incremental host-health table: the frontier's back-off input is " +
    "the maintained aggregate — parity with the raw-log ladder, refresh " +
    "plan reads ONE health partition and never the fetch log, raw-log " +
    "appends alone are invisible until merged, health-only batches " +
    "propagate via the manifest signature, crash-replay never double-" +
    "counts") {
    import graft.ops.{Robots, WebText}
    import graft.runtime.{FrontierLink, HostHealthLink}
    val s = spark
    import s.implicits._
    def bucketOf(host: String): Int =
      Seq(host).toDF("h")
        .select(FrontierLink.bucketOf(col("h"), 16)).head().getInt(0)
    val alphaB = bucketOf("alpha.org")
    val other = Seq("bravo.net", "carol.com", "delta.io", "echo.org")
      .find(bucketOf(_) != alphaB).get
    val otherB = bucketOf(other)
    val seed = Seq("seed2.org", "seed3.net", "seed4.com", "seed5.io")
      .find(h => bucketOf(h) != otherB && bucketOf(h) != alphaB).get

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-health-stream").toString)
    val health = new HostHealthLink("hh_hist", "hh_health")
    val frontier = new FrontierLink("hh_pages", "hh_crawled", "hh_links",
      "hh_frontier", topKPerDomain = 3, healthStream = "hh_health")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    def expected(pages: Seq[(String, String)]): DataFrame = {
      val pdf = pages.toDF("url", "html")
      FrontierLink.frontierPlan(
        WebText.resolvedLinkRows(pdf, "url", "html").select("link"),
        pdf.select("url"), None, "graftbot", 3,
        history = Some(reg.read("hh_hist")))
    }

    // batch 1: links into both buckets; alpha.org is DISTRESSED (2/4
    // server errors → share 1/2 → ladder 8×)
    val h1 = Seq(("alpha.org", 500), ("alpha.org", 503),
      ("alpha.org", 200), ("alpha.org", 200), (other, 200))
    reg.write(h1.toDF("host", "status_code"), "hh_hist")
    health.start(spark, reg).awaitTermination()
    val b1 = Seq((s"http://$seed/p",
      s"<a href='http://alpha.org/a'>1</a><a href='http://$other/x'>2</a>"))
    reg.write(b1.toDF("url", "html"), "hh_pages")
    frontier.start(spark, reg).awaitTermination()

    // the maintained aggregate IS the log's aggregate, and the ladder
    // over it IS the raw-log ladder
    assert(rows(reg.read("hh_health")
        .select("host", "n_fetches", "n_errors")) ===
      rows(Robots.healthCounts(reg.read("hh_hist"))))
    assert(rows(Robots.backoffFromCounts(reg.read("hh_health")
        .select("host", "n_fetches", "n_errors"))) ===
      rows(Robots.backoffSchedule(reg.read("hh_hist"))))
    // last_status/last_batch: the worst status of the most recent
    // batch that touched the host
    assert(rows(reg.read("hh_health")
        .select("host", "last_status", "last_batch")) ===
      Set(Seq("alpha.org", 503, 0L), Seq(other, 200, 0L)))
    // frontier parity with the RAW-log reference plan (the aggregate
    // path must be invisible in the output), and the 8× ladder landed
    val f1 = rows(reg.read("hh_frontier").drop("bucket"))
    assert(f1 === rows(expected(b1)))
    assert(f1.exists(r => r(1) === "http://alpha.org/a" && r(4) === 8000L))

    // THE 100 TB pin: a bucket's refresh plan reads its count,
    // crawled-set and HEALTH partitions — never the raw fetch log and
    // never a whole table
    val scanPaths = FrontierLink.refreshBucketPlan(reg,
        "hh_frontier_counts", "hh_frontier_crawled_set", alphaB, 16, Nil,
        "", "", "graftbot", 3, 1000L, healthStream = "hh_health")
      .queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
    assert(scanPaths.nonEmpty)
    assert(!scanPaths.exists(_.contains("hh_hist")), scanPaths)
    assert(scanPaths.forall(p =>
      p.contains(s"hh_frontier_counts/bucket=$alphaB") ||
        p.contains(s"hh_frontier_crawled_set/bucket=$alphaB") ||
        p.contains(s"hh_health/bucket=$alphaB")), scanPaths)

    // raw-log appends alone are INVISIBLE to the refresh (nothing in
    // the loop reads the log): new history rows without a health merge
    // change no frontier bucket
    def frontierFiles(): Map[String, (Long, Long)] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (!d.exists()) Nil
        else d.listFiles().toSeq.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(s"${reg.root}/streams/hh_frontier"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val h2 = Seq(("alpha.org", 200), ("alpha.org", 200),
      ("alpha.org", 200), ("alpha.org", 200))
    reg.write(h2.toDF("host", "status_code"), "hh_hist")
    val beforeRaw = frontierFiles()
    reg.write(Seq.empty[(String, String)].toDF("url", "html"), "hh_pages")
    frontier.start(spark, reg).awaitTermination()
    assert(frontierFiles() === beforeRaw,
      "a raw-log append without a health merge rewrote a frontier bucket")

    // ...and the MERGE propagates through the manifest signature: a
    // health-only batch (no links, no crawls) refreshes EXACTLY
    // alpha's bucket — the 8 recovery fetches drop the share to 1/4
    // (ladder 4×) — while the other bucket rides through byte-identical
    health.start(spark, reg).awaitTermination()
    val beforeMerge = frontierFiles()
    reg.write(Seq.empty[(String, String)].toDF("url", "html"), "hh_pages")
    frontier.start(spark, reg).awaitTermination()
    val afterMerge = frontierFiles()
    assert(afterMerge !== beforeMerge)
    assert(afterMerge.filter(_._1.contains(s"bucket=$otherB")) ===
      beforeMerge.filter(_._1.contains(s"bucket=$otherB")),
      "a health merge for alpha's bucket rewrote the other bucket")
    val f2 = rows(reg.read("hh_frontier").drop("bucket"))
    assert(f2 === rows(expected(b1)))
    assert(f2.exists(r => r(1) === "http://alpha.org/a" && r(4) === 4000L))

    // crash-replay of the HEALTH merge: drop the commit mark (and its
    // crc — ChecksumFileSystem would fail the re-created commit's
    // rename otherwise) and re-run; counts must not inflate
    val commits = new java.io.File(
      reg.checkpointDir(health.name, "hh_health"), "commits")
    assert(new java.io.File(commits, "1").delete())
    new java.io.File(commits, ".1.crc").delete()
    health.start(spark, reg).awaitTermination()
    assert(rows(reg.read("hh_health")
        .select("host", "n_fetches", "n_errors")) ===
      rows(Robots.healthCounts(reg.read("hh_hist"))))
    assert(reg.read("hh_health").filter(col("host") === "alpha.org")
      .select("n_fetches").head().getLong(0) === 8L)
  }

  test("rebucket migration: a pinned modulus changes in one maintenance " +
    "op — contents identical, rows land in their new-hash buckets, " +
    "merge marks carried, an old-modulus link fails loudly (including " +
    "after a crash between data swap and pin write), and the frontier " +
    "loop resumes against the new modulus") {
    import graft.ops.WebText
    import graft.runtime.FrontierLink
    val s = spark
    import s.implicits._
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-rebucket").toString)
    val link16 = new FrontierLink("rb_pages", "rb_crawled", "rb_links",
      "rb_frontier", topKPerDomain = 3)
    val b1 = Seq(("http://seed.org/p",
      "<a href='http://alpha.org/a'>1</a><a href='http://bravo.net/x'>2</a>"))
    val b2 = Seq(("http://seed2.org/p",
      "<a href='http://alpha.org/b'>1</a><a href='http://carol.com/y'>2</a>"))
    reg.write(b1.toDF("url", "html"), "rb_pages")
    link16.start(spark, reg).awaitTermination()
    reg.write(b2.toDF("url", "html"), "rb_pages")
    link16.start(spark, reg).awaitTermination()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val countsBefore = rows(reg.read("rb_frontier_counts").drop("bucket"))
    val crawledBefore = rows(reg.read("rb_frontier_crawled_set")
      .drop("bucket"))
    val frontierBefore = rows(reg.read("rb_frontier").drop("bucket"))

    // migrate all three tables of the loop to 4 buckets, each under
    // ITS bucketing key
    reg.rebucket("rb_frontier_counts", col("host"), 4)
    reg.rebucket("rb_frontier_crawled_set",
      WebText.registeredDomain(col("url")), 4)
    reg.rebucket("rb_frontier", col("domain"), 4)

    // contents identical; every row sits in its new-hash bucket
    assert(rows(reg.read("rb_frontier_counts").drop("bucket")) ===
      countsBefore)
    assert(rows(reg.read("rb_frontier_crawled_set").drop("bucket")) ===
      crawledBefore)
    assert(rows(reg.read("rb_frontier").drop("bucket")) === frontierBefore)
    assert(reg.read("rb_frontier_counts")
      .filter(col("bucket") =!= FrontierLink.bucketOf(col("host"), 4))
      .count() === 0)
    assert(reg.read("rb_frontier")
      .filter(col("bucket") =!= FrontierLink.bucketOf(col("domain"), 4))
      .count() === 0)
    // the merge high-water mark carried (max of the old buckets' marks)
    val popped = reg.read("rb_frontier_counts").select("bucket")
      .distinct().collect().map(_.getInt(0))
    popped.foreach { b =>
      assert(reg.refreshPartitionMeta("rb_frontier_counts", b, "batch")
        === Some("1"), s"bucket $b lost its merge mark")
    }

    // an old-modulus link fails LOUDLY at start — never a mixed read
    val stale = new FrontierLink("rb_pages", "rb_crawled", "rb_links",
      "rb_frontier", topKPerDomain = 3, numBuckets = 16)
    val ex = intercept[IllegalArgumentException] {
      stale.start(spark, reg)
    }
    assert(ex.getMessage.contains("fixed for the"))

    // crash between the data swap and the pin write: the in-dir
    // _buckets marker is the committed truth — the pin heals on the
    // next pin check, the stale link still fails
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        s"${reg.root}/schemas/rb_frontier_counts.buckets"),
      "16".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the direct write bypassed Hadoop's ChecksumFileSystem — drop the
    // stale .crc sibling so the registry can read the simulated state
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      s"${reg.root}/schemas/.rb_frontier_counts.buckets.crc"))
    reg.pinBucketCount("rb_frontier_counts", 4) // heals from the marker
    assert(reg.bucketCountOf("rb_frontier_counts") === Some(4))
    intercept[IllegalArgumentException] {
      reg.pinBucketCount("rb_frontier_counts", 16)
    }

    // the loop RESUMES against the new modulus: a new-modulus link
    // picks up the same checkpoint, processes a fresh batch, and the
    // view equals the whole-plan reference
    val link4 = new FrontierLink("rb_pages", "rb_crawled", "rb_links",
      "rb_frontier", topKPerDomain = 3, numBuckets = 4)
    val b3 = Seq(("http://seed3.io/p",
      "<a href='http://alpha.org/a'>1</a><a href='http://delta.io/z'>2</a>"))
    reg.write(b3.toDF("url", "html"), "rb_pages")
    link4.start(spark, reg).awaitTermination()
    assert(rows(reg.read("rb_frontier_counts")
        .select("link", "host", "inlinks")) ===
      rows(FrontierLink.linkCounts(reg.read("rb_links"))))
    assert(rows(reg.read("rb_frontier").drop("bucket")) ===
      rows(FrontierLink.refreshPlan(reg, "rb_frontier_counts", Nil,
        "rb_crawled", "", "", "graftbot", 3, 1000L)))
    assert(reg.read("rb_frontier")
      .filter(col("bucket") =!= FrontierLink.bucketOf(col("domain"), 4))
      .count() === 0)
  }

  test("bucketed url-keyed side channel: a BucketedSideLink dates table " +
    "feeds the frontier identically to the flat stream, per-bucket " +
    "refresh reads ONE dates partition, distinct-set merge is " +
    "exactly-once under replay") {
    import graft.ops.WebText
    import graft.runtime.{BucketedSideLink, FrontierLink}
    val s = spark
    import s.implicits._
    def bucketOf(host: String): Int =
      Seq(host).toDF("h")
        .select(FrontierLink.bucketOf(col("h"), 16)).head().getInt(0)
    val alphaB = bucketOf("alpha.org")

    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-sidedates-stream").toString)
    val sideLink = new BucketedSideLink("sd_dates_raw", "sd_dates",
      urlCol = "url")
    val now = 1755000000000L
    val frontier = new FrontierLink("sd_pages", "sd_crawled", "sd_links",
      "sd_frontier", topKPerDomain = 2, datesStream = "sd_dates",
      nowMs = now)

    // dates for alpha's urls (one DUPLICATE row — the distinct set
    // must hold it once) land in alpha's bucket via registeredDomain
    val d1 = Seq(("http://alpha.org/a", now - 86400000L),
      ("http://alpha.org/a", now - 86400000L),
      ("http://alpha.org/b", now - 200L * 86400000L))
    reg.write(d1.toDF("url", "published_ms"), "sd_dates_raw")
    sideLink.start(spark, reg).awaitTermination()
    assert(reg.read("sd_dates").count() === 2)
    assert(reg.read("sd_dates").select("bucket").distinct()
      .head().getInt(0) === alphaB)

    val b1 = Seq(("http://seed.org/p",
      "<a href='http://alpha.org/a'>1</a><a href='http://alpha.org/b'>2</a>" +
        "<a href='http://alpha.org/c'>3</a>"))
    reg.write(b1.toDF("url", "html"), "sd_pages")
    frontier.start(spark, reg).awaitTermination()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    // parity with the FLAT-stream reference plan: layout must be
    // invisible in the ranking (fresh /a outranks 200-day-old /b)
    val pdf = b1.toDF("url", "html")
    val f1 = rows(reg.read("sd_frontier").drop("bucket"))
    assert(f1 === rows(FrontierLink.frontierPlan(
      WebText.resolvedLinkRows(pdf, "url", "html").select("link"),
      pdf.select("url"), None, "graftbot", 2, None, 1000L,
      None, Some(d1.toDF("url", "published_ms")), None, now)))
    assert(f1.exists(r => r(1) === "http://alpha.org/a" && r(3) === 1L))

    // the per-bucket refresh reads the dates PARTITION, not the whole
    // table and not the raw channel
    val scanPaths = FrontierLink.refreshBucketPlan(reg,
        "sd_frontier_counts", "sd_frontier_crawled_set", alphaB, 16, Nil,
        "", "", "graftbot", 2, 1000L, datesStream = "sd_dates",
        nowMs = now)
      .queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
    assert(scanPaths.nonEmpty)
    assert(!scanPaths.exists(_.contains("sd_dates_raw")), scanPaths)
    assert(scanPaths.forall(p =>
      p.contains(s"sd_frontier_counts/bucket=$alphaB") ||
        p.contains(s"sd_frontier_crawled_set/bucket=$alphaB") ||
        p.contains(s"sd_dates/bucket=$alphaB")), scanPaths)

    // crash-replay of the side merge: distinct-set contents unchanged
    val commits = new java.io.File(
      reg.checkpointDir(sideLink.name, "sd_dates"), "commits")
    assert(new java.io.File(commits, "0").delete())
    new java.io.File(commits, ".0.crc").delete()
    sideLink.start(spark, reg).awaitTermination()
    assert(reg.read("sd_dates").count() === 2)
  }
}
