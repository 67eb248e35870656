package graft

import org.apache.spark.sql.functions._
import graft.ops.{Http, Robots}

/** robots.txt / HTTP-split edge semantics beyond the q190–q193 oracles. */
class RobotsSpec extends SparkSpec {
  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  private val robotsTxt =
    """User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |
      |User-agent: graftbot
      |Disallow: /tmp
      |""".stripMargin

  test("parseRobots: groups, stacking, comments, valueless disallow") {
    val txt =
      """# header comment
        |User-agent: a
        |User-agent: b
        |Disallow: /one
        |Disallow:
        |
        |USER-AGENT: c
        |Allow: /two # tail comment
        |Crawl-delay: 5
        |""".stripMargin
    val got = Robots.parseRobots(Seq(("h", txt)).toDF("host", "robots_txt"))
      .orderBy("group_id", "user_agent", "directive")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4))).toSeq
    // valueless Disallow dropped; crawl-delay not a path rule; stacked
    // agents a+b share group 1's /one; c's group gets /two
    assert(got === Seq((1L, "a", "disallow", "/one"),
      (1L, "b", "disallow", "/one"), (2L, "c", "allow", "/two")))
  }

  test("isAllowed: default-allow without rules, agent group replaces *, " +
    "longest prefix with allow winning ties") {
    val rules = Robots.parseRobots(
      Seq(("h", robotsTxt)).toDF("host", "robots_txt"))
    val urls = Seq(
      (1L, "h", "/private/ok/page"),   // * group: allow (longer prefix)
      (2L, "h", "/private/no"),        // * group: disallow
      (3L, "h", "/elsewhere"),         // no rule: allow
      (4L, "nohost", "/private/no"),   // host without robots: allow
      (5L, "h", "/tmp/x"),             // graftbot group: disallow
      (6L, "h", "/privateXtra")        // prefix is plain-text: /private
    ).toDF("doc_id", "host", "path")   //   matches /privateXtra too
    def verdicts(agent: String) =
      Robots.isAllowed(urls, rules, agent).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
    val star = verdicts("unknownbot")
    assert(star === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> true, 6L -> false))
    val bot = verdicts("graftbot")
    // agent-specific group REPLACES *: /private free, /tmp blocked
    assert(bot === Map(1L -> true, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> true))
    // tie at equal length: a rule pair allow+disallow on the SAME prefix
    val tie = Robots.parseRobots(Seq(("t",
      "User-agent: *\nDisallow: /p\nAllow: /p\n")).toDF("host", "robots_txt"))
    val t = Robots.isAllowed(Seq((1L, "t", "/p/x")).toDF("doc_id", "host",
      "path"), tie, "any").collect().head.getAs[Boolean]("allowed")
    assert(t, "allow must win an equal-length tie")
    // a crawl-delay line is a group BOUNDARY even though isAllowed
    // ignores the directive itself: agent a's delay-only group must not
    // merge into agent b's group and inherit b's disallow
    val sep = Robots.parseRobots(Seq(("s",
      "User-agent: a\nCrawl-delay: 1\n\nUser-agent: b\nDisallow: /x\n"))
      .toDF("host", "robots_txt"))
    val sepUrls = Seq((1L, "s", "/x/page")).toDF("doc_id", "host", "path")
    assert(Robots.isAllowed(sepUrls, sep, "a")
      .collect().head.getAs[Boolean]("allowed"),
      "b's disallow leaked across the crawl-delay group boundary")
    assert(!Robots.isAllowed(sepUrls, sep, "b")
      .collect().head.getAs[Boolean]("allowed"))
  }

  test("parseCrawlDelays: agent group beats *, no-delay agent group " +
    "does NOT fall back, fractional seconds, malformed value drops, " +
    "max of multiple applicable delays") {
    val robots = Seq(
      // agent-specific 2.5s beats the * 10s
      ("a", "User-agent: *\nCrawl-delay: 10\n\n" +
        "User-agent: graftbot\nCrawl-delay: 2.5\n"),
      // agent group exists but declares NO delay: absent, not 10s
      ("b", "User-agent: *\nCrawl-delay: 10\n\n" +
        "User-agent: graftbot\nAllow: /\n"),
      // no agent group: * applies
      ("c", "User-agent: *\nCrawl-delay: 3\n"),
      // malformed value fails open (dropped), not the job
      ("d", "User-agent: *\nCrawl-delay: fast\n"),
      // two applicable groups (stacked + repeated): conservative max
      ("e", "User-agent: graftbot\nCrawl-delay: 1\n\n" +
        "User-agent: graftbot\nUser-agent: otherbot\nCrawl-delay: 4\n"),
      // no robots rules at all
      ("f", "# empty\n"),
      // hostile negative delay: dropped like malformed, never scheduled
      ("g", "User-agent: *\nCrawl-delay: -5\n"),
      // huge-but-valid magnitudes CLAMP to the 24h cap (dropping them
      // would fall back to a much faster default); NaN drops
      ("h", "User-agent: *\nCrawl-delay: 1e300\n"),
      ("i", "User-agent: *\nCrawl-delay: Infinity\n"),
      ("j", "User-agent: *\nCrawl-delay: NaN\n"),
      ("l", "User-agent: *\nCrawl-delay: 100000\n"), // ~28h: clamps too
      // agent group FIRST, closed by its own rule line, then a * group
      // with a delay: the graftbot group declares none, and the rule
      // line between the UA lines must keep the groups from merging —
      // a filter-before-group parse would leak the * delay to graftbot
      ("k", "User-agent: graftbot\nDisallow: /private\n\n" +
        "User-agent: *\nCrawl-delay: 10\n")).toDF("host", "robots_txt")
    val got = graft.ops.Robots.parseCrawlDelays(robots, "GraftBot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2500L, "c" -> 3000L, "e" -> 4000L,
      "h" -> 86400000L, "i" -> 86400000L, "l" -> 86400000L))
  }

  test("politenessSchedule: per-host slots spaced by that host's delay, " +
    "default for undeclared hosts, url-order ties") {
    val urls = Seq(("h1", "/b"), ("h1", "/a"), ("h1", "/c"),
      ("h2", "/x"), ("h2", "/y")).toDF("host", "url")
    val delays = Seq(("h1", 2000L)).toDF("host", "crawl_delay_ms")
    val got = graft.ops.Robots.politenessSchedule(urls, delays,
        defaultDelayMs = 500L)
      .select("host", "url", "delay_ms", "slot", "fetch_offset_ms")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      ("h1", "/a", 2000L, 0L, 0L), ("h1", "/b", 2000L, 1L, 2000L),
      ("h1", "/c", 2000L, 2L, 4000L),
      ("h2", "/x", 500L, 0L, 0L), ("h2", "/y", 500L, 1L, 500L)))
  }

  test("politenessSchedule: maxPerHost drops the hot host's tail via a " +
    "map-side WindowGroupLimit, cold hosts untouched, 0 disables") {
    val urls = ((0 until 10).map(i => ("hot", f"/u$i%02d")) ++
      Seq(("cold", "/a"), ("cold", "/b"))).toDF("host", "url")
    val delays = Seq(("hot", 100L)).toDF("host", "crawl_delay_ms")
    val capped = Robots.politenessSchedule(urls, delays,
      defaultDelayMs = 50L, maxPerHost = 3)
    val got = capped.select("host", "url", "slot", "fetch_offset_ms")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // hot keeps its FIRST 3 url-order slots (the kept set is the cap's
    // contract, not just the count); cold is below the cap → intact
    assert(got === Set(
      ("hot", "/u00", 0L, 0L), ("hot", "/u01", 1L, 100L),
      ("hot", "/u02", 2L, 200L),
      ("cold", "/a", 0L, 0L), ("cold", "/b", 1L, 50L)))
    // the cap must plan as a WindowGroupLimit (map-side per-partition
    // top-k BEFORE the shuffle), not a post-window filter — the actual
    // scale guard (executedPlan read AFTER the collect above)
    assert(capped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "expected InferWindowGroupLimit to plant a WindowGroupLimit node")
    // maxPerHost = 0: guard off, every slot present
    assert(Robots.politenessSchedule(urls, delays, maxPerHost = 0)
      .count() === 12L)
    intercept[IllegalArgumentException] {
      Robots.politenessSchedule(urls, delays, maxPerHost = -1)
    }
  }

  test("sitemapUrls: case-insensitive key, comment strip, scheme colon " +
    "intact, group-independent, valueless line dropped") {
    val robots = Seq(
      ("a.com", "User-agent: *\nSitemap: http://a.com/s.xml # note\n" +
        "User-agent: bot\nDisallow: /\nSITEMAP:https://a.com/t.xml\n" +
        "sitemap :\n# Sitemap: http://a.com/commented.xml"),
      ("b.org", "User-agent: *\nDisallow: /tmp"))
      .toDF("host", "robots_txt")
    val got = graft.ops.Robots.sitemapUrls(robots)
      .as[(String, String)].collect().sorted.toSeq
    // the inside-a-group placement must not matter; the fully-commented
    // line and the valueless line must not emit
    assert(got === Seq(
      ("a.com", "http://a.com/s.xml"),
      ("a.com", "https://a.com/t.xml")))
  }

  test("Http.splitResponseBytes: declared-charset decode, fallback on " +
    "unsupported names, replacement on malformed bytes, first-split wins") {
    def resp(cs: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$cs\r\n\r\n"
        .getBytes("ISO-8859-1")) ++ body
    // latin-1 body: é = 0xE9 as ONE byte — an eager UTF-8 read corrupts it
    val latin = Http.splitResponseBytes(
      resp("ISO-8859-1", "café".getBytes("ISO-8859-1")))
    assert(latin === ((200, "text/html", "iso-8859-1", "café")))
    // unsupported charset name: raw token reported, UTF-8 fallback decode
    val bogus = Http.splitResponseBytes(
      resp("x-bogus", "plain café".getBytes("UTF-8")))
    assert(bogus === ((200, "text/html", "x-bogus", "plain café")))
    // malformed bytes under the declared charset: U+FFFD, never a throw
    val bad = Http.splitResponseBytes(resp("UTF-8", Array(0xE9.toByte)))
    assert(bad._4 === "�")
    // body containing CRLFCRLF: only the FIRST split separates headers
    val nested = Http.splitResponseBytes(
      resp("UTF-8", "a\r\n\r\nb".getBytes("UTF-8")))
    assert(nested._4 === "a\r\n\r\nb")
    // no status line: whole payload is the body
    assert(Http.splitResponseBytes("raw bytes".getBytes("UTF-8")) ===
      ((null, "", "", "raw bytes")))
  }

  test("Http.splitResponseBytes BOM precedence: BOM beats a lying " +
    "header and any meta, BOM bytes never leak into the text, UTF-16 " +
    "decodes from its BOM alone, truncated BOM-ish prefixes stay raw") {
    def resp(hdrCs: String, body: Array[Byte]): Array[Byte] = {
      val cs = if (hdrCs.isEmpty) "" else s"; charset=$hdrCs"
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html$cs\r\n\r\n"
        .getBytes("ISO-8859-1")) ++ body
    }
    val bomU8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    // UTF-8 BOM under a WRONG latin-1 header: BOM wins, is consumed
    val u8 = Http.splitResponseBytes(
      resp("iso-8859-1", bomU8 ++ "café".getBytes("UTF-8")))
    assert(u8 === ((200, "text/html", "utf-8", "café")))
    // UTF-16BE/LE decode from the BOM alone (no header charset)
    val be = Http.splitResponseBytes(resp("",
      Array(0xFE.toByte, 0xFF.toByte) ++ "über".getBytes("UTF-16BE")))
    assert(be === ((200, "text/html", "utf-16be", "über")))
    val le = Http.splitResponseBytes(resp("",
      Array(0xFF.toByte, 0xFE.toByte) ++ "über".getBytes("UTF-16LE")))
    assert(le === ((200, "text/html", "utf-16le", "über")))
    // BOM beats the meta prescan too
    val overMeta = Http.splitResponseBytes(resp("", bomU8 ++
      "<meta charset=\"iso-8859-1\">é".getBytes("UTF-8")))
    assert(overMeta._3 === "utf-8")
    assert(overMeta._4 === "<meta charset=\"iso-8859-1\">é")
    // a lone 0xEF 0xBB without the third byte is NOT a BOM: the body
    // decodes raw (U+FFFD on the malformed head, never a throw)
    val trunc = Http.splitResponseBytes(resp("",
      Array(0xEF.toByte, 0xBB.toByte) ++ "x".getBytes("UTF-8")))
    assert(trunc._3 === "" && trunc._4.endsWith("x"))
    // a BOM agreeing with its header still strips
    val agree = Http.splitResponseBytes(
      resp("utf-8", bomU8 ++ "plain".getBytes("UTF-8")))
    assert(agree === ((200, "text/html", "utf-8", "plain")))
  }

  test("RobotsGlob.matches: RFC 9309 wildcard semantics — prefix " +
    "reduction, * spans, trailing-$ anchor, mid-pattern $ literal") {
    import graft.functions.RobotsGlob.matches
    assert(matches("/private/data", "/private")) // wildcard-free = prefix
    assert(!matches("/fish", "/Fish")) // case-sensitive per RFC
    assert(matches("/index.php", "/*.php$"))
    assert(!matches("/index.php?x=1", "/*.php$")) // $ anchors the end
    assert(matches("/index.php?x=1", "/*.php")) // no $: prefix after *
    assert(matches("/a/b/c.gif", "/a/*.gif$"))
    assert(!matches("/a/b/c.gifx", "/a/*.gif$"))
    assert(matches("/x/yz/private", "/*/private"))
    assert(matches("/fish", "/fish$"))
    assert(!matches("/fishy", "/fish$"))
    assert(matches("/any/thing", "")) // empty pattern matches everything
    assert(matches("", "$"))
    assert(!matches("/x", "$"))
    assert(matches("/a$b", "/a$b")) // $ is literal unless trailing
    assert(matches("/abc", "/a*b*c$")) // multi-star backtracking
    assert(matches("/ab", "/a*b*$")) // trailing stars before the anchor
  }

  test("isAllowed: wildcard rules — $ anchor, * spans, most-octets " +
    "precedence between overlapping allow/disallow") {
    val robots = Seq(("w.com",
      "User-agent: *\nDisallow: /*.php$\nAllow: /pub*.php$\n" +
        "Disallow: /img/*.gif\n")).toDF("host", "robots_txt")
    val rules = graft.ops.Robots.parseRobots(robots)
    val urls = Seq(
      ("w.com", "/index.php"),     // /*.php$ (7 octets) → disallowed
      ("w.com", "/index.php?x=1"), // $ fails → no rule → allowed
      ("w.com", "/pub_x.php"),     // allow (10) beats disallow (7)
      ("w.com", "/img/a/b.gif"),   // * spans directories → disallowed
      ("w.com", "/img/a.gifs"),    // no $: ".gif" prefix-matches → disallowed
      ("w.com", "/ok/page")        // nothing matches → allowed
    ).toDF("host", "path")
    val got = graft.ops.Robots.isAllowed(urls, rules, "graftbot")
      .select("path", "allowed").as[(String, Boolean)].collect().toMap
    assert(got === Map(
      "/index.php" -> false, "/index.php?x=1" -> true,
      "/pub_x.php" -> true, "/img/a/b.gif" -> false,
      "/img/a.gifs" -> false, "/ok/page" -> true))
  }

  test("retryAfter + backoffSchedule: delta-seconds vs HTTP-date forms, " +
    "ladder steps, 4xx excluded from distress") {
    val ra = Seq(
      Tuple1("HTTP/1.1 429 Too Many\r\nRetry-After: 120\r\n\r\nb"),
      Tuple1("HTTP/1.1 503 Down\r\nRetry-After: Tue, 01 Jul 2025 " +
        "00:00:00 GMT\r\n\r\nb"),
      Tuple1("HTTP/1.1 200 OK\r\nServer: s\r\n\r\nb")).toDF("p")
      .select(Http.retryAfter(col("p")).as("raw"),
        Http.retryAfterMs(col("p")).as("ms"))
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(ra === Seq(("120", Some(120000L)),
      ("Tue, 01 Jul 2025 00:00:00 GMT", None), ("", None)))

    val hist = Seq(
      // a: 2/4 server errors -> 500000 micros -> 8x
      ("a", 503), ("a", 500), ("a", 200), ("a", 301),
      // b: 1/4 -> 250000 -> 4x (429 counts as distress)
      ("b", 429), ("b", 200), ("b", 200), ("b", 200),
      // c: 1/10 -> 100000 -> 2x
      ("c", 503), ("c", 200), ("c", 200), ("c", 200), ("c", 200),
      ("c", 200), ("c", 200), ("c", 200), ("c", 200), ("c", 200),
      // d: only 404s -> client errors never back a host off
      ("d", 404), ("d", 404), ("d", 200), ("d", 200))
      .toDF("host", "status_code")
    val got = graft.ops.Robots.backoffSchedule(hist)
      .select("host", "n_errors", "error_micros", "backoff_multiplier",
        "delay_ms")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("a", 2L, 500000L, 8L, 8000L),
      ("b", 1L, 250000L, 4L, 4000L),
      ("c", 1L, 100000L, 2L, 2000L),
      ("d", 0L, 0L, 1L, 1000L)))
  }

  test("Http.splitResponseBytes: transfer/content coding layers — " +
    "chunked, gzip, chunked+gzip, multi-member, deflate both flavors, " +
    "unsupported and malformed fall back raw") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close(); out.toByteArray
    }
    def chunk(b: Array[Byte], sizes: Seq[Int],
              ext: String = ""): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      for (s <- sizes) {
        out.write((s.toHexString + ext + "\r\n").getBytes("ISO-8859-1"))
        out.write(b, i, s); i += s
        out.write("\r\n".getBytes("ISO-8859-1"))
      }
      assert(i == b.length)
      out.write("0\r\nX-Trailer: t\r\n\r\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    def resp(hdrs: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n${hdrs}Content-Type: text/html\r\n\r\n"
        .getBytes("ISO-8859-1")) ++ body
    // gzip + DECLARED latin-1: gunzip must run before the charset decode
    val latin = "café latin".getBytes("ISO-8859-1")
    val g1 = Http.splitResponseBytes(resp(
      "Content-Encoding: gzip\r\nContent-Type: text/html; " +
        "charset=iso-8859-1\r\n", gz(latin)))
    assert(g1 === ((200, "text/html", "iso-8859-1", "café latin")))
    // gzip + NO header charset: the meta prescan must read the INFLATED
    // head (a sniff over compressed octets finds nothing)
    val metaDoc = ("<meta charset=\"iso-8859-1\"><body>café</body>")
      .getBytes("ISO-8859-1")
    val g2 = Http.splitResponseBytes(resp("Content-Encoding: gzip\r\n",
      gz(metaDoc)))
    assert(g2._3 === "iso-8859-1" && g2._4.contains("café"))
    // chunked framing: sizes split mid-word, chunk extension, trailer
    val plain = "hello chunked world".getBytes("UTF-8")
    val c1 = Http.splitResponseBytes(resp("Transfer-Encoding: chunked\r\n",
      chunk(plain, Seq(7, 12), ext = ";x=1")))
    assert(c1._4 === "hello chunked world")
    // layering: chunked wraps gzip on the wire — dechunk FIRST
    val both = Http.splitResponseBytes(resp(
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      chunk(gz(plain), Seq(5, gz(plain).length - 5))))
    assert(both._4 === "hello chunked world")
    // multi-member gzip entity
    val mm = Http.splitResponseBytes(resp("Content-Encoding: gzip\r\n",
      gz("part1 ".getBytes("UTF-8")) ++ gz("part2".getBytes("UTF-8"))))
    assert(mm._4 === "part1 part2")
    // deflate: zlib-wrapped and raw flavors both decode
    def deflate(b: Array[Byte], raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](256)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
    }
    assert(Http.splitResponseBytes(resp("Content-Encoding: deflate\r\n",
      deflate(plain, raw = false)))._4 === "hello chunked world")
    assert(Http.splitResponseBytes(resp("Content-Encoding: deflate\r\n",
      deflate(plain, raw = true)))._4 === "hello chunked world")
    // unsupported coding: raw passthrough (the crawler may have already
    // decoded it — exactly the case a passthrough round-trips)
    assert(Http.splitResponseBytes(resp("Content-Encoding: br\r\n",
      plain))._4 === "hello chunked world")
    // malformed chunk framing / corrupt gzip: raw fallback, never a throw
    assert(Http.splitResponseBytes(resp("Transfer-Encoding: chunked\r\n",
      "ZZZ\r\nnot chunked".getBytes("UTF-8")))._4 === "ZZZ\r\nnot chunked")
    val corrupt = gz(plain).dropRight(4) ++ Array[Byte](0, 0, 0, 0)
    val cr = Http.splitResponseBytes(resp("Content-Encoding: gzip\r\n",
      corrupt))
    assert(cr._1 === 200) // fallback decoded something, no exception
    // the column-level header extracts used by corpus audits
    val hdrs = Seq(
      Tuple1("HTTP/1.1 200 OK\r\nContent-Encoding: GZip\r\n" +
        "Transfer-Encoding: chunked\r\n\r\nb"),
      Tuple1("HTTP/1.1 200 OK\r\nServer: s\r\n\r\nb")).toDF("p")
      .select(Http.contentEncoding(col("p")).as("ce"),
        Http.transferEncoding(col("p")).as("te"))
      .as[(String, String)].collect().toSeq
    assert(hdrs === Seq(("gzip", "chunked"), ("", "")))
  }

  test("Http.splitResponseBytes: meta-charset prescan when the header " +
    "declares none — both forms, header wins, decoys and far metas ignored") {
    def resp(body: Array[Byte]): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        .getBytes("ISO-8859-1")) ++ body
    // HTML5 form: latin-1 é decoded correctly only if the sniff fired
    val m1 = Http.splitResponseBytes(resp(
      "<html><head><meta charset=\"iso-8859-1\"></head><body>café</body>"
        .getBytes("ISO-8859-1")))
    assert(m1._3 === "iso-8859-1" && m1._4.contains("café"))
    // legacy http-equiv form, name-first
    val m2 = Http.splitResponseBytes(resp(
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=ISO-8859-1\"><p>né</p>").getBytes("ISO-8859-1")))
    assert(m2._3 === "iso-8859-1" && m2._4.contains("né"))
    // legacy form, content-first attribute order
    val m3 = Http.splitResponseBytes(resp(
      ("<meta content=\"text/html; charset=ISO-8859-1\" " +
        "http-equiv='Content-Type'><p>nä</p>").getBytes("ISO-8859-1")))
    assert(m3._3 === "iso-8859-1" && m3._4.contains("nä"))
    // a charset= inside some OTHER attribute's value must not match
    val decoy = Http.splitResponseBytes(resp(
      ("<meta name=\"description\" content=\"discusses charset=utf-16\">" +
        "<p>plain</p>").getBytes("UTF-8")))
    assert(decoy._3 === "" && decoy._4.contains("plain"))
    // declarations past the 1024-byte prescan window are ignored
    val far = Http.splitResponseBytes(resp(
      (("x" * 1200) + "<meta charset=\"iso-8859-1\">").getBytes("UTF-8")))
    assert(far._3 === "")
    // a header-declared charset always wins over the body meta
    val hdr = Http.splitResponseBytes(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        .getBytes("ISO-8859-1")) ++
        "<meta charset=\"iso-8859-1\">café".getBytes("UTF-8"))
    assert(hdr._3 === "utf-8" && hdr._4.contains("café"))
  }

  test("Http.splitResponse hostile payloads: missing blank line, " +
    "non-HTTP, empty, header-only") {
    val df = Seq(
      (1L, "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"),
      (2L, "HTTP/1.1 301 Moved\r\nLocation: /y"),      // no CRLFCRLF
      (3L, "just a plain document"),
      (4L, ""),
      (5L, "HTTP/1.1 204 No Content\r\nServer: s\r\n\r\n")) // empty body
      .toDF("doc_id", "payload")
    val got = Http.splitResponse(df, "payload").orderBy("doc_id")
      .select("status_code", "content_type", "is_http", "body")
      .collect().map(r => (Option(r.get(0)), r.getString(1),
        r.getBoolean(2), r.getString(3))).toSeq
    assert(got(0) === ((Some(200), "text/html", true, "<p>x</p>")))
    // headerless-split degenerate: body passes through whole
    assert(got(1)._1 === Some(301) && got(1)._3 &&
      got(1)._4 === "HTTP/1.1 301 Moved\r\nLocation: /y")
    assert(got(2) === ((None, "", false, "just a plain document")))
    assert(got(3) === ((None, "", false, "")))
    assert(got(4) === ((Some(204), "", true, "")))
  }
}
