package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ops.{Robots, WebText}

/** Streaming crawl-frontier link — the discovery stage that closes the
  * crawl loop: consumes fetched pages `(url, html)`, records them as
  * crawled, extracts and RFC 3986-resolves every out-link
  * ([[graft.ops.WebText.resolvedLinkRows]] — relative links included,
  * which on real pages is most of them), merges the BATCH's in-link
  * counts into a persisted per-target count table, and REFRESHES a
  * frontier over it: already-crawled targets anti-joined away, robots
  * admission per registered domain, top-k per domain, and a politeness
  * fetch slot per row (crawl-delay × error-back-off — the q227
  * scheduler as the loop's output contract).
  *
  * Streams:
  *  - `crawledStream` `(url)` — append-only fetched set;
  *  - `linksStream` `(link)` — append-only out-link log. AUDIT ONLY on
  *    the refresh path: the refresh never re-scans it (see scale
  *    shape); it exists so the count table can be rebuilt offline and
  *    so batch jobs (q195 and friends) can run over the raw log;
  *  - `countsStream` `(link, host, inlinks)` — the persisted in-link
  *    count table, REFRESHED incrementally per batch: the batch's own
  *    aggregated counts merge into the previous table
  *    ([[StreamRegistry.refresh]] rotate — readers never see a
  *    half-merge, a crash rolls back to the previous table). The
  *    merge is EXACTLY-ONCE under replay: the admitted batch id rides
  *    inside the refreshed directory (`_batch`, atomic with its
  *    data), so a replayed batch whose merge already landed skips the
  *    merge instead of double-counting;
  *  - `frontierStream` `(domain, url, inlinks, rank, delay_ms,
  *    not_before_ms)` — REFRESHED per batch: a materialized view, not
  *    a log. Readers see the latest complete refresh; `not_before_ms`
  *    is the politeness slot offset — `(rank − 1) ·` the host's
  *    effective delay (robots crawl-delay or `defaultDelayMs`, times
  *    the error-back-off multiplier from `historyStream`) — so wiring
  *    the frontier back into a fetcher yields a schedule, not just a
  *    list;
  *  - optional `robotsStream` `(host, robots_txt)` — admission rules +
  *    crawl delays; absent ⇒ every URL admitted at the default delay;
  *  - optional `historyStream` `(host, status_code)` — fetch outcomes;
  *    when present, hosts with high 5xx/429 shares back off
  *    ([[graft.ops.Robots.backoffSchedule]] step ladder);
  *  - optional `extraLinksStreams` — additional `(link)` tables the
  *    refresh unions in READ-ONLY (ownership stays with their
  *    producers): point one at a [[FeedDiscoveryLink]]'s output and
  *    feed-discovered URLs rank in the same frontier as page
  *    out-links (the q239 discovery-channels composition, streaming).
  *
  * Scale shape: per batch, extraction is the scan-stage
  * `resolvedLinkRows` projection over the BATCH only, and the count
  * merge aggregates the BATCH's links (map-side combine) before
  * folding them into the count table — ONE row per distinct target,
  * already aggregated, so per-batch merge work is the batch plus the
  * compact count table, never the raw accumulated link log (which
  * grows with every duplicate sighting and is exactly the re-scan the
  * first implementation paid per batch). The refresh plan provably
  * never touches `linksStream` ([[FrontierLink.refreshPlan]] is the
  * plan the spec walks). The per-domain top-k keeps the
  * `row_number ≤ k` filter directly above its window so
  * `InferWindowGroupLimit` prunes map-side (the politenessSchedule
  * shape). `extraLinksStreams` ARE re-aggregated per refresh — they
  * are the discovery side channels (feeds, sitemaps), orders of
  * magnitude smaller than the link log; an extra channel that grows
  * log-shaped should get its own FrontierLink instead. */
class FrontierLink(input: String, crawledStream: String,
                   linksStream: String, frontierStream: String,
                   robotsStream: String = "", agent: String = "graftbot",
                   topKPerDomain: Int = 3,
                   extraLinksStreams: Seq[String] = Nil,
                   historyStream: String = "",
                   defaultDelayMs: Long = 1000L,
                   countsStream: String = "") extends Link {
  require(topKPerDomain >= 1, s"topKPerDomain >= 1, got $topKPerDomain")
  require(defaultDelayMs >= 0, s"negative defaultDelayMs: $defaultDelayMs")
  val inputs: Seq[String] = Seq(input)
  val output: Option[String] = None // custom start: four streams below

  private val countsName =
    if (countsStream.nonEmpty) countsStream else s"${frontierStream}_counts"

  private val crawledSchema = StructType(Seq(StructField("url", StringType)))
  private val linkSchema = StructType(Seq(StructField("link", StringType)))
  private val countsSchema = StructType(Seq(
    StructField("link", StringType), StructField("host", StringType),
    StructField("inlinks", LongType)))
  private val frontierSchema = StructType(Seq(
    StructField("domain", StringType), StructField("url", StringType),
    StructField("inlinks", LongType), StructField("rank", LongType),
    StructField("delay_ms", LongType), StructField("not_before_ms", LongType)))

  override def start(spark: SparkSession, registry: StreamRegistry,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    setup(spark)
    registry.declare(crawledStream, crawledSchema)
    registry.declare(linksStream, linkSchema)
    registry.declare(countsName, countsSchema)
    registry.declare(frontierStream, frontierSchema)
    registry.readStream(input).writeStream
      .option("checkpointLocation",
        registry.checkpointDir(name, frontierStream))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(col("url"), col("html")).localCheckpoint()
        registry.write(b.select(col("url")), crawledStream)
        // ONE extraction per batch feeds both the audit log append and
        // the count merge (they must agree row-for-row)
        val batchLinks = WebText.resolvedLinkRows(b, "url", "html")
          .select(col("link")).localCheckpoint()
        registry.write(batchLinks, linksStream)
        // incremental count merge — skipped on a replay whose merge
        // already landed (the _batch mark rode the refresh rotate, so
        // it can never claim a merge that rolled back)
        val merged = registry.refreshMeta(countsName, "batch")
          .exists(_.toLong >= batchId)
        if (!merged) {
          val bc = FrontierLink.linkCounts(batchLinks)
          registry.refresh(countsName,
            registry.read(countsName).unionByName(bc)
              .groupBy("link", "host").agg(sum("inlinks").as("inlinks")),
            Map("batch" -> batchId.toString))
        }
        registry.refresh(frontierStream, FrontierLink.refreshPlan(
          registry, countsName, extraLinksStreams, crawledStream,
          robotsStream, historyStream, agent, topKPerDomain,
          defaultDelayMs))
      }
      .start()
  }
}

object FrontierLink {
  /** Per-target in-link counts with the target's registered domain —
    * the aggregation shape shared by the per-batch merge and the batch
    * reference plan. */
  def linkCounts(links: DataFrame): DataFrame =
    links
      .select(col("link"), WebText.registeredDomain(col("link")).as("host"))
      .groupBy("link", "host").agg(count(lit(1)).as("inlinks"))

  /** The frontier view as a function of a COUNT table: crawled URLs
    * anti-joined away, optional robots admission on the target's
    * registered domain, top-k per domain by (inlinks desc, url asc),
    * then the politeness schedule — each row's `not_before_ms` is
    * `(rank − 1) ·` the host's effective delay: robots crawl-delay
    * (or `defaultDelayMs`) × the error-back-off multiplier from the
    * fetch history. `robots`/`history` absent ⇒ everything admitted
    * at the default delay, multiplier 1. */
  def frontierFromCounts(counts: DataFrame, crawled: DataFrame,
                         robots: Option[DataFrame],
                         history: Option[DataFrame], agent: String,
                         topKPerDomain: Int,
                         defaultDelayMs: Long = 1000L): DataFrame = {
    val fresh = counts.join(crawled.select(col("url").as("link")).distinct(),
      Seq("link"), "left_anti")
    val gated = robots match {
      case Some(r) =>
        Robots.isAllowed(
            fresh.withColumn("path", regexp_extract(col("link"),
              "^[a-zA-Z]+://[^/]*(/.*)?$", 1)),
            Robots.parseRobots(r), agent)
          .filter(col("allowed"))
          .select("link", "host", "inlinks")
      case None => fresh
    }
    val w = Window.partitionBy("host")
      .orderBy(col("inlinks").desc, col("link").asc)
    // bare row_number ≤ literal directly over the window — the
    // InferWindowGroupLimit contract (see Robots.politenessSchedule)
    val ranked = gated.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= topKPerDomain)
    // effective per-host delay: crawl-delay (default when the host has
    // none / no robots) × back-off multiplier (1 when healthy / no
    // history). Both sides are one-row-per-host tiny → AQE broadcasts.
    val withDelay = robots match {
      case Some(r) => ranked.join(Robots.parseCrawlDelays(r, agent)
        .select(col("host"), col("crawl_delay_ms")), Seq("host"), "left")
      case None => ranked.withColumn("crawl_delay_ms", lit(null).cast("long"))
    }
    val withMult = history match {
      case Some(h) => withDelay.join(Robots.backoffSchedule(h)
        .select(col("host"), col("backoff_multiplier")), Seq("host"), "left")
      case None =>
        withDelay.withColumn("backoff_multiplier", lit(null).cast("long"))
    }
    withMult
      .withColumn("graft_delay",
        coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)) *
          coalesce(col("backoff_multiplier"), lit(1L)))
      .select(col("host").as("domain"), col("link").as("url"),
        col("inlinks"), col("graft_rn").cast("long").as("rank"),
        col("graft_delay").as("delay_ms"),
        ((col("graft_rn") - 1).cast("long") * col("graft_delay"))
          .as("not_before_ms"))
  }

  /** The frontier computation as a function of the RAW link log — the
    * batch reference plan the streaming refresh is spec-pinned equal
    * to (and the q195 shape): count, gate, rank, schedule. */
  def frontierPlan(links: DataFrame, crawled: DataFrame,
                   robots: Option[DataFrame], agent: String,
                   topKPerDomain: Int,
                   history: Option[DataFrame] = None,
                   defaultDelayMs: Long = 1000L): DataFrame =
    frontierFromCounts(linkCounts(links), crawled, robots, history, agent,
      topKPerDomain, defaultDelayMs)

  /** The EXACT DataFrame a [[FrontierLink]] refresh materializes — a
    * function of the registry state, exposed so the scale spec can
    * plan-walk it: its scans read the count table, the crawled set,
    * and the (bounded) rule/history/extra side streams — NEVER the
    * raw accumulated `linksStream` log. Extra link channels are
    * aggregated and summed into the counts here (read-only). */
  def refreshPlan(registry: StreamRegistry, countsStream: String,
                  extraLinksStreams: Seq[String], crawledStream: String,
                  robotsStream: String, historyStream: String,
                  agent: String, topKPerDomain: Int,
                  defaultDelayMs: Long): DataFrame = {
    val base = registry.read(countsStream)
    val extras = extraLinksStreams.filter(registry.exists)
      .map(n => linkCounts(registry.read(n).select(col("link"))))
    val counts =
      if (extras.isEmpty) base
      else (base +: extras).reduce(_ unionByName _)
        .groupBy("link", "host").agg(sum("inlinks").as("inlinks"))
    val robots =
      if (robotsStream.nonEmpty && registry.exists(robotsStream))
        Some(registry.read(robotsStream))
      else None
    val history =
      if (historyStream.nonEmpty && registry.exists(historyStream))
        Some(registry.read(historyStream))
      else None
    frontierFromCounts(counts, registry.read(crawledStream), robots,
      history, agent, topKPerDomain, defaultDelayMs)
  }
}
