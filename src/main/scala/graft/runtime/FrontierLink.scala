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
  * which on real pages is most of them), accumulates the link table,
  * and REFRESHES a frontier: per-target in-link counts over all links
  * seen so far, already-crawled targets anti-joined away, robots
  * admission per registered domain, top-k per domain. The frontier
  * after batch N equals the q195 batch plan over the accumulated pages
  * (StreamingCurationSpec pins the equality), so wiring
  * `frontierStream` back into the fetcher closes the
  * ingest→curate→discover loop.
  *
  * Streams:
  *  - `crawledStream` `(url)` — append-only fetched set;
  *  - `linksStream` `(link)` — append-only accumulated out-links;
  *  - `frontierStream` `(domain, url, inlinks, rank)` — REFRESHED per
  *    batch (delete + rewrite): a materialized view over the two
  *    append-only tables, not a log. Readers see the latest complete
  *    refresh; a crash mid-refresh is repaired by the next batch,
  *    because the sources of truth are the append-only streams behind
  *    the exactly-once link checkpoint;
  *  - optional `robotsStream` `(host, robots_txt)` — admission rules;
  *    absent ⇒ every URL admitted;
  *  - optional `extraLinksStreams` — additional `(link)` tables the
  *    refresh unions in READ-ONLY (ownership stays with their
  *    producers): point one at a [[FeedDiscoveryLink]]'s output and
  *    feed-discovered URLs rank in the same frontier as page
  *    out-links (the q239 discovery-channels composition, streaming).
  *
  * Scale shape: per batch, extraction is the scan-stage
  * `resolvedLinkRows` projection over the BATCH only; the refresh
  * aggregates the accumulated `(link)` table — compact strings,
  * map-side-combined counts, then one per-domain window whose
  * `row_number ≤ k` filter sits directly above it so
  * `InferWindowGroupLimit` prunes map-side (the politenessSchedule
  * shape). When the accumulated link table outgrows a refresh window,
  * swap the full re-aggregate for an incremental count merge — the
  * spec-pinned contract is only the refresh's EQUALITY with the batch
  * plan. */
class FrontierLink(input: String, crawledStream: String,
                   linksStream: String, frontierStream: String,
                   robotsStream: String = "", agent: String = "graftbot",
                   topKPerDomain: Int = 3,
                   extraLinksStreams: Seq[String] = Nil) extends Link {
  require(topKPerDomain >= 1, s"topKPerDomain >= 1, got $topKPerDomain")
  val inputs: Seq[String] = Seq(input)
  val output: Option[String] = None // custom start: three streams below

  private val crawledSchema = StructType(Seq(StructField("url", StringType)))
  private val linkSchema = StructType(Seq(StructField("link", StringType)))
  private val frontierSchema = StructType(Seq(
    StructField("domain", StringType), StructField("url", StringType),
    StructField("inlinks", LongType), StructField("rank", LongType)))

  override def start(spark: SparkSession, registry: StreamRegistry,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    setup(spark)
    registry.declare(crawledStream, crawledSchema)
    registry.declare(linksStream, linkSchema)
    registry.declare(frontierStream, frontierSchema)
    registry.readStream(input).writeStream
      .option("checkpointLocation",
        registry.checkpointDir(name, frontierStream))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // localCheckpoint: the batch feeds TWO writes (crawled + links)
        val b = batch.select(col("url"), col("html")).localCheckpoint()
        registry.write(b.select(col("url")), crawledStream)
        registry.write(
          WebText.resolvedLinkRows(b, "url", "html").select(col("link")),
          linksStream)
        val rules =
          if (robotsStream.nonEmpty && registry.exists(robotsStream))
            Some(registry.read(robotsStream))
          else None
        // extra link sources (e.g. a FeedDiscoveryLink's output) are
        // READ here, never written — ownership stays with their
        // producing links; a source that hasn't produced yet simply
        // contributes nothing to this refresh
        val allLinks = extraLinksStreams
          .filter(registry.exists)
          .map(registry.read(_).select(col("link")))
          .foldLeft(registry.read(linksStream).select(col("link")))(_ unionAll _)
        val out = FrontierLink.frontierPlan(
          allLinks, registry.read(crawledStream),
          rules, agent, topKPerDomain)
          // materialize BEFORE the refresh delete: the plan must not
          // re-list anything while the old frontier directory vanishes
          .localCheckpoint()
        registry.delete(frontierStream)
        registry.declare(frontierStream, frontierSchema)
        registry.write(out, frontierStream)
      }
      .start()
  }
}

object FrontierLink {
  /** The frontier computation shared by the streaming refresh and its
    * batch-parity spec: in-link counts per resolved target, crawled
    * URLs anti-joined away, optional robots admission on the target's
    * registered domain, top-k per domain by (inlinks desc, url asc) —
    * the q195 plan as a function of the accumulated inputs. */
  def frontierPlan(links: DataFrame, crawled: DataFrame,
                   robots: Option[DataFrame], agent: String,
                   topKPerDomain: Int): DataFrame = {
    val inl = links
      .select(col("link"), WebText.registeredDomain(col("link")).as("host"))
      .groupBy("link", "host").agg(count(lit(1)).as("inlinks"))
    val fresh = inl.join(crawled.select(col("url").as("link")).distinct(),
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
    gated.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= topKPerDomain)
      .select(col("host").as("domain"), col("link").as("url"),
        col("inlinks"), col("graft_rn").cast("long").as("rank"))
  }
}
