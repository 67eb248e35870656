package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + URL admission — the crawl-politeness gate that
  * decides which fetched URLs a pipeline may keep. The REP grammar
  * (RFC 9309): groups of `User-agent:` lines followed by
  * `Allow:`/`Disallow:` rules (consecutive user-agent lines share one
  * group), `#` comments, blank-line-insensitive; matching picks the
  * most specific group for the agent and then the LONGEST matching
  * path prefix, allow winning length ties; no rule ⇒ allowed.
  *
  * Deliberate simplification, stated where it bites: path patterns are
  * treated as PLAIN prefixes — the `*` wildcard and `$` anchor of the
  * Google extension are not interpreted (they are rare, and a literal
  *-prefix reading of a wildcard rule fails OPEN on the allow side and
  * closed on the disallow side only for the exact-prefix subset). The
  * comparison is exact `substr` equality, engine-identical by
  * construction.
  *
  * Scale shape: rules tables are host-keyed and tiny next to the URL
  * corpus (one robots.txt per host), so [[isAllowed]] joins
  * rules-to-URLs on host — AQE broadcasts the rules side at runtime —
  * and resolves the winning rule with one per-URL max-struct
  * aggregation: no window over the corpus, no driver state. */
object Robots {

  /** Parse `(host, robots_txt)` into one row per rule:
    * `(host, group_id, user_agent, directive, path_prefix)` —
    * `directive` ∈ {allow, disallow}; `user_agent` is lowercased.
    * Group assembly is the RFC's: a `User-agent:` line OPENS a new
    * group unless the previous directive line was also a user-agent
    * line (consecutive UA lines stack onto one group); rules bind to
    * every agent of the current group. One posexplode + two host-keyed
    * windows — per-host robots files are KBs, so the window partitions
    * are tiny by construction. */
  def parseRobots(robots: DataFrame, hostCol: String = "host",
                  textCol: String = "robots_txt"): DataFrame = {
    val grouped = groupedDirectiveLines(robots, hostCol, textCol,
      Seq("user-agent", "allow", "disallow"))
    val agents = grouped.filter(col("key") === "user-agent")
      .select(col("host"), col("group_id"),
        lower(col("value")).as("user_agent"))
    val rules = grouped.filter(col("key") =!= "user-agent")
      .filter(col("value") =!= "") // a valueless Disallow: allows all
      .select(col("host"), col("group_id"), col("key").as("directive"),
        col("value").as("path_prefix"))
    agents.join(rules, Seq("host", "group_id"))
      .select("host", "group_id", "user_agent", "directive", "path_prefix")
  }

  /** `Sitemap:` directives of each robots.txt — the standard sitemap
    * DISCOVERY entry point (feeds [[WebText.sitemapIndexEntries]] /
    * `sitemapEntries` fan-out). Per RFC 9309 §2.3/sitemaps.org the
    * directive is group-INDEPENDENT — it applies to every crawler
    * regardless of the User-agent stack it appears inside — so this is
    * a plain line scan (case-insensitive key, comment strip), not a
    * grouped parse; values keep their scheme colon intact. Per-row
    * projection + explode, no shuffle. */
  def sitemapUrls(robots: DataFrame, hostCol: String = "host",
                  textCol: String = "robots_txt"): DataFrame =
    robots.select(col(hostCol).as("host"),
        explode(split(col(textCol), "\n")).as("raw"))
      .select(col("host"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("ln"))
      .filter(col("ln").rlike("(?i)^sitemap\\s*:"))
      .select(col("host"),
        trim(regexp_extract(col("ln"), "(?i)^sitemap\\s*:(.*)$", 1))
          .as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Every directive key that participates in GROUP ASSEMBLY. Grouping
    * must see the full recognized-directive stream: filtering a
    * caller's uninteresting keys out BEFORE grouping would delete the
    * rule lines separating two `User-agent:` blocks and merge them into
    * one stacked group — e.g. `User-agent: a / Crawl-delay: 9 / (blank)
    * / User-agent: *` would hand `a` the `*` group's rules. Unknown
    * directives (`sitemap:`, `host:`, …) stay outside grouping, the
    * de-facto parser behavior: they never close a UA stack. */
  private val GroupingKeys =
    Seq("user-agent", "allow", "disallow", "crawl-delay")

  /** Shared grammar core: directive lines with their RFC group ids —
    * comment/CR strip, key lowercasing, consecutive-UA stacking.
    * Grouping runs over ALL [[GroupingKeys]] directives; `keys` then
    * filters which rows the caller receives, AFTER group ids are
    * assigned, so both callers see the same group boundaries. Output:
    * `(host, line_no, key, value, group_id)`. */
  private def groupedDirectiveLines(robots: DataFrame, hostCol: String,
                                    textCol: String,
                                    keys: Seq[String]): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n")))
      .select(col("host"), col("pos").as("line_no"),
        // strip comments + surrounding whitespace (CR from CRLF files)
        trim(regexp_replace(col("col"), "#.*$", "")).as("ln"))
      .filter(col("ln") =!= "")
      .select(col("host"), col("line_no"),
        lower(trim(regexp_extract(col("ln"), "^([A-Za-z-]+)\\s*:", 1)))
          .as("key"),
        trim(regexp_extract(col("ln"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("value"))
      .filter(col("key").isin(GroupingKeys: _*))
    val w = Window.partitionBy("host").orderBy("line_no")
    lines
      .withColumn("prev_key", lag("key", 1).over(w))
      // a UA line opens a group iff the previous directive was not UA
      .withColumn("opens", (col("key") === "user-agent") &&
        (col("prev_key").isNull || col("prev_key") =!= "user-agent"))
      .withColumn("group_id",
        sum(when(col("opens"), 1L).otherwise(0L)).over(w))
      .filter(col("key").isin(keys: _*))
      .select("host", "line_no", "key", "value", "group_id")
  }

  /** Admission verdict for `(host, path)` URLs against [[parseRobots]]
    * rules for `agent`: applicable groups are the agent's own
    * (lowercased exact match) if any exist for the host, else the `*`
    * groups; among applicable rules matching the path — the FULL RFC
    * 9309 §2.2.3 rule language: anchored at the path start, `*`
    * matching any sequence, a trailing `$` anchoring the path end,
    * plain rules matching as prefixes — the most-octets rule wins
    * (§2.2.2), allow beating disallow at equal length; no matching
    * rule (or no robots at all) ⇒ allowed.
    *
    * Stated deviation: a group with NO path rules at all (e.g. only a
    * `Crawl-delay:`) is invisible in [[parseRobots]] output, so an
    * agent whose only group is ruleless falls back to the `*` rules —
    * RFC 9309 would let the empty group replace `*` (allow all). The
    * fallback is the CONSERVATIVE direction: this gate never fetches
    * anything the RFC reading forbids, it can only skip URLs the RFC
    * reading would allow.
    *
    * Output: the URL
    * frame + `allowed` (the one reserved output name) — row
    * multiplicity and every input column are preserved: the verdict is
    * resolved per DISTINCT (host, path) key and joined back, so the
    * rule machinery never touches (or collides with) caller columns. */
  def isAllowed(urls: DataFrame, rules: DataFrame, agent: String): DataFrame = {
    val a = lit(agent.toLowerCase)
    // does the host publish rules for this specific agent?
    val hostHasAgent = rules.filter(col("user_agent") === a)
      .select("host").distinct().withColumn("graft_has_agent", lit(true))
    val applicable = rules.join(hostHasAgent, Seq("host"), "left")
      .filter(when(coalesce(col("graft_has_agent"), lit(false)),
        col("user_agent") === a).otherwise(col("user_agent") === "*"))
      .select("host", "directive", "path_prefix")
    // verdict per DISTINCT key: max over matching rules of
    // (pattern_len, is_allow) — most-octets rule first (RFC 9309
    // §2.2.2), allow breaking ties — as ONE max-struct aggregate; no
    // corpus window. Matching is the full RFC rule language (`*` and
    // trailing `$`, [[graft.functions.RobotsGlob]]); a wildcard-free
    // rule reduces exactly to the prefix test this generalizes.
    val verdict = urls.select("host", "path").distinct()
      .join(applicable, Seq("host"), "left")
      .withColumn("graft_m", col("path_prefix").isNotNull &&
        graft.functions.RobotsGlob.robotsGlob(col("path"), col("path_prefix")))
      .groupBy("host", "path")
      .agg(max(when(col("graft_m"),
        struct(length(col("path_prefix")).as("l"),
          (col("directive") === "allow").as("al")))).as("graft_win"))
      .select(col("host"), col("path"),
        coalesce(col("graft_win.al"), lit(true)).as("allowed"))
    urls.join(verdict, Seq("host", "path"), "left")
  }

  /** Per-host crawl delay for `agent` from `Crawl-delay:` directives
    * (the de-facto extension most large sites publish; not part of RFC
    * 9309, which is why [[parseRobots]] ignores it): group assembly is
    * [[parseRobots]]'s, the applicable groups are the agent's own
    * (lowercased exact match) if the host publishes any, else the `*`
    * groups — and the delay is read from THOSE groups only (an
    * agent-specific group with no crawl-delay means "no declared
    * delay", NOT a fallback to `*`: the group replaced the generic one
    * wholesale, matching [[isAllowed]]'s group-selection rule). Multiple
    * applicable delays collapse to the MAX (the conservative read).
    * Fractional seconds are honored: `delay_ms = trunc(seconds · 1000)`
    * in double arithmetic, identical IEEE in any engine; a non-numeric,
    * NaN, or negative value drops the directive (fail open to the
    * caller's default), while a huge-but-valid delay CLAMPS to a 24h
    * cap — dropping it would fall back to a much faster default, the
    * anti-conservative direction for a politeness gate.
    * Output: `(host, crawl_delay_ms)` — hosts without an applicable
    * directive are simply absent. */
  def parseCrawlDelays(robots: DataFrame, agent: String,
                       hostCol: String = "host",
                       textCol: String = "robots_txt"): DataFrame = {
    val a = lit(agent.toLowerCase)
    val grouped = groupedDirectiveLines(robots, hostCol, textCol,
      Seq("user-agent", "crawl-delay"))
    val agents = grouped.filter(col("key") === "user-agent")
      .select(col("host"), col("group_id"), lower(col("value")).as("user_agent"))
    val hostHasAgent = agents.filter(col("user_agent") === a)
      .select("host").distinct().withColumn("graft_has_agent", lit(true))
    val applicable = agents.join(hostHasAgent, Seq("host"), "left")
      .filter(when(coalesce(col("graft_has_agent"), lit(false)),
        col("user_agent") === a).otherwise(col("user_agent") === "*"))
      .select("host", "group_id").distinct()
    grouped.filter(col("key") === "crawl-delay")
      .join(applicable, Seq("host", "group_id"))
      .select(col("host"),
        // try_cast, not cast: under ANSI (the Spark 4 default) a plain
        // cast on a malformed delay value fails the whole job instead
        // of failing open to the caller's default
        (expr("try_cast(value AS DOUBLE)") * 1000).as("msd"))
      // fail open on what a robots file can't mean (malformed → null,
      // NaN, negative — fetches scheduled into the past), but CLAMP
      // huge-but-valid delays to a 24h cap instead of dropping them:
      // dropping would fall back to the (much smaller) caller default —
      // the anti-conservative direction for a politeness gate — and the
      // clamp also keeps Infinity/1e300 from overflowing the long cast
      // into an ANSI job-killing exception
      .filter(col("msd").isNotNull && !isnan(col("msd")) && col("msd") >= 0)
      .select(col("host"),
        least(col("msd"), lit(86400000.0)).cast("long").as("ms"))
      .groupBy("host")
      .agg(max(col("ms")).as("crawl_delay_ms"))
  }

  /** Generous default for [[politenessSchedule]]'s per-host cap: at the
    * 1 req/s default delay this is already a >27h fetch horizon — any
    * URL past it belongs to the NEXT frontier round, not this schedule. */
  val DefaultMaxPerHost: Int = 100000

  /** Politeness fetch schedule: each host's URLs get sequential fetch
    * slots spaced by that host's crawl delay — slot k fetches at
    * `k · delay_ms` after the host's first request. `delays` is
    * [[parseCrawlDelays]] output (or any `(host, crawl_delay_ms)` frame
    * with AT MOST ONE row per host — a duplicate host would fan out
    * every URL of that host through the join). Hosts absent from it
    * use `defaultDelayMs`. Slot order
    * within a host is the ascending binary order of `url` — callers
    * wanting priority order pre-encode it into the sort key. Output:
    * the URL frame + `delay_ms`, `slot` (0-based), `fetch_offset_ms`.
    *
    * `maxPerHost` (DEFAULT ON, [[DefaultMaxPerHost]]) drops a host's
    * URLs past that many slots — the [[graft.ops.Dedup.DefaultHotKeyCap]]
    * discipline: a pathological frontier with tens of millions of URLs
    * on ONE host must not serialize one unbounded sort task, and slots
    * past the cap are politeness-unfetchable in any near-term window
    * anyway (slot 100k at 1 req/s is tomorrow). Composed paths that cap
    * upstream (the q195 frontier's per-domain cap) are unaffected;
    * `maxPerHost = 0` switches the guard off for bounded inputs.
    *
    * Scale shape: ONE window partitioned by host — exactly the
    * granularity politeness serializes anyway — with the cap expressed
    * as a `row_number() ≤ k` filter DIRECTLY over the window so the
    * `InferWindowGroupLimit` rule plants a map-side WindowGroupLimit:
    * every input partition prunes to its own top-k per host BEFORE the
    * shuffle, so the hot host moves (and sorts) at most
    * partitions·k rows, not its full frontier (RobotsSpec pins the
    * WindowGroupLimit node in the executed plan). The delays side is
    * one-row-per-host tiny → AQE broadcasts the join. No corpus-wide
    * window, no driver state. */
  def politenessSchedule(urls: DataFrame, delays: DataFrame,
                         defaultDelayMs: Long = 1000L,
                         maxPerHost: Int = DefaultMaxPerHost): DataFrame = {
    require(defaultDelayMs >= 0, s"negative defaultDelayMs: $defaultDelayMs")
    require(maxPerHost >= 0, s"negative maxPerHost: $maxPerHost")
    val w = Window.partitionBy("host").orderBy("url")
    val ranked = urls.join(delays, Seq("host"), "left")
      .withColumn("delay_ms",
        coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
      .drop("crawl_delay_ms")
      .withColumn("graft_rn", row_number().over(w))
    // the cap filter must stay a bare `rank ≤ literal` immediately above
    // the Window for InferWindowGroupLimit to match (deriving `slot`
    // first and filtering on the derived column would defeat the rule)
    val capped =
      if (maxPerHost > 0) ranked.filter(col("graft_rn") <= maxPerHost)
      else ranked
    capped
      .withColumn("slot", (col("graft_rn") - 1).cast("long"))
      .drop("graft_rn")
      .withColumn("fetch_offset_ms", col("slot") * col("delay_ms"))
  }

  /** Error-rate back-off schedule — the host-health half of politeness
    * ([[politenessSchedule]] spaces requests; this SLOWS DOWN hosts
    * that are failing): from a fetch history of `(host, status_code)`
    * rows, compute per host the fetch/error counts (error = 5xx or
    * 429, the retryable server-side classes — 4xx client errors are
    * the crawler's own fault and don't indicate host distress), the
    * error share in integer micros (exact Long floor division, the
    * library micros discipline), and a step-ladder back-off multiplier
    * over `baseDelayMs`: share ≥ 1/2 → 8×, ≥ 1/4 → 4×, ≥ 1/10 → 2×,
    * else 1×. An explicit `Retry-After` demand
    * ([[graft.ops.Http.retryAfterMs]]) overrides per response; this
    * ladder is the standing cadence between demands. Output per host:
    * `n_fetches`, `n_errors`, `error_micros`, `backoff_multiplier`,
    * `delay_ms`.
    *
    * Scale shape: ONE host-keyed aggregate with map-side partial
    * combine — per-key cardinality is that host's fetch count, never
    * corpus-shaped; the ladder is a per-row CASE after the
    * aggregation. No window, no join. */
  /** Explicit per-host `Retry-After` demands from raw fetched
    * responses — the header half of the politeness contract
    * ([[backoffSchedule]]'s doc has always promised it overrides the
    * ladder): rows whose status is 429 or 503 (RFC 9110's overload
    * statuses — a 3xx Retry-After paces a redirect, not a host) AND
    * whose `Retry-After` is the delta-seconds form
    * ([[graft.ops.Http.retryAfterMs]]; the HTTP-date form needs the
    * caller's fetch clock and maps to null) yield
    * `(host, retry_after_ms)` — the MAX demand per registered domain,
    * since obeying the largest concurrent demand obeys them all.
    * Feed it to [[graft.runtime.FrontierLink.frontierFromCounts]]'s
    * `retry` input (q270). One scan-stage regex projection + one
    * host-keyed aggregate with map-side combine; output is
    * distressed-host-sized (broadcastable). */
  def retryAfterDemands(responses: DataFrame, urlCol: String = "url",
                        payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    responses
      .filter(Http.statusCode(p).isin(429, 503) &&
        Http.retryAfterMs(p).isNotNull)
      .select(WebText.registeredDomain(col(urlCol)).as("host"),
        Http.retryAfterMs(p).as("graft_ra"))
      .groupBy("host").agg(max("graft_ra").as("retry_after_ms"))
  }

  def backoffSchedule(history: DataFrame,
                      baseDelayMs: Long = 1000L): DataFrame =
    backoffFromCounts(healthCounts(history), baseDelayMs)

  /** The per-host fetch/error AGGREGATE [[backoffSchedule]] runs on —
    * `(host, n_fetches, n_errors)` from raw `(host, status_code)`
    * outcomes (error = 5xx or 429, the retryable server-side classes).
    * Split out so the aggregate can be MAINTAINED incrementally
    * ([[graft.runtime.HostHealthLink]] merges per-batch counts into a
    * bucketed table — counts are associative, so per-batch partial
    * aggregates sum to exactly this) instead of re-derived from the
    * append-only fetch log on every consumer evaluation; the identity
    * `backoffSchedule(log) == backoffFromCounts(healthCounts(log))`
    * holds by construction. ONE host-keyed aggregate with map-side
    * partial combine. */
  def healthCounts(history: DataFrame): DataFrame = {
    val isErr = col("status_code") >= 500 || col("status_code") === 429
    history.groupBy("host").agg(
      count(lit(1)).as("n_fetches"),
      sum(when(isErr, 1L).otherwise(0L)).as("n_errors"))
  }

  /** The ladder half of [[backoffSchedule]], as a pure projection over
    * a `(host, n_fetches, n_errors)` aggregate (extra columns ride
    * through untouched): error share in integer micros, step-ladder
    * `backoff_multiplier` (share ≥ 1/2 → 8×, ≥ 1/4 → 4×, ≥ 1/10 → 2×,
    * else 1×) and `delay_ms`. Consuming a MAINTAINED aggregate here —
    * the [[graft.runtime.HostHealthLink]] table — is the 100 TB shape:
    * the raw fetch log grows with every fetch the crawl ever made,
    * while this input stays host-cardinality. No shuffle, no window —
    * a scan-stage CASE chain. */
  def backoffFromCounts(health: DataFrame,
                        baseDelayMs: Long = 1000L): DataFrame = {
    require(baseDelayMs >= 0, s"negative baseDelayMs: $baseDelayMs")
    val share = graft.ops.Micros.ratio(col("n_errors"), col("n_fetches"))
    health
      .withColumn("error_micros", share)
      .withColumn("backoff_multiplier",
        when(col("error_micros") >= 500000L, lit(8L))
          .when(col("error_micros") >= 250000L, lit(4L))
          .when(col("error_micros") >= 100000L, lit(2L))
          .otherwise(lit(1L)))
      .withColumn("delay_ms", col("backoff_multiplier") * baseDelayMs)
  }
}
