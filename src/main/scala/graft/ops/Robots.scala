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
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("line_no")
    val grouped = lines
      .withColumn("prev_key", lag("key", 1).over(w))
      // a UA line opens a group iff the previous directive was not UA
      .withColumn("opens", (col("key") === "user-agent") &&
        (col("prev_key").isNull || col("prev_key") =!= "user-agent"))
      .withColumn("group_id",
        sum(when(col("opens"), 1L).otherwise(0L)).over(w))
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

  /** Admission verdict for `(host, path)` URLs against [[parseRobots]]
    * rules for `agent`: applicable groups are the agent's own
    * (lowercased exact match) if any exist for the host, else the `*`
    * groups; among applicable rules matching the path as a prefix, the
    * longest prefix wins, allow beating disallow at equal length; no
    * matching rule (or no robots at all) ⇒ allowed. Output: the URL
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
    // (prefix_len, is_allow) — longest prefix first, allow breaking
    // ties — as ONE max-struct aggregate; no corpus window
    val verdict = urls.select("host", "path").distinct()
      .join(applicable, Seq("host"), "left")
      .withColumn("graft_m", col("path_prefix").isNotNull &&
        expr("substring(path, 1, length(path_prefix))") === col("path_prefix"))
      .groupBy("host", "path")
      .agg(max(when(col("graft_m"),
        struct(length(col("path_prefix")).as("l"),
          (col("directive") === "allow").as("al")))).as("graft_win"))
      .select(col("host"), col("path"),
        coalesce(col("graft_win.al"), lit(true)).as("allowed"))
    urls.join(verdict, Seq("host", "path"), "left")
  }
}
