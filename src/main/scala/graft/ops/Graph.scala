package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph ranking for corpus curation (SURVEY.md §2.3).
  *
  * Crawl-scale pipelines weight documents by the link structure of the
  * pages they came from (Common-Crawl-derived corpora rank hosts by
  * centrality before sampling). The reference has no graph surface —
  * like the rest of §2.3 this extends it with the operators a training
  * -data pipeline needs; `Dedup.connectedComponents` covers the
  * undirected clustering side, this file covers directed ranking.
  *
  * Scale stance (100 TB): edges stay a DataFrame keyed by `src`; one
  * power-iteration round is one equi-join (ranks ⋈ edges on src — the
  * rank frame is |V| rows against |E| edges, broadcastable when hosts
  * ≪ pages) plus one groupBy(dst) sum with map-side partial
  * aggregation, so a celebrity page (huge in-degree) combines locally
  * before the shuffle. Rounds are driver-coordinated like
  * `Dedup.connectedComponents`' distributed branch: per-round
  * `localCheckpoint` truncates the lineage so iteration count never
  * compounds the plan.
  */
object Graph {

  /** Power-iteration PageRank in integer MICRO-rank units.
    *
    * Floating-point `sum` over a shuffle is reduction-order-dependent,
    * so like `Curation.dsirLogRatio` the whole iteration is kept in the
    * integer domain: ranks are longs (1.0 ≡ 1,000,000), per-edge
    * contributions are floor-divided (`r div deg`), and the damped
    * update is `base + (damping · Σ) div 1,000,000` — every engine that
    * follows the same arithmetic (the oracle unrolls it as chained
    * CTEs) reproduces the bytes, in any partition order. Both divisions
    * use Spark SQL's integral `div` (not `floor` over a double
    * quotient, which stops being exact past 2⁵³) so the arithmetic is
    * exact at any graph size.
    *
    * The recurrence is the classic simplified power iteration (the
    * Spark-examples variant: dangling mass is dropped, not
    * redistributed — documented contract, matched by the oracle):
    *
    *   r₀(v)    = 1,000,000
    *   rₖ₊₁(v) = (1,000,000 − damping) + (damping · Σ_{u→v} rₖ(u) div deg(u)) div 1,000,000
    *
    * Self-loops are removed and edges deduplicated up front (a
    * multigraph would double-count contributions). Overflow headroom:
    * Σ ≤ |V|·10⁶ so `damping·Σ` ≤ |V|·10¹² stays inside a long for
    * |V| up to ~9·10⁶ nodes; beyond that, rank hosts (or registered
    * domains), not pages — which is what a crawl pipeline does anyway.
    *
    * @param edges  (src, dst) long-castable columns
    * @param iters  fixed round count (power iteration; callers pick the
    *               precision/cost point — rank ordering stabilizes in a
    *               handful of rounds on web-ish graphs)
    * @return (node, rank_micro) — one row per node appearing in `edges`
    */
  def pageRankMicro(edges: DataFrame, iters: Int = 3,
                    dampingMicro: Long = 850000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingMicro >= 0L && dampingMicro <= 1000000L,
      s"dampingMicro must be in [0, 1000000], got $dampingMicro")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // (src, dst, deg): the static per-round join input, computed once —
    // persist instead of localCheckpoint so it stays recomputable if an
    // executor drops blocks mid-loop
    val edgesDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src")).persist()
    val nodesP = nodes.persist()
    var ranks = nodesP.withColumn("r", lit(1000000L)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val next = rankRound(edgesDeg, nodesP, ranks, dampingMicro).localCheckpoint()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    edgesDeg.unpersist()
    nodesP.unpersist()
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** One power-iteration round — the plan the loop checkpoints each
    * pass (exposed for GraphSpec's plan-shape assert): an equi-join of
    * the rank frame against (src, dst, deg) edges, a map-side-combined
    * groupBy(dst) sum of floor-divided contributions, and the damped
    * integral-div update left-joined back onto the node set. */
  private[graft] def rankRound(edgesDeg: DataFrame, nodes: DataFrame,
                               ranks: DataFrame, dampingMicro: Long): DataFrame = {
    val base = lit(1000000L - dampingMicro)
    val contrib = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
      .select(col("dst"), expr("r div deg").as("c"))
      .groupBy("dst").agg(sum("c").as("s"))
    nodes
      .join(contrib, nodes("node") === contrib("dst"), "left")
      .select(col("node"),
        (base + expr(s"($dampingMicro * coalesce(s, 0L)) div 1000000")).as("r"))
  }
}
