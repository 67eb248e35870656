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
  * `Dedup.connectedComponents`' distributed branch, with a
  * `localCheckpoint` every few rounds so iteration count never
  * compounds the plan while short runs stay a single job.
  */
object Graph {

  /** Rounds between lineage truncations (see the loop comment in
    * [[pageRankWeightedMicro]]). */
  private val CheckpointEvery = 8

  /** Power-iteration PageRank over an UNWEIGHTED directed graph, in
    * integer MICRO-rank units. Exactly [[pageRankWeightedMicro]] with
    * unit weights after self-loop removal and edge deduplication (a
    * multigraph would double-count contributions): `r·1 div Σ1` is
    * `r div outdeg`, so the recurrence below specializes bit-for-bit.
    *
    * @param edges  (src, dst) long-castable columns
    * @return (node, rank_micro) — one row per node appearing in `edges`
    */
  def pageRankMicro(edges: DataFrame, iters: Int = 3,
                    dampingMicro: Long = 850000L): DataFrame =
    pageRankWeightedMicro(
      edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .distinct()
        .withColumn("w", lit(1L)),
      iters, dampingMicro)

  /** Power-iteration PageRank over a WEIGHTED directed graph — the
    * Markov-chain form: a node's mass splits across its out-edges in
    * proportion to integer edge weights (link counts, transition
    * counts), so the ranks approximate the damped stationary
    * distribution of the weight-normalized transition matrix.
    *
    * Floating-point `sum` over a shuffle is reduction-order-dependent,
    * so like `Curation.dsirLogRatio` the whole iteration is kept in the
    * integer domain: ranks are longs (1.0 ≡ 1,000,000), per-edge
    * contributions are floor-divided, and the damped update uses
    * integral `div` — every engine that follows the same arithmetic
    * (the oracle unrolls it as chained CTEs) reproduces the bytes, in
    * any partition order. `div` rather than `floor` over a double
    * quotient: doubles stop being exact past 2⁵³.
    *
    * The recurrence (dangling mass is dropped, not redistributed —
    * documented contract, matched by the oracle; W(u) = Σ_x w(u,x)):
    *
    *   r₀(v)    = 1,000,000
    *   rₖ₊₁(v) = (10⁶ − damping) + (damping · Σ_{u→v} (rₖ(u)·w(u,v)) div W(u)) div 10⁶
    *
    * Self-loops are removed; parallel (src, dst) edges are merged by
    * weight sum. Overflow headroom: rₖ(u)·w ≤ |V|·10⁶·w_max must stay
    * inside a long — at |V| ~ 10⁶ hosts that allows w_max ~ 10⁶ link
    * counts; aggregate weights coarser (or cap them) past that.
    *
    * @param edges  (src, dst, w) — src/dst of any equatable type, w a
    *               positive long-castable weight; w ≤ 0 edges dropped
    * @param iters  fixed round count (power iteration; callers pick the
    *               precision/cost point — rank ordering stabilizes in a
    *               handful of rounds on web-ish graphs)
    * @return (node, rank_micro) — one row per node appearing in `edges`
    */
  def pageRankWeightedMicro(edges: DataFrame, iters: Int = 3,
                            dampingMicro: Long = 850000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingMicro >= 0L && dampingMicro <= 1000000L,
      s"dampingMicro must be in [0, 1000000], got $dampingMicro")
    val e = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .filter(col("src") =!= col("dst") && col("w") > 0)
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // (src, dst, w, wt): the static per-round join input, computed once —
    // persist instead of localCheckpoint so it stays recomputable if an
    // executor drops blocks mid-loop
    val edgesDeg = e.join(
      e.groupBy("src").agg(sum("w").as("wt")), Seq("src")).persist()
    val nodesP = nodes.persist()
    // Lineage cadence: a localCheckpoint per round would keep the plan
    // minimal but pays one eager materialization per round — for the
    // common 3-5 round call that triples the job count for no benefit,
    // since Catalyst plans a handful of nested join rounds fine.
    // Checkpoint every CheckpointEvery rounds instead: short runs
    // execute as ONE job, deep iteration still can't compound the DAG.
    var ranks = nodesP.withColumn("r", lit(1000000L))
    var sinceCheckpoint = 0
    var i = 0
    while (i < iters) {
      var next = rankRound(edgesDeg, nodesP, ranks, dampingMicro)
      sinceCheckpoint += 1
      if (sinceCheckpoint >= CheckpointEvery && i < iters - 1) {
        next = next.localCheckpoint()
        ranks.unpersist()
        sinceCheckpoint = 0
      }
      ranks = next
      i += 1
    }
    edgesDeg.unpersist()
    nodesP.unpersist()
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** HITS hubs-and-authorities over a directed graph, in integer MICRO
    * units — the complementary centrality to [[pageRankMicro]]: an
    * AUTHORITY is pointed at by good hubs (a canonical reference page),
    * a HUB points at good authorities (a curated link list). Crawl
    * curation uses both signals: authorities seed quality lists, pure
    * hubs (link farms) get down-weighted.
    *
    * Integer recurrence (the PageRank determinism argument —
    * floating-point normalization would be reduction-order-dependent):
    *
    *   h₀(v) = 10⁶
    *   aₖ(v) = Σ_{u→v} hₖ₋₁(u), rescaled so max = 10⁶: (a·10⁶) div max(a)
    *   hₖ(u) = Σ_{u→v} aₖ(v), rescaled identically
    *
    * Per half-round: one equi-join + map-side-combined sum, plus a
    * one-row max aggregate broadcast back for the rescale — the
    * max-normalization in exact integer division, identical in any
    * engine (the oracle unrolls it). Nodes with no in-edges hold
    * authority 0; no out-edges → hub 0. Overflow headroom as
    * [[pageRankWeightedMicro]]: per-node sums stay in a long for
    * |V| up to ~9·10⁶.
    *
    * @param edges (src, dst) — any equatable node type; self-loops
    *              dropped, parallel edges deduplicated
    * @return (node, authority_micro, hub_micro), one row per node
    */
  def hitsMicro(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    def rescale(raw: DataFrame): DataFrame = {
      // joint max over the scored nodes, broadcast as a one-row frame;
      // integer (v·10⁶) div max keeps the rescale order-free
      val mx = raw.agg(max("v").as("mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          when(col("mx").isNull || col("mx") === 0L, lit(0L))
            .otherwise(expr("(coalesce(v, 0L) * 1000000) div mx")).as("v"))
    }
    var hubs = nodes.withColumn("v", lit(1000000L))
    var auths = nodes.withColumn("v", lit(0L))
    var i = 0
    while (i < iters) {
      auths = rescale(
        e.join(hubs, e("src") === hubs("node"))
          .groupBy(e("dst").as("node")).agg(sum("v").as("v")))
      hubs = rescale(
        e.join(auths, e("dst") === auths("node"))
          .groupBy(e("src").as("node")).agg(sum("v").as("v")))
      if ((i + 1) % CheckpointEvery == 0 && i < iters - 1) {
        auths = auths.localCheckpoint()
        hubs = hubs.localCheckpoint()
      }
      i += 1
    }
    val out = nodes
      .join(auths.select(col("node"), col("v").as("authority_micro")), Seq("node"), "left")
      .join(hubs.select(col("node"), col("v").as("hub_micro")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("authority_micro"), lit(0L)).as("authority_micro"),
        coalesce(col("hub_micro"), lit(0L)).as("hub_micro"))
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** One power-iteration round — the plan the loop checkpoints each
    * pass (exposed for GraphSpec's plan-shape assert): an equi-join of
    * the rank frame against (src, dst, w, wt) edges, a map-side-combined
    * groupBy(dst) sum of floor-divided weighted contributions, and the
    * damped integral-div update left-joined back onto the node set. */
  private[graft] def rankRound(edgesDeg: DataFrame, nodes: DataFrame,
                               ranks: DataFrame, dampingMicro: Long): DataFrame = {
    val base = lit(1000000L - dampingMicro)
    val contrib = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
      .select(col("dst"), expr("(r * w) div wt").as("c"))
      .groupBy("dst").agg(sum("c").as("s"))
    nodes
      .join(contrib, nodes("node") === contrib("dst"), "left")
      .select(col("node"),
        (base + expr(s"($dampingMicro * coalesce(s, 0L)) div 1000000")).as("r"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over the
    * undirected simple graph induced by `edges` — community detection,
    * the coarser sibling of [[graft.ops.Dedup.connectedComponents]]
    * (LPA splits a connected component into densely-linked communities;
    * CC cannot). Fully deterministic: labels start as the node id, and
    * each round every node adopts its neighbors' MOST FREQUENT label
    * with ties broken toward the SMALLEST label — the classic
    * random-order LPA is nondeterministic, which is useless for a
    * reproducible curation pipeline, so the synchronous min-tie-break
    * variant is deliberate (and lets the oracle unroll rounds exactly).
    *
    * Per round: one equi-join of edges against labels + a
    * map-side-combined (node, label) count + ONE more aggregate taking
    * `min(struct(-count, label))` per node — argmax-by-count with
    * deterministic ties as a lexicographic struct min, no window (a
    * `row_number` window over node would add a sort per round). Rounds
    * are bounded and small (communities stabilize in a few sync rounds;
    * sync LPA can 2-cycle on bipartite structures, so convergence
    * looping is NOT the API — fixed `rounds` is).
    *
    * @param edges (src, dst); direction ignored, self-loops dropped,
    *              parallel edges deduplicated. Node ids must be
    *              orderable (the tie-break) — numeric or string.
    * @return (node, label) after `rounds` synchronous rounds
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds out of range: $rounds")
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val nodes = e.select(col("src").as("node")).distinct().persist()
    var labels = nodes.withColumn("label", col("node"))
    var i = 0
    while (i < rounds) {
      val counts = e.join(labels, e("dst") === labels("node"))
        .groupBy(e("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      labels = counts.groupBy("node")
        .agg(min(struct((col("c") * -1).as("nc"), col("label").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("label"))
      i += 1
    }
    val out = labels
    e.unpersist()
    nodes.unpersist()
    out
  }
}
