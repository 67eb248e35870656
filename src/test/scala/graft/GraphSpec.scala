package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Integer-micros PageRank: hand-computed fixtures, a sequential
  * reference on a derived graph, and the partition-order-independence
  * the integer recurrence exists to guarantee. */
class GraphSpec extends SparkSpec {
  import SparkSpec.sf0001
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("src", "dst")

  test("uniform cycle keeps every rank at exactly 1.0 (1,000,000 micros)") {
    // a→b→c→a: each node receives exactly one full contribution, so
    // r = 150000 + 850000·10⁶ div 10⁶ = 10⁶ at every round, exactly
    val r = Graph.pageRankMicro(edgesDf(1L -> 2L, 2L -> 3L, 3L -> 1L), iters = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("hub of a star outranks the leaves; dangling hub contributes nothing") {
    // leaves 1..4 each point at hub 0; hub has no out-edges (dangling)
    val r = Graph.pageRankMicro(edgesDf(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      iters = 3).collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // round 1: leaves get no in-mass → 150000; hub gets 4·10⁶ → 150000+3400000
    // round 2: hub gets 4·150000 → 150000 + 510000; round 3 the same (leaves fixed)
    assert(r(0L) === 660000L)
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) === 150000L))
    assert(r(0L) > r(1L))
  }

  test("self-loops and duplicate edges are ignored") {
    val base = Graph.pageRankMicro(edgesDf(1L -> 2L, 2L -> 3L, 3L -> 1L), iters = 3)
    val noisy = Graph.pageRankMicro(
      edgesDf(1L -> 2L, 1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 2L), iters = 3)
    assert(base.exceptAll(noisy).isEmpty && noisy.exceptAll(base).isEmpty)
  }

  /** Sequential reference: the documented integer recurrence, computed
    * in plain Scala maps. */
  private def seqPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    r
  }

  test("matches the sequential integer reference on the lineitem-derived graph") {
    val edges = Tables.lineitem(spark, sf0001).select(
      (col("l_orderkey") % 37).as("src"), (col("l_partkey") % 37).as("dst"))
    val got = Graph.pageRankMicro(edges, iters = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val raw = edges.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got === seqPageRank(raw, iters = 4))
  }

  test("one pageRank round plans equi-joins only — no cartesian/NLJ stage") {
    // the loop checkpoints each round, so the shape to audit is the
    // per-round plan, exposed via rankRound
    val e = edgesDf(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L).withColumn("w", lit(1L))
    val edgesDeg = e.join(e.groupBy("src").agg(sum("w").as("wt")), "src")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val ranks = nodes.withColumn("r", lit(1000000L))
    val plan = Graph.rankRound(edgesDeg, nodes, ranks, 850000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("weighted: hand-computed one-round ranks on a 3-node flow graph") {
    // a→b w=3, a→c w=1, b→a w=1, c→a w=1; W(a)=4, W(b)=W(c)=1
    // round 1: s(b)=750000, s(c)=250000, s(a)=2·10⁶ →
    //   r(a)=150000+1700000, r(b)=150000+637500, r(c)=150000+212500
    val e = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRankWeightedMicro(e, iters = 1)
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r === Map("a" -> 1850000L, "b" -> 787500L, "c" -> 362500L))
  }

  test("weighted with unit weights equals the unweighted op") {
    val pairs = (1L to 300L).map(i => (i % 41, (i * 11) % 41)).distinct
    val unweighted = Graph.pageRankMicro(edgesDf(pairs: _*), iters = 3)
    val weighted = Graph.pageRankWeightedMicro(
      edgesDf(pairs: _*).withColumn("w", lit(1L)), iters = 3)
    assert(unweighted.exceptAll(weighted).isEmpty &&
      weighted.exceptAll(unweighted).isEmpty)
  }

  test("weighted: parallel edges merge by weight sum; zero weights drop") {
    val a = Graph.pageRankWeightedMicro(
      Seq(("a", "b", 2L), ("a", "b", 1L), ("b", "a", 1L), ("a", "c", 0L))
        .toDF("src", "dst", "w"), iters = 2)
    val b = Graph.pageRankWeightedMicro(
      Seq(("a", "b", 3L), ("b", "a", 1L)).toDF("src", "dst", "w"), iters = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  /** Weighted sequential reference: the documented weighted integer
    * recurrence in plain Scala maps. */
  private def seqWeightedPageRank(edges: Seq[(Long, Long, Long)],
                                  iters: Int): Map[Long, Long] = {
    val e = edges.filter(t => t._1 != t._2 && t._3 > 0)
      .groupBy(t => (t._1, t._2)).map { case ((s2, d2), g) => (s2, d2, g.map(_._3).sum) }
      .toSeq
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val wt = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w2) => r(u) * w2 / wt(u) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    r
  }

  test("weighted matches the sequential reference on a skew-weighted graph") {
    val pairs = (1L to 300L).map(i => (i % 23, (i * 5) % 23, i % 9 + 1))
    val got = Graph.pageRankWeightedMicro(
        pairs.toDF("src", "dst", "w"), iters = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got === seqWeightedPageRank(pairs, iters = 4))
  }

  test("hits: star fixture — hub of in-links is the authority, leaves are hubs") {
    val m = Graph.hitsMicro(edgesDf(1L -> 0L, 2L -> 0L, 3L -> 0L), iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(m(0L) === ((1000000L, 0L)))
    assert(Seq(1L, 2L, 3L).forall(m(_) === ((0L, 1000000L))))
  }

  /** Sequential HITS reference: the documented integer recurrence. */
  private def seqHits(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    def rescale(raw: Map[Long, Long]): Map[Long, Long] = {
      val mx = if (raw.isEmpty) 0L else raw.values.max
      nodes.map(n => n ->
        (if (mx == 0L) 0L else raw.getOrElse(n, 0L) * 1000000L / mx)).toMap
    }
    var h = nodes.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      a = rescale(e.groupBy(_._2).view.mapValues(_.map(p => h(p._1)).sum).toMap)
      h = rescale(e.groupBy(_._1).view.mapValues(_.map(p => a(p._2)).sum).toMap)
    }
    nodes.map(n => n -> ((a.getOrElse(n, 0L), h.getOrElse(n, 0L)))).toMap
  }

  test("hits matches the sequential reference on the lineitem-derived graph") {
    val edges = Tables.lineitem(spark, sf0001).select(
      (col("l_orderkey") % 37).as("src"), (col("l_partkey") % 37).as("dst"))
    val got = Graph.hitsMicro(edges, iters = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val raw = edges.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got === seqHits(raw, iters = 2))
  }

  test("ranks are identical under adversarial repartitioning (integer domain)") {
    val pairs = (1L to 400L).map(i => (i % 53, (i * 7) % 53))
    val a = Graph.pageRankMicro(edgesDf(pairs: _*), iters = 3)
    val b = Graph.pageRankMicro(edgesDf(pairs: _*).repartition(17), iters = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("labelPropagation: two bridged triangles, hand-unrolled 2 rounds") {
    import spark.implicits._
    // direction must not matter: edges given one-directional
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: min-tie-break over neighbor ids; round 2 as hand-computed
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation is partitioning-invariant and drops self-loops") {
    import spark.implicits._
    val pairs = (1L to 300L).map(i => (i % 40, (i * 11) % 40))
    val df = pairs.toDF("src", "dst")
    val a = Graph.labelPropagation(df, rounds = 3)
    val b = Graph.labelPropagation(df.repartition(13), rounds = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every label must be a node id from the graph
    val nodes = a.select("node").as[Long].collect().toSet
    assert(a.select("label").as[Long].collect().forall(nodes.contains))
  }
}
