package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Library-surface semantics of the reusable relational operators. */
class RelationalOpsSpec extends SparkSpec {

  test("asOfJoin: latest right ≤ left; equal-ts matches; no-match is null") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, "u", 100L), (2L, "u", 50L), (3L, "v", 10L), (4L, "w", 99L))
      .toDF("id", "k", "t")
    val quotes = Seq(("u", 40L, "q40"), ("u", 100L, "q100"), ("v", 20L, "q20"))
      .toDF("k", "qt", "quote")
    val got = Relational.asOfJoin(probes, quotes, key = Seq("k"),
        leftTs = "t", rightTs = "qt", rightCols = Seq("quote"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, "q100"), // equal timestamp matches (≤)
      (2L, "q40"),  // latest preceding
      (3L, null),   // right exists but only later
      (4L, null)))  // key never seen on right
  }

  test("asOfJoin forward: earliest right ≥ left; equal-ts matches") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, "u", 100L), (2L, "u", 50L), (3L, "u", 200L))
      .toDF("id", "k", "t")
    val quotes = Seq(("u", 60L, "q60"), ("u", 100L, "q100"), ("u", 150L, "q150"))
      .toDF("k", "qt", "quote")
    val got = Relational.asOfJoin(probes, quotes, Seq("k"), "t", "qt",
        Seq("quote"), direction = "forward")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, "q100"), // equal timestamp matches (≥)
      (2L, "q60"),  // earliest following
      (3L, null)))  // nothing after 200
  }

  test("asOfJoin tolerance: matches past the bound null out (both directions)") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, "u", 100L), (2L, "u", 500L)).toDF("id", "k", "t")
    val quotes = Seq(("u", 90L, "q90")).toDF("k", "qt", "quote")
    def run(dir: String) = Relational.asOfJoin(probes, quotes, Seq("k"),
        "t", "qt", Seq("quote"), direction = dir, tolerance = Some(50L))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3)))
    assert(run("backward").toSeq === Seq((1L, "q90"), (2L, null))) // 410 > 50
    assert(run("forward").toSeq === Seq((1L, null), (2L, null)))   // q90 < both
  }

  test("sessionize: splits on gap, 1-based ids per partition") {
    val s = spark
    import s.implicits._
    val df = Seq(("u", 0L, 1L), ("u", 10L, 2L), ("u", 1000L, 3L),
      ("v", 5L, 4L)).toDF("k", "ms", "id")
    val got = Relational.sessionize(df, Seq("k"), "ms", gapMs = 100, tieBreak = Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("topKPerGroup: rank column, deterministic tie-break") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 5, 1), ("g", 5, 2), ("g", 3, 3), ("h", 9, 4))
      .toDF("k", "score", "id")
    val got = Relational.topKPerGroup(df, Seq("k"),
        Seq(col("score").desc, col("id")), k = 2)
      .orderBy("k", "rn").collect().map(r => (r.getString(0), r.getLong(3), r.getInt(2)))
    assert(got.toSeq === Seq(("g", 1L, 1), ("g", 2L, 2), ("h", 1L, 4)))
  }

  test("asOfJoin plans one shuffle on the key, no join operator") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, "u", 100L)).toDF("id", "k", "t")
    val quotes = Seq(("u", 40L, "q40")).toDF("k", "qt", "quote")
    val p = Relational.asOfJoin(probes, quotes, Seq("k"), "t", "qt", Seq("quote"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1500)) // union + window, not a join
  }

  test("bucketedIntervalJoin == plain theta join, at several bucket widths") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random intervals and points, overlaps galore
    val intervals = (1L to 60L)
      .map(i => (i, (i * 37) % 200, (i * 37) % 200 + i % 25))
      .toDF("iv_id", "lo", "hi")
    val points = (1L to 500L).map(p => (p, (p * 13) % 230)).toDF("pt_id", "pt")
    val plain = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt_id", "iv_id")
    Seq(1L, 7L, 32L, 1000L).foreach { w =>
      val bucketed = Relational
        .bucketedIntervalJoin(points, intervals, "pt", "lo", "hi", w)
        .select("pt_id", "iv_id")
      assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
        s"bucketWidth=$w")
    }
  }

  test("bucketedIntervalJoin: inclusive bounds, empty intervals dropped, negatives") {
    val s = spark
    import s.implicits._
    val intervals = Seq((1L, -10L, -1L), (2L, 5L, 5L), (3L, 9L, 3L))
      .toDF("iv_id", "lo", "hi") // iv 3 is inverted -> contributes nothing
    val points = Seq((1L, -10L), (2L, -1L), (3L, 5L), (4L, 6L), (5L, 0L))
      .toDF("pt_id", "pt")
    val got = Relational
      .bucketedIntervalJoin(points, intervals, "pt", "lo", "hi", 4L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("bucketedIntervalJoin plans a hash equi-join, never a nested loop") {
    val s = spark
    import s.implicits._
    val intervals = (1L to 50L).map(i => (i, i * 10, i * 10 + 15)).toDF("iv_id", "lo", "hi")
    val points = (1L to 500L).map(p => (p, p)).toDF("pt_id", "pt")
    val p = Relational.bucketedIntervalJoin(points, intervals, "pt", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(1500))
  }

  test("intervalUnionLength: overlap, nesting, duplicates, disjoint, zero-width") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      // key "a": [0,10) ∪ [5,15) ∪ [12,12) ∪ [20,25) = 15 + 0 + 5 = 20
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 12L, 12L), ("a", 20L, 25L),
      // key "b": nested + duplicate: [0,100) ∪ [10,20) ∪ [0,100) = 100
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 0L, 100L),
      // key "c": single
      ("c", 7L, 9L)).toDF("k", "lo", "hi")
    val got = Relational.intervalUnionLength(iv, Seq("k"), "lo", "hi")
      .select(col("k"), col("n_intervals"), col("covered").cast("long"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, c) => k -> ((n, c)) }.toMap
    assert(got === Map("a" -> ((4L, 20L)), "b" -> ((3L, 100L)), "c" -> ((1L, 2L))))
  }

  test("intervalUnionLength is partitioning-invariant") {
    val s = spark
    import s.implicits._
    val iv = (1 to 500).map(i =>
      (s"k${i % 7}", (i * 13 % 97).toLong, (i * 13 % 97 + i % 29).toLong))
      .toDF("k", "lo", "hi")
    val a = Relational.intervalUnionLength(iv, Seq("k"), "lo", "hi")
    val b = Relational.intervalUnionLength(iv.repartition(11), Seq("k"), "lo", "hi")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("globalRunningSum equals the single-partition window at every " +
    "bucket count, including degenerate ones") {
    val s = spark
    import s.implicits._
    val rows = (1 to 400).map(i => ((i * 37 % 401).toLong, (i % 23).toLong))
    val df = rows.toDF("k", "v").repartition(7)
    val expect = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, run), (k, v)) => (k, v, run + v) }
      .drop(1).map { case (k, v, run) => (k, run) }.toMap
    for (b <- Seq(1, 2, 16, 1000)) {
      val got = Relational.globalRunningSum(df, "k", "v", buckets = b)
        .select("k", "running_sum").as[(Long, Long)].collect().toMap
      assert(got === expect, s"buckets=$b")
    }
  }

  test("globalRunningSum: duplicate order keys and negative values — " +
    "every later key still sees the exact full prefix") {
    val s = spark
    import s.implicits._
    // ties (k=1, k=3) and a negative value: band totals must be exact
    // sums, not a read-off-one-tied-row's-running-sum shortcut
    val df = Seq((1L, 5L), (1L, 7L), (2L, 9L), (3L, -20L), (3L, 1L),
      (4L, 2L)).toDF("k", "v").repartition(3)
    for (b <- Seq(1, 4, 64)) {
      val got = Relational.globalRunningSum(df, "k", "v", buckets = b)
      assert(got.filter(col("k") === 2)
        .select("running_sum").as[Long].head() === 21L, s"buckets=$b")
      assert(got.filter(col("k") === 4)
        .select("running_sum").as[Long].head() === 4L, s"buckets=$b")
    }
  }

  test("globalRunningSum materializes the band shuffle ONCE: the offsets " +
    "branch reads a ReusedExchange, not a second source scan") {
    // parquet-backed source (the production shape; a local relation can
    // be constant-folded per branch) — reuse is an AQE runtime decision,
    // so assert on the EXECUTED plan after an action
    val docs = Tables.documents(spark, SparkSpec.sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val out = Relational.globalRunningSum(docs, "doc_id", "n")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(_.contains("ReusedExchange")),
      s"band exchange not reused:\n$plan")
  }

  test("tokenBudgetShards: contiguous shards, at-most-one-doc overshoot, " +
    "doc straddling a boundary lands where its first token falls") {
    val s = spark
    import s.implicits._
    // tokens: 4,4,4 -> cum 4,8,12; target 5: excl prefixes 0,4,8 ->
    // shards 0,0,1 (doc 2 starts at token 4 < 5: overshoots shard 0)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("doc_id", "n")
    val got = graft.ops.Curation.tokenBudgetShards(docs, "n", 5L)
      .select("doc_id", "cum_tokens", "shard")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 4L, 0L), (2L, 8L, 0L), (3L, 12L, 1L)))
    // shards are contiguous doc ranges: shard ids are nondecreasing in
    // doc order on a larger corpus
    val big = (1 to 300).map(i => (i.toLong, (i % 9 + 1).toLong))
      .toDF("doc_id", "n")
    val shards = graft.ops.Curation.tokenBudgetShards(big, "n", 50L)
      .orderBy("doc_id").select("shard").as[Long].collect().toSeq
    assert(shards === shards.sorted)
  }
}
