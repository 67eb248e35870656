package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Profile, Similarity, TextAnalysis}

/** Specs for the retrieval/diagnostics batch: BM25 ranking, edit-distance
  * near-dup, blocked kNN graph, table profiling, key-skew histogram. */
class ProfileSearchSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ bm25

  test("bm25TopK: pinned hand-computed scores and ranks on a tiny corpus") {
    // corpus d1="a b a" d2="b c" d3="c c c"; query (doc 0) = "a c".
    // N=3, avgdl=8/3; idf(a)=ln(1+2.5/1.5), idf(c)=ln(1+1.5/2.5);
    // micros: d1=1302837, d3=719310, d2=523548 (python-mirrored chain).
    val corpus = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c")).toDF("doc_id", "text")
    val queries = Seq((0L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(queries, corpus, topK = 5)
      .orderBy("rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 1.3028, 1L, 1L),
      (0L, 3L, 0.7193, 1L, 2L),
      (0L, 2L, 0.5235, 1L, 3L)))
  }

  test("bm25TopK: a term unique to one doc ranks that doc first") {
    val corpus = Seq((1L, "x x common"), (2L, "common word here"),
      (3L, "word here again")).toDF("doc_id", "text")
    val queries = Seq((0L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(queries, corpus, topK = 3).collect()
    assert(got.length === 1) // only d1 contains 'x'
    assert(got.head.getLong(1) === 1L)
  }

  test("bm25TopK equals a sequential reference on random corpora") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val corpus = (10 until 40).map(i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val queries = (0 until 3).map(i =>
      (i.toLong, Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val got = TextAnalysis.bm25TopK(queries.toDF("doc_id", "text"),
        corpus.toDF("doc_id", "text"), topK = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toSet
    // sequential mirror of the op's exact chain (incl. micros rounding)
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = corpus.map(_._2.split(" ").length.toLong).sum.toDouble / corpus.size
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val expected = queries.flatMap { case (qid, qt) =>
      val scored = corpus.flatMap { case (did, _) =>
        val ts = toks(did)
        val contribs = qt.split(" ").distinct.toSeq.flatMap { term =>
          val tf = ts.count(_ == term)
          if (tf == 0) None else {
            val df = dfm(term)
            val idf = math.log(1.0 + ((n.toLong - df).toDouble + 0.5) / (df.toDouble + 0.5))
            val tfn = (tf.toDouble * 2.2) /
              (tf.toDouble + 1.2 * (0.25 + 0.75 * (ts.length.toDouble / avgdl)))
            Some(math.round(idf * tfn * 1000000.0))
          }
        }
        if (contribs.isEmpty) None
        else Some((did, contribs.sum, contribs.size.toLong))
      }
      scored.sortBy { case (did, m, _) => (-m, did) }.take(4).zipWithIndex.map {
        case ((did, m, nt), i) =>
          (qid, did,
            BigDecimal(m.toDouble / 1000000.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
            nt, (i + 1).toLong)
      }
    }.toSet
    assert(got === expected)
  }

  test("histogram conserves mass and tiles the range") {
    val rnd = new scala.util.Random(31)
    val df = Seq.fill(500)(rnd.nextDouble() * 100 - 50).toDF("x")
    val got = Profile.histogram(df, "x", bins = 13).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._4).sum === 500L)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    got.sliding(2).foreach {
      case Array((b0, _, hi, _), (b1, lo, _, _)) if b1 == b0 + 1 =>
        assert(math.abs(hi - lo) < 1e-9, s"bins $b0/$b1 must tile")
      case _ => ()
    }
  }

  // --------------------------------------------------------- edit distance

  private def localLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def shingleSet(text: String, n: Int = 3): Set[String] =
    text.split(" ").sliding(n).map(_.mkString(" ")).toSet

  test("editDistancePairs equals the brute-force reference on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(15 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // plant: exact copy (dist 0) and single-char mutations (small dist)
    val planted = Seq(
      (100L, base(3)._2),
      (101L, base(5)._2.replaceFirst("a", "o")),
      (102L, base(8)._2 + " pi"))
    val docs = (base ++ planted).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 20, minSharedShingles = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = base ++ planted
    val expected = (for {
      a <- all; b <- all if a._1 < b._1
      if (shingleSet(a._2) & shingleSet(b._2)).size >= 3
      d = localLev(a._2, b._2) if d <= 20
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got === expected)
    assert(expected.nonEmpty && expected.size >= 3) // the plant actually fired
    assert(expected.exists(_._3 == 0L)) // exact copy confirmed at distance 0
  }

  test("editDistancePairs plans no cartesian product") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val p = Dedup.editDistancePairs(docs, maxDist = 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  // ------------------------------------------------------------ kNN graph

  test("knnGraphBlocked equals per-block brute force on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat()), i % 4)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnGraphBlocked(df, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val vecs = rows.map { case (id, e, l) => (id, e.map(_.toDouble), l) }
    val expected = vecs.flatMap { case (id, v, l) =>
      val sims = vecs.filter(o => o._3 == l && o._1 != id)
        .map { case (oid, ov, _) =>
          (oid, dot(v, ov) / (math.sqrt(dot(v, v)) * math.sqrt(dot(ov, ov))))
        }
        .sortBy { case (oid, raw) => (-raw, oid) }
        .take(3)
      sims.zipWithIndex.map { case ((oid, raw), i) =>
        (id, l, oid, BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          (i + 1).toLong)
      }
    }.toSet
    assert(got === expected)
  }

  test("knnGraphBlocked plans an equi-join — no cartesian/NLJ stage") {
    val df = Seq((0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val p = Similarity.knnGraphBlocked(df, k = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  // -------------------------------------------------------------- profile

  test("profile: exact per-column stats incl. nulls on a hand-built frame") {
    val df = Seq(
      (Some(1L), Some("x"), Some(1.5)),
      (Some(2L), Some("y"), Some(2.5)),
      (Some(2L), None, Some(1.5)),
      (None, Some("x"), None))
      .toDF("id", "name", "score")
    val got = Profile.profile(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
    assert(got.toSeq === Seq(
      ("id", "bigint", 3L, 2L, Some(1.0), Some(2.0), None, None),
      ("name", "string", 3L, 2L, None, None, Some("x"), Some("y")),
      ("score", "double", 3L, 2L, Some(1.5), Some(2.5), None, None)))
  }

  test("profileApprox: one pass (no Expand/Union), estimates within HLL bounds") {
    val df = Tables.lineitem(spark, SparkSpec.sf0001)
    val approx = Profile.profileApprox(df, rsd = 0.05)
    val p = approx.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), p.take(1500))
    assert(!p.contains("Union"), p.take(1500))
    val exact = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      val ex = exact(c).toDouble
      assert(math.abs(est - ex) <= math.max(4, 4 * 0.05 * ex),
        s"$c: approx $est vs exact ${exact(c)}")
    }
  }

  test("profile and profileApprox survive a dotted column name") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("the.id", "the.name") // dots: bare col() would parse a path
    val ex = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ex === Map("the.id" -> 2L, "the.name" -> 2L))
    val ap = Profile.profileApprox(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ap === Map("the.id" -> 2L, "the.name" -> 2L))
  }

  test("sampleByHash: deterministic, rate-monotone, consistent across tables") {
    val df = (0 until 2000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    val s10 = Profile.sampleByHash(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val s10b = Profile.sampleByHash(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(s10 === s10b) // no RNG state
    assert(math.abs(s10.size - 200) < 60, s"~10% expected, got ${s10.size}")
    // monotone: a higher rate keeps a superset (same-key joins survive)
    val s30 = Profile.sampleByHash(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30))
    // consistent across tables sharing the key
    val other = (0 until 2000).map(i => (i.toLong, i * 2)).toDF("id", "x")
    val o10 = Profile.sampleByHash(other, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(o10 === s10)
  }

  test("medianAbsDeviation: outlier-resistant on hand values") {
    // [1, 2, 4, 100]: median = 2nd sorted = 2; |x−2| sorted = [0,1,2,98]
    // → MAD = 1. The 100-outlier moves stddev to ~49 but MAD stays 1.
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 4.0), ("g", 100.0))
      .toDF("k", "v")
    val got = Profile.medianAbsDeviation(df, "k", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("g", 2.0, 1.0)))
  }

  test("keyHistogram: shares and floor'd skew on hand counts") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("k")
    val got = Profile.keyHistogram(df, "k", topN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // total=10, n_keys=3: a → share .5, skew 5*3*1000/10 = 1500
    assert(got.toSeq === Seq(("a", 5L, 0.5, 1500L), ("b", 3L, 0.3, 900L)))
  }

  test("keyConcentration: hand-computed Gini, shares, effective keys") {
    // a:1, b:3 → asc ranks a=1,b=2; S1=1+6=7, T=4, k=2
    // gini=(14-12)/8=0.25; top1=3/4; top5=4/4; eff=16*1000/(1+9)=1600
    val df = (Seq("a") ++ Seq.fill(3)("b")).toDF("k")
    val got = Profile.keyConcentration(df, "k", topK = 5).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) === ((2L, 4L, 250000L, 750000L,
      1000000L, 1600L)))
    // degenerate single key: gini 0, all shares 1, eff exactly 1000
    val one = Profile.keyConcentration(Seq.fill(4)("x").toDF("k"), "k")
      .collect().head
    assert((one.getLong(2), one.getLong(3), one.getLong(5)) ===
      ((0L, 1000000L, 1000L)))
    intercept[IllegalArgumentException] {
      Profile.keyConcentration(df, "k", topK = 0)
    }
  }

  test("keyConcentration: maxKeys guard trips over-cardinality keys " +
    "before any rank window runs; 0 disables; values unchanged under cap") {
    val wide = (0 until 50).map(i => s"k$i").toDF("k")
    // 50 distinct keys vs cap 10: fails fast with the audit-key message
    val ex = intercept[IllegalArgumentException] {
      Profile.keyConcentration(wide, "k", maxKeys = 10)
    }
    assert(ex.getMessage.contains("50 distinct keys"))
    // guard off: computes (uniform keys → gini 0)
    val off = Profile.keyConcentration(wide, "k", maxKeys = 0).collect().head
    assert((off.getLong(0), off.getLong(2)) === ((50L, 0L)))
    // under the cap the guarded path must agree with the unguarded one
    val df = (Seq("a") ++ Seq.fill(3)("b")).toDF("k")
    val guarded = Profile.keyConcentration(df, "k", topK = 5).collect().head
    assert((guarded.getLong(2), guarded.getLong(3), guarded.getLong(5)) ===
      ((250000L, 750000L, 1600L)))
  }

  // ------------------------------------------------------------------- rrf

  test("rrfFuse: hand-computed fusion of two overlapping rankings") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q_id", "doc_id", "rnk")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("q_id", "doc_id", "rnk")
    val got = TextAnalysis.rrfFuse(Seq(a, b), k = 60, topK = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // doc 11 appears in both lists (ranks 2 and 1); 10 and 12 in one each
    assert(got.toSeq === Seq(
      (11L, r6(1.0 / 62 + 1.0 / 61), 2L, 1L),
      (10L, r6(1.0 / 61), 1L, 2L),
      (12L, r6(1.0 / 62), 1L, 3L)))
  }

  test("rrfFuse: a doc ranked by every list beats single-list docs at equal ranks") {
    val lists = (0 until 3).map { i =>
      Seq((1L, 100L, 1L), (1L, 200L + i, 2L)).toDF("q_id", "doc_id", "rnk")
    }
    val top = TextAnalysis.rrfFuse(lists, k = 60, topK = 1).collect().head
    assert(top.getLong(1) === 100L && top.getLong(3) === 3L)
  }

  // ----------------------------------------------------- pmi collocations

  test("pmiCollocations: hand-computed micros on a tiny corpus") {
    // d1 = "a b a b", d2 = "a b c d": N=8 tokens, B=6 bigrams;
    // pairs: (a,b)x3, (b,a)x1, (b,c)x1, (c,d)x1 — only (a,b) >= minCount 2;
    // c(a)=3, c(b)=3 -> PMI = ln(3*8*8 / (6*3*3)) = ln(32/9)
    val corpus = Seq((1L, "a b a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(corpus, minCount = 2, topK = 10)
      .collect()
    assert(got.length === 1)
    val exp = BigDecimal(math.log(3.0 * 8 * 8 / (6.0 * 3 * 3)) * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert((got.head.getString(0), got.head.getString(1),
      got.head.getLong(2), got.head.getLong(3)) === ("a", "b", 3L, exp))
  }

  test("pmiCollocations: an always-together pair outranks independent fillers") {
    // "neural network" always adjacent; filler words pair up randomly
    val docs = (1L to 40L).map { i =>
      (i, s"f${i % 5} neural network f${(i * 3) % 5} f${(i * 7) % 5}")
    }.toDF("doc_id", "text")
    val top = TextAnalysis.pmiCollocations(docs, minCount = 5, topK = 5)
      .collect().head
    assert((top.getString(0), top.getString(1)) === ("neural", "network"))
  }

  test("pmiCollocations: micros are identical under repartitioning") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
    val a = TextAnalysis.pmiCollocations(docs, minCount = 5, topK = 20)
    val b = TextAnalysis.pmiCollocations(docs.repartition(11), minCount = 5, topK = 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // ------------------------------------------------------- source KL drift

  test("sourceKlDivergence: hand-computed micros; identical sources score 0") {
    // s1 = "a a b", s2 = "b b b": n=6, c(a)=2, c(b)=4
    val docs = Seq(("s1", "a a b"), ("s2", "b b b")).toDF("source", "text")
    def term(cSw: Long, nS: Long, cW: Long, n: Long): Long =
      BigDecimal((cSw.toDouble / nS) *
        math.log((cSw.toDouble * n) / (nS.toDouble * cW)) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = graft.ops.TextAnalysis.sourceKlDivergence(docs)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("s1", 3L, term(2, 3, 2, 6) + term(1, 3, 4, 6)),
      ("s2", 3L, term(3, 3, 4, 6))))
    // two sources with the same distribution both sit at exactly 0
    val same = Seq(("x", "a b"), ("y", "a b")).toDF("source", "text")
    val zeros = graft.ops.TextAnalysis.sourceKlDivergence(same)
      .collect().map(_.getLong(2))
    assert(zeros.toSeq === Seq(0L, 0L))
  }

  test("sourceKlDivergence: non-negative per source and repartition-stable " +
    "on the fixture corpus") {
    val docs = Tables.documents(spark, SparkSpec.sf0001)
    val a = graft.ops.TextAnalysis.sourceKlDivergence(docs)
    // Gibbs' inequality: KL >= 0 (micro rounding can dip a term, so
    // allow the one-micro-per-term slack the rounding admits)
    assert(a.filter(col("kl_micro") < -100L).isEmpty)
    val b = graft.ops.TextAnalysis.sourceKlDivergence(docs.repartition(13))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("collapseTokenRuns: runs collapse to keep, non-runs untouched") {
    val s = spark
    import s.implicits._
    val got = Seq("very very very very good", "a b a b", "x", "a a b b a a")
      .toDF("t")
      .select(TextAnalysis.collapseTokenRuns(col("t")).as("c1"),
        TextAnalysis.collapseTokenRuns(col("t"), keep = 2).as("c2"))
      .as[(String, String)].collect().toSeq
    assert(got(0) === (("very good", "very very good")))
    assert(got(1) === (("a b a b", "a b a b"))) // alternation is not a run
    assert(got(2) === (("x", "x")))
    assert(got(3) === (("a b a", "a a b b a a")))
  }

  test("compressionSignals: repetition compresses, prose doesn't; deterministic") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "ab " * 300),                                       // pure repetition
      (2L, (1 to 300).map(i => s"w${i * 7919 % 9973}").mkString(" ")), // diverse
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionSignals(spark, docs)
      .select("doc_id", "ratio_micros").as[(Long, Long)].collect().toMap
    assert(got(1L) < 100000L, s"repetition must compress hard: ${got(1L)}")
    assert(got(2L) > 400000L, s"diverse text must not: ${got(2L)}")
    assert(got(3L) === 1000000L) // empty doc: ratio pinned to 1.0
    // deterministic across partitionings (per-partition Deflater reuse
    // must not leak state between rows)
    val again = TextAnalysis.compressionSignals(spark, docs.repartition(3))
      .select("doc_id", "ratio_micros").as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("winsorizedStats: outliers clamped, mean exact, repartition-stable") {
    val s = spark
    import s.implicits._
    // 11 values 1..10 plus an outlier 1000; p05/p95 of the sorted array
    // interpolate near the edges, so the 1000 clamps to hi_clamp
    val df = ((1 to 10).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("k", "v")
    val row = Profile.winsorizedStats(df, "k", "v", 0.1, 0.9).head()
    val n = row.getLong(1)
    val hi = row.getDouble(3)
    val mean = row.getDouble(4)
    assert(n === 11L)
    assert(hi < 1000.0) // the outlier cannot be its own clamp
    // hand-recompute: clamped sum in cents / n
    val arr = ((1 to 10).map(_.toDouble) :+ 1000.0).sorted
    def pc(p: Double): Double = {
      val h = 1.0 + p * (arr.size - 1)
      val lo = arr(h.toInt - 1); val hiV = arr(math.min(h.toInt, arr.size - 1))
      lo + (h - math.floor(h)) * (hiV - lo)
    }
    val loC = math.round(pc(0.1) * 100); val hiC = math.round(pc(0.9) * 100)
    val wsum = arr.map(x => math.min(math.max(math.round(x * 100), loC), hiC)).sum
    assert(math.abs(mean - math.rint(wsum.toDouble / 11 / 100 * 100) / 100) < 0.011)
    val again = Profile.winsorizedStats(df.repartition(5), "k", "v", 0.1, 0.9).head()
    assert(again.getDouble(4) === mean)
  }
}
