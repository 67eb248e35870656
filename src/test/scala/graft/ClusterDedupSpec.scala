package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, TextAnalysis}

/** Cluster canonicalization, chunk dedup, decontamination, PII redaction
  * and temperature resampling semantics. */
class ClusterDedupSpec extends SparkSpec {
  import SparkSpec.sf0001

  private lazy val docs = Tables.documents(spark, sf0001)

  /** Reference union-find over an edge list. */
  private def ufClusters(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)], cutoff: Long): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("a", "b")
    Dedup.connectedComponents(df, driverCutoff = cutoff).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents matches union-find on random graphs (both paths)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 30
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = ufClusters(edges)
      assert(ccOf(edges, cutoff = 0) === expected, s"distributed, trial $trial")
      assert(ccOf(edges, cutoff = 1L << 20) === expected, s"driver, trial $trial")
    }
  }

  test("connectedComponents on adversarial shapes (distributed path)") {
    // two cliques joined by one bridge edge; a star; disjoint pairs —
    // the shapes where pairwise reasoning and contraction rounds differ
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val bridge = Seq((4L, 10L))
    val star = (101L to 108L).map(i => (100L, i))
    val pairs = Seq((200L, 201L), (202L, 203L), (204L, 205L))
    val edges = cliqueA ++ cliqueB ++ bridge ++ star ++ pairs
    assert(ccOf(edges, cutoff = 0) === ufClusters(edges))
  }

  test("connectedComponents collapses a long chain (diameter >> rounds)") {
    // a 200-node path: min-label propagation would need ~200 rounds;
    // star contraction must finish within the default maxIter
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = ccOf(chain, cutoff = 0)
    assert(got.size === 200 && got.values.forall(_ == 0L))
  }

  test("connectedComponents handles empty input and singleton-free output") {
    val empty = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("a", "b")
    assert(Dedup.connectedComponents(empty).isEmpty)
    assert(Dedup.connectedComponents(empty, driverCutoff = 0).isEmpty)
    // self-loops contribute nothing
    val selfy = spark.createDataFrame(Seq((3L, 3L), (1L, 2L))).toDF("a", "b")
    assert(Dedup.connectedComponents(selfy).collect().map(_.getLong(0)).toSet
      === Set(1L, 2L))
  }

  test("nearDupClusters: every confirmed pair lands in one cluster") {
    val pairs = Dedup.minHashLshPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val cl = Dedup.nearDupClusters(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) => assert(cl(a) === cl(b)) }
    // canonical id is the min of its cluster and a member of it
    cl.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
    }
  }

  test("nearDupSurvivorsByScore: highest score survives each cluster, " +
    "unclustered docs untouched, one survivor per cluster") {
    val s = spark
    import s.implicits._
    // 1/2/3 are near-identical with scores 5/9/9 → doc 2 wins the 9-tie
    // by lowest id; doc 4 is unrelated and must pass through
    val hand = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", 5L),
      (2L, "the quick brown fox jumps over the lazy dog today", 9L),
      (3L, "the quick brown fox jumps over the lazy dog", 9L),
      (4L, "completely unrelated text with different words entirely here", 1L)
    ).toDF("doc_id", "text", "score")
    val got = Dedup.nearDupSurvivorsByScore(hand, col("score"), minJaccard = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 4L))
    // fixture-corpus identity: survivors = unclustered + one per cluster
    val cl = Dedup.nearDupClusters(docs, 0.8)
    val surv = Dedup.nearDupSurvivorsByScore(docs, col("n_chars"), 0.8)
    assert(surv.count() ===
      docs.count() - cl.count() + cl.select("cluster_id").distinct().count())
    // every survivor that IS clustered carries its cluster's max n_chars
    val best = cl.join(docs, "doc_id").groupBy("cluster_id")
      .agg(max("n_chars").as("mx"))
    val bad = surv.join(cl, "doc_id").join(best, "cluster_id")
      .filter(col("n_chars") =!= col("mx"))
    assert(bad.isEmpty)
  }

  test("cdcChunks: chunks reassemble to the original text, boundaries content-defined") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho", "sig", "tau",
      "ups", "phi", "chi")
    val a = Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val b = "zz yy xx " + a // shifted copy: every position moves by 3
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df).orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    val ca = got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    val cb = got.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    // reassembly is lossless
    assert(ca.mkString(" ") === a)
    assert(cb.mkString(" ") === b)
    // shift-resistance (the CDC property): boundaries depend only on the
    // local 5-gram, so every chunk of A after its first boundary recurs
    // verbatim in the prefixed copy — fixed-size chunking would lose all
    // alignment after the 3-token shift
    assert(ca.size >= 3, s"want multiple chunks, got ${ca.size}")
    assert(ca.drop(1).forall(cb.toSet.contains),
      s"interior chunks must survive the prefix shift: $ca vs $cb")
  }

  /** Greedy leftmost non-overlapping application of one merge (internal
    * joiner form) — the reference application step shared by the trainer
    * and encoder tests. */
  private def applyOne(t: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == l && t(i + 1) == r) {
        b += t(i) + "\u0001" + t(i + 1); i += 2
      } else { b += t(i); i += 1 }
    }
    b.result()
  }

  /** Sequential reference for WPE/BPE merge learning: exact greedy
    * left-to-right merging, global (count desc, pair asc) argmax. */
  private def localWpe(texts: Seq[String], n: Int): Seq[(Long, String, String, Long)] = {
    var docs = texts.map(_.split(" ").toVector)
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (rank <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.foreach(t => t.indices.dropRight(1).foreach { i =>
        counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + 1
      })
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank.toLong, l.replace('\u0001', ' '), r.replace('\u0001', ' '), c))
        docs = docs.map(applyOne(_, l, r))
      }
    }
    out.result()
  }

  test("learnWpeMerges matches the sequential BPE reference on a random corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    // planted dominant trigram: round 1 fuses one of its pairs, a later
    // round must fuse the FUSED token with the third word (compound merge)
    val texts = Seq.fill(30)(
      Seq.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq.fill(10)(Seq.fill(6)("aa bb cc").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.learnWpeMerges(df, nMerges = 6)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === localWpe(texts, 6))
    // later merges must be able to build on earlier fused tokens
    assert(got.exists(m => m._2.contains(" ") || m._3.contains(" ")),
      s"no compound merge in $got — corpus too sparse for the test's intent")
  }

  test("applyWpeMerges: train/apply consistency, round-trip, self-pair chains") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val texts = Seq.fill(30)(
      Seq.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq.fill(10)(Seq.fill(6)("aa bb cc").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val learned = graft.ops.TextAnalysis.learnWpeMerges(df, nMerges = 6)
    val ms = learned.orderBy("merge_rank").collect()
      .map(r => (r.getString(1).replace(' ', '\u0001'),
        r.getString(2).replace(' ', '\u0001')))
    val want = texts.zipWithIndex.map { case (t, i) =>
      val toks = ms.foldLeft(t.split(" ").toVector) {
        case (acc, (l, r)) => applyOne(acc, l, r)
      }
      i.toLong -> toks.map(_.replace('\u0001', ' '))
    }.toMap
    val got = graft.ops.TextAnalysis.applyWpeMerges(df, learned)
      .orderBy("doc_id", "pos").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toVector }
    assert(got === want)
    // round-trip: merges regroup, never rewrite — rejoining the tokens
    // with single spaces reproduces every original text byte-for-byte
    got.foreach { case (id, toks) =>
      assert(toks.mkString(" ") === texts(id.toInt), s"doc $id")
    }
    // competing self-pair chains take the greedy leftmost pairing
    val chain = Seq((0L, "a a a a a")).toDF("doc_id", "text")
    val selfMerge = Seq((1L, "a", "a")).toDF("merge_rank", "left", "right")
    val chainToks = graft.ops.TextAnalysis.applyWpeMerges(chain, selfMerge)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(chainToks === Seq("a a", "a a", "a"))
  }

  test("applyWpeMerges == sequential reference on random merge tables (adversarial)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(101)
    val vocab = Vector("a", "b", "c", "dd", "ee")
    for (trial <- 1 to 12) {
      val texts = Seq.fill(12)(
        Seq.fill(3 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // random merges: self-pairs, repeats, and pairs that never occur all
      // allowed; compound lefts reference possibly-nonexistent fusions
      val nm = 1 + rnd.nextInt(5)
      val merges = (1 to nm).map { k =>
        val l = if (k > 1 && rnd.nextBoolean())
          vocab(rnd.nextInt(vocab.size)) + " " + vocab(rnd.nextInt(vocab.size))
        else vocab(rnd.nextInt(vocab.size))
        (k.toLong, l, vocab(rnd.nextInt(vocab.size)))
      }
      val got = graft.ops.TextAnalysis
        .applyWpeMerges(df, merges.toDF("merge_rank", "left", "right"))
        .orderBy("doc_id", "pos").collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toVector }
      val ms = merges.map { case (_, l, r) =>
        (l.replace(' ', '\u0001'), r.replace(' ', '\u0001')) }
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = ms.foldLeft(t.split(" ").toVector) {
          case (acc, (l, r)) => applyOne(acc, l, r)
        }.map(_.replace('\u0001', ' '))
        assert(got(i.toLong) === want, s"trial $trial doc $i merges=$merges")
        assert(got(i.toLong).mkString(" ") === t, s"round-trip trial $trial doc $i")
      }
    }
  }

  test("connectedComponents driver path survives a deep descending chain") {
    // edges arrive worst-case ordered (each union hangs the new root under
    // a long chain); a recursive find() overflowed the stack here
    val n = 30000L
    val edges = (n - 1 to 1L by -1).map(i => (i, i + 1))
    val got = ccOf(edges, cutoff = 1L << 20)
    assert(got.values.toSet === Set(1L))
    assert(got.size === n.toInt)
  }

  test("cdcChunks: lossless reassembly and determinism on random corpora") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
      val texts = (0 until 25).map(i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val df = texts.toDF("doc_id", "text")
      val chunks = Dedup.cdcChunks(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      // reassembly: chunks in chunk_idx order concatenate to the text
      val byDoc = chunks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4).mkString(" "))
      texts.foreach { case (id, t) => assert(byDoc(id) === t, s"seed $seed doc $id") }
      // start positions are consistent with chunk lengths
      chunks.groupBy(_._1).values.foreach { cs =>
        val sorted = cs.sortBy(_._2)
        sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
          assert(b._3 === a._3 + a._4.split(" ").length, s"seed $seed contiguity")
        }
      }
    }
  }

  test("chunkDedup keeps exactly the first occurrence of each chunk") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c d"),
      (2L, "a b x y"), // chunk "a b" already seen in doc 1
      (3L, "c d x y") // both chunks seen
    )).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(df, Dedup.wordChunks(col("text"), 2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got === Array((1L, 2L, "a b c d"), (2L, 1L, "x y")))
  }

  test("chunkDedup matches a sequential reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 3) {
      val corpus = (0L until 30L).map { id =>
        // tiny vocab + short docs → many cross-doc and within-doc repeats
        id -> Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val chunk = 2
      // sequential reference: walk docs in id order, keep first-seen chunks
      val seen = scala.collection.mutable.Set[String]()
      val expected = corpus.flatMap { case (id, text) =>
        val parts = text.split(" ", -1).grouped(chunk).map(_.mkString(" ")).toSeq
        val kept = parts.filter(seen.add)
        if (kept.isEmpty) None
        else Some((id, kept.size.toLong, kept.mkString(" ")))
      }
      val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
      val got = Dedup.chunkDedup(df, Dedup.wordChunks(col("text"), chunk))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq === expected, s"trial $trial")
    }
  }

  test("duplicateSpans matches a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e")
    val k = 3
    for (trial <- 1 to 3) {
      val corpus = (0L until 25L).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      // brute force: count string k-grams globally, mark positions whose
      // gram repeats, merge overlapping [p, p+k) intervals per doc
      val counts = scala.collection.mutable.Map[String, Int]()
        .withDefaultValue(0)
      val posOf = corpus.map { case (id, text) =>
        val grams = text.split(" ", -1).sliding(k).filter(_.size == k)
          .map(_.mkString(" ")).toSeq
        grams.foreach(g => counts(g) += 1)
        id -> grams
      }
      val expected = posOf.flatMap { case (id, grams) =>
        val marked = grams.zipWithIndex.collect {
          case (g, p) if counts(g) >= 2 => p
        }
        val spans = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        marked.foreach { p =>
          spans.lastOption match {
            case Some((s, e, n)) if p <= e =>
              spans(spans.size - 1) = (s, math.max(e, p + k), n + 1)
            case _ => spans += ((p.toLong, (p + k).toLong, 1L))
          }
        }
        spans.map { case (s, e, n) => (id, s, e, n) }
      }
      val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, k).orderBy("doc_id", "span_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === expected, s"trial $trial")
    }
  }

  test("removeDuplicateSpans matches a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c", "d", "e")
    val k = 3
    for (trial <- 1 to 3) {
      val corpus = (0L until 20L).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      val gramsOf = corpus.map { case (id, text) =>
        val g = text.split(" ", -1).sliding(k).filter(_.size == k)
          .map(_.mkString(" ")).toSeq
        g.foreach(x => counts(x) += 1)
        id -> (text.split(" ", -1).toSeq, g)
      }
      val expected = gramsOf.flatMap { case (id, (toks, grams)) =>
        val covered = grams.zipWithIndex.collect {
          case (g, p) if counts(g) >= 2 => (p until p + k)
        }.flatten.toSet
        val kept = toks.zipWithIndex.filterNot { case (_, p) => covered(p) }
        if (kept.isEmpty) None
        else Some((id, kept.size.toLong, kept.map(_._1).mkString(" ")))
      }
      val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
      val got = Dedup.removeDuplicateSpans(df, k).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq === expected, s"trial $trial")
    }
  }

  test("bigramLogProb matches a driver-side reference on a random corpus") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (0L until 30L).map { id =>
      id -> Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val bg = corpus.flatMap { case (id, t) =>
      t.split(" ", -1).sliding(2).filter(_.size == 2)
        .map(p => (id, p(0), p(1))).toSeq
    }
    val freq = bg.groupBy(p => (p._2, p._3)).map { case (key, v) => key -> v.size }
    val prefix = bg.groupBy(_._2).map { case (w1, v) => w1 -> v.size }
    val expected = bg.groupBy(_._1).toSeq.map { case (id, rows) =>
      // the integer-micros convention: per-bigram lp rounds to micros,
      // long sum (exact, order-free), divide once — so the reference
      // matches the distributed result EXACTLY, not to a tolerance
      val sumMicros = rows.map { case (_, w1, w2) =>
        math.round(math.log(freq((w1, w2)).toDouble / prefix(w1)) * 1e6)
      }.sum
      (id, rows.size.toLong, SparkSpec.microAvg4(sumMicros, rows.size))
    }.sortBy(_._1)
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bigramLogProb(df, df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === expected)
  }

  test("mixCorpus raises on a weighted source absent from the corpus") {
    val bad = Curation.mixCorpus(docs, Map("en" -> 0.5, "klingon" -> 0.5))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("absent from corpus") ||
      Option(e.getCause).exists(_.getMessage.contains("absent from corpus")))
  }

  test("mixCorpus keep decisions match an independent md5 reference") {
    val w = Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15)
    val out = Curation.mixCorpus(docs, w)
      .select("doc_id", "text", "keep_rate", "kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { case (id, text, rate, kept) =>
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val bucket = java.lang.Long.parseLong(hex, 16)
      assert(kept === (bucket < rate * (1 << 24)), s"doc $id")
    }
  }

  test("chunkDedup is idempotent") {
    val chunked = Dedup.chunkDedup(docs, Dedup.wordChunks(col("text"), 10))
    val again = Dedup.chunkDedup(
      chunked.select(col("doc_id"), col("dedup_text").as("text")),
      Dedup.wordChunks(col("text"), 10))
    val a = chunked.select("doc_id", "dedup_text")
    val b = again.select("doc_id", "dedup_text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("contaminationFlags matches brute-force string n-gram overlap") {
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val eval = docs.filter(col("doc_id") % 17 === 0)
    def grams(t: String, n: Int): Set[String] =
      t.split(" ").sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    val evalGrams = eval.select("text").collect()
      .flatMap(r => grams(r.getString(0), 5)).toSet
    val expected = train.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams(r.getString(1), 5).count(evalGrams).toLong)
      .filter(_._2 > 0).toMap
    val got = Curation.contaminationFlags(train, eval, n = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("redactPii masks emails, IPs and dash-phones, leaves clean text alone") {
    val df = spark.createDataFrame(Seq(
      (1L, "write to jane.doe+x@mail.example.org today"),
      (2L, "server 10.0.113.7 port open"),
      (3L, "call +1-555-0142 or 555-9000"),
      (4L, "nothing sensitive here v1.2 x@y"))).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Curation.redactPii(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "write to <EMAIL> today")
    assert(got(2L) === "server <IP> port open")
    assert(got(3L) === "call <PHONE> or <PHONE>")
    assert(got(4L) === "nothing sensitive here v1.2 x@y")
  }

  test("domainCap: at most k per domain, best-first, deterministic tiebreak") {
    val uniq = size(array_distinct(split(col("text"), " "))).cast("double") /
      size(split(col("text"), " "))
    val capped = Curation.domainCap(
      docs.withColumn("q", uniq), col("source"), col("q"), cap = 3)
    val bySrc = capped.groupBy("source").agg(count(lit(1)).as("n"),
        max("domain_rank").as("mx"), min("domain_rank").as("mn"))
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (n, mx, mn) =>
      assert(n <= 3 && mn === 1 && mx === n.toInt) // contiguous 1..n
    }
    // rerun → identical keep set (deterministic tiebreak)
    val again = Curation.domainCap(
      docs.withColumn("q", uniq), col("source"), col("q"), cap = 3)
    assert(capped.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
  }

  test("bigramLogProb: pinned score on a hand corpus") {
    val hand = spark.createDataFrame(Seq((1L, "a b a b a c")))
      .toDF("doc_id", "text")
    // bigrams: ab ba ab ba ac → freq ab=2 ba=2 ac=1; prefixes a=3 b=2
    // avg = (2·ln(2/3) + 2·ln(2/2) + ln(1/3)) / 5, per-bigram micros +
    // integer-domain 4-decimal rounding
    val sumMicros = 2 * math.round(math.log(2.0 / 3) * 1e6) +
      2 * math.round(math.log(1.0) * 1e6) + math.round(math.log(1.0 / 3) * 1e6)
    val expected = SparkSpec.microAvg4(sumMicros, 5)
    val got = graft.ops.TextAnalysis.bigramLogProb(hand, hand).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 5L)
    assert(got(0).getDouble(2) === expected)
  }

  test("jaccardTopK: a planted exact duplicate ranks first with jaccard 1.0") {
    val donor = docs.filter(col("doc_id") === 0).select("text")
      .collect().head.getString(0)
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      spark.createDataFrame(Seq((9999L, donor))).toDF("doc_id", "text"))
    val top = Dedup.jaccardTopK(planted, Seq(9999L), k = 1).collect()
    assert(top.length === 1)
    assert(top(0).getLong(1) === 0L && top(0).getDouble(2) === 1.0)
  }

  test("duplicateSpans: planted repeated phrase yields one merged span per doc") {
    // the 8-word phrase is shared across docs 1 and 2; doc 3 has no k-gram
    // repeated anywhere → no rows. k=5 marks 4 overlapping grams per
    // occurrence (positions p..p+3), merging to one span of length 8.
    val phrase = "the quick brown fox jumps over the lazy"
    val hand = spark.createDataFrame(Seq(
      (1L, s"alpha beta $phrase gamma delta"),
      (2L, s"one two three four $phrase"),
      (3L, "completely unrelated words with no overlap here at all")))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(hand, k = 5).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: phrase at word offset 2 → span [2, 10); doc 2: offset 4 → [4, 12)
    assert(got.toSeq === Seq((1L, 2L, 10L, 4L), (2L, 4L, 12L, 4L)))
  }

  test("duplicateSpans: within-doc repetition is caught and overlaps merge") {
    val hand = spark.createDataFrame(Seq(
      (1L, "a b c d e x y a b c d e"))).toDF("doc_id", "text")
    // "a b c d e" at offsets 0 and 7; spans [0,5) and [7,12) do not touch
    val got = Dedup.duplicateSpans(hand, k = 5).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 5L), (7L, 12L)))
  }

  test("removeDuplicateSpans cuts the shared phrase from all occurrences") {
    val phrase = "the quick brown fox jumps over the lazy"
    val hand = spark.createDataFrame(Seq(
      (1L, s"alpha beta $phrase gamma delta"),
      (2L, s"one two three four $phrase"),
      (3L, "completely unrelated words with no overlap here at all")))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(hand, k = 5).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 4L, "alpha beta gamma delta"),
      (2L, 4L, "one two three four"),
      (3L, 9L, "completely unrelated words with no overlap here at all")))
  }

  test("removeDuplicateSpans drops a fully-duplicated doc") {
    val hand = spark.createDataFrame(Seq(
      (1L, "a b c d e"), (2L, "a b c d e"))).toDF("doc_id", "text")
    assert(Dedup.removeDuplicateSpans(hand, k = 5).count() === 0L)
  }

  test("tfIdfTopK: corpus-wide terms score zero, distinctive terms rank first") {
    val hand = spark.createDataFrame(Seq(
      (1L, "shared shared apple apple apple"),
      (2L, "shared banana"),
      (3L, "shared cherry cherry"))).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.tfIdfTopK(hand, topK = 1).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    val ln3 = math.log(3.0)
    def r4(d: Double) = BigDecimal(d).setScale(4,
      BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(got(1L)._1 === "apple" && got(1L)._2 === r4(3 * ln3))
    assert(got(2L)._1 === "banana" && got(2L)._2 === r4(ln3))
    assert(got(3L)._1 === "cherry" && got(3L)._2 === r4(2 * ln3))
  }

  test("jaccardTopK matches brute-force Jaccard ranking on random corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (0L until 20L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    def sh(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val queryIds = Seq(0L, 1L, 2L)
    val k = 3
    val expected = queryIds.flatMap { qid =>
      val qs = sh(corpus(qid.toInt)._2)
      corpus.filter(_._1 != qid).map { case (did, t) =>
        val ds = sh(t)
        val inter = (qs & ds).size
        (qid, did, if (inter == 0) 0.0
          else inter.toDouble / (qs.size + ds.size - inter))
      }.filter(_._3 > 0)
        .sortBy { case (_, did, j) => (-j, did) }.take(k)
        .zipWithIndex.map { case ((q, d, j), i) =>
          (q, d, BigDecimal(j).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1) }
    }
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = Dedup.jaccardTopK(df, queryIds, k).orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === expected)
  }

  test("mixCorpus: binding source keeps 100%, rates scale-invariant in the weights") {
    val w = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)
    val out = Curation.mixCorpus(docs, w)
    val rates = out.select("lang", "n_in", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rates.keySet === w.keySet)
    // T = min(n/w); rates follow the closed form (rounding aside) and the
    // arg-min (binding) source keeps every document — asserted on the
    // kept decisions, not on rate == 1.0 bit patterns (the three-op IEEE
    // chain n/w → ·w → /n need not round-trip to exactly 1.0)
    val t = rates.map { case (l, (n, _)) => n / w(l) }.min
    rates.foreach { case (l, (n, r)) =>
      assert(math.abs(r - w(l) * t / n) < 1e-12 && r > 0.0 && r <= 1.0 + 1e-12, l)
    }
    val binding = rates.minBy { case (l, (n, _)) => n / w(l) }._1
    val bindingRows = out.filter(col("lang") === binding)
    assert(bindingRows.filter(!col("kept")).count() === 0L &&
      bindingRows.count() > 0L)
    // relative weights: scaling every weight by 7 keeps the same docs
    // (rates agree to rounding; compare decisions, not double bit patterns)
    val scaled = Curation.mixCorpus(docs, w.map { case (k, v) => k -> v * 7 })
    val a = out.select("doc_id", "kept")
    val b = scaled.select("doc_id", "kept")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("temperatureResample: rarest language fully kept, rates in (0,1]") {
    val out = Curation.temperatureResample(docs)
    val rates = out.select("lang", "n_lang", "keep_rate").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rates.forall { case (_, _, r) => r > 0.0 && r <= 1.0 })
    val nMin = rates.map(_._2).min
    rates.filter(_._2 == nMin).foreach { case (_, _, r) => assert(r === 1.0) }
    // the rarest language keeps everything
    val kept = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("kept").cast("long")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rarest = rates.filter(_._2 == nMin).map(_._1)
    rarest.foreach(l => assert(kept(l)._1 === kept(l)._2))
    // deterministic: same result on rerun
    val again = Curation.temperatureResample(docs).groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("kept").cast("long")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept === again)
  }

  test("buildVocab: frequency-ranked ids with lexicographic ties, capped size") {
    val s2 = spark
    import s2.implicits._
    val corpus = Seq((0L, "b b b a a c"), (1L, "a d")).toDF("doc_id", "text")
    // counts: b:3 a:3 c:1 d:1 → ties break lexicographically: a=0 b=1 c=2 d=3
    val full = TextAnalysis.buildVocab(corpus, vocabSize = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    val capped = TextAnalysis.buildVocab(corpus, vocabSize = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("a" -> 0L, "b" -> 1L))
  }

  test("encodeToIds: vocab lookup, OOV → unk id, truncation at maxLen") {
    val s2 = spark
    import s2.implicits._
    val corpus = Seq((0L, "b b b a a c"), (1L, "a d")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(corpus, vocabSize = 2) // a=0 b=1
    val enc = TextAnalysis.encodeToIds(corpus, vocab, maxLen = 4, unkId = 2L)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq === Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 0L), // truncated at 4
      (1L, 0L, 0L), (1L, 1L, 2L)))                            // d is OOV
  }

  test("buildVocab+encodeToIds match a sequential reference on random corpora") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(12) + 1)(words(rnd.nextInt(words.size))).mkString(" ")))
    val df = corpus.toDF("doc_id", "text")
    val vocabSize = 5; val maxLen = 6
    val counts = corpus.flatMap(_._2.split(" "))
      .groupBy(identity).map { case (t, ts) => t -> ts.size }
    val refVocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(vocabSize).zipWithIndex
      .map { case ((t, _), i) => t -> i.toLong }.toMap
    val expected = corpus.flatMap { case (id, text) =>
      text.split(" ").take(maxLen).zipWithIndex.map { case (t, p) =>
        (id, p.toLong, refVocab.getOrElse(t, vocabSize.toLong))
      }
    }
    val got = TextAnalysis.encodeToIds(df,
        TextAnalysis.buildVocab(df, vocabSize), maxLen, vocabSize.toLong)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected.sortBy(e => (e._1, e._2)))
  }

  test("encodeToIds round-trips with the vocab: in-vocab tokens decode back") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val vocab = TextAnalysis.buildVocab(docs, vocabSize = 500)
    val enc = TextAnalysis.encodeToIds(docs, vocab, maxLen = 1000, unkId = 500L)
    // decode via the inverted vocab and compare against the raw tokens
    val decoded = enc.join(vocab.withColumnRenamed("tok", "back"),
        Seq("token_id"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("back"), lit("<unk>")).as("tok"))
    val raw = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val mismatches = decoded.join(raw, Seq("doc_id", "pos"))
      .filter(decoded("tok") =!= raw("tok") && decoded("tok") =!= "<unk>")
    assert(mismatches.isEmpty)
  }
}
