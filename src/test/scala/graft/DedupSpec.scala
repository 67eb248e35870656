package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dedup operator semantics on the sf0.001 fixture corpus. */
class DedupSpec extends SparkSpec {
  import SparkSpec.sf0001

  private lazy val docs = Tables.documents(spark, sf0001)

  test("hash dedup and text dedup agree on survivors and dup counts") {
    val byText = docs.groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")
    val byHash = Dedup.exactByHash(docs, col("text"), col("doc_id"))
      .select("doc_id", "dup_count")
    assert(byText.exceptAll(byHash).isEmpty && byHash.exceptAll(byText).isEmpty)
  }

  test("shingles: exact 3-gram sliding window, distinct") {
    val df = spark.createDataFrame(Seq((1L, "a b c d e"), (2L, "x y z"), (3L, "p q")))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) === Set("a b c", "b c d", "c d e"))
    assert(got(2L) === Set("x y z"))
    assert(got(3L) === Set.empty[String])
  }

  test("minhash-LSH finds the same high-similarity pairs as the exact inverted index") {
    // threshold 0.8 with 32 bands × 4 rows → candidate prob ≈ 1 for j≥0.8
    val exact = Dedup.jaccardNearDupPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact)
  }

  test("incremental LSH screening == the cross-side subset of the self-join path") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val inc = Dedup.minHashLshAgainstCorpus(even, odd, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: all-pairs run, restricted to one-even-one-odd pairs,
    // reoriented as (odd, even)
    val ref = Dedup.minHashLshPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, j) => if (a % 2 == 1) (a, b, j) else (b, a, j) }
      .toSet
    assert(ref.nonEmpty, "fixture should contain cross-side near-dups")
    assert(inc === ref)
  }

  test("banded incremental screening: parity with the recompute path; band " +
    "keys are computed over the BATCH only — never over the corpus scan") {
    import spark.implicits._
    val even = docs.filter(col("doc_id") % 2 === 0)
    // the batch arrives as an in-memory frame (a micro-batch), so the
    // plan-walk below can tell batch-side band-key work (over a
    // LocalRelation) from corpus-side re-shingling (over the parquet scan)
    val odd = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .toDF("doc_id", "text")
    // materialized band index — the persisted band stream a deployment
    // reads back, NOT live lineage over the corpus scan
    val evenBands = Dedup.minHashBandProjection(even)
      .as[(Long, Long)].collect().toSeq.toDF("doc_id", "band")
    val banded = Dedup.minHashLshAgainstCorpusBanded(even, evenBands, odd, 0.8)
    val ref = Dedup.minHashLshAgainstCorpus(even, odd, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = banded
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ref.nonEmpty && got === ref)
    // surplus band rows are benign: duplicates + bands of an unadmitted
    // doc (id 999 absent from the corpus text frame) change nothing
    val surplus = evenBands.union(evenBands)
      .union(evenBands.limit(5).withColumn("doc_id", lit(999L)))
    val gotSurplus = Dedup
      .minHashLshAgainstCorpusBanded(even, surplus, odd, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotSurplus === ref)
    // the amortization claim, as a plan property: in the banded plan, NO
    // node that computes minhash_band_keys sits over the corpus's parquet
    // relation — every band-key computation is batch-side. The recompute
    // path must trip the same detector (band keys over the corpus scan).
    def bandKeysOverParquet(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case node if node.expressions.exists(_.collectFirst {
            case e if e.prettyName.startsWith("minhash_band_keys") => ()
          }.nonEmpty) =>
          node.collectLeaves().exists(
            _.getClass.getSimpleName.contains("LogicalRelation"))
      }.exists(identity)
    assert(!bandKeysOverParquet(banded),
      banded.queryExecution.optimizedPlan.toString.take(1500))
    assert(bandKeysOverParquet(Dedup.minHashLshAgainstCorpus(even, odd, 0.8)))
    // ... and a capped banded screen still matches the capped recompute
    val cappedRef = Dedup.minHashLshAgainstCorpus(even, odd, 0.8,
        maxBandSize = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cappedGot = Dedup.minHashLshAgainstCorpusBanded(even, evenBands, odd,
        0.8, maxBandSize = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cappedGot === cappedRef)
  }

  test("df>1 pruning changes nothing: pruned == unpruned pair sets and jaccards") {
    val plain = Dedup.jaccardNearDupPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = Dedup.jaccardNearDupPairs(docs, 0.8, pruneSingletons = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain.nonEmpty)
    assert(pruned === plain)
  }

  test("overlapCoefficientPairs: a contained fragment scores 1.0 where " +
    "Jaccard is blind; overlap dominates jaccard on every pair") {
    val s = spark
    import s.implicits._
    // host: 24 words; fragment: its first 8 words → 6 shingles, all ⊂ host
    val host = (1 to 24).map(i => s"w$i").mkString(" ")
    val frag = (1 to 8).map(i => s"w$i").mkString(" ")
    val hand = Seq((1L, host), (2L, frag),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")).toDF("doc_id", "text")
    val ov = Dedup.overlapCoefficientPairs(hand, minOverlap = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ov.toSeq === Seq((1L, 2L, 1.0)))
    // jaccard = 6/22 ≈ 0.27 — the inclusion is invisible at any sane threshold
    assert(Dedup.jaccardNearDupPairs(hand, 0.8).isEmpty)
    // dominance on the fixture corpus: every jaccard-pair at t is an
    // overlap-pair at t (overlap >= jaccard pointwise)
    val jac = Dedup.jaccardNearDupPairs(docs, 0.8)
      .select("doc_a", "doc_b")
    val ovp = Dedup.overlapCoefficientPairs(docs, 0.8)
      .select("doc_a", "doc_b")
    assert(jac.exceptAll(ovp).isEmpty)
  }

  /** Sequential winnowing reference: per window of w shingle hashes,
    * pick the min (ties → rightmost), dedup. */
  private def seqWinnow(text: String, n: Int, w: Int): Set[(Long, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wd = text.split(" ")
    if (wd.length < n + w - 1) Set.empty
    else {
      val hs = (0 to wd.length - n).map(i => md5hex(wd.slice(i, i + n).mkString(" ")))
      (0 to hs.length - w).map { j =>
        val best = (j until j + w).minBy(p => (hs(p), -p))
        (best.toLong, hs(best))
      }.toSet
    }
  }

  test("winnowingFingerprints == sequential MOSS reference on the fixture") {
    val sub = docs.filter(col("doc_id") < 30)
    val got = Dedup.winnowingFingerprints(sub, n = 3, w = 4).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getString(2))).toSet }
    val texts = sub.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    texts.foreach { case (id, text) =>
      val exp = seqWinnow(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) === exp, s"doc $id")
    }
  }

  test("winnowing guarantee: a shared run of >= w+n-1 words shares a fingerprint") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w+n-1 words
    val hand = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"p q r s t u v $shared w x y z")).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(hand, n = 3, w = 4).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("hammingHex matches parseUnsignedLong popcount and stays codegen'd") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val hexes = Seq.fill(40)(f"${rnd.nextLong()}%016x") ++
      Seq("0", "f", "ffffffffffffffff", "8000000000000000", "00000000000000ff")
    val pairs = for (a <- hexes; b <- hexes) yield (a, b)
    val df = pairs.toDF("ha", "hb")
    val got = df.select(col("ha"), col("hb"),
        Dedup.hammingHex(col("ha"), col("hb")).as("d"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      val want = java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))
      assert(got((a, b)) === want.toLong, s"hamming($a,$b)")
    }
    // malformed fingerprints fail loudly (as the former UDF's parse did):
    // >16 digits would otherwise silently truncate, non-hex parse as 0
    for (badHex <- Seq("0123456789abcdef0", "zz00000000000000", "")) {
      val e = intercept[Exception] {
        Seq((badHex, "0")).toDF("ha", "hb")
          .select(Dedup.hammingHex(col("ha"), col("hb"))).collect()
      }
      assert(e.getMessage.contains("hammingHex"), e.getMessage)
    }
    // pure builtins: over a parquet-backed scan (literals would fold to a
    // LocalTableScan) the projection must sit inside a whole-stage-codegen
    // span with no ScalaUDF interpreter fallback
    val pdf = Dedup.simHash(docs)
      .select(Dedup.hammingHex(col("simhash"), reverse(col("simhash"))).as("d"))
    pdf.collect() // finalize AQE so codegen spans appear in the plan string
    val p = pdf.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project") || p.contains("*(2) Project"), p.take(800))
    assert(!p.contains("UDF"), p.take(800))
  }

  test("simhash: near-dup pairs are close in hamming distance, random pairs far") {
    val sh = Dedup.simHash(docs).select("doc_id", "simhash")
    val pairs = Dedup.jaccardNearDupPairs(docs, 0.8).select("doc_a", "doc_b")
    val near = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
      .select(Dedup.hammingHex(col("ha"), col("hb")).as("d"))
      .collect().map(_.getLong(0))
    assert(near.nonEmpty && near.forall(_ <= 16), near.mkString(","))
    // random (non-near) pairs: expect ~32 bit flips on average
    val rand = sh.limit(20).collect().map(_.getString(1))
    val dists = for (a <- rand; b <- rand if a < b)
      yield java.lang.Long.bitCount(java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))
    assert(dists.nonEmpty && dists.sum.toDouble / dists.length > 16.0)
  }

  test("simHashMd5: duplicates collide exactly; near-dups land close in " +
    "hamming, random pairs far; 60-bit range") {
    val sh = Dedup.simHashMd5(docs).select("doc_id", "simhash60")
    val fps = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // non-negative 60-bit fingerprints (15 md5 hex chars, no sign bit)
    assert(fps.values.forall(f => f >= 0L && f < (1L << 60)))
    // identical text ⇒ identical fingerprint (pure function of content):
    // a planted exact copy under a fresh id collides bit-for-bit
    val planted = docs.select(col("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") === 0L)
        .select(lit(900000L).as("doc_id"), col("text")))
    val pf = Dedup.simHashMd5(planted).filter(col("doc_id").isin(0L, 900000L))
      .select("simhash60").collect().map(_.getLong(0))
    assert(pf.length === 2 && pf(0) === pf(1))
    // near-dups at jaccard ≥ 0.8 stay within 16 of 60 bits; random pairs
    // average above 20 flips
    val near = Dedup.jaccardNearDupPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => java.lang.Long.bitCount(fps(r.getLong(0)) ^ fps(r.getLong(1))))
    assert(near.nonEmpty && near.forall(_ <= 16), near.mkString(","))
    val rand = fps.toSeq.sortBy(_._1).take(20).map(_._2)
    val dists = for (a <- rand; b <- rand if a < b)
      yield java.lang.Long.bitCount(a ^ b)
    assert(dists.sum.toDouble / dists.length > 20.0)
  }

  test("simHashMd5NearDupPairs equals the brute-force quadratic confirm") {
    // planted exact copy (hamming 0) guarantees a nonempty result
    val corpus = docs.select(col("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") < 3)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val got = Dedup.simHashMd5NearDupPairs(corpus, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps = Dedup.simHashMd5(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(got.nonEmpty && got === brute)
    assert(got.exists { case (a, b, d) => b - a === 900000L && d === 0L })
    // no cartesian: candidates must come from the band-bucket equi-join
    val plan = Dedup.simHashMd5NearDupPairs(corpus, maxHamming = 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan.take(600))
  }

  test("hamming64Pairs hot-bucket cap: no-op on a cold fixture, prunes a " +
    "planted hot band group, keeps cold pairs") {
    // cold corpus: no (band, bits) bucket anywhere near the default cap,
    // so capped and uncapped pair sets are identical
    val corpus = docs.select(col("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") < 3)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    def pairs(cap: Int) =
      Dedup.simHashMd5NearDupPairs(corpus, maxHamming = 6, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = pairs(0)
    assert(uncapped.nonEmpty && pairs(Dedup.DefaultHotKeyCap) === uncapped)
    // hot fixture: 40 byte-identical docs share one fingerprint, so every
    // band bucket it touches holds ≥ 40 members; cap 16 drops them all —
    // zero intra-group pairs survive — while the cold planted copy pair
    // (two docs, bucket size ~2) is untouched
    val hot = docs.filter(col("doc_id") < 40)
      .select((col("doc_id") + 800000L).as("doc_id"),
        lit("graft hot boilerplate navigation footer graft hot " +
          "boilerplate navigation footer").as("text"))
    val withHot = corpus.union(hot)
    val capped = Dedup.simHashMd5NearDupPairs(withHot, maxHamming = 6,
        maxBucketSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(!capped.exists { case (a, b, _) => a >= 800000L && b < 900000L },
      "hot-group pairs must be pruned by the bucket cap")
    assert(Dedup.simHashMd5NearDupPairs(withHot, maxHamming = 6,
        maxBucketSize = 0)
      .filter(col("doc_a") >= 800000L && col("doc_b") < 900000L)
      .count() === 40L * 39 / 2, "uncapped run must see all hot pairs")
    assert(capped.filter(t => t._1 < 800000L) === uncapped,
      "cold pairs must survive the cap unchanged")
  }

  test("removeBoilerplateLines: heavy lines cut everywhere, order kept, " +
    "all-boilerplate docs vanish") {
    import spark.implicits._
    val footer = "all rights reserved"
    val in = ((1L to 5L).map(i => (i, s"unique body $i\n$footer\nmore $i")) :+
      (6L, footer) :+                         // only boilerplate: disappears
      (7L, s"$footer\nkeep head\n$footer"))   // both copies cut, middle kept
      .toDF("doc_id", "text")
    val got = Dedup.removeBoilerplateLines(in, minRepeats = 5)
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._1) === (1L to 5L) :+ 7L)     // doc 6 gone
    assert(got.head === ((1L, 2L, "unique body 1\nmore 1")))
    assert(got.last === ((7L, 1L, "keep head")))
    assert(got.forall(!_._3.contains(footer)))
    intercept[IllegalArgumentException] {
      Dedup.removeBoilerplateLines(in, minRepeats = 1)
    }
  }

  test("scrubSharedNgramSpans: union coverage on overlapping shared " +
    "spans, exact dups scrub to empty, unique and short docs untouched") {
    import spark.implicits._
    // docs 1+2 share the 6-token run "a b c d e f": its two 5-grams
    // overlap, so coverage is the 6-token UNION (never 10); tails differ
    val in = Seq(
      (1L, "a b c d e f tail one x"),
      (2L, "a b c d e f other end y"),
      (3L, "exact duplicate body of five tokens"),
      (4L, "exact duplicate body of five tokens"),
      (5L, "wholly unique text with six words"),
      (6L, "too short")).toDF("doc_id", "text")
    val got = Dedup.scrubSharedNgramSpans(in, n = 5, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((1L, 9L, 6L, "tail one x")))
    assert(got(1) === ((2L, 9L, 6L, "other end y")))
    assert(got(2) === ((3L, 6L, 6L, "")))
    assert(got(3) === ((4L, 6L, 6L, "")))
    assert(got(4) === ((5L, 6L, 0L, "wholly unique text with six words")))
    assert(got(5) === ((6L, 2L, 0L, "too short")))
    intercept[IllegalArgumentException] {
      Dedup.scrubSharedNgramSpans(in, minDf = 1)
    }
    // materialize-once parity: the From variant over a pre-built
    // gram-position frame equals the composed form
    val from = Dedup.scrubSharedNgramSpansFrom(in,
        Dedup.ngramPositionHashes(in, 5), n = 5, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(from === got)
  }

  test("crossSourceDupMatrix: shared distinct contents, ordered pairs, " +
    "within-source dups not double counted") {
    import spark.implicits._
    val in = Seq(
      ("a", "shared one"), ("a", "shared one"),   // within-source dup: 1 hash
      ("a", "only a"), ("b", "shared one"),
      ("b", "shared two"), ("c", "shared two"), ("c", "only c"))
      .toDF("source", "text")
    val got = Dedup.crossSourceDupMatrix(in)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 1L), ("b", "c", 1L)))
  }

  test("corpusDiff: added/removed/retained on hand-built snapshots") {
    import spark.implicits._
    val old = Seq("keep", "gone", "gone", "edit me").toDF("text")
    val neu = Seq("keep", "edit me v2", "brand new").toDF("text")
    val got = Dedup.corpusDiff(old, neu).collect().head
    // old hashes: {keep, gone, edit me}; new: {keep, edit me v2, brand new}
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((2L, 2L, 1L)))
  }

  test("ngramNovelty: empty new corpus reads (0, 0, 0), not nulls") {
    import spark.implicits._
    val old = Seq("a b c").toDF("text")
    val neu = Seq.empty[String].toDF("text")
    val got = Dedup.ngramNovelty(old, neu, n = 2).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((0L, 0L, 0L)))
  }

  test("dupRateBySource: null-text docs stay in the denominator") {
    import spark.implicits._
    val in = Seq(("a", Some("x")), ("a", Some("x")), ("a", None))
      .toDF("source", "text")
    val got = Dedup.dupRateBySource(in).collect().head
    // 3 docs, 2 dups, floor(2e6/3) — the null doc counted, not dropped
    assert((got.getString(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === (("a", 3L, 2L, 666666L)))
  }

  test("ngramNovelty: hand-built snapshots at n=2") {
    import spark.implicits._
    // old grams: {a b, b c}; new grams: {a b, b x} -> 1 of 2 novel
    val old = Seq("a b c").toDF("text")
    val neu = Seq("a b x").toDF("text")
    val got = Dedup.ngramNovelty(old, neu, n = 2).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((2L, 1L, 500000L)))
  }

  test("crossSourceNgramContainment: directional ratios on planted overlap") {
    import spark.implicits._
    // a: grams {p q, q r}; b: grams {p q, q z, z w} -> shared {p q}
    // containment a->b = 1/2, b->a = 1/3
    val in = Seq(("a", "p q r"), ("b", "p q z w")).toDF("source", "text")
    val got = Dedup.crossSourceNgramContainment(in, n = 2)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 1L, 2L, 500000L),
      ("b", "a", 1L, 3L, 333333L)))
  }

  test("crossSourceNgramContainmentFrom: parity with the composed form " +
    "over a materialized gram set") {
    import spark.implicits._
    val in = Seq(("a", "p q r"), ("b", "p q z w")).toDF("source", "text")
    val composed = Dedup.crossSourceNgramContainment(in, n = 2)
      .orderBy("source_a", "source_b").collect().toSeq
    val grams = Dedup.sourceNgramSets(in, n = 2)
    val from = Dedup.crossSourceNgramContainmentFrom(grams)
      .orderBy("source_a", "source_b").collect().toSeq
    assert(from === composed)
  }

  test("groupMinHashMd5: lattice property — a group's signature is the " +
    "elementwise min of its members' signatures") {
    val byDoc = Dedup.groupMinHashMd5(
      docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    val expect = byDoc.withColumn("g", col("doc_id") % 3)
      .groupBy("g", "hash_idx").agg(min("minhash").as("minhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Dedup.groupMinHashMd5(
        docs.withColumn("g", col("doc_id") % 3), Seq("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === expect)
    // 16 entries per group, all in the 60-bit range
    val sizes = got.groupBy(_._1).values.map(_.size).toSet
    assert(sizes === Set(16))
    assert(got.forall(t => t._3 >= 0L && t._3 < (1L << 60)))
  }

  test("simHashNearDupPairs: complete for hamming ≤ 3, nothing above threshold") {
    val got = graft.ops.Dedup.simHashNearDupPairs(docs, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.values.forall(_ <= 3))
    // expected: brute-force hamming over all fingerprint pairs
    val fps = graft.ops.Dedup.simHash(docs).collect()
      .map(r => r.getLong(0) -> java.lang.Long.parseUnsignedLong(r.getString(1), 16))
    val expected = (for {
      (ia, ha) <- fps; (ib, hb) <- fps if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib) -> d.toLong).toMap
    assert(got === expected) // pigeonhole: 4×16-bit bands cover hamming ≤ 3
  }

  test("fnv1a64 and mix64 are deterministic and dispersive") {
    assert(Dedup.fnv1a64("abc") === Dedup.fnv1a64("abc"))
    assert(Dedup.fnv1a64("abc") !== Dedup.fnv1a64("abd"))
    val hashes = (1 to 1000).map(i => Dedup.mix64(i.toLong))
    assert(hashes.distinct.size === 1000)
  }

  test("stop-shingle cap: boilerplate-only pairs vanish, kept-set jaccard " +
    "is exact, huge caps reproduce the uncapped result") {
    import spark.implicits._
    // docs 1-4 share ONLY the boilerplate shingle "the same footer";
    // docs 5,6 additionally share two rare shingles
    val corpus = Seq(
      (1L, "alpha beta gamma the same footer"),
      (2L, "delta epsilon zeta the same footer"),
      (3L, "eta theta iota the same footer"),
      (4L, "kappa lambda mu the same footer"),
      (5L, "red green blue sky the same footer"),
      (6L, "red green blue sea the same footer")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardNearDupPairs(corpus, minJaccard = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate links every pair of the 6 docs
    assert(uncapped.size === 15)
    val capped = Dedup.jaccardNearDupPairs(corpus, minJaccard = 0.01,
      maxShingleDf = 3)
    val got = capped.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // only 5-6 survive: their rare shared shingles ("red green blue",
    // "green blue sky|sea"-adjacent grams). Kept sets after dropping the
    // df=6 boilerplate grams: doc5/doc6 keep their non-boilerplate
    // shingles; shared kept = {"red green blue"} plus any other df≤3 gram
    assert(got.keySet === Set((5L, 6L)))
    // exact kept-set jaccard: compute from first principles
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = corpus.collect().map(r => r.getLong(0) -> sh(r.getString(1))).toMap
    val df_ = all.values.flatten.groupBy(identity).view.mapValues(_.size)
    val kept = all.map { case (id, s) => id -> s.filter(g => df_(g) <= 3) }
    val inter = (kept(5L) & kept(6L)).size.toDouble
    val expected = inter / (kept(5L).size + kept(6L).size - inter)
    assert(math.abs(got((5L, 6L)) - expected) < 5e-4)
    // a cap nothing exceeds is a no-op: pair set == uncapped (jaccard
    // values too — sizes fall back to the full sets)
    val loose = Dedup.jaccardNearDupPairs(corpus, minJaccard = 0.01,
        maxShingleDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === uncapped)
    // composes with singleton pruning (lossless on the same cap)
    val both = Dedup.jaccardNearDupPairs(corpus, minJaccard = 0.01,
        maxShingleDf = 3, pruneSingletons = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(both === got)
  }

  test("normalize-then-dedup collapses reformatted variants exact dedup misses") {
    val s2 = spark
    import s2.implicits._
    val variants = Seq(
      (1L, "Hello, World! This is   a Test."),
      (2L, "hello world this is a test"),     // same after normalization
      (3L, "HELLO WORLD — this is a test!!"), // em-dash strips, ws collapses
      (4L, "a genuinely different document"))
      .toDF("doc_id", "text")
    // exact dedup sees 4 distinct texts; normalized sees 2
    assert(Dedup.exactByHash(variants, col("text"), col("doc_id")).count() === 4)
    val got = Dedup.exactDedupNormalized(variants, col("text"), col("doc_id"))
      .select("doc_id", "dup_count").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 3L), (4L, 1L)))
    // the normalizer itself: RE2-and-Java-common regex chain, idempotent
    val norm = variants.select(Dedup.normalizeForDedup(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(norm(0) === "hello world this is a test")
    assert(norm(2) === "hello world this is a test")
    val renorm = variants.select(
      Dedup.normalizeForDedup(Dedup.normalizeForDedup(col("text"))).as("n"))
      .collect().map(_.getString(0))
    assert(renorm.toSeq === norm.toSeq)
    // engine-parity edges: vertical tab is NOT whitespace (stripped, not
    // collapsed — Java \s vs RE2 \s disagree on it, so the explicit
    // class leaves it out), and Greek final sigma folds to σ (Java's
    // contextual Σ→ς lowering vs utf8proc's plain σ)
    val edges = Seq((10L, "foo\u000bbar"), (11L, "ΟΔΥΣΣΕΥΣ"))
      .toDF("doc_id", "text")
      .select(Dedup.normalizeForDedup(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(edges(0) === "foobar")
    assert(edges(1) === "οδυσσευσ" && !edges(1).contains('ς'))
  }

  test("incremental dedup composes with normalization: a reformatted " +
    "corpus duplicate is caught, genuinely-new text passes") {
    val s2 = spark
    import s2.implicits._
    val corpus = Seq((1L, "Hello, World! This is   a Test."),
      (2L, "another corpus document entirely"))
      .toDF("doc_id", "text")
    val corpusHashes = Dedup.exactDedupNormalized(
      corpus, col("text"), col("doc_id")).select("content_hash")
    val batch = Seq((10L, "hello world this is a test"), // reformatted dup of 1
      (11L, "a brand new never seen document"))
      .toDF("doc_id", "text")
    val survivors = Dedup.dedupAgainstCorpus(batch, corpusHashes,
        expectedItems = 2, textKey = Dedup.normalizeForDedup(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(11L))
    // raw-text keying (the default) would have missed the reformatted dup
    val rawCorpus = Dedup.exactByHash(corpus, col("text"), col("doc_id"))
      .select("content_hash")
    val rawSurvivors = Dedup.dedupAgainstCorpus(batch, rawCorpus,
        expectedItems = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rawSurvivors === Set(10L, 11L))
  }

  test("maxBandSize bounds LSH candidate growth under 10x duplication; " +
    "a cap nothing exceeds is a no-op") {
    import spark.implicits._
    val base = docs.limit(30).collect().map(r => (r.getLong(0), r.getString(1)))
    def dupN(times: Int) = spark.createDataFrame(
      (0 until times).flatMap(k =>
        base.map { case (id, t) => (id * 1000 + k, t) })).toDF("doc_id", "text")
    val tenOff = Dedup.minHashBandCandidates(dupN(10), 3, 0).count()
    val tenOn = Dedup.minHashBandCandidates(dupN(10), 3, 5).count()
    // uncapped: each base doc's 10 exact copies collide on EVERY band →
    // ≥ C(10,2)=45 candidate pairs per base doc. The quadratic bomb.
    assert(tenOff >= 45L * base.length)
    // capped at 5: every copy-group bucket has df=10 > cap and is dropped,
    // so candidate volume collapses instead of growing quadratically. (The
    // pairs lost here are exact duplicates — the documented defense pairing
    // is exact-collapse first [nearDupClustersCollapsed], cap second.)
    assert(tenOn < tenOff / 10,
      s"cap should kill the blowup: capped=$tenOn uncapped=$tenOff")
    // a cap nothing exceeds is a no-op on pair set AND jaccard values
    val plain = Dedup.minHashLshPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val loose = Dedup.minHashLshPairs(docs, 0.8, maxBandSize = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain.nonEmpty && loose === plain)
    // incremental path: loose corpus-side cap is likewise a no-op
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val incPlain = Dedup.minHashLshAgainstCorpus(even, odd, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incLoose = Dedup.minHashLshAgainstCorpus(even, odd, 0.8,
        maxBandSize = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incLoose === incPlain)
  }

  test("cluster entry points cap hot bands BY DEFAULT; the default is a " +
    "no-op on the fixture corpus") {
    import spark.implicits._
    // 300 copies of one text: every copy collides on EVERY band, all
    // band buckets have df=300 > DefaultHotKeyCap=256
    val bomb = (0 until 300)
      .map(i => (i.toLong, "the same boilerplate text repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minHashBandCandidates(bomb, 3, 0).count()
    val defCap = Dedup.minHashBandCandidates(bomb, 3, Dedup.DefaultHotKeyCap).count()
    assert(uncapped === 300L * 299 / 2)
    assert(defCap === 0L, s"default cap should drop all df=300 buckets, got $defCap")
    // the DEFAULT entry point (no cap arg) completes without the d² pair
    // stage — the bomb clusters are lost to the cap (documented lossy;
    // exact copies are nearDupClustersCollapsed's job, which still finds
    // them via the collapse, cap notwithstanding)
    assert(Dedup.nearDupClusters(bomb).isEmpty)
    val colBomb = Dedup.nearDupClustersCollapsed(bomb)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(colBomb.length === 300 && colBomb.forall(_._2 === 0L))
    // on the real fixture no band bucket is anywhere near 256 deep, so
    // the default cap changes NOTHING vs explicit off — the property the
    // oracle queries rely on
    val defaulted = Dedup.nearDupClusters(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val off = Dedup.nearDupClusters(docs, 0.8, maxBandSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaulted.nonEmpty && defaulted === off)
  }

  test("collapsed clustering == uncollapsed on the fixture; exact copies " +
    "of shingle-less texts still cluster; star edges never elect a fake " +
    "canonical") {
    val full = Dedup.nearDupClusters(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val collapsed = Dedup.nearDupClustersCollapsed(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty && collapsed === full)
    // shingle-less exact dupes: invisible to the shingle path, clustered
    // by the collapse (exact duplicates are near-duplicates by definition)
    import spark.implicits._
    val shorts = Seq((10L, "too short"), (11L, "too short"),
      (12L, "also tiny")).toDF("doc_id", "text")
    val fullShort = Dedup.nearDupClusters(shorts, 0.8).collect()
    assert(fullShort.isEmpty)
    val colShort = Dedup.nearDupClustersCollapsed(shorts, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(colShort === Set((10L, 10L), (11L, 10L)))
  }
}
