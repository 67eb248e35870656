package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Round-16 optimization parity battery: every fused native kernel that
  * replaced an expression-chain form must compute the IDENTICAL value on
  * a corpus that exercises the edge shapes (unicode, empty tokens from
  * repeated spaces, under-n docs, gate-share boundaries). The reference
  * chains are rebuilt here verbatim from the pre-r16 operator bodies, so
  * a silent semantic drift in the kernels fails loudly. */
class NativeKernelParitySpec extends SparkSpec {
  import graft.functions.{Md5ShingleFunctions, ShingleFunctions, ScriptGateFunctions}

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b c a b c a b c"),                  // heavy in-doc repeats
      (3L, "one two"),                            // under n=3
      (4L, ""),                                   // empty text -> [""]
      (5L, "x"),                                  // single token
      (6L, "café über łódź 東京 données café über łódź 東京 données"),
      (7L, "a  b   c a  b"),                      // runs of spaces -> empty tokens
      (8L, "w w w w w w w w w w w w"),            // one token repeated
      (9L, "alpha beta gamma delta alpha beta gamma delta epsilon"),
      (10L, "tab\tand newline\nstay intact words words tab\tand")
    ).toDF("doc_id", "text")
  }

  private def md5Prefix60Ref(sg: org.apache.spark.sql.Column) =
    graft.functions.Md5Functions.md5Prefix60(sg)

  test("md5_shingle_pos_hashes == transform/concat_ws/md5_prefix60 chain") {
    for (n <- Seq(2, 3, 5)) {
      val wd = split(col("text"), " ")
      val native = docs.select(col("doc_id"), wd.as("wd"))
        .filter(size(col("wd")) >= n)
        .select(col("doc_id"), posexplode(
          Md5ShingleFunctions.md5ShinglePosHashes(col("wd"), n)).as(Seq("pos", "h")))
      val chain = docs.select(col("doc_id"), wd.as("wd"))
        .filter(size(col("wd")) >= n)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("wd")) - n),
          i => concat_ws(" ", slice(col("wd"), i + 1, lit(n))))))
        .select(col("doc_id"), col("pos"), md5Prefix60Ref(col("col")).as("h"))
      assert(native.except(chain).isEmpty && chain.except(native).isEmpty,
        s"positional md5 shingle mismatch at n=$n")
      assert(native.count() == chain.count(), s"cardinality mismatch at n=$n")
    }
  }

  test("md5_shingle_hashes == explode(array_distinct)/md5_prefix60 chain") {
    for (n <- Seq(2, 3, 5)) {
      val wd = split(col("text"), " ")
      val native = docs.select(col("doc_id"), wd.as("wd"))
        .filter(size(col("wd")) >= n)
        .select(col("doc_id"), explode(
          Md5ShingleFunctions.md5ShingleHashes(col("wd"), n)).as("h"))
      val chain = docs.select(col("doc_id"), wd.as("wd"))
        .filter(size(col("wd")) >= n)
        .select(col("doc_id"),
          explode(array_distinct(transform(sequence(lit(0), size(col("wd")) - n),
            i => concat_ws(" ", slice(col("wd"), i + 1, lit(n)))))).as("sg"))
        .select(col("doc_id"), md5Prefix60Ref(col("sg")).as("h"))
      assert(native.except(chain).isEmpty && chain.except(native).isEmpty,
        s"distinct md5 shingle mismatch at n=$n")
      assert(native.count() == chain.count(),
        s"distinct cardinality mismatch at n=$n (first-occurrence dedup)")
    }
  }

  test("dup_ngram_stats == exploded position-union pipeline") {
    for (n <- Seq(2, 3, 5)) {
      val toksCol = split(col("text"), " ")
      val toks = docs.select(col("doc_id"),
        posexplode(toksCol).as(Seq("tpos", "tok")))
      // the pre-r16 pipeline, string-gram-keyed (reference semantics)
      val m = greatest(size(toksCol) - (n - 1), lit(0))
      val gramsCol = (1 until n).foldLeft(slice(toksCol, lit(1), m)) { (acc, j) =>
        zip_with(acc, slice(toksCol, lit(1 + j), m), (a, b) => concat_ws(" ", a, b))
      }
      val grams = docs.select(col("doc_id"),
        posexplode(gramsCol).as(Seq("gpos", "gram")))
      val dupPos = grams.groupBy("doc_id", "gram")
        .agg(count(lit(1)).as("c"), collect_list(col("gpos")).as("ps"))
        .filter(col("c") >= 2)
        .select(col("doc_id"), explode(col("ps")).as("gpos"))
      val covered = dupPos.select(col("doc_id"),
          explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("tpos"))
        .distinct()
      val covChars = covered.join(toks, Seq("doc_id", "tpos"))
        .groupBy("doc_id").agg(sum(length(col("tok"))).as("cov"))
      val expected = toks.groupBy("doc_id")
        .agg(sum(length(col("tok"))).as("tot"))
        .join(covChars, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cov"), lit(0L)).as("cov"), col("tot"))
      val native = docs.select(col("doc_id"),
          ShingleFunctions.dupNgramStats(toksCol, n).as("st"))
        .select(col("doc_id"), element_at(col("st"), 1).as("cov"),
          element_at(col("st"), 2).as("tot"))
      assert(native.except(expected).isEmpty && expected.except(native).isEmpty,
        s"dup-ngram stats mismatch at n=$n")
    }
  }

  test("md5_minhash == the k exploded md5_prefix60(i|gram) min-columns") {
    val k = 16
    for (n <- Seq(2, 3)) {
      val wd = split(col("text"), " ")
      val toked = docs.select(col("doc_id"), wd.as("wd"))
        .filter(size(col("wd")) >= n)
      val ex = toked.select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("wd")) - n),
          i => concat_ws(" ", slice(col("wd"), i + 1, lit(n))))).as("sg"))
      val hashed = ex.select(Seq(col("doc_id")) ++ (0 until k).map(i =>
        md5Prefix60Ref(concat_ws("|", lit(i), col("sg"))).as(s"h$i")): _*)
      val chain = hashed.groupBy("doc_id")
        .agg((0 until k).map(i => min(col(s"h$i")).as(s"m$i")).head,
          (0 until k).map(i => min(col(s"h$i")).as(s"m$i")).tail: _*)
      val native = toked.select(col("doc_id"),
          Md5ShingleFunctions.md5MinHashK(col("wd"), n, k).as("sig"))
        .select(Seq(col("doc_id")) ++ (0 until k).map(i =>
          element_at(col("sig"), i + 1).as(s"m$i")): _*)
      assert(native.except(chain).isEmpty && chain.except(native).isEmpty,
        s"md5 minhash mismatch at n=$n")
    }
  }

  test("trigram_lang_best == explode/broadcast-join/argmax chain") {
    import spark.implicits._
    val texts = docs.select("doc_id", "text").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ++ Seq(
      (100L, "the theatre there is then that these"),
      (101L, "der die das und ist nicht"),
      (102L, "no hits here zz qq xx"),
      (103L, ""),
      (104L, "le la les des une est dans"))
    val df = texts.toDF("doc_id", "text")
    val sExpr = concat(lit(" "),
      trim(regexp_replace(lower(col("text")), "\\s+", " ")), lit(" "))
    val norm = df.select(col("doc_id"), sExpr.as("graft_s"))
    val chain = norm.select(col("doc_id"),
        explode(graft.functions.CharNgramFunctions.charTrigrams(col("graft_s")))
          .as("trigram"))
      .join(broadcast(TextAnalysis.trigramProfiles(spark)), Seq("trigram"))
      .groupBy("doc_id", "lang").agg(sum("w").as("w"))
      .groupBy("doc_id")
      .agg(max(struct(col("w"), col("lang"))).as("b"))
      .select(col("doc_id"), col("b.w").as("w"), col("b.lang").as("lang"))
    val native = norm.select(col("doc_id"),
        graft.functions.TrigramLangFunctions.trigramLangBest(col("graft_s"))
          .as("b"))
      .filter(col("b").isNotNull)
      .select(col("doc_id"), col("b.w").as("w"), col("b.lang").as("lang"))
    assert(native.except(chain).isEmpty && chain.except(native).isEmpty,
      "trigram lang argmax mismatch")
    assert(native.count() == chain.count(), "hit-doc cardinality mismatch")
  }

  test("script_gate_lang == the rlike/regexp_replace gate chain") {
    import spark.implicits._
    val texts = Seq(
      "これは日本語のテキストです",                      // ja gate
      "これは kanji 漢字 mixed latin text with one ほ",   // mixed, share decides
      "한국어 텍스트입니다 완전히",                        // ko
      "中文文本没有假名只有汉字",                          // zh (no kana)
      "русский текст для проверки",                       // ru
      "ελληνικό κείμενο εδώ",                             // el
      "نص عربي للاختبار",                                 // ar
      "טקסט בעברית לבדיקה",                               // he
      "हिन्दी पाठ परीक्षण के लिए",                          // hi
      "ข้อความภาษาไทยสำหรับทดสอบ",                        // th
      "plain latin text with a single greek π letter inside a long doc",
      "x π",                                              // short: share clears
      "", " ", "a",
      "日本語と한국어の混在テキスト",                       // two gated scripts
      "math uses σ and Σ sometimes but prose stays latin here okay")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val gateConds = TextAnalysis.scriptGateConds(col("text"))
    val chain = gateConds.foldRight(lit(null).cast("string")) {
      case ((lang, cond), other) => when(cond, lit(lang)).otherwise(other)
    }
    val native = ScriptGateFunctions.scriptGateLang(col("text"),
      TextAnalysis.ScriptGateMinShareMicros)
    val bad = df.select(col("doc_id"), chain.as("want"), native.as("got"))
      .filter(!(col("want") <=> col("got")))
      .collect()
    assert(bad.isEmpty, s"gate mismatch: ${bad.mkString(", ")}")
  }

  /** Reuse materializes only at RUNTIME (AQE stage cache) — the plan
    * must come from the EXECUTED QueryExecution (a `.write` would build
    * a fresh, never-adapted one). Walk into query stages (leaf wrappers
    * whose materialized plan is not a child). */
  private def countReused(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    var c = 0
    p.foreach {
      case _: ReusedExchangeExec => c += 1
      case a: AdaptiveSparkPlanExec => c += countReused(a.executedPlan)
      case q: QueryStageExec => c += countReused(q.plan)
      case _ => ()
    }
    c
  }

  test("near-dup pair candidate stages reuse ONE fingerprint exchange " +
      "(runtime plan)") {
    import spark.implicits._
    val corpus = (0L until 60L).map(i =>
        (i, s"tok${i % 7} alpha beta gamma delta tok${i % 5} epsilon zeta"))
      .toDF("doc_id", "text")
    // projection-built fingerprint (no aggregate below it): without the
    // shared repartition every branch would recompute it
    val simPairs = Dedup.simHashNearDupPairs(corpus, maxHamming = 3,
      maxBucketSize = 16)
    simPairs.collect()
    assert(countReused(simPairs.queryExecution.executedPlan) >= 1,
      "simHashNearDupPairs: fingerprint exchange not reused — every band " +
        "branch recomputes the per-doc fingerprint")
    // md5 path: the fingerprint aggregate's own exchange is the reuse
    // point (the explicit repartition is optimizer-eliminated there)
    val md5Pairs = Dedup.simHashMd5NearDupPairs(corpus, maxHamming = 6,
      maxBucketSize = 16)
    md5Pairs.collect()
    assert(countReused(md5Pairs.queryExecution.executedPlan) >= 1,
      "simHashMd5NearDupPairs: fingerprint exchange not reused")
    // MinHash band candidates (128-perm signatures in a projection)
    val mhPairs = Dedup.minHashLshPairs(corpus, minJaccard = 0.2)
    mhPairs.collect()
    assert(countReused(mhPairs.queryExecution.executedPlan) >= 1,
      "minHashLshPairs: banded-signature exchange not reused")
  }
}
