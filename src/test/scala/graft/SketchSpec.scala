package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Sketch-backed scale operators: Bloom-prefiltered incremental dedup,
  * count-min heavy hitters, approx quantiles. */
class SketchSpec extends SparkSpec {
  import SparkSpec.sf0001

  test("dedupAgainstCorpus == exact anti-join (bloom false positives resolved)") {
    val docs = Tables.documents(spark, sf0001)
    // corpus = first 300 docs' hashes; new batch = all docs (so 300 dups)
    val corpusHashes = docs.filter(col("doc_id") < 300)
      .select(graft.functions.GraftFunctions.blake2b_256(col("text")).as("content_hash"))
    val got = Dedup.dedupAgainstCorpus(docs, corpusHashes, expectedItems = 1000)
    val expected = docs
      .withColumn("content_hash", graft.functions.GraftFunctions.blake2b_256(col("text")))
      .join(corpusHashes, Seq("content_hash"), "left_anti")
    assert(got.count() === expected.count())
    assert(got.select("doc_id").exceptAll(expected.select("doc_id")).isEmpty)
  }

  test("dedupAgainstCorpus clamps oversized expectedItems to the session caps") {
    val docs = Tables.documents(spark, sf0001)
    val corpusHashes = docs.filter(col("doc_id") < 100)
      .select(graft.functions.GraftFunctions.blake2b_256(col("text")).as("content_hash"))
    // far above spark.sql.optimizer.runtime.bloomFilter.maxNumItems (4M):
    // unclamped this fails BloomFilterAggregate's analysis check; clamped
    // it only raises fpp, and the exact anti-join confirm keeps the
    // result identical
    val got = Dedup.dedupAgainstCorpus(docs, corpusHashes, expectedItems = 100000000L)
    val expected = docs
      .withColumn("content_hash", graft.functions.GraftFunctions.blake2b_256(col("text")))
      .join(corpusHashes, Seq("content_hash"), "left_anti")
    assert(got.count() === expected.count())
  }

  test("dedupAgainstCorpus with empty corpus keeps everything") {
    val docs = Tables.documents(spark, sf0001)
    val empty = docs.filter(lit(false))
      .select(lit("").as("content_hash"))
    val got = Dedup.dedupAgainstCorpus(docs, empty, expectedItems = 10)
    assert(got.count() === docs.count())
  }

  test("heavyHitters matches exact frequency filter") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.heavyHitters(docs, minShare = 0.03)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.count()
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= (total * 0.03).toLong)
      .orderBy(col("n").desc, col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === exact.toSeq)
    assert(got.nonEmpty) // 31-word vocab → plenty of heavy tokens
  }

  test("heavyHitters probe is the native expression, not a ScalaUDF") {
    val docs = Tables.documents(spark, sf0001)
    val p = TextAnalysis.heavyHitters(docs, minShare = 0.03)
      .queryExecution.executedPlan.toString
    assert(p.contains("count_min_estimate"), p.take(1500))
    assert(!p.contains("UDF"), p.take(1500))
  }

  test("MisraGriesAgg: every token with count > n/(k+1) survives; estimates " +
    "underestimate by at most n/(k+1), under adversarial repartitioning") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 8 // small k so the guarantee threshold n/9 actually bites
    val agg = org.apache.spark.sql.functions.udaf(graft.ops.MisraGriesAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    // vary the merge tree: different partitionings must all honor the bound
    Seq(toks, toks.repartition(3), toks.repartition(29)).foreach { t =>
      val summary = t.agg(agg(col("tok")).as("mg")).head()
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(summary.size <= k)
      exact.foreach { case (tok, c) =>
        if (c > n / (k + 1)) {
          assert(summary.contains(tok), s"guaranteed hitter $tok ($c) missing")
          val est = summary(tok)
          assert(est <= c && c - est <= n / (k + 1),
            s"$tok est=$est true=$c n/(k+1)=${n / (k + 1)}")
        }
      }
    }
  }

  test("MisraGriesAgg as a streaming aggregate: guarantee holds across batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[String]
    val agg = org.apache.spark.sql.functions.udaf(graft.ops.MisraGriesAgg(4),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val q = mem.toDF().toDF("tok")
      .groupBy().agg(agg(col("tok")).as("mg"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      val batch1 = Seq.fill(30)("hot") ++ (1 to 10).map(i => s"t$i")
      val batch2 = Seq.fill(25)("warm") ++ (11 to 20).map(i => s"t$i")
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val summary = s.table("mg_stream").head()
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = batch1.size + batch2.size // 75; n/(k+1) = 15
      assert(summary.size <= 4)
      // both true heavy tokens (30 and 25 > 15) must survive the stream
      assert(summary.contains("hot") && summary.contains("warm"), summary.toString)
      assert(summary("hot") <= 30L && 30L - summary("hot") <= n / 5)
      assert(summary("warm") <= 25L && 25L - summary("warm") <= n / 5)
    } finally q.stop()
  }

  test("heavyHittersMG equals the exact frequency filter (and the count-min path)") {
    val docs = Tables.documents(spark, sf0001)
    val mg = TextAnalysis.heavyHittersMG(docs, minShare = 0.02, k = 64)
    val cm = TextAnalysis.heavyHitters(docs, minShare = 0.02)
    assert(mg.exceptAll(cm).isEmpty && cm.exceptAll(mg).isEmpty)
    assert(mg.count() > 0)
    // the guarantee precondition is enforced, not silently violated
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHittersMG(docs, minShare = 0.001, k = 64)
    }
  }

  test("approxQuantile within declared relative error") {
    val orders = Tables.orders(spark, sf0001)
    val Array(p50) = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.01)
    val exact = orders.selectExpr("median(o_totalprice)").collect()(0).getDouble(0)
    // 1% rank tolerance → value must sit between the 45th and 55th pct
    val Array(lo, hi) = orders.stat.approxQuantile("o_totalprice", Array(0.45, 0.55), 0.001)
    assert(p50 >= lo && p50 <= hi, s"p50=$p50 exact=$exact")
  }

  test("HLL sketch columns: union of per-source sketches == direct sketch") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(s, SparkSpec.sf001)
    val tok = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val merged = tok.groupBy("source")
      .agg(hll_sketch_agg(col("tok")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = tok
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("est"))
      .head().getLong(0)
    // registers are max-combined: same lgK → identical merged state
    assert(merged === direct, s"merged=$merged direct=$direct")
    val exact = tok.select(countDistinct("tok")).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"est=$merged exact=$exact")
  }
}
