package graft

import org.apache.spark.sql.functions._
import graft.ops.Classifier

/** Hashed-feature logistic regression ([[graft.ops.Classifier]]):
  * feature hashing pinned cross-engine, scorer vs a driver-side
  * reference, trainer gated on loss descent + holdout accuracy (float
  * sums are engine-ordered, so training has no value oracle — q146
  * oracle-checks the closed-form scorer instead). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("featureId matches the md5-prefix reference and stays in range") {
    val toks = Seq("spark", "table", "the", "zebra", "éclair")
    val got = toks.toDF("t")
      .select(Classifier.featureId(col("t"), 4096).as("f"))
      .as[Long].collect().toSeq
    val ref = toks.map { t =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16) % 4096
    }
    assert(got === ref)
    assert(got.forall(f => f >= 0 && f < 4096))
  }

  test("pseudoScoreMicros equals the token-wise driver reference") {
    val docs = Seq("spark table the", "zebra", "a b c d e").toDF("text")
    val got = docs.select(Classifier.pseudoScoreMicros(col("text"), 4096).as("z"))
      .as[Long].collect().toSeq
    val ref = Seq("spark table the", "zebra", "a b c d e").map {
      _.split(" ").map { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(6)
        val fid = java.lang.Long.parseLong(hex, 16) % 4096
        fid * 2654435761L % 1000001L - 500000L
      }.sum
    }
    assert(got === ref)
  }

  test("scoreWith: literal-weight lookup matches a hand-computed sigmoid") {
    val w = new Array[Double](64)
    val fid = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest("hot".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(6)
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    w(fid) = 2.0
    val model = Classifier.LinearModel(w, bias = -1.0)
    val scored = Classifier.scoreWith(Seq("hot hot", "cold").toDF("text"), model)
      .select("score").as[Double].collect().toSeq
    // "hot hot": z = -1 + 2*2 = 3; "cold": z = -1 + w(h(cold))
    assert(math.abs(scored.head - 1.0 / (1.0 + math.exp(-3.0))) < 1e-12)
    assert(scored(1) <= 1.0 / (1.0 + math.exp(-1.0)) + 1e-12)
  }

  test("trainLogRegHashed separates a planted token; loss descends") {
    // 200 docs: positives carry the token "good", negatives "bad",
    // shared filler vocabulary on both sides
    val docs = (0 until 200).map { i =>
      val filler = s"the quick w${i % 7} w${i % 13}"
      if (i % 2 == 0) (s"$filler good stuff", 1) else (s"$filler bad stuff", 0)
    }.toDF("text", "y")
    val m1 = Classifier.trainLogRegHashed(spark, docs, "y",
      dim = 256, rounds = 2, lr = 1.0)
    val m2 = Classifier.trainLogRegHashed(spark, docs, "y",
      dim = 256, rounds = 12, lr = 1.0)
    val l1 = Classifier.logLoss(docs, m1, "y")
    val l2 = Classifier.logLoss(docs, m2, "y")
    assert(l2 < l1, s"more rounds must reduce training loss: $l1 -> $l2")
    assert(l2 < math.log(2.0), "trained loss must beat the constant-0.5 model")
    val acc = Classifier.scoreWith(docs, m2)
      .select(avg(((col("score") > 0.5).cast("int") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc >= 0.95, s"separable fixture should be learned, got acc=$acc")
  }

  test("trained model transfers: holdout split scores correctly") {
    val docs = (0 until 300).map { i =>
      val filler = s"common w${i % 5}"
      if (i % 3 == 0) (i, s"$filler signal term$i", 1)
      else (i, s"$filler noise term$i", 0)
    }.toDF("id", "text", "y")
    val train = docs.filter(col("id") % 10 < 8)
    val holdout = docs.filter(col("id") % 10 >= 8)
    val m = Classifier.trainLogRegHashed(spark, train, "y",
      dim = 512, rounds = 25, lr = 2.0)
    val acc = Classifier.scoreWith(holdout, m)
      .select(avg(((col("score") > 0.5).cast("int") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc >= 0.9, s"holdout accuracy too low: $acc")
  }

  test("calibrationBins: hand-computed bins, out-of-range clamp, " +
    "exact integral means and gaps") {
    val scored = Seq(
      (0.05, true), (0.15, false),   // bin 0 / bin 1
      (0.12, true), (0.18, false),   // bin 1
      (1.0, true),                   // exact 1.0 clamps into bin 9
      (-0.3, false), (1.7, true)     // out of range: edge bins, clamped
    ).toDF("score", "label")
    val got = graft.ops.Classifier.calibrationBins(scored, bins = 10)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // bin 0: scores .05 and clamped -0.3->0.0; one positive
      // mean = (50000+0)/2 = 25000; frac = 500000; gap 475000
      (0L, 2L, 1L, 25000L, 500000L, 475000L),
      // bin 1: .15 .12 .18, one positive
      // mean = (150000+120000+180000)/3 = 150000; frac = 333333
      (1L, 3L, 1L, 150000L, 333333L, 183333L),
      // bin 9: 1.0 and clamped 1.7->1.0, both positive: gap 0
      (9L, 2L, 2L, 1000000L, 1000000L, 0L)))
    // ECE rollup is one exact Long expression over the table
    val ece = graft.ops.Classifier.calibrationBins(scored, bins = 10)
      .select((sum(col("n") * col("gap_micros")) /
        sum(col("n"))).cast("long")).as[Long].head()
    assert(ece === (2 * 475000L + 3 * 183333L + 0L) / 7L)
  }
}
