package graft

import org.apache.spark.sql.functions._
import graft.functions.ShingleFunctions
import graft.ops.Dedup

/** Native ShingleHashes expression vs the string-shingle reference form. */
class ShingleExprSpec extends SparkSpec {

  test("hash-shingle set size == string-shingle set size on real docs") {
    val rows = Tables.documents(spark, SparkSpec.sf0001)
      .select(size(Dedup.hashedShingles(col("text"))).as("nh"),
              size(Dedup.shingles(col("text"))).as("ns"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("pairwise intersection sizes match the string form (Jaccard-identical)") {
    val both = Tables.documents(spark, SparkSpec.sf0001).limit(40)
      .select(col("doc_id"), Dedup.hashedShingles(col("text")).as("h"),
              Dedup.shingles(col("text")).as("s"))
    val a = both.select(col("doc_id").as("ida"), col("h").as("ha"), col("s").as("sa"))
    val b = both.select(col("doc_id").as("idb"), col("h").as("hb"), col("s").as("sb"))
    val rows = a.join(b, col("ida") < col("idb"))
      .select(size(array_intersect(col("ha"), col("hb"))).as("ih"),
              size(array_intersect(col("sa"), col("sb"))).as("is"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("edge cases: fewer tokens than n → empty; deterministic; equal text → equal set") {
    val s = spark
    import s.implicits._
    val df = Seq("a b", "a b c d e", "a b c d e").toDF("text")
    val got = df.select(ShingleFunctions.shingleHashes(split(col("text"), " "), 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(got(0).isEmpty)
    assert(got(1).size === 3)
    assert(got(1) === got(2))
  }

  test("stays inside whole-stage codegen") {
    val df = Tables.documents(spark, SparkSpec.sf0001)
      .select(Dedup.hashedShingles(col("text")).as("h"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(1000))
    assert(p.contains("shingle_hashes"), p.take(1000))
  }
}
