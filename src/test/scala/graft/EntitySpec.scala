package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler
import graft.ops.Entity

/** Jaro-Winkler native expression + blocked entity resolution.
  * The JW vectors are pinned against an independent implementation
  * (DuckDB 1.0 `jaro_winkler_similarity`, the q151 oracle's scorer) —
  * bit-exact, no tolerance: both implement classic Jaro with the
  * ⌊max/2⌋−1 window and Winkler's p=0.1/max-4-prefix bonus above the
  * 0.7 boost threshold, in double arithmetic with the same operation
  * order. */
class EntitySpec extends SparkSpec {
  import spark.implicits._

  private val vectors: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.8400000000000001),
    ("kitten", "sitting", 0.746031746031746),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("a", "b", 0.0),
    ("crate", "trace", 0.7333333333333334),
    ("small ring", "small rings", 0.9818181818181818),
    ("red widget", "r3d widg3t", 0.88),
    // jaro 0.6 with a 4-char prefix: the 0.7 boost threshold must
    // suppress the prefix bonus
    ("abcdxxxxxx", "abcdyyyyyy", 0.6),
    ("aaaaa", "aaaaabbbbbbbbbbbbbbb", 0.85),
    ("supplier#000000001", "supplier#000000010", 0.9888888888888889))

  test("JaroWinkler.similarity matches the reference vectors bit-exactly") {
    vectors.foreach { case (a, b, want) =>
      assert(JaroWinkler.similarity(a, b) === want, s"($a, $b)")
    }
  }

  test("jaro_winkler expression: codegen path equals the driver function") {
    val got = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Double].collect().toSeq
    assert(got === vectors.map(_._3))
  }

  test("jaro_winkler SQL registration and null handling") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS a, " +
        "jaro_winkler('x', CAST(NULL AS STRING)) AS b")
      .head()
    assert(r.getDouble(0) === 0.9611111111111111)
    assert(r.isNullAt(1))
  }

  test("blockedMatches: typo variants link back; blocking bounds the join") {
    val corpus = Seq("red widget", "blue bolt", "small ring", "hot gear")
      .toDF("name")
    val queries = Seq(
      (1L, "red widgetx"), // append: edit 1
      (2L, "blue bol"),    // truncation: edit 1
      (3L, "sm4ll r1ng"),  // two subs past the prefix: edit 2
      (4L, "cold gear"),   // first-letter mismatch: escapes the block
      (5L, "zzz")).toDF("qid", "name")
    val got = Entity.blockedMatches(queries, corpus, maxEdit = 2)
      .select("qid", "c_name").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "red widget"), (2L, "blue bolt"),
      (3L, "small ring")))
    // jw of confirmed pairs is high
    val jws = Entity.blockedMatches(queries, corpus, maxEdit = 2)
      .select("jw").as[Double].collect()
    assert(jws.forall(_ > 0.8))
  }

  test("suffix block recovers first-letter typos the prefix block misses") {
    val corpus = Seq("red widget", "blue bolt").toDF("name")
    val queries = Seq((1L, "Red widget"), (2L, "xed widget")).toDF("qid", "name")
    val prefixOnly = Entity.blockedMatches(queries, corpus, maxEdit = 2)
      .select("qid").as[Long].collect().toSet
    assert(prefixOnly === Set(1L)) // "xe" block misses "re"
    val both = Entity.blockedMatches(queries, corpus, maxEdit = 2,
      suffixBlock = true).select("qid", "c_name")
      .as[(Long, String)].collect().toSet
    assert(both === Set((1L, "red widget"), (2L, "red widget")))
    // the union is distinct: a pair caught by BOTH keys appears once
    assert(Entity.blockedMatches(queries, corpus, maxEdit = 2,
      suffixBlock = true).count() === 2)
  }
}
