package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.runtime.{Link, StreamRegistry}

/** Capstone integration: the reference's Link microservice surface running
  * the LLM-curation operators as a STREAMING pipeline — the deployment
  * shape a reference user migrating a curation microservice would build
  * (docs MIGRATION.md §1 + SURVEY.md §2.3 composed).
  *
  * The link consumes a raw documents stream, applies the quality gate as
  * a row-level streaming filter, content-addresses each survivor with
  * blake2b-256 (the reference's canonical hash), and drops exact
  * duplicates ACROSS batches with streaming dropDuplicates state — the
  * incremental form of exact dedup, with the dedup ledger living in the
  * link's exactly-once checkpoint rather than a side table. */
class StreamingCurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  object CurationLink extends Link {
    val inputs = Seq("docs_raw"); val output = Some("docs_clean")
    override def transform(df: DataFrame): DataFrame = {
      val toks = split(col("text"), " ")
      df.filter(size(toks) >= 3 &&
          (size(array_distinct(toks)).cast("double") / size(toks)) >= 0.5)
        .withColumn("content_hash", GraftFunctions.blake2b_256(col("text")))
        .dropDuplicates("content_hash")
    }
  }

  test("streaming curation link: gates + cross-batch exact dedup, exactly once") {
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-cur-stream").toString)
    reg.write(docs(
      1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox jumps", // exact dup of 1 (same batch)
      3L -> "ok ok ok ok ok ok",         // fails uniq-ratio gate
      4L -> "too short",                 // fails min-token gate
      5L -> "a genuinely different document body"), "docs_raw")
    CurationLink.start(spark, reg).awaitTermination()
    val round1 = reg.read("docs_clean").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // gates dropped 3 and 4; the dup pair collapsed to one survivor
    assert(round1.keySet.subsetOf(Set(1L, 2L, 5L)) && round1.size === 2)
    assert(round1.values.toSet ===
      Set("the quick brown fox jumps", "a genuinely different document body"))

    // batch 2: one doc already seen in batch 1, one new — the dedup state
    // in the checkpoint must suppress the re-send across restarts
    reg.write(docs(
      6L -> "the quick brown fox jumps", // cross-batch exact dup
      7L -> "fresh unseen content arrives here"), "docs_raw")
    CurationLink.start(spark, reg).awaitTermination()
    val round2 = reg.read("docs_clean").collect().map(_.getAs[String]("text"))
    assert(round2.length === 3, round2.mkString("; "))
    assert(round2.count(_ == "the quick brown fox jumps") === 1,
      "cross-batch duplicate must not be re-emitted")
    assert(round2.contains("fresh unseen content arrives here"))

    // replaying with no new input emits nothing (exactly-once offsets)
    CurationLink.start(spark, reg).awaitTermination()
    assert(reg.read("docs_clean").count() === 3)
  }
}
