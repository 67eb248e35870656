package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.GraftFunctions
import graft.ops.{Curation, Dedup}

/** Invariants of the end-to-end curation pipeline, plus the streaming
  * dedup composition (content hash + dropDuplicatesWithinWatermark). */
class CurationSpec extends SparkSpec {
  import SparkSpec.sf0001

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val curated = Curation.curate(docs)

  test("survivors are a subset of the input, with all columns intact") {
    assert(curated.columns.toSeq === docs.columns.toSeq)
    assert(curated.count() > 0 && curated.count() <= docs.count())
    assert(curated.join(docs, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("no exact duplicates and no confirmed near-dup pair among survivors") {
    assert(curated.groupBy("text").count().filter(col("count") > 1).isEmpty)
    assert(Dedup.jaccardNearDupPairs(curated, 0.8).isEmpty)
  }

  test("curation is idempotent") {
    val twice = Curation.curate(curated)
    assert(twice.count() === curated.count())
    assert(twice.select("doc_id").exceptAll(curated.select("doc_id")).isEmpty)
  }

  test("near-dups removed at sf0.001: every planted pair lost exactly one side") {
    val pairs = Dedup.jaccardNearDupPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    pairs.foreach { case (a, b) =>
      assert(kept.contains(a) ^ kept.contains(b) || (!kept.contains(a) && !kept.contains(b)),
        s"pair ($a,$b) should not survive whole")
    }
  }

  test("streaming curation chain: quality-gate link → stateful dedup link over the registry") {
    val s = spark
    import s.implicits._
    val reg = new graft.runtime.StreamRegistry(spark,
      java.nio.file.Files.createTempDirectory("graft-cur").toString)
    object QualityGate extends graft.runtime.Link {
      val inputs = Seq("docs_in"); val output = Some("docs_q")
      override def transform(df: org.apache.spark.sql.DataFrame) =
        df.filter(size(split(col("text"), " ")) >= 3)
    }
    object DedupLink extends graft.runtime.Link {
      val inputs = Seq("docs_q"); val output = Some("docs_clean")
      override def transform(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("content_hash", GraftFunctions.blake2b_256(col("text")))
          .dropDuplicates("content_hash")
    }
    val pipe = new graft.runtime.Pipeline(Seq(QualityGate, DedupLink))
    reg.write(Seq("good doc one", "bad", "good doc one", "good doc two")
      .toDF("text"), "docs_in")
    pipe.runOnce(spark, reg)
    assert(reg.read("docs_clean").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("good doc one", "good doc two"))
    // second batch: a cross-batch duplicate must be suppressed by the
    // dedup state persisted in the link's checkpoint
    reg.write(Seq("good doc two", "good doc three").toDF("text"), "docs_in")
    pipe.runOnce(spark, reg)
    assert(reg.read("docs_clean").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("good doc one", "good doc three", "good doc two"))
  }

  test("streaming dedup: content hash + dropDuplicatesWithinWatermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val deduped = mem.toDF().toDF("ts", "text")
      .withColumn("content_hash", GraftFunctions.blake2b_256(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:01:00")
      mem.addData((t0, "doc one"), (t1, "doc one"), (t1, "doc two"))
      q.processAllAvailable()
    } finally q.stop()
    val texts = s.sql("SELECT text FROM sdedup").collect().map(_.getString(0)).sorted
    assert(texts.toSeq === Seq("doc one", "doc two"))
  }
}
