package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType, StructField, StructType}
import graft.ops.Warc

/** Streaming revisit-record dedup — [[graft.ops.Warc.revisitDedup]]'s
  * semantics as a live archive writer with CROSS-BATCH digest state:
  * the first capture of a payload EVER SEEN becomes a full `response`
  * record; every later capture — in the same batch or any batch after
  * it — becomes a ~200-byte `revisit` stub naming that first capture.
  * This is the arrival-order archive semantic (first capture in TIME
  * wins; the batch op's min-uri rule is the deterministic choice for a
  * static frame), and it is what turns a recrawling fetch loop into an
  * archive that stores each payload once.
  *
  * State: `seenStream` `(digest, first_url, bucket)` — the
  * digest→first-capture registry, hive-partitioned into `numBuckets`
  * FIXED digest-hash buckets and merged per touched bucket
  * ([[StreamRegistry.refreshPartition]], per-bucket `_batch` marks —
  * the [[FrontierLink]] count-merge discipline; the modulus pins via
  * [[StreamRegistry.pinBucketCount]]). Per batch: the batch's rows
  * LEFT-join the prior state on digest (prior first wins), within-batch
  * duplicates fall to the batch's lexicographically first url, and only
  * genuinely new digests merge into the touched buckets. Records append
  * to `outputStream` `(url, digest, is_revisit, refers_to,
  * warc_record)`; the append is at-least-once under a mid-batch crash
  * like every foreachBatch sink, while the STATE merge is exactly-once
  * per bucket — so a replay can duplicate output rows but can never
  * flip which capture is the canonical first.
  *
  * Scale shape: per batch, one digest-keyed join of the BATCH against
  * the touched buckets of the state (bucket-pruned reads), one
  * within-batch window, and state writes ∝ touched buckets — never the
  * digest universe. */
class RevisitGateLink(input: String, outputStream: String,
                      seenStream: String, numBuckets: Int = 16,
                      uriCol: String = "url", textCol: String = "text",
                      date: String = "2026-01-01T00:00:00Z") extends Link {
  require(numBuckets >= 1, s"numBuckets >= 1, got $numBuckets")
  val inputs: Seq[String] = Seq(input)
  val output: Option[String] = None // custom start: output + state streams

  private val outSchema = StructType(Seq(
    StructField("url", StringType), StructField("digest", StringType),
    StructField("is_revisit", BooleanType),
    StructField("refers_to", StringType),
    StructField("warc_record", StringType)))
  private val seenSchema = StructType(Seq(
    StructField("digest", StringType), StructField("first_url", StringType),
    StructField("bucket", IntegerType)))

  override def start(spark: SparkSession, registry: StreamRegistry,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    setup(spark)
    registry.declare(outputStream, outSchema)
    registry.declare(seenStream, seenSchema, Seq("bucket"))
    registry.pinBucketCount(seenStream, numBuckets)
    registry.readStream(input).writeStream
      .option("checkpointLocation", registry.checkpointDir(name, outputStream))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("digest").orderBy(col("url").asc)
        val b = batch
          .filter(col(textCol).isNotNull && col(uriCol).isNotNull)
          .select(col(uriCol).as("url"), col(textCol).as("text"))
          .withColumn("digest", md5(encode(col("text"), "UTF-8")))
          .withColumn("bucket",
            StreamRegistry.bucketOf(col("digest"), numBuckets))
          .withColumn("graft_batch_first", min(col("url")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("digest")))
          .localCheckpoint()
        // touched-bucket ids: bounded by numBuckets — control-plane
        val touched = b.select("bucket").distinct()
          .collect().map(_.getInt(0)).sorted
        // prior state for the touched buckets only (bucket-pruned)
        val prior = touched.map(bkt =>
            registry.readPartition(seenStream, bkt)).reduceOption(_ unionByName _)
          .getOrElse(registry.readPartition(seenStream, 0).limit(0))
          .localCheckpoint()
        // the emitted records: prior first wins, then the batch first
        val joined = b.join(prior.select(col("digest"),
            col("first_url").as("graft_prior")), Seq("digest"), "left")
          .withColumn("graft_first",
            coalesce(col("graft_prior"), col("graft_batch_first")))
          .withColumn("is_revisit", col("url") =!= col("graft_first"))
          .withColumn("refers_to",
            when(col("is_revisit"), col("graft_first")).otherwise(lit("")))
        val out = joined.select(col("url"), col("digest"),
          col("is_revisit"), col("refers_to"),
          when(col("is_revisit"), Warc.revisitStub(col("url"),
              col("refers_to"), col("digest"), lit(date)))
            .otherwise(Warc.responseRecord(col("url"), col("text"),
              lit(date))).as("warc_record"))
        registry.write(out, outputStream)
        // merge genuinely NEW digests into their buckets, exactly-once
        val fresh = b.filter(col("url") === col("graft_batch_first"))
          .join(prior.select("digest"), Seq("digest"), "left_anti")
          .select(col("digest"), col("url").as("first_url"), col("bucket"))
          .distinct().localCheckpoint()
        touched.foreach { bkt =>
          val merged = registry.refreshPartitionMeta(seenStream, bkt, "batch")
            .exists(_.toLong >= batchId)
          if (!merged) {
            registry.refreshPartition(seenStream, bkt,
              registry.readPartition(seenStream, bkt).unionByName(
                fresh.filter(col("bucket") === bkt).drop("bucket")),
              Map("batch" -> batchId.toString))
          }
        }
      }
      .start()
  }
}
