package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads are opaque
  * `binary` columns with typed metadata structs, processed per-partition so
  * a real decoder would be initialized once per partition (executor-local),
  * not once per row.
  *
  * The container ships no image/audio libs, so `decodeStub` derives
  * deterministic fake features from the bytes — clearly marked STUB. The
  * Spark-side contract (schema, batch shape, partition-scoped init,
  * encoder-based Dataset plumbing) is the real, tested part; swapping the
  * stub body for e.g. a JNI JPEG decoder changes no plan shape.
  */
object Multimodal {

  /** Typed metadata row produced by the decode stage. */
  case class MediaFeature(
      doc_id: Long,
      n_bytes: Long,
      // STUB-decoded fields (deterministic fakes; see decodeStub):
      width: Int,
      height: Int,
      channels: Int,
      format: String,
      checksum: Long)

  /** Attach a binary payload column (here: UTF-8 bytes of `text`; in a real
    * pipeline this is the stored media blob). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB media decode: a real implementation would decode image/audio
    * bytes here (`??? decode library not available in this container`);
    * the fake derives width/height/format deterministically from the
    * payload so tests can pin exact outputs. Partition-scoped "decoder"
    * init mimics per-executor native-lib setup. */
  def decodeStub(spark: SparkSession, docs: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (native lib handle etc.)
        it.map { case (id, bytes) =>
          var cs = 0xcbf29ce484222325L
          var i = 0
          while (i < bytes.length) { cs ^= (bytes(i) & 0xffL); cs *= 0x100000001b3L; i += 1 }
          MediaFeature(
            doc_id = id,
            n_bytes = bytes.length.toLong,
            width = 64 + (((cs % 960) + 960) % 960).toInt,
            height = 64 + ((((cs >>> 17) % 960) + 960) % 960).toInt,
            channels = 1 + ((((cs >>> 31) % 3) + 3) % 3).toInt,
            format = if ((cs & 1L) == 0L) "png" else "jpeg",
            checksum = cs)
        }
      }
  }

  /** Resize stub: maps decoded media features to target dimensions
    * preserving aspect ratio (longest side = `maxSide`). The arithmetic is
    * the real resize contract; only the pixel work is stubbed out with the
    * decode. */
  def resizeStub(features: Dataset[MediaFeature], maxSide: Int)
                (implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    features.map { m =>
      val scale = maxSide.toDouble / math.max(m.width, m.height)
      if (scale >= 1.0) m
      else m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }
  }

  /** Frame-sample stub: pick k deterministic "frame offsets" from a payload
    * — the plumbing for video frame extraction (offsets real, decode stub). */
  def frameOffsets(docs: DataFrame, k: Int = 4): DataFrame =
    withBinaryPayload(docs)
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"),
        transform(sequence(lit(0), lit(k - 1)),
          i => floor(i * length(col("payload")).cast("long") / k).cast("long"))
          .as("frame_offsets"))
}
