package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Named-stream registry — the engine's analog of the reference's Stopover
  * broker (named, append-only, partitioned message logs created implicitly
  * on first put; reference `src/catenae/catenae.py:79-81`, `319-324`).
  *
  * A stream is a parquet directory under `root/streams/<name>` plus a
  * persisted schema (`root/schemas/<name>.json`) so streaming readers can
  * attach without sampling. Offset/commit progress (reference
  * `catenae.py:424-427`, `469-470`) is Structured Streaming's checkpoint
  * under `root/checkpoints/<link>/<target>` — per (consumer, stream), the
  * same ledger shape as the broker's per-(stream, receiver-group) offsets,
  * upgraded from at-least-once to exactly-once (SURVEY.md §2.1 O5).
  *
  * Scale: a stream directory is a plain partitioned parquet dataset —
  * writers append files, readers list + tail them; no driver-side state
  * beyond the schema file.
  */
class StreamRegistry(spark: SparkSession, val root: String,
                     val format: String = "parquet") {

  private def streamDir(name: String): String = s"$root/streams/$name"
  private def schemaPath(name: String): Path = Paths.get(s"$root/schemas/$name.json")
  def checkpointDir(link: String, target: String): String =
    s"$root/checkpoints/$link/$target"

  def exists(name: String): Boolean = Files.exists(schemaPath(name))

  def schemaOf(name: String): StructType = {
    if (!exists(name)) throw new StreamNotFoundError(name)
    DataType.fromJson(new String(Files.readAllBytes(schemaPath(name)),
      StandardCharsets.UTF_8)).asInstanceOf[StructType]
  }

  private def persistSchema(name: String, schema: StructType): Unit = {
    Files.createDirectories(schemaPath(name).getParent)
    Files.write(schemaPath(name), schema.json.getBytes(StandardCharsets.UTF_8))
  }

  /** Batch append — the `send` analog (reference `catenae.py:319-324`);
    * creates the stream implicitly like the broker's first `put`.
    * `partitionBy` lays the stream out hive-partitioned — at 100 TB a
    * stream is a partitioned dataset so consumers prune by partition. */
  def write(df: DataFrame, name: String, partitionBy: Seq[String] = Nil): Unit = {
    if (!exists(name)) persistSchema(name, df.schema)
    val w = df.write.mode("append").format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(streamDir(name))
  }

  /** Batch read of a whole stream. */
  def read(name: String): DataFrame =
    spark.read.schema(schemaOf(name)).format(format).load(streamDir(name))

  /** Streaming tail of a stream (file source; exactly-once with the
    * per-link checkpoint). */
  def readStream(name: String): DataFrame =
    spark.readStream.schema(schemaOf(name)).format(format).load(streamDir(name))

  /** Compact a stream's many small appended files into `numFiles`
    * (maintenance analog of a table OPTIMIZE). Run in a maintenance
    * window: streaming consumers tailing the directory must be stopped,
    * and their checkpoints reset, since file identities change — this is
    * batch housekeeping for downstream BATCH readers of a stream at scale,
    * where thousands of micro-appends otherwise dominate scan planning. */
  def compact(name: String, numFiles: Int = 1): Unit = {
    val dir = streamDir(name)
    val tmp = s"$dir.compacting"
    read(name).repartition(numFiles).write.format(format).save(tmp)
    val dirFile = new java.io.File(dir)
    val old = new java.io.File(s"$dir.old")
    if (!dirFile.renameTo(old)) throw new java.io.IOException(s"cannot rotate $dir")
    if (!new java.io.File(tmp).renameTo(dirFile)) {
      old.renameTo(dirFile) // roll back
      throw new java.io.IOException(s"cannot swap in compacted $name")
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(old)
  }

  /** Declare a stream's schema up front (optional — first write also
    * registers it); lets a consumer start before any producer ran. */
  def declare(name: String, schema: StructType): Unit = {
    if (!exists(name)) persistSchema(name, schema)
    Files.createDirectories(Paths.get(streamDir(name)))
  }
}
