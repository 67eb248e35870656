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
  def read(name: String): DataFrame = {
    recover(name)
    spark.read.schema(schemaOf(name)).format(format).load(streamDir(name))
  }

  /** Streaming tail of a stream (file source; exactly-once with the
    * per-link checkpoint). */
  def readStream(name: String): DataFrame = {
    recover(name)
    spark.readStream.schema(schemaOf(name)).format(format).load(streamDir(name))
  }

  /** Compact a stream's many small appended files into `numFiles`
    * (maintenance analog of a table OPTIMIZE). Run in a maintenance
    * window: streaming consumers tailing the directory must be stopped,
    * and their checkpoints reset, since file identities change — this is
    * batch housekeeping for downstream BATCH readers of a stream at scale,
    * where thousands of micro-appends otherwise dominate scan planning.
    *
    * The swap uses the Hadoop `FileSystem` API so the same code works on
    * HDFS (atomic dir rename) and local FS. NOTE the two renames are not
    * one atomic commit: there is a window where the stream dir is absent,
    * and on an object store (S3A) "rename" is copy+delete — on the 100 TB
    * scale path back streams with a table format that has atomic commit
    * (or HDFS), and treat this as the local/HDFS maintenance tool. A crash
    * between the renames leaves `<dir>.old`, recovered by [[recover]]
    * (called automatically by [[read]]/[[readStream]]). */
  def compact(name: String, numFiles: Int = 1): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val dir = new HPath(streamDir(name))
    val tmp = new HPath(s"${streamDir(name)}.compacting")
    val old = new HPath(s"${streamDir(name)}.old")
    read(name).repartition(numFiles).write.format(format).save(tmp.toString)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.rename(dir, old)) throw new java.io.IOException(s"cannot rotate $dir")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // roll back
      throw new java.io.IOException(s"cannot swap in compacted $name")
    }
    fs.delete(old, true); ()
  }

  /** Recover from a crash mid-[[compact]]: if `<dir>.old` exists and the
    * stream dir is gone, roll the original back; a leftover `.compacting`
    * dir is incomplete output and is dropped. */
  def recover(name: String): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val dir = new HPath(streamDir(name))
    val old = new HPath(s"${streamDir(name)}.old")
    val tmp = new HPath(s"${streamDir(name)}.compacting")
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old) && !fs.exists(dir)) { fs.rename(old, dir); () }
    if (fs.exists(tmp)) { fs.delete(tmp, true); () }
  }

  /** Declare a stream's schema up front (optional — first write also
    * registers it); lets a consumer start before any producer ran. */
  def declare(name: String, schema: StructType): Unit = {
    if (!exists(name)) persistSchema(name, schema)
    Files.createDirectories(Paths.get(streamDir(name)))
  }

  // ------------------------------------------------------- sequence counter

  private def seqPath(name: String): Path = Paths.get(s"$root/seq/$name.seq")

  /** Allocate the next value of a monotonic per-stream sequence. Writers
    * stamp it on control-plane envelopes so consumers can order/fence by
    * log position instead of wall clocks (which skew across hosts). The
    * counter is guarded by an OS file lock, so it is monotonic across
    * processes sharing the registry root; a JVM-wide mutex avoids the
    * same-JVM `OverlappingFileLockException`. Control-plane rate only —
    * not for data-path use. */
  def nextSeq(name: String): Long = withSeqLock(name) { (ch, cur) =>
    val next = cur + 1
    ch.truncate(0)
    ch.write(java.nio.ByteBuffer.wrap(next.toString.getBytes(StandardCharsets.UTF_8)), 0)
    next
  }

  /** Read the sequence's current high-water mark without advancing it
    * (0 if nothing was ever allocated). */
  def peekSeq(name: String): Long = withSeqLock(name) { (_, cur) => cur }

  private def withSeqLock[A](name: String)(
      f: (java.nio.channels.FileChannel, Long) => A): A =
    StreamRegistry.seqMutex.synchronized {
      import java.nio.file.StandardOpenOption._
      val p = seqPath(name)
      Files.createDirectories(p.getParent)
      val ch = java.nio.channels.FileChannel.open(p, CREATE, READ, WRITE)
      try {
        val lock = ch.lock()
        try {
          val buf = java.nio.ByteBuffer.allocate(32)
          val n = ch.read(buf, 0)
          val cur =
            if (n <= 0) 0L
            else new String(buf.array(), 0, n, StandardCharsets.UTF_8).trim.toLong
          f(ch, cur)
        } finally lock.release()
      } finally ch.close()
    }
}

object StreamRegistry {
  private val seqMutex = new Object
}
