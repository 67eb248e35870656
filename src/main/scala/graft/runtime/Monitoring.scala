package graft.runtime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Structured progress monitoring — the engine's analog of the reference's
  * per-instance structured logging (`src/catenae/logger.py:7-33`: every
  * event tagged with instance uid + microservice name). Spark-native:
  * a StreamingQueryListener captures per-microbatch progress (rows/s,
  * batch duration) for every Link query in the session; records are kept
  * in memory for inspection and can be drained to any sink. */
class Monitoring(spark: SparkSession, instanceUid: String) {
  import Monitoring.Progress

  private val records = new java.util.concurrent.ConcurrentLinkedQueue[Progress]()

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      records.add(Progress(instanceUid, Option(p.name).getOrElse(p.id.toString),
        p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)))
      ()
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def start(): Unit = spark.streams.addListener(listener)
  def stop(): Unit = spark.streams.removeListener(listener)

  /** Snapshot of captured progress records (oldest first). */
  def snapshot(): Seq[Progress] = {
    val it = records.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Progress]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }
}

object Monitoring {
  /** One captured micro-batch progress record (top-level so pattern
    * matches need no outer-instance check). */
  final case class Progress(uid: String, queryName: String, batchId: Long,
                            numInputRows: Long, durationMs: Long)
}
