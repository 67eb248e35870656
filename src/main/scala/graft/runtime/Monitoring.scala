package graft.runtime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Structured progress monitoring — the engine's analog of the reference's
  * per-instance structured logging (`src/catenae/logger.py:7-33`: every
  * event tagged with instance uid + microservice name). Spark-native:
  * a StreamingQueryListener captures per-microbatch progress (rows/s,
  * batch duration) for every Link query in the session. The in-memory
  * buffer is BOUNDED (drop-oldest past `maxRecords`): a continuous
  * pipeline emits one record per link per trigger forever, and an
  * unbounded queue is a slow driver OOM. [[drain]] removes what it
  * returns — the ship-to-a-sink path; [[snapshot]] peeks. */
class Monitoring(spark: SparkSession, instanceUid: String,
                 maxRecords: Int = 100000) {
  import Monitoring.Progress
  require(maxRecords > 0, s"maxRecords must be positive: $maxRecords")

  private val records = new java.util.concurrent.ConcurrentLinkedQueue[Progress]()
  // CLQ.size() is O(n) — track it ourselves for the cap check
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Append one record under the drop-oldest cap (the listener's path;
    * package-visible so the cap/drain contract is directly testable). */
  private[graft] def record(p: Progress): Unit = {
    records.add(p)
    if (count.incrementAndGet() > maxRecords) {
      // drop-oldest; a record() races a drain() harmlessly (poll may
      // find the queue already shorter — decrement only on a real hit)
      if (records.poll() != null) count.decrementAndGet()
      ()
    }
    ()
  }

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      record(Progress(instanceUid, Option(p.name).getOrElse(p.id.toString),
        p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)))
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def start(): Unit = spark.streams.addListener(listener)
  def stop(): Unit = spark.streams.removeListener(listener)

  /** Snapshot of captured progress records (oldest first) — non-destructive. */
  def snapshot(): Seq[Progress] = {
    val it = records.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Progress]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** Remove and return everything captured so far (oldest first) — the
    * periodic ship-to-a-sink call that keeps the buffer empty on
    * long-running pipelines. */
  def drain(): Seq[Progress] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Progress]
    var p = records.poll()
    while (p != null) {
      count.decrementAndGet()
      buf += p
      p = records.poll()
    }
    buf.toSeq
  }
}

object Monitoring {
  /** One captured micro-batch progress record (top-level so pattern
    * matches need no outer-instance check). */
  final case class Progress(uid: String, queryName: String, batchId: Long,
                            numInputRows: Long, durationMs: Long)
}
