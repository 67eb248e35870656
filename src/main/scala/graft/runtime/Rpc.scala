package graft.runtime

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions

/** Control plane carried over a registry stream — the Spark-native port of
  * the reference's RPC-over-broker-topics (reference
  * `src/catenae/catenae.py:362-391` invoke, `475-534` dispatch).
  *
  * Semantics preserved:
  *  - envelope `{method, context{group,uid}, args}` (`catenae.py:381-389`);
  *  - addressing: a link name, a specific instance uid (the reference's
  *    per-uid topic, `catenae.py:133-134`, topic scheme `catenae.py:380`),
  *    or `broadcast` (`catenae.py:124-127`);
  *  - every instance sees every call — the dispatcher checkpoints under
  *    the instance uid, not the group (`catenae.py:480`);
  *  - self-skip (`catenae.py:490-491`);
  *  - whitelist: only registered handlers run (the `@rpc` decorator
  *    registry, `catenae.py:45-52`, checked at `512-514`);
  *  - serialized execution per instance (the `rpc_lock`,
  *    `catenae.py:528-529`) — foreachBatch runs batches sequentially.
  */
class Rpc(spark: SparkSession, registry: StreamRegistry, linkName: String,
          handlers: Map[String, Seq[String] => Unit],
          stableUid: Option[String] = None,
          replayHistory: Boolean = false) {

  /** Instance uid. Pass `stableUid` (the analog of the reference's `-u`
    * flag, `catenae.py:229-232`) to keep the dispatcher checkpoint stable
    * across restarts — resume where it left off instead of a fresh
    * randomized checkpoint. */
  val uid: String = stableUid.getOrElse(GraftFunctions.getUid())
  val ControlStream = "catenae_rpc"

  private val envelopeSchema = StructType(Seq(
    StructField("to", StringType), StructField("method", StringType),
    StructField("args", ArrayType(StringType)),
    StructField("from_uid", StringType), StructField("from_group", StringType),
    StructField("sent_at_ms", LongType), StructField("seq", LongType)))

  registry.declare(ControlStream, envelopeSchema)

  /** A fresh dispatcher starts at the *current end* of the control stream:
    * calls sent before this instance existed are not re-executed (a
    * side-effect-replay hazard otherwise — every restart under a new uid
    * would replay the full RPC history). The fence is the control stream's
    * monotonic sequence (log position), NOT a wall clock: clocks skew
    * across hosts, so a timestamp fence can wrongly skip a just-sent call
    * from a slow-clock sender or replay an old one from a fast-clock
    * sender. The fence value PERSISTS beside the checkpoint: a stable-uid
    * dispatcher restart keeps its ORIGINAL birth fence, so calls sent
    * while it was down are still dispatched on resume (re-fencing at the
    * current end would silently drop them; already-processed files are
    * deduped by the checkpoint, not the fence). Set `replayHistory=true`
    * to opt back into full-history dispatch. Tie rule at the fence:
    * "sent before birth" is defined by seq ALLOCATION order, not append
    * order — a notify that allocated its seq before this peekSeq read is
    * pre-birth and excluded even if its append lands afterwards (the
    * counter is the log clock; the fence would be meaningless against
    * append-time races). */
  private val bornSeq: Long = {
    val fencePath = s"${registry.checkpointDir(s"rpc_$uid", ControlStream)}.born_seq"
    registry.readTextIfExists(fencePath) match {
      case Some(v) => v.trim.toLong
      case None =>
        val seq = registry.peekSeq(ControlStream)
        registry.writeText(fencePath, seq.toString)
        seq
    }
  }

  /** Invoke `method` on `to` (a link name, an instance uid, or
    * "broadcast") — append the envelope to the control stream (reference
    * `rpc_notify`). `sent_at_ms` is observability metadata only; ordering
    * and replay fencing use the registry-allocated `seq`. */
  def notify(method: String, args: Seq[String], to: String = "broadcast"): Unit = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(to, method, args, uid, linkName,
        java.lang.Long.valueOf(System.currentTimeMillis()),
        java.lang.Long.valueOf(registry.nextSeq(ControlStream)))), envelopeSchema)
    registry.write(df, ControlStream)
  }

  /** Number of calls dispatched (for observability/tests). */
  @volatile var dispatched: Long = 0L
  /** Number of calls whose handler threw (isolated, not replayed). */
  @volatile var failed: Long = 0L

  /** Start the dispatcher: filters to us (group name, instance uid, or
    * broadcast), skips our own calls, whitelists methods, and executes
    * serially per microbatch. */
  def start(trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    registry.readStream(ControlStream)
      .filter(col("to").isin(linkName, uid, "broadcast"))
      .filter(if (replayHistory) lit(true) else col("seq") > bornSeq)
      .writeStream
      .option("checkpointLocation", registry.checkpointDir(s"rpc_$uid", ControlStream))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { row =>  // control plane: tiny, driver-side by design
          val fromUid = row.getAs[String]("from_uid")
          val method = row.getAs[String]("method")
          if (fromUid != uid) {           // self-skip (catenae.py:490-491)
            handlers.get(method) match {  // whitelist (catenae.py:512-514)
              case Some(h) =>
                // per-call isolation (reference catches per-dispatch,
                // catenae.py:515-521): a throwing handler must not kill
                // the dispatcher query — that would replay the whole
                // micro-batch on restart (re-running handlers that
                // already succeeded) and then crash-loop on the bad call
                try { h(row.getAs[scala.collection.Seq[String]]("args").toSeq)
                      dispatched += 1 }
                catch { case e: Exception =>
                  failed += 1
                  System.err.println(s"[rpc:$linkName] handler $method failed: $e") }
              case None => () // unregistered method: ignored, like a failed
                              // whitelist check in the reference
            }
          }
        }
      }
      .start()
}
