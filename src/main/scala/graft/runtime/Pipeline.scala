package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Source link with a user `generator` hook (reference O1: a user loop
  * spawned at start that produces messages via `send`,
  * `src/catenae/catenae.py:289-290`; HTTP-ingest example
  * `src/examples/falcon_api/main.py:13-19`).
  *
  * Spark-native: a rate-source tick drives `generate(batchId)` whose
  * result is appended to the output stream — the generator cadence is the
  * trigger (reference fixed-interval loops, O10 `catenae.py:341-360`,
  * become `Trigger.ProcessingTime`). Like the reference generator this
  * path is at-least-once (a crash between write and commit can replay a
  * batch); transform links downstream stay exactly-once via checkpoints. */
trait GeneratorLink {
  def name: String = getClass.getSimpleName.stripSuffix("$")
  def output: String
  /** Produce one batch (None/empty ⇒ nothing emitted this tick). */
  def generate(spark: SparkSession, batchId: Long): Option[DataFrame]

  def start(spark: SparkSession, registry: StreamRegistry,
            trigger: Trigger = Trigger.AvailableNow(),
            rowsPerSecond: Int = 1): StreamingQuery =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .writeStream
      .option("checkpointLocation", registry.checkpointDir(name, s"gen_$output"))
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        generate(spark, batchId).filter(!_.isEmpty)
          .foreach(df => registry.write(df, output))
      }
      .start()
}

/** Multi-link lifecycle (reference O9 `start`/`stop`/signal handling,
  * `src/catenae/catenae.py:259-317`, `393-422`): a chain of links started
  * together; `runOnce` drains available data through the chain in
  * topological (declaration) order — the batch-test analog of the broker's
  * always-on chain. */
class Pipeline(links: Seq[Link]) {

  /** Queries started by THIS pipeline (tracked so stopAll cannot touch
    * unrelated queries in the session). */
  @volatile private var started: Seq[StreamingQuery] = Nil

  /** Start every link continuously; returns the queries (caller owns
    * await/stop — `embedded=True` semantics, `catenae.py:311`). */
  def start(spark: SparkSession, registry: StreamRegistry,
            trigger: Trigger): Seq[StreamingQuery] = {
    val qs = links.map(_.start(spark, registry, trigger))
    started = started ++ qs
    qs
  }

  /** Drain currently-available data through the chain once (upstream
    * first), blocking until quiescent. */
  def runOnce(spark: SparkSession, registry: StreamRegistry): Unit =
    links.foreach(_.start(spark, registry, Trigger.AvailableNow()).awaitTermination())

  /** Stop the queries THIS pipeline started — not every active query in
    * the session (an Rpc dispatcher or a sibling pipeline must survive). */
  def stopAll(spark: SparkSession): Unit = {
    started.filter(_.isActive).foreach(_.stop())
    started = Nil
  }
}
