package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.ops.Dedup

/** Streaming incremental near-dup gate — [[graft.ops.Dedup.minHashLshAgainstCorpus]]
  * composed into a runtime [[Link]] (the streaming sibling of the exact
  * Bloom gate in `Dedup.dedupAgainstCorpus`, and the near-dup analog of
  * the exact-dedup `CurationLink` shape): each micro-batch of arriving
  * documents is screened against the ACCEPTED corpus stream; confirmed
  * pairs `(doc_new, doc_corpus, jaccard)` are appended to `pairsStream`,
  * and only documents with NO confirmed match are appended to
  * `corpusStream` — so later batches are screened against everything
  * admitted before them, incrementally, without ever re-pairing
  * corpus × corpus.
  *
  * Semantics and contracts:
  *  - per-batch work is batch-proportional (Σ over incoming bands of the
  *    corpus band df — the `minHashLshAgainstCorpus` guarantee), with the
  *    corpus-side hot-band cap DEFAULTING ON ([[Dedup.DefaultHotKeyCap]])
  *    as at every cluster-level dedup entry point;
  *  - near-dups WITHIN one micro-batch are admitted together (the gate
  *    compares arrivals to the accepted corpus, not to each other) —
  *    micro-batch granularity is the screening granularity; shrink the
  *    trigger interval for a tighter gate, or run the batch clusterers
  *    (`nearDupClusters*`) as a periodic sweep over the corpus stream;
  *  - offsets are exactly-once (the link checkpoint), so a replay with no
  *    new input appends nothing; the two side-effect writes inside the
  *    batch are at-least-once under a mid-batch crash, like any
  *    foreachBatch sink — downstream consumers of `pairsStream` dedup on
  *    (doc_new, doc_corpus) if they need idempotence;
  *  - doc_ids must be globally unique across the corpus and all batches
  *    (the `minHashLshAgainstCorpus` id-space contract).
  *
  * At 100 TB the corpus re-shingling per batch is the cost to watch: the
  * band projection is a pure function of the corpus stream, so a
  * deployment persists it as its own banded stream (bucketed by band) and
  * appends survivors' bands alongside — same join, amortized prep; this
  * link keeps the simpler recompute form, correct at any scale and right
  * whenever batches are not tiny relative to corpus growth. */
class NearDupGateLink(input: String, corpusStream: String,
                      pairsStream: String, minJaccard: Double,
                      n: Int = 3,
                      maxBandSize: Int = Dedup.DefaultHotKeyCap)
    extends Link {

  val inputs: Seq[String] = Seq(input)
  val output: Option[String] = None

  private val pairsSchema = StructType(Seq(
    StructField("doc_new", LongType), StructField("doc_corpus", LongType),
    StructField("jaccard", DoubleType)))
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  override def start(spark: SparkSession, registry: StreamRegistry,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    setup(spark)
    registry.declare(pairsStream, pairsSchema)
    if (!registry.exists(corpusStream)) registry.declare(corpusStream, docSchema)
    registry.readStream(input).writeStream
      .option("checkpointLocation", registry.checkpointDir(name, pairsStream))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // localCheckpoint both: the pairs feed TWO actions (pairs append +
        // survivor anti-join), and the survivor write must not re-list the
        // corpus directory it is itself about to append to
        val b = batch.select(col("doc_id"), col("text")).localCheckpoint()
        val corpus = registry.read(corpusStream)
        val pairs = Dedup.minHashLshAgainstCorpus(corpus, b, minJaccard, n,
          maxBandSize).localCheckpoint()
        registry.write(pairs, pairsStream)
        val survivors = b.join(
          pairs.select(col("doc_new").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        registry.write(survivors, corpusStream)
      }
      .start()
  }
}
