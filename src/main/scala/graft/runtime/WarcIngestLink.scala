package graft.runtime

import org.apache.spark.sql.DataFrame
import graft.ops.Warc

/** Streaming WARC ingestion — [[graft.ops.Warc.parseWarc]] behind a
  * runtime [[Link]]: consumes a stream of `(chunk_id, payload)` crawl
  * chunks (plain WARC or `.warc.gz` member streams, sniffed per chunk)
  * and appends one parsed envelope row per record to the output stream.
  * This is the Spark-native rendering of the reference's ingest-Link
  * shape (`/root/reference/src/examples/falcon_api/main.py:13-19`: an
  * edge source feeding raw payloads into the chain) with the offsets
  * upgraded to the link checkpoint's exactly-once: a replayed chunk file
  * is never re-parsed, so downstream dedup sees each record once.
  *
  * The parse is the same stateless mapPartitions cursor as the batch
  * path — per-batch work is O(bytes), no state store, no shuffle — so
  * batch/streaming record parity holds bit-for-bit (gated by spec). */
class WarcIngestLink(input: String, outputStream: String) extends Link {
  val inputs: Seq[String] = Seq(input)
  val output: Option[String] = Some(outputStream)

  override def transform(df: DataFrame): DataFrame =
    Warc.parseWarc(df.sparkSession, df).toDF()
}

/** The bytes→text sibling of [[WarcIngestLink]]: streams fully decoded
  * crawl documents ([[graft.ops.Warc.parseWarcHttpDocs]] — envelope
  * parse + HTTP split + declared-charset body decode in the same
  * stateless cursor), so the stream downstream of this link is already
  * string-typed curation input. Batch/streaming parity is structural
  * (no state store) and spec-gated alongside the metadata link. */
class WarcHttpIngestLink(input: String, outputStream: String) extends Link {
  val inputs: Seq[String] = Seq(input)
  val output: Option[String] = Some(outputStream)

  override def transform(df: DataFrame): DataFrame =
    Warc.parseWarcHttpDocs(df.sparkSession, df).toDF()
}
