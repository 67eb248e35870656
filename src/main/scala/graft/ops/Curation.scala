package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the
  * north-star operators exist for (SURVEY.md §2.3), as one DataFrame
  * program:
  *
  *   quality gate → exact dedup (blake2b content hash) →
  *   near-dup removal (MinHash-LSH candidates + exact Jaccard confirm) →
  *   surviving corpus + per-language stats.
  *
  * Every stage is shuffle-bounded: the quality gate is a projection, exact
  * dedup shuffles 32-byte hashes, near-dup pairs come from band equi-joins,
  * and removal is a broadcast-able anti-join against the (small) drop list.
  * The pipeline is idempotent: curating a curated corpus is a no-op
  * (tested in CurationSpec).
  */
object Curation {

  final case class Config(
      minTokens: Int = 5,
      minUniqRatio: Double = 0.05,
      nearDupJaccard: Double = 0.8)

  /** Surviving documents (all original columns) after the three gates. */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val toks = split(col("text"), " ")
    // 1. quality gate — pure projection/filter, no shuffle
    val quality = docs.filter(
      size(toks) >= cfg.minTokens &&
        (size(array_distinct(toks)).cast("double") / size(toks)) >= cfg.minUniqRatio)
    // 2. exact dedup — keep min doc_id per content hash
    val survivorsExact = quality.join(
      Dedup.exactByHash(quality, col("text"), col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    // 3. near-dup removal — drop the higher-id side of each confirmed pair
    val dropList = Dedup.minHashLshPairs(survivorsExact, cfg.nearDupJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    survivorsExact.join(dropList, Seq("doc_id"), "left_anti")
  }

  /** Curated corpus stats per language (rows-only oracle: upstream uses
    * engine-internal MinHash). */
  def stats(curated: DataFrame): DataFrame =
    curated.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(size(split(col("text"), " "))), 2).as("avg_tokens"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
      .orderBy("lang")
}
