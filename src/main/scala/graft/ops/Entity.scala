package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler

/** Record linkage / entity resolution (SURVEY.md §2.3 curation family):
  * match dirty name fields (suppliers, authors, domains) against a
  * canonical corpus without the all-pairs cross join.
  *
  * The classic blocking shape: candidates = equi-join on a cheap blocking
  * key (lowercased `blockChars`-prefix) PLUS a length band (|Δlen| ≤
  * `maxEdit` — an edit-distance lower bound, so it prunes nothing that
  * could confirm), then confirm with exact `levenshtein ≤ maxEdit` and
  * score survivors with the codegen'd [[graft.functions.JaroWinkler]]
  * expression. Never quadratic in the corpus: cost is Σ over blocks of
  * |queries_block|·|corpus_block|, and the corpus side is typically the
  * smaller canonical table (AQE broadcasts it when it measures small).
  * Prefix blocking trades recall for scale exactly like LSH banding —
  * a first-letter typo escapes the block; production raises recall by
  * unioning a second key (e.g. length + last chars), same plan shape.
  *
  * Reference anchor: the reference keys everything by opaque uid
  * (`/root/reference/src/catenae/utils.py:60-61`) and leaves fuzzy
  * matching to user transforms; this is that transform, Spark-first. */
object Entity {

  /** Candidate + confirm + score. `queries` carries (`qid`, `name`),
    * `corpus` carries (`name`) (dedup upstream if needed). Returns
    * (qid, q_name, c_name, edit, jw) for every confirmed pair.
    * `suffixBlock = true` unions a second candidate set blocked on the
    * lowercased SUFFIX — recovering pairs whose typo falls inside the
    * prefix key (the standard multi-key recall move; both probes share
    * one plan shape, cost is two block joins + a distinct). */
  def blockedMatches(queries: DataFrame, corpus: DataFrame,
                     maxEdit: Int = 2, blockChars: Int = 2,
                     suffixBlock: Boolean = false): DataFrame = {
    require(maxEdit >= 0 && blockChars >= 1)
    def keyed(df: DataFrame, nameAs: String, lenAs: String)
             (key: Column => Column): DataFrame =
      df.select(df.columns.map(col) :+
        key(col("name")).as("block") :+ length(col("name")).as(lenAs): _*)
        .withColumnRenamed("name", nameAs)
    def candidates(key: Column => Column): DataFrame =
      keyed(queries, "q_name", "q_len")(key)
        .join(keyed(corpus, "c_name", "c_len")(key), Seq("block"))
        .filter(abs(col("q_len") - col("c_len")) <= maxEdit)
        .select("qid", "q_name", "c_name")
    val prefix = candidates(n => lower(substring(n, 1, blockChars)))
    val cands =
      if (!suffixBlock) prefix
      else prefix.union(candidates(n =>
        lower(n.substr(length(n) - blockChars + 1, lit(blockChars))))).distinct()
    // bounded 3-arg levenshtein (the Dedup.editDistancePairs idiom):
    // O(len·maxEdit) banded DP per pair instead of O(len²), returning −1
    // past the bound — so the confirm cost stays linear in name length
    cands
      .withColumn("edit", levenshtein(col("q_name"), col("c_name"), maxEdit))
      .filter(col("edit") >= 0)
      .withColumn("jw", JaroWinkler.jaroWinkler(col("q_name"), col("c_name")))
      .select("qid", "q_name", "c_name", "edit", "jw")
  }

  /** Pure Jaro-Winkler linkage: the same prefix-block + length-band
    * candidate join as [[blockedMatches]], confirmed by `jw ≥ minJw`
    * alone — no levenshtein stage. This is the path for NON-ASCII name
    * fields: the [[graft.functions.JaroWinkler]] scorer works over
    * UTF-8 bytes, bit-identical to DuckDB's on every string (q214's
    * accented/CJK/Cyrillic oracle), whereas an edit-distance confirm
    * mixes units cross-engine (Spark's levenshtein counts codepoints,
    * DuckDB's counts bytes — fine inside one engine, not oracle-
    * portable beyond ASCII; [[blockedMatches]] keeps it for the
    * ASCII-name scope q151 pins). `maxLenDelta` is the codepoint
    * length band (length() counts codepoints in both engines).
    * Same scale shape: never corpus-quadratic — Σ per block of
    * |queries_block|·|corpus_block|, corpus side AQE-broadcast when
    * small. */
  def jwMatches(queries: DataFrame, corpus: DataFrame,
                minJw: Double = 0.85, blockChars: Int = 2,
                maxLenDelta: Int = 4): DataFrame = {
    require(minJw >= 0 && blockChars >= 1 && maxLenDelta >= 0)
    def keyed(df: DataFrame, nameAs: String, lenAs: String): DataFrame =
      df.select(df.columns.map(col) :+
        lower(substring(col("name"), 1, blockChars)).as("block") :+
        length(col("name")).as(lenAs): _*)
        .withColumnRenamed("name", nameAs)
    keyed(queries, "q_name", "q_len")
      .join(keyed(corpus, "c_name", "c_len"), Seq("block"))
      .filter(abs(col("q_len") - col("c_len")) <= maxLenDelta)
      .withColumn("jw", JaroWinkler.jaroWinkler(col("q_name"), col("c_name")))
      .filter(col("jw") >= minJw)
      .select("qid", "q_name", "c_name", "jw")
  }
}
