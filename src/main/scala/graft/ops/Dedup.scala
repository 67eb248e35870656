package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Deduplication operators for LLM-training-data pipelines (SURVEY.md §2.3).
  *
  * Scale stance (100 TB): every step is a DataFrame transformation —
  * hash-groupBy for exact dedup (shuffle key = 32-byte digest, not the
  * document), inverted-index / LSH-band equi-joins for near-dup candidate
  * generation (never an all-pairs cross join), exact Jaccard only on the
  * candidate set. Anchored on the reference's blake2b-256 content
  * addressing (`/root/reference/src/catenae/utils.py:42-61`).
  */
object Dedup {

  /** 64-bit FNV-1a over UTF-8 bytes — cheap, deterministic base hash for
    * MinHash/SimHash (cryptographic strength not needed for sketches;
    * content addressing uses blake2b instead). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — mixes a base hash with a seed into an
    * independent-enough hash family for MinHash. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct word n-gram shingles of a whitespace-tokenized text column —
    * pure `functions._`, stays inside whole-stage codegen.
    *
    * Built as a zip_with fold over shifted slices, NOT
    * `transform(sequence(...), i => element_at(toks, i+j))`: expressions
    * inside a lambda re-evaluate per element, so the element_at form
    * re-runs the regex `split` O(tokens²) times per row (measured 10×
    * slower on the sf0.1 corpus). The slice/zip form evaluates `split`
    * O(n) times per row.
    *
    * This string form is the reference semantics (used by the group
    * MinHash aggregator and the specs); the near-dup pipelines below use
    * [[hashedShingles]] — a native expression producing the 64-bit shingle
    * identities directly with zero string construction. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    val m = greatest(size(toks) - (n - 1), lit(0))
    val joined = (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(1 + j), m), (a, b) => concat_ws(" ", a, b))
    }
    array_distinct(joined)
  }

  /** Distinct 64-bit shingle hashes (native codegen'd
    * [[graft.functions.ShingleHashes]] expression). Downstream operators
    * only need a stable shingle identity — set sizes, intersections, and
    * join keys are unchanged w.h.p. vs the string form (2⁻⁶⁴ per-pair
    * collision odds), which keeps the DuckDB string-shingle oracles
    * valid. */
  def hashedShingles(text: Column, n: Int = 3): Column =
    graft.functions.ShingleFunctions.shingleHashes(split(text, " "), n)

  /** Exact dedup keyed on the blake2b-256 content hash: one hash projection,
    * one hash-groupBy. Output: surviving `doc_id` (min id per content),
    * `dup_count`, `content_hash`. */
  def exactByHash(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"), GraftFunctions.blake2b_256(text).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count", "content_hash")

  /** Cross-document repeated n-gram span SCRUB — the removal counterpart
    * of `TextAnalysis.dupNgramCoverage` (which only measures): every
    * token covered by an n-gram that appears in at least `minDf`
    * DISTINCT documents is cut, and each document reassembles from its
    * surviving tokens in order. This is the practical middle ground of
    * exact-substring corpus dedup (Lee et al.'s "Deduplicating Training
    * Data Makes Language Models Better" without the suffix array):
    * boilerplate sentences, license blocks, and navigation chrome that
    * exact-dup and near-dup DOC-level dedup both miss get excised
    * in-place, overlap-safe (covered positions are a set union, the
    * q172 discipline — overlapping shared grams never double-cut).
    *
    * Scale shape: grams carry a 60-bit md5-prefix hash, so the df
    * aggregation and the heavy-gram semi-join shuffle 8-byte keys, never
    * gram strings; the positions explode is n× the token count inside
    * the scan stage; reassembly is one doc-keyed aggregate (per-doc
    * bounded). The hash is [[graft.functions.Md5Prefix60]] — the oracle
    * derives the identical value, so the WHOLE scrub is
    * cross-engine-checkable.
    *
    * @return (doc_id, n_tokens, n_scrubbed, text) — text is the
    *         surviving-token join (empty when everything was shared,
    *         e.g. an exact duplicate pair ≥ n tokens long) */
  def scrubSharedNgramSpans(docs: DataFrame, n: Int = 5,
                            minDf: Int = 2): DataFrame =
    scrubSharedNgramSpansFrom(docs, ngramPositionHashes(docs, n), n, minDf)

  /** The `(doc_id, pos, h)` gram-position hash projection
    * [[scrubSharedNgramSpans]] consumes — exposed (the
    * [[sourceNgramSets]] materialize-once idiom) because the scrub
    * reads it TWICE (df aggregation + coverage semi-join): a corpus-
    * scale run computes it once, persists/checkpoints it, and calls
    * [[scrubSharedNgramSpansFrom]], instead of paying the gram explode
    * and per-gram digest twice inside one composed plan. */
  def ngramPositionHashes(docs: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // r16: fused native gram digest (see [[graft.ops.Dedup.simHashMd5]]
    // note) — positional form; hash values identical to the prior
    // transform/concat_ws/md5_prefix60 chain.
    Spread.cpu(docs)
      .select(col("doc_id"), split(col("text"), " ").as("wd"))
      .filter(size(col("wd")) >= n)
      .select(col("doc_id"), posexplode(
        graft.functions.Md5ShingleFunctions.md5ShinglePosHashes(col("wd"), n))
        .as(Seq("pos", "h")))
  }

  /** [[scrubSharedNgramSpans]] over a pre-materialized
    * [[ngramPositionHashes]] frame (parity-tested in DedupSpec). */
  def scrubSharedNgramSpansFrom(docs: DataFrame, hashed: DataFrame,
                                n: Int = 5, minDf: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 2, s"minDf < 2 would scrub every token, got $minDf")
    val toked = Spread.cpu(docs)
      .select(col("doc_id"), split(col("text"), " ").as("wd"))
    // r16: the gram-hash projection is consumed TWICE (df aggregation +
    // coverage semi-join) — as two plan branches it would compute the
    // gram explode + digest twice per run. Establishing ONE hash(h)
    // exchange here lets both consumers reuse it (guide §2.4 "share one
    // exchange"): the groupBy's required distribution is already
    // satisfied and the semi-join's probe side re-reads the same shuffle
    // output, so the expensive projection runs once.
    val hashedOnce = hashed.repartition(col("h"))
    val heavy = hashedOnce.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= minDf).select("h")
    val covered = hashedOnce.join(heavy, Seq("h"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val toks = toked.select(col("doc_id"), posexplode(col("wd")))
      .select(col("doc_id"), col("pos").as("p"), col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        // r17: collect_list + array_sort reassembly (r16's listagg swap
        // REGRESSED: q73/q84 consistently slower at 32 cores and q84 ran
        // 38–115 s at 8 cores — ListAgg's TypedImperativeAggregate buffer
        // degrades as per-partition group state grows, exactly the
        // at-scale regime). `p` unique per doc ⇒ struct sort = ORDER BY p.
        // Field extraction via getField (native GetArrayStructFields),
        // NOT the interpreted per-element transform() lambda of r15.
        array_join(array_sort(collect_list(struct(col("p"), col("tok"))))
          .getField("tok"), " ").as("text"))
    toked.select(col("doc_id"), size(col("wd")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_scrubbed"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Text canonicalization for normalize-then-dedup (the C4/RefinedWeb
    * recipe): lowercase, strip everything but letters/digits/whitespace,
    * collapse whitespace runs, trim. Two trivially-different crawls of
    * the same page ("Hello, World!" vs "hello world") collapse to one
    * key, catching the near-dup mass that exact hashing misses WITHOUT
    * any pair stage — a pure projection, so it composes with
    * [[exactByHash]]/[[dedupAgainstCorpus]] unchanged. The chain is
    * engine-identical by construction (the q75 redactPii discipline):
    * `\p{L}\p{N}` agree between Java and RE2, whitespace is an EXPLICIT
    * class (Java's `\s` includes vertical tab, RE2's does not — so VT
    * is left out of the keep-class and stripped identically), and the
    * Greek final sigma is folded to σ after lowercasing (Java applies
    * the context-sensitive Σ→ς final-position rule, utf8proc does not —
    * folding makes both engines emit σ, which is also the right
    * canonicalization for dedup). */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(text), "ς", "σ"),
        "[^\\p{L}\\p{N} \\t\\n\\r\\f]", ""),
      "[ \\t\\n\\r\\f]+", " "))

  /** [[exactByHash]] over the [[normalizeForDedup]] canonical form:
    * survivors keyed on the normalized content (min doc_id), with the
    * normalized key's hash. Same 32-byte-key shuffle shape. */
  def exactDedupNormalized(df: DataFrame, text: Column, id: Column): DataFrame =
    exactByHash(df, normalizeForDedup(text), id)

  /** Near-dup pairs by exact shingle Jaccard, candidates from an inverted
    * index: explode distinct shingles → equi-self-join on shingle →
    * shared-count per pair → Jaccard ≥ `minJaccard`. Join work is Σ df²
    * over shingles — bounded and shuffle-friendly; at extreme corpus sizes
    * swap candidate generation for [[minHashLshPairs]].
    *
    * `pruneSingletons` adds a df>1 prefilter on the inverted index: a
    * shingle in exactly one document can never form a pair, so dropping
    * singletons shrinks the self-join's input without changing the result
    * (Jaccard sizes come from the per-doc arrays, not the pruned index).
    * Worth it when df-skew is real (big corpora, boilerplate shingles);
    * measured a wash at sf0.1 where the extra aggregation pass costs as
    * much as the join it saves — hence opt-in. */
  /** Shared candidate stage of the shingle-index family: (doc_a, doc_b,
    * shared) counts for every pair sharing ≥1 distinct n-gram shingle —
    * the explode → equi-self-join → count pipeline used by
    * [[jaccardNearDupPairs]] and [[editDistancePairs]]. Shingle identity
    * is the 64-bit native hash: the shuffle carries 8-byte keys instead
    * of shingle strings; counts and set sizes are unchanged w.h.p. (a
    * cross-doc collision needs ~2³² distinct shingles per pair).
    * `pruneSingletons` pre-drops df=1 shingles (can never form a pair) —
    * lossless; worth it under df-skew, a measured wash on the fixtures.
    * `maxShingleDf` > 0 additionally drops shingles whose document
    * frequency EXCEEDS the cap ("stop-shingles"): a boilerplate shingle
    * in d documents contributes d·(d−1)/2 candidate pairs by itself, so
    * one hot shingle at crawl scale is a quadratic bomb — measured 125×
    * runtime at 10× corpus size under heavy duplication, vs ~6× with the
    * collapse/cap defenses. Unlike singleton pruning this is LOSSY (a
    * pair whose every shared shingle is boilerplate is never
    * considered); callers own the semantic shift and their oracles
    * mirror the same df filter. */
  private[graft] def sharedShinglePairs(docs: DataFrame, n: Int,
                                        pruneSingletons: Boolean,
                                        maxShingleDf: Int = 0): DataFrame = {
    val sh = Spread.cpu(docs).select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    val ex0 = sh.select(col("doc_id"), explode(col("s")).as("sg"))
    // the df-dependent filters broadcast the SMALL side of each rule:
    // stop-shingles (df > cap) are few by construction → anti-join;
    // repeated shingles (df > 1) are the minority of a natural-text
    // vocabulary → semi-join. Broadcasting the keep set (df ≤ cap ≈ the
    // whole vocabulary) would OOM the driver at crawl scale.
    lazy val dfs = ex0.groupBy("sg").count()
    val afterCap =
      if (maxShingleDf <= 0) ex0
      else ex0.join(broadcast(
          dfs.filter(col("count") > maxShingleDf).select("sg")),
        Seq("sg"), "left_anti")
    val ex =
      if (!pruneSingletons) afterCap
      else afterCap.join(broadcast(
          dfs.filter(col("count") > 1).select("sg")),
        Seq("sg"), "left_semi")
    ex.as("a").join(ex.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
  }

  /** `maxShingleDf` > 0 switches the semantics to "Jaccard over
    * non-boilerplate shingles": stop-shingles (df > cap) are removed
    * from BOTH the candidate index and the per-doc set sizes, so the
    * reported coefficient is exact over the kept shingle sets. Singleton
    * pruning stays lossless (sizes keep df=1 shingles, which belong to
    * exactly one side and never intersect — dropping them from sizes
    * would inflate Jaccard). At fixture scale the cap is exercised with
    * tiny values; a real crawl deployment caps in the thousands. */
  /** Per-doc count of KEPT shingles (shared by the Jaccard and
    * overlap-coefficient confirms): with a df cap the filter broadcasts
    * the small stop set (df > cap), never the vocabulary-sized keep
    * set. */
  private def keptShingleSizes(docs: DataFrame, n: Int,
                               maxShingleDf: Int): DataFrame = {
    val sh = Spread.cpu(docs).select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    if (maxShingleDf <= 0) sh.select(col("doc_id"), size(col("s")).as("n"))
    else {
      val ex0 = sh.select(col("doc_id"), explode(col("s")).as("sg"))
      val stop = ex0.groupBy("sg").count()
        .filter(col("count") > maxShingleDf).select("sg")
      ex0.join(broadcast(stop), Seq("sg"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
    }
  }

  def jaccardNearDupPairs(docs: DataFrame, minJaccard: Double, n: Int = 3,
                          pruneSingletons: Boolean = false,
                          maxShingleDf: Int = 0): DataFrame = {
    val sizes = keptShingleSizes(docs, n, maxShingleDf)
    val pairs = sharedShinglePairs(docs, n, pruneSingletons, maxShingleDf)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard_raw",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard_raw") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard_raw"), 3).as("jaccard"))
  }

  /** Overlap-coefficient (containment) near-dup pairs:
    * overlap(A, B) = |A∩B| / min(|A|, |B|) over word-`n`-gram shingle
    * sets — the INCLUSION detector symmetric Jaccard structurally
    * misses. A short document wholly quoted inside a long one scores
    * overlap 1.0 but Jaccard |A|/|B| (arbitrarily low as the host
    * grows), so quote-inclusion, boilerplate-wrapping, and
    * fragment-of-a-page duplicates only surface here. Same
    * inverted-index candidate stage as [[jaccardNearDupPairs]] (never
    * all-pairs), same df-cap semantics; output mirrors it:
    * (doc_a, doc_b, overlap rounded to 3). */
  def overlapCoefficientPairs(docs: DataFrame, minOverlap: Double, n: Int = 3,
                              pruneSingletons: Boolean = false,
                              maxShingleDf: Int = 0): DataFrame = {
    val sizes = keptShingleSizes(docs, n, maxShingleDf)
    sharedShinglePairs(docs, n, pruneSingletons, maxShingleDf)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("overlap_raw",
        col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("overlap_raw") >= minOverlap)
      .select(col("doc_a"), col("doc_b"), round(col("overlap_raw"), 3).as("overlap"))
  }

  /** Edit-distance (Levenshtein) near-dup pairs: candidates from the
    * shingle inverted index (pairs sharing ≥ `minSharedShingles` distinct
    * n-gram shingles — the [[jaccardNearDupPairs]] machinery, never
    * all-pairs), confirmed by exact Levenshtein ≤ `maxDist` on the
    * candidate texts only. The confirm uses Spark's bounded
    * `levenshtein(l, r, threshold)` — O(len·maxDist) banded DP instead of
    * O(len²), returning −1 past the bound, so the per-pair confirm cost
    * stays linear in the text. Character-level edit distance catches
    * small in-place edits (typo/number swaps) that shingle Jaccard
    * under-scores; the candidate gate makes the operator's semantics
    * "among shingle-sharing candidates", which the oracle mirrors
    * exactly. */
  def editDistancePairs(docs: DataFrame, maxDist: Int, n: Int = 3,
                        minSharedShingles: Int = 3,
                        pruneSingletons: Boolean = false): DataFrame = {
    val cand = sharedShinglePairs(docs, n, pruneSingletons)
      .filter(col("shared") >= minSharedShingles)
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("ta"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("tb"))
    cand.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("dist"))
  }

  /** Content-defined chunking (CDC): a chunk boundary is placed BEFORE
    * token j when the `window`-token n-gram ENDING AT TOKEN j−1 (the
    * window of tokens immediately preceding j) satisfies
    * `bucket % modulus == 0` — i.e. a qualifying window closes the
    * current chunk and the next token starts a new one. Boundaries
    * depend only on LOCAL content,
    * so inserting or deleting a prefix shifts every token position yet
    * reproduces the SAME chunks after the edit region (the
    * rsync/LBFS/FastCDC property; fixed-size chunking loses all
    * alignment). This is the shift-resistant complement to
    * [[wordChunks]]: chunk-granular dedup over near-identical documents
    * keeps working when edits move content around.
    *
    * The boundary hash is the engine-portable md5-bucket rule shared
    * with `Curation.hashSplit` (first 24 md5 bits), NOT an internal
    * 64-bit hash — so the full chunking is SQL-mirrorable and
    * oracle-checked (q102). Shape: one explode (a row per token), one
    * per-doc cumsum window, one (doc, chunk) groupBy — nothing
    * corpus-wide. Output: doc_id, chunk_idx, start_pos, n_toks,
    * chunk_text. */
  def cdcChunks(docs: DataFrame, window: Int = 5, modulus: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    // r17: native md5_prefix24 — value-identical to
    // `conv(substring(md5(s),1,6),16,10)` but digest→long with no 32-char
    // hex render / base-16 string parse per token (§1.2 per-task work,
    // the Md5Prefix60 pattern; the oracle keeps deriving the same value
    // from its own md5 builtin)
    val bucket = (s: Column) => graft.functions.Md5Functions.md5Prefix24(s)
    // flat posexplode + codegen projection: the md5 boundary hash runs in
    // the whole-stage span, not inside an interpreted transform() lambda
    // (measured 4.4 s → ~1 s at sf0.1 for the lambda variant of this)
    val j = (col("pos0") + 1).as("j")
    val ex = Spread.cpu(docs).select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), j, col("tok"),
        when(col("pos0") + 1 > window,
          (bucket(concat_ws(" ", slice(col("toks"),
            greatest(col("pos0") + 1 - lit(window), lit(1)), lit(window))))
            % modulus === 0).cast("int"))
          .otherwise(lit(0)).as("nc"))
    val w = Window.partitionBy("doc_id").orderBy("j")
      .rowsBetween(Window.unboundedPreceding, 0)
    ex.withColumn("chunk_idx", (sum("nc").over(w) + 1).cast("long"))
      .groupBy("doc_id", "chunk_idx")
      .agg(min("j").cast("long").as("start_pos"), count(lit(1)).as("n_toks"),
        // native ordered listagg (Spark 4) — no interpreted
        // collect+sort+transform lambda in the reassembly
        expr("listagg(tok, ' ') WITHIN GROUP (ORDER BY j)").as("chunk_text"))
  }

  /** Number of MinHash permutations / LSH bands (4 rows per band →
    * threshold ≈ (1/32)^(1/4) ≈ 0.42; candidates then exact-verified). */
  val MinHashes = 128
  val Bands     = 32
  private val RowsPerBand = MinHashes / Bands

  /** Band signature keys for a pre-hashed shingle set: minhash under
    * `MinHashes` seeded splitmix64 families, folded into one 64-bit key
    * per band. */
  private[graft] def bandKeys(hashed: Seq[Long]): Seq[Long] = {
    if (hashed == null || hashed.isEmpty) return Seq.empty
    val base = hashed.toArray
    val mins = new Array[Long](MinHashes)
    var i = 0
    while (i < MinHashes) {
      var m = Long.MaxValue
      var j = 0
      while (j < base.length) {
        val h = mix64(base(j) ^ (i.toLong * 0x9e3779b97f4a7c15L))
        if (h < m) m = h
        j += 1
      }
      mins(i) = m
      i += 1
    }
    (0 until Bands).map { b =>
      var acc = b.toLong // band index in the key → buckets never cross bands
      var r = 0
      while (r < RowsPerBand) {
        acc = mix64(acc ^ mins(b * RowsPerBand + r))
        r += 1
      }
      acc
    }
  }

  /** Band-key column: native codegen'd [[graft.functions.MinHashBandKeys]]
    * (bit-identical to [[bandKeys]], which stays as the spec's reference
    * implementation for the parity test and the group-MinHash UDAF). */
  private def bandKeysCol(hashes: Column): Column =
    graft.functions.MinHashFunctions.minHashBandKeys(hashes, MinHashes, Bands)

  /** Shared exact-Jaccard confirm stage of [[minHashLshPairs]] /
    * [[minHashLshAgainstCorpus]]: attach each side's shingle set to the
    * candidate pairs and keep pairs with Jaccard ≥ `minJaccard` (one
    * definition so the confirm semantics — intersection math, threshold
    * comparison, 3-decimal rounding — can never drift between the
    * self-join and incremental paths). `shLeft`/`shRight` must already
    * be pruned to the candidate docs: pruning is the caller's
    * scale-critical step, not an implementation detail here. */
  private def confirmJaccard(cands: DataFrame, shLeft: DataFrame,
                             shRight: DataFrame, leftCol: String,
                             rightCol: String, minJaccard: Double): DataFrame =
    cands
      .join(shLeft.select(col("doc_id").as(leftCol), col("s").as("sa")), leftCol)
      .join(shRight.select(col("doc_id").as(rightCol), col("s").as("sb")), rightCol)
      .withColumn("jaccard_raw",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
      .filter(col("jaccard_raw") >= minJaccard)
      .select(col(leftCol), col(rightCol),
        round(col("jaccard_raw"), 3).as("jaccard"))

  /** Drops every row of `banded` whose band key is shared by MORE than
    * `maxBandSize` docs. A band bucket of d docs emits d·(d−1)/2
    * candidate pairs by itself, so one hot bucket — boilerplate text,
    * near-empty docs, a degenerate shingle distribution — is the same
    * quadratic bomb [[sharedShinglePairs]]'s `maxShingleDf` defuses for
    * the shingle index. Capping is standard LSH practice: a full bucket
    * carries almost no discriminative signal (its members collide on a
    * band by construction, i.e. they are boilerplate-alike), and the cap
    * bounds candidate growth to maxBandSize·|bands| instead of Σ d².
    * LOSSY like the shingle cap: a pair whose every colliding band is
    * hot is never considered. The hot-band set (df > cap) is small by
    * construction → broadcast anti-join, same shape as the stop-shingle
    * filter. */
  private def capBands(banded: DataFrame, maxBandSize: Int): DataFrame =
    dropHotKeys(banded, "band", maxBandSize)

  /** Default hot-key cap for the CLUSTER-LEVEL dedup entry points
    * ([[nearDupClusters]], [[nearDupClustersCollapsed]],
    * `Similarity.semanticClustersCollapsed`). Sizing: for random
    * non-duplicate text the expected band-bucket size is ~1, and a real
    * near-dup group the clusterers should preserve is tens of documents,
    * so 256 is ≥10× any bucket the workload intends while bounding one
    * pathological bucket (site boilerplate, empty-ish documents) to
    * ≤ C(256,2) ≈ 33k candidate pairs instead of corpus². A 100 TB run
    * that hits the cap loses only pairs whose EVERY colliding band is
    * boilerplate-hot — pass `maxBandSize = 0` to the entry point for the
    * exact (quadratic-risk) behavior. The raw pair primitives
    * ([[minHashLshPairs]], `lshCosineNearDupPairs`) stay uncapped by
    * default: their contract is the exact confirmed pair set. */
  val DefaultHotKeyCap = 256

  /** The ONE hot-key cap all LSH candidate stages share (MinHash bands
    * here, sign-LSH buckets in `Similarity.lshCosineCandidates`): drop
    * every row whose `keyCol` value occurs STRICTLY more than `cap`
    * times. `cap` ≤ 0 disables. Shared so the cap semantics (strict
    * comparison, anti-join) cannot drift between the Jaccard and cosine
    * paths. The hot set is small for any sane cap, and AQE turns the
    * anti-join into a broadcast join at runtime when it measures small —
    * deliberately NOT a `broadcast()` hint, because a misconfigured tiny
    * cap (cap=1 on a crawl-scale band frame) makes the hot set
    * corpus-sized, and a hint there would OOM the driver; un-hinted, the
    * same mistake degrades to an ordinary shuffle anti-join. */
  private[graft] def dropHotKeys(df: DataFrame, keyCol: String, cap: Int): DataFrame =
    if (cap <= 0) df
    else df.join(
      df.groupBy(keyCol).count()
        .filter(col("count") > cap).select(keyCol),
      Seq(keyCol), "left_anti")

  /** Candidate stage of [[minHashLshPairs]]: distinct (doc_a, doc_b)
    * pairs colliding on ≥1 kept band. Exposed for the DedupSpec
    * duplication-blowup measurement. */
  private[graft] def minHashBandCandidates(docs: DataFrame, n: Int,
                                           maxBandSize: Int): DataFrame =
    bandCandidatesFromShingles(
      Spread.cpu(docs).select(col("doc_id"), hashedShingles(col("text"), n).as("s")),
      maxBandSize)

  /** [[minHashBandCandidates]] over an already-shingled `(doc_id, s)`
    * frame — lets [[minHashLshPairs]] share ONE shingle projection
    * between the candidate stage and the confirm joins instead of
    * re-computing `hashedShingles` per consumer. */
  private def bandCandidatesFromShingles(sh: DataFrame,
                                         maxBandSize: Int): DataFrame = {
    // r16/r17: the banded frame feeds the cap's aggregate + anti-join and
    // both self-join sides — four branches, each re-running the
    // 128-permutation MinHash band signatures (a pure projection, no
    // exchange to reuse). ONE repartition of the exploded (doc_id, band)
    // rows makes the signature computation run once and every branch a
    // ReusedExchange (guide §2.4). r17 re-keys it from hash(doc_id) to
    // hash(band) — the key EVERY consumer clusters on (the cap's groupBy,
    // its anti-join, and both self-join sides) — so the shared exchange
    // also SATISFIES their required distributions instead of each branch
    // stacking its own hash(band) exchange on top (the undocumented r16
    // cost on q33/q72). Skew is not worsened: the band self-join needs
    // hash(band) placement regardless; this just stops paying for it
    // twice, and the hot-band cap bounds bucket size before the join.
    val banded = capBands(
      sh.select(col("doc_id"), explode(bandKeysCol(col("s"))).as("band"))
        .repartition(col("band")),
      maxBandSize)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs: band signatures → equi-self-join on band
    * key (candidate pairs, no cross join) → exact Jaccard confirm ≥
    * `minJaccard`. Output matches [[jaccardNearDupPairs]]: (doc_a, doc_b,
    * jaccard). `maxBandSize` > 0 drops hot band buckets before the
    * self-join (see [[capBands]]) — lossy, off by default; a crawl-scale
    * deployment caps in the hundreds. */
  def minHashLshPairs(docs: DataFrame, minJaccard: Double, n: Int = 3,
                      maxBandSize: Int = 0): DataFrame = {
    val sh = docs.select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    val cands = bandCandidatesFromShingles(sh, maxBandSize)
    // prune the corpus-sized shingle frame to candidate docs BEFORE the
    // confirm joins — at scale |candidates| << |corpus|, so the two joins
    // below shuffle only the near-dup suspects' shingles
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    val shCand = sh.join(candDocs, Seq("doc_id"), "left_semi")
    confirmJaccard(cands, shCand, shCand, "doc_a", "doc_b", minJaccard)
  }

  /** Winnowing document fingerprints (the MOSS algorithm): from the
    * word-`n`-gram shingle stream, select the minimum-hash shingle of
    * EVERY `w`-length window (ties → rightmost position), dedup'd —
    * the classic guarantee: any match of at least w+n-1 consecutive
    * words between two documents shares at least one selected
    * fingerprint, while only ~2/(w+1) of positions are kept. The
    * robust plagiarism/near-dup index: fingerprints go into an
    * inverted index like shingles, but w× smaller and
    * position-carrying.
    *
    * Engine-reproducible selection: the hash is md5 hex (native,
    * codegen'd, and available verbatim in the oracle engine — the fnv
    * `ShinglePosHashes` path is faster but its ordering cannot be
    * re-derived outside the JVM), and the rightmost-min rule is
    * encoded in ONE sortable string `md5 ‖ zero-padded (10⁹−1−pos)` so
    * `min` picks the smallest hash then the largest position,
    * identically in any engine. Per-doc windows only — the window
    * function partitions by doc_id, so nothing corpus-wide shuffles
    * beyond the doc-keyed exchange.
    *
    * @return (doc_id, pos, fp) — distinct selected fingerprints;
    *         docs with fewer than n+w-1 words yield no rows (no full
    *         window exists)
    */
  def winnowingFingerprints(docs: DataFrame, n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1 && w >= 1, s"n and w must be >= 1, got n=$n w=$w")
    // r17: winnowing is a per-DOCUMENT selection, so the explode-every-
    // gram → doc-keyed window min(enc) → distinct pipeline (one exchange
    // for the window, one for the distinct, an interpreted
    // transform/slice/concat_ws gram chain, and a 41-char enc string per
    // gram) collapses to ONE scan-stage kernel (§1.2 step 1 — the q172
    // DupNgramStats precedent). [[graft.functions.WinnowingOps]] applies
    // the identical rules: md5-hex ordering via unsigned digest bytes
    // (order-isomorphic to the hex string), ties → rightmost position
    // (what min over `md5 ‖ pad(10⁹−1−pos)` encoded), full windows only,
    // selected set dedup'd, same (doc_id, pos, fp) rows out.
    val toked = docs.select(col("doc_id"), split(col("text"), " ").as("wd"))
      .filter(size(col("wd")) >= n)
    toked
      .select(col("doc_id"), explode(
        graft.functions.WinnowingFunctions.winnowingFps(col("wd"), n, w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** 64-bit SimHash over pre-hashed shingles. */
  private[graft] def simHash64(hashes: Seq[Long]): Long = {
    val acc = new Array[Int](64)
    hashes.foreach { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash column: native codegen'd [[graft.functions.SimHash64]]
    * (bit-identical to [[simHash64]], the reference implementation). */
  private def simHashCol(hashes: Column): Column =
    graft.functions.MinHashFunctions.simHash64(hashes)

  /** Per-document SimHash fingerprint (hex) + shingle count. */
  def simHash(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
      .select(col("doc_id"), lpad(hex(simHashCol(col("s"))), 16, "0").as("simhash"),
        size(col("s")).cast("long").as("n_shingles"))

  /** Engine-portable SimHash: the classic per-bit majority vote of
    * [[simHash]], but over md5-DERIVED 60-bit shingle hashes (first 15
    * md5 hex chars → a non-negative long) instead of the internal fnv
    * pipeline — so the WHOLE fingerprint, shingling included, is
    * re-derivable verbatim in any engine with md5 and the bit-vote is a
    * full value oracle (the q141 winnowing md5-ordering precedent,
    * extended from ordering to bit arithmetic). Bit j of the fingerprint
    * is set iff STRICTLY more than half of the document's distinct
    * word-`n`-gram shingles have bit j set in their hash — ties → 0,
    * deterministic in any engine.
    *
    * Shape: explode distinct shingles (the q32 inverted-index projection),
    * then ONE doc-keyed groupBy whose 61 aggregate columns are the shingle
    * count plus a `sum((h >> j) & 1)` per bit — the whole 60-way vote is a
    * single partial-aggregated pass (the shuffle carries 61 longs per
    * (doc, partition), never a 60× row fanout), and the fingerprint
    * reassembles in one codegen'd projection over the vote columns. Still
    * slower than [[simHash]]'s fused native expression (which stays the
    * fast path); this is the cross-engine-auditable sibling, same trade
    * as `winnowingFingerprints`' md5 encoding. The hash kernel is the
    * native [[graft.functions.Md5Prefix60]] — value-identical to
    * `conv(substring(md5(x),1,15),16,10)` (what the oracle derives) but
    * digest→long with no hex-render/parse round-trip. `h` is
    * non-negative (< 2^60 by construction) so the shift-and-mask bit
    * probe is exact.
    *
    * @return (doc_id, simhash60, n_shingles); docs with fewer than `n`
    *         words yield no row */
  def simHashMd5(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toked = Spread.cpu(docs)
      .select(col("doc_id"), split(col("text"), " ").as("wd"))
      .filter(size(col("wd")) >= n)
    // r16: the gram construction + digest are ONE fused native pass
    // ([[graft.functions.Md5ShingleHashes]]) — the prior
    // `explode(array_distinct(transform(..., concat_ws(slice))))` +
    // per-row md5_prefix60 evaluated the HOF interpreted per element and
    // materialized every gram string (guide §1.2 per-task work; measured
    // q163 executor time 28.6 s → see OPTIMIZATION_r16.md). Hash values
    // and the distinct set are bit-identical (dedup keys on the full
    // 128-bit digest), so the DuckDB oracles are unchanged.
    val sh = toked.select(col("doc_id"), explode(
      graft.functions.Md5ShingleFunctions.md5ShingleHashes(col("wd"), n)).as("h"))
    val ones = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"b$j"))
    val voted = sh.groupBy("doc_id")
      .agg(count(lit(1)).as("m"), ones: _*)
    val fp = (0 until 60).map(j =>
        when(col(s"b$j") * 2 > col("m"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select(col("doc_id"), fp.as("simhash60"),
      col("m").as("n_shingles"))
  }

  /** Engine-portable SimHash near-dup pairs: [[simHashMd5]] fingerprints
    * fed through the shared [[hamming64Pairs]] banded candidate machinery
    * (pigeonhole-complete at `maxHamming`, exact `bit_count(xor)` confirm).
    * Because the fingerprint itself is md5-derived, the FULL pair set —
    * candidates, confirm, and hamming values — is re-derivable in any
    * engine with md5 (the fast internal-hash [[simHashNearDupPairs]] stays
    * the throughput path; this is its cross-engine-auditable sibling).
    *
    * Band-width note for scale: bands are `64 / (first power of two >
    * maxHamming)` bits wide, so `maxHamming ≤ 3` gives 16-bit bands (65k
    * buckets — the 100 TB setting); higher thresholds shrink bands and
    * grow per-bucket candidate fanout, the usual LSH recall/cost dial.
    * At the default `maxHamming = 6` the bands are 8 bits — 256 possible
    * bucket values per band — so `maxBucketSize` (the [[hamming64Pairs]]
    * hot-bucket cap, default [[DefaultHotKeyCap]]) is what keeps a
    * fingerprint-concentrated corpus from degrading the self-join toward
    * N²/256 per band. Lossy: a pair drops iff its every agreeing band is
    * hot; pass 0 for the exact pigeonhole-complete pair set (quadratic
    * risk — the cross-engine-completeness-oracle setting, not the 100 TB
    * one).
    *
    * @return (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤
    *         `maxHamming` over the 60-bit fingerprints */
  def simHashMd5NearDupPairs(docs: DataFrame, maxHamming: Int = 6,
                             n: Int = 3,
                             maxBucketSize: Int = DefaultHotKeyCap): DataFrame =
    hamming64Pairs(
      simHashMd5(docs, n).select(col("doc_id"), col("simhash60").as("h")),
      maxHamming, maxBucketSize)

  /** Engine-portable group-wise MinHash signature — the md5 sibling of
    * the [[graft.ops.MinHashSignatureAgg]] UDAF (q62), in the same spirit
    * as [[simHashMd5]]: hash function `i` of shingle `sg` is the 60-bit
    * integer from the first 15 hex chars of `md5(i ‖ "|" ‖ sg)`, and the
    * group signature entry is the MIN over every shingle of every group
    * member — re-derivable verbatim in any engine with md5, so the WHOLE
    * signature (not just its row count) is a value oracle. MinHash is a
    * lattice homomorphism: min over the group's shingle MULTISET equals
    * min over its set union, so no distinct is needed anywhere and the
    * aggregation partial-merges map-side — the shuffle carries `k` longs
    * per (group, partition), never shingles. The `k` hashes ride as `k`
    * min-aggregate COLUMNS over the shingle rows (no k× row fanout —
    * only the final per-group signature unpivots to the long shape), so
    * `k` costs k digests per shingle and nothing else (the native
    * [[graft.functions.Md5Prefix60]] kernel — oracle-identical value,
    * no hex round-trip). The UDAF
    * (one fused native pass, 128 mixes per shingle) remains the scale
    * path.
    *
    * @return one row per (group, hash_idx): groupCols..., hash_idx,
    *         minhash — the long-table shape both engines aggregate
    *         identically */
  def groupMinHashMd5(docs: DataFrame, groupCols: Seq[String],
                      k: Int = 16, n: Int = 3): DataFrame = {
    require(k >= 1 && k <= 256, s"k out of range: $k")
    require(n >= 1, s"n must be >= 1, got $n")
    val g = groupCols.map(col)
    val toked = Spread.cpu(docs)
      .select(g :+ split(col("text"), " ").as("wd"): _*)
      .filter(size(col("wd")) >= n)
    // r16: per-row fused signature ([[graft.functions.Md5MinHashK]]) —
    // the k digests per gram still happen, but the gram explode (one
    // row per position), the interpreted transform/concat_ws gram
    // construction, and the k-column projection through the aggregate
    // all collapse into one native pass; the group aggregate then takes
    // element-wise mins of k-long arrays. min(over docs, over grams) ==
    // min(over the group's gram multiset): values identical.
    val sigs = toked.select(g :+ graft.functions.Md5ShingleFunctions
      .md5MinHashK(col("wd"), n, k).as("graft_sig"): _*)
    val mins = (0 until k).map(i =>
      min(element_at(col("graft_sig"), i + 1)).as(s"m$i"))
    sigs.groupBy(groupCols.head, groupCols.tail: _*)
      .agg(mins.head, mins.tail: _*)
      .select(g :+ explode(array((0 until k).map(i =>
        struct(lit(i.toLong).as("hash_idx"), col(s"m$i").as("minhash"))): _*))
        .as("e"): _*)
      .select(g :+ col("e.hash_idx").as("hash_idx")
        :+ col("e.minhash").as("minhash"): _*)
  }

  /** Hamming-near pairs over ANY 64-bit fingerprint frame `(doc_id, h)` —
    * the banded candidate machinery shared by [[simHashNearDupPairs]]
    * (text SimHash) and `Multimodal.imageNearDupPairs` (perceptual image
    * hashes). The fingerprint is cut into the smallest power-of-two band
    * count STRICTLY greater than `maxHamming` (so any pair within the
    * threshold agrees on ≥1 whole band by pigeonhole — candidate
    * completeness is guaranteed, not probabilistic), candidates come from
    * a band-bucket equi-self-join, and the exact `bit_count(xor)` confirm
    * keeps only pairs at `hamming ≤ maxHamming`. Same
    * inverted-index-not-cross-join shape as MinHash banding; fewer bits
    * per band (higher thresholds) → more candidates per bucket, the usual
    * LSH recall/cost dial.
    *
    * `maxBucketSize` > 0 drops every (band, bits) bucket holding STRICTLY
    * more than that many fingerprints BEFORE the self-join (the shared
    * [[dropHotKeys]] cap). This matters here even more than on the
    * MinHash path: at `maxHamming` in [4, 7] the bands are 8 bits wide —
    * only 256 possible bucket values per band — so on a corpus whose
    * fingerprints concentrate (boilerplate-heavy crawl text, near-blank
    * images) the uncapped self-join degrades toward N²/256 per band.
    * LOSSY like every LSH cap: a pair is silently dropped iff EVERY band
    * the two fingerprints agree on is hot. 0 disables (exact pigeonhole
    * completeness — the quadratic risk is the caller's). */
  private[graft] def hamming64Pairs(fp: DataFrame, maxHamming: Int,
                                    maxBucketSize: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (16 bands of 4 bits), got $maxHamming")
    val bands = Seq(1, 2, 4, 8, 16).find(_ > maxHamming).get
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    // r16/r17: the fingerprint frame feeds both sides of the band
    // self-join plus the hot-bucket cap's aggregate + anti-join — FOUR
    // plan branches. Exchange reuse (AQE stage cache / ReuseExchange)
    // dedupes canonically-identical exchanges at runtime, but a
    // fingerprint built by pure PROJECTION (the internal-hash simhash
    // path, the image phash decode) has no exchange to reuse — each
    // branch would recompute the per-doc fingerprint, for images the
    // full pixel decode. ONE deterministic repartition gives every
    // branch the shared exchange (guide §2.4). r17 re-keys it from
    // hash(doc_id) (which satisfied NO consumer — every branch stacked
    // its own hash(bk) exchange on top, the undocumented r16 cost on
    // q187/q36) to hash(bk), the band-bucket key the cap's groupBy, its
    // anti-join, and both self-join sides all cluster on — so the one
    // exchange is also the only one. Skew is not worsened: the band
    // self-join needs hash(bk) placement regardless, and the hot-bucket
    // cap bounds bucket size before the join. Pinned by the
    // NativeKernelParitySpec runtime-plan tests.
    val banded0 = fp.select(col("doc_id"), col("h"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("h"), b * bits).bitwiseAND(mask).as("bits"))): _*)).as("bk"))
      .repartition(col("bk"))
    val banded = dropHotKeys(banded0, "bk", maxBucketSize)
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** SimHash near-dup pairs: candidates share at least one simhash band
    * (any pair within the hamming threshold must agree on one band by
    * pigeonhole — see [[hamming64Pairs]]); confirmed at `maxHamming`.
    * `maxBucketSize` is the hot-band-bucket cap (lossy, default
    * [[DefaultHotKeyCap]]; 0 = exact) — see [[hamming64Pairs]]. */
  def simHashNearDupPairs(docs: DataFrame, maxHamming: Int = 3, n: Int = 3,
                          maxBucketSize: Int = DefaultHotKeyCap): DataFrame = {
    require(maxHamming <= 3,
      "4 bands of 16 bits guarantee candidate completeness only for hamming <= 3")
    val fp = docs.select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
      .select(col("doc_id"), simHashCol(col("s")).as("h"))
    hamming64Pairs(fp, maxHamming, maxBucketSize)
  }

  /** Incremental dedup of a new batch against an existing (huge) corpus:
    * a Bloom filter over the corpus content hashes prefilters the
    * batch — rows the filter says are definitely-new pass with NO join at
    * all; only possible-dups (corpus-hit or false positive) go through
    * the exact anti-join. At 100 TB this turns "anti-join every new batch
    * against the corpus" into "ship a few-GB bitset + anti-join a tiny
    * suspect set". Result is exact (false positives are resolved by the
    * anti-join). Sizes are clamped to Spark's runtime-filter caps
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`.maxNumBits`,
    * which the native aggregate enforces at ANALYSIS time): a clamp only
    * raises the false-positive rate — more suspects through the exact
    * anti-join, never a wrong result — where an unclamped literal would
    * fail the whole job; raise the confs to regain the configured fpp at
    * corpus scale.
    *
    * `textKey` is the content the batch side is hashed on — pass
    * [[normalizeForDedup]]`(col("text"))` (with a corpus keyed the same
    * way, e.g. [[exactDedupNormalized]]'s hashes) for incremental
    * normalize-then-dedup; the default preserves raw-text keying. */
  def dedupAgainstCorpus(newDocs: DataFrame, corpusHashes: DataFrame,
                         expectedItems: Long, fpp: Double = 0.01,
                         textKey: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // Build the filter with the native BloomFilterAggregate (partial
    // sketches merge executor-side, exactly like a map-side combine), and
    // probe with the codegen'd BloomFilterMightContain over xxhash64 of
    // the content hash — the same expression pair Spark's own runtime
    // row-level filtering uses, with no UDF serde on the probe's hot path.
    val xxOf = (c: Column) =>
      new XxHash64(Seq(GraftSqlBridge.expression(c)))
    val conf = newDocs.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val items = math.min(expectedItems, maxItems)
    val numBits = math.min(maxBits, org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(items, fpp))
    val blobRow = corpusHashes.select(GraftSqlBridge.column(
      new BloomFilterAggregate(xxOf(col("content_hash")),
        Literal(items), Literal(numBits)).toAggregateExpression()
    ).as("bf")).head()
    val hashed = newDocs.withColumn("content_hash",
      GraftFunctions.blake2b_256(textKey))
    // Null blob = empty corpus (the aggregate yields null when no bit was
    // ever set) — everything in the batch is definitely new.
    if (blobRow.isNullAt(0)) return hashed
    val blob = blobRow.getAs[Array[Byte]](0)
    val mightBeDup = GraftSqlBridge.column(new BloomFilterMightContain(
      Literal(blob, BinaryType), xxOf(col("content_hash"))))
    val definitelyNew = hashed.filter(!mightBeDup)
    val suspects = hashed.filter(mightBeDup)
      .join(corpusHashes, Seq("content_hash"), "left_anti")
    definitelyNew.unionByName(suspects)
  }

  /** Hamming distance between two 64-bit hex simhashes (for near-dup
    * grouping). Pure codegen'd builtins — no UDF serde: a whole 16-digit
    * hex value can't round-trip through `conv(…,16,10)`+CAST (unsigned
    * decimal overflows signed BIGINT), but each 8-digit HALF is ≤ 32 bits
    * and converts safely, and popcount distributes over the halves:
    * bit_count(hi_a^hi_b) + bit_count(lo_a^lo_b). Inputs shorter than 16
    * digits are left-padded (same value `parseUnsignedLong` would see);
    * longer, EMPTY, or non-hex inputs raise (lpad would silently
    * TRUNCATE >16 chars, pad "" to all-zeros — distance 0 to a zero
    * hash — and conv parses garbage as 0: a malformed fingerprint must
    * fail loudly, as the former UDF's parse did, not mis-cluster with a
    * plausible distance). NULL in → NULL out (SQL convention). */
  def hammingHex(a: Column, b: Column): Column = {
    def checked(c: Column): Column =
      when(length(c) > 16 || length(c) === 0 || c.rlike("[^0-9a-fA-F]"),
        raise_error(concat(lit("hammingHex: not a 64-bit hex string: "), c)))
        .otherwise(c)
    def half(c: Column, start: Int): Column =
      conv(substring(lpad(checked(c), 16, "0"), start, 8), 16, 10).cast("long")
    (bit_count(half(a, 1).bitwiseXOR(half(b, 1))) +
      bit_count(half(a, 9).bitwiseXOR(half(b, 9)))).cast("long")
  }

  /** Connected components over an undirected edge list — the step a
    * near-dup pipeline needs between "confirmed pairs" and actual dedup:
    * pairs (a,b) and (b,c) must collapse into ONE cluster so exactly one
    * canonical document survives per group, not one per pair. Implements
    * the alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each round
    * is two aggregate+join passes over the edge list and converges in
    * O(log n) rounds regardless of component diameter — the property that
    * makes it the 100 TB path (naive min-label propagation needs
    * diameter-many rounds, and near-dup graphs form long chains).
    * Per-round `localCheckpoint` truncates the growing lineage; the
    * convergence probe is a (count, xor, xor) signature over
    * xxhash64(edge) — one cheap aggregate instead of a set-difference
    * shuffle. Output: one row per node that appears in `pairs`, labelled
    * `cluster_id` = the smallest node id of its component.
    *
    * Edge sets at or below `driverCutoff` (default 2²⁰ edges ≈ 16 MB)
    * short-circuit to a driver-side union-find — identical output, none
    * of the per-round job latency. Same bounded-driver stance as the IVF
    * quantizer's training sample: near-dup pair sets are collapse-lists,
    * typically orders of magnitude smaller than the corpus, so even a
    * 100 TB run usually lands in this branch; the contraction loop is
    * the unbounded fallback. Pass `driverCutoff = 0` to force the
    * distributed path.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30,
                          driverCutoff: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    val a = col(pairs.columns(0)).cast("long")
    val b = col(pairs.columns(1)).cast("long")
    def canon(df: DataFrame, x: Column, y: Column): DataFrame =
      df.select(least(x, y).as("u"), greatest(x, y).as("v"))
        .filter(col("u") =!= col("v")).distinct()
    // (count, xor of two independently-salted edge hashes): a set
    // signature — edges are kept distinct, and ANSI mode forbids the
    // wrapping sum() variant (long overflow).
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v"))),
        bit_xor(xxhash64(lit(0x5bd1e995), col("v"), col("u")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var edges = canon(pairs, a, b).localCheckpoint()
    // The branch decision needs only the edge count; the xor signature is
    // computed lazily below, only if the distributed loop actually runs —
    // the common (driver-cutoff) path pays one count + one collect over
    // the checkpointed blocks, nothing else.
    val nEdges = edges.count()
    if (nEdges <= driverCutoff) {
      val collected = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      // iterative find + path compression: a recursive find overflows the
      // stack on long parent chains (components arrive in arbitrary
      // collect() order, so chain depth can reach the edge count)
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var cur = x
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      collected.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val nodes = collected.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct
      return spark.createDataFrame(nodes.map(n => (n, find(n))))
        .toDF("node", "cluster_id")
    }
    var sig = signature(edges)
    var converged = nEdges == 0L
    var it = 0
    while (!converged && it < maxIter) {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      // large-star: hook every neighbor v > u onto min(N(u) ∪ {u})
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
      val large = canon(
        sym.join(mins, "u").filter(col("v") > col("u"))
          .select(col("v").as("x"), least(col("mn"), col("u")).as("y")),
        col("x"), col("y"))
      // small-star: hook u and every smaller neighbor onto their min
      val sym2 = large.union(large.select(col("v").as("u"), col("u").as("v")))
      val smaller = sym2.filter(col("v") < col("u"))
      val mins2 = smaller.groupBy("u").agg(min("v").as("mn"))
      val next = canon(
        smaller.join(mins2, "u").select(col("v").as("x"), col("mn").as("y"))
          .union(mins2.select(col("u").as("x"), col("mn").as("y"))),
        col("x"), col("y")).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      edges.unpersist()
      edges = next
      sig = nextSig
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // Fixpoint edges form stars (leaf ↔ component-min center): each
    // node's label is the min over itself and its neighbors.
    edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as("node"), least(col("u"), col("mn")).as("cluster_id"))
  }

  /** Near-dup cluster assignment over the full MinHash-LSH + exact-confirm
    * pair set: `(doc_id, cluster_id)` for every document in some near-dup
    * group, `cluster_id` = smallest doc_id of the group (the canonical
    * survivor a dedup pass would keep).
    *
    * The hot-band cap DEFAULTS ON here ([[DefaultHotKeyCap]]) — the
    * cluster entry points are where a 100 TB crawl meets the quadratic
    * candidate bomb, and a safety net a deployment must discover by
    * reading [[minHashLshPairs]]'s optional knob is not a safety net.
    * `maxBandSize = 0` switches it off for the exact pair semantics. */
  def nearDupClusters(docs: DataFrame, minJaccard: Double = 0.8,
                      maxBandSize: Int = DefaultHotKeyCap): DataFrame =
    connectedComponents(minHashLshPairs(docs, minJaccard,
        maxBandSize = maxBandSize)
        .select("doc_a", "doc_b"))
      .withColumnRenamed("node", "doc_id")

  /** [[nearDupClusters]] with an exact-duplicate collapse in front — the
    * defense a duplication-heavy crawl needs. Identical texts are first
    * collapsed to one representative (min doc_id per blake2b-256 content
    * hash — the [[exactByHash]] key, so the collapse shuffle carries
    * 32-byte hashes, not document text), the quadratic candidate stage
    * runs over REPRESENTATIVES only, and members rejoin their rep
    * through linear star edges before connected components. A document
    * duplicated d times costs the candidate join d² work per shared
    * shingle bucket in the uncollapsed path (measured: 10× corpus of
    * exact copies → 125× runtime) but only d star edges here.
    *
    * Semantics: identical to [[nearDupClusters]] whenever every text has
    * at least one shingle, because identical texts have Jaccard 1 and
    * always pair anyway. The one deliberate difference: identical
    * shingle-LESS texts (shorter than the shingle width) cluster here —
    * exact duplicates are near-duplicates by definition — while the
    * uncollapsed path never sees them (no shingle, no candidate). */
  def nearDupClustersCollapsed(docs: DataFrame,
                               minJaccard: Double = 0.8,
                               maxBandSize: Int = DefaultHotKeyCap): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      GraftFunctions.blake2b_256(col("text")).as("k"))
    val reps = keyed.groupBy("k").agg(min("doc_id").as("rep"))
    val repDocs = docs.join(
      reps.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    val repPairs = minHashLshPairs(repDocs, minJaccard,
        maxBandSize = maxBandSize)
      .select("doc_a", "doc_b")
    val star = keyed.join(reps, Seq("k"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
    connectedComponents(repPairs.union(star))
      .withColumnRenamed("node", "doc_id")
  }

  /** Quality-priority cluster canonicalization: within each near-dup
    * cluster keep the member MAXIMIZING `score` (ties → lowest doc_id)
    * and drop the rest; documents in no cluster survive untouched. The
    * min-id survivor rule (q78) is arbitrary — a production pipeline
    * keeps the best-quality member of each duplicate family (longest,
    * highest LM score, best source), which this implements for any
    * caller-supplied numeric score column.
    *
    * Scale: the cluster table holds only pair-members (≪ corpus), the
    * per-cluster argmax is a map-side-combined `max(struct)` — no
    * window over the corpus — and the final survivor filter is a hash
    * anti-join on doc_id. */
  def nearDupSurvivorsByScore(docs: DataFrame, score: Column,
                              minJaccard: Double = 0.8,
                              maxBandSize: Int = DefaultHotKeyCap): DataFrame = {
    val clusters = nearDupClusters(docs, minJaccard, maxBandSize)
    val keep = clusters
      .join(docs.select(col("doc_id"), score.as("graft_score")), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("graft_score"), (-col("doc_id")).as("neg"))).as("best"))
      .select((-col("best.neg")).as("doc_id"))
    val drops = clusters.join(keep, Seq("doc_id"), "left_anti").select("doc_id")
    docs.join(drops, Seq("doc_id"), "left_anti")
  }

  /** Chunk-granular exact dedup with reassembly (the "paragraph dedup" of
    * Dolma/RefinedWeb, over an arbitrary `parts` array column): across the
    * whole corpus, only the globally-first occurrence of each distinct
    * part survives — first = smallest (doc_id, position) — and each
    * document is reassembled from its surviving parts in original order.
    * One groupBy on the part text (partial aggregation collapses repeats
    * map-side before the shuffle; `min(struct(doc_id, pos))` IS the
    * first-occurrence rule, no window over the whole corpus needed) plus
    * one groupBy doc_id to reassemble. Documents whose every part was
    * seen earlier disappear entirely — the contract dedup needs.
    */
  def chunkDedup(docs: DataFrame, parts: Column): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      posexplode(parts).as(Seq("pos", "part")))
    val firsts = exploded
      .groupBy("part")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.pos").as("pos"), col("part"))
    firsts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        // r17: collect_list + array_sort, native getField extraction —
        // see scrubSharedNgramSpansFrom for why listagg was reverted
        array_join(array_sort(collect_list(struct(col("pos"), col("part"))))
          .getField("part"), " ").as("dedup_text"))
  }

  /** Corpus-frequency line filter — the CCNet/RefinedWeb boilerplate-line
    * rule, complementary to [[chunkDedup]]'s keep-first semantics: a line
    * that occurs at least `minRepeats` times ACROSS the corpus is removed
    * from EVERY document (nav chrome, cookie banners, "all rights
    * reserved" footers repeat thousands of times; prose lines don't), and
    * each document is reassembled from its surviving lines in original
    * order. Documents whose every line was boilerplate disappear.
    *
    * Scale shape: explode stays in the scan stage; the frequency count is
    * a groupBy on the line with map-side partial aggregation (the shuffle
    * carries distinct lines, not occurrences — exactly the heavy ones
    * collapse hardest); the `>= minRepeats` filter shrinks that to the
    * heavy set, which at a production threshold is tiny relative to the
    * corpus, so AQE turns the anti-join into a broadcast; reassembly is
    * one doc_id groupBy. Lines join by their exact text (the anti-join
    * key a production variant can narrow to `xxhash64(line)`); empty
    * lines participate like any other — in a corpus with blank-line
    * separators they are heavy and get stripped, which is the wanted
    * outcome. */
  def removeBoilerplateLines(docs: DataFrame, minRepeats: Int = 10,
                             textCol: String = "text"): DataFrame = {
    require(minRepeats >= 2, s"minRepeats must be >= 2, got $minRepeats")
    val exploded = docs.select(col("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val heavy = exploded.groupBy("line")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minRepeats)
      .select("line")
    exploded.join(heavy, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        // r17: collect_list + array_sort, native getField extraction —
        // see scrubSharedNgramSpansFrom for why listagg was reverted
        array_join(array_sort(collect_list(struct(col("pos"), col("line"))))
          .getField("line"), "\n").as("clean_text"))
  }

  /** Cross-source duplication matrix — for every source pair, how many
    * DISTINCT contents appear in both (the "is source B just a re-crawl
    * of source A?" audit that decides which feeds are worth ingesting,
    * and the denominator story behind corpus-level dedup rates). Keyed on
    * md5 of the raw text so any engine reproduces the exact matrix;
    * compose with [[normalizeForDedup]] upstream for the
    * canonical-form variant.
    *
    * Shape: distinct (source, hash) — one map-side-combined aggregate,
    * shuffle key is the 16-byte digest — then a self-equi-join on hash.
    * Per-hash join fanout is the number of sources holding that content
    * (≤ #sources, a SMALL bound — never corpus-sized), and the result
    * collapses straight into the (src_a, src_b) count aggregate. */
  def crossSourceDupMatrix(docs: DataFrame,
                           sourceCol: String = "source",
                           textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(sourceCol).as("source"),
      md5(col(textCol)).as("h")).distinct()
    sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-source duplication rate — for each source: document count, how
    * many of its documents carry content that appears ≥2× ANYWHERE in
    * the corpus (within or across sources), and that share in integral
    * micros. The one-line corpus-health row a mixing decision reads
    * first ("this feed is 40% recycled"); [[crossSourceDupMatrix]] then
    * attributes WHERE the copies live. md5-keyed for engine portability,
    * same composition note as the matrix.
    *
    * Shape: one digest-keyed count aggregate (map-side combined), one
    * equi-join back on the digest (per-key fanout = the content's copy
    * count — the quantity being measured), one per-source rollup. The
    * rate is floor(n_dup·1e6 / n_docs) in exact Long arithmetic
    * (order-free, the library-wide micros idiom). */
  def dupRateBySource(docs: DataFrame,
                      sourceCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col(sourceCol).as("source"),
      md5(col(textCol)).as("h"))
    val copies = keyed.filter(col("h").isNotNull)
      .groupBy("h").agg(count(lit(1)).as("n_copies"))
    // LEFT join: a null-text doc has a null digest, which an inner
    // equi-join would silently drop — it must stay in the denominator
    // (counted as non-duplicate), not vanish from the corpus-health row
    keyed.join(copies, Seq("h"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        Micros.ratio(col("n_dup"), col("n_docs")).as("dup_rate_micros"))
  }

  /** Corpus snapshot diff — one row summarizing what changed between two
    * corpus versions at content granularity: distinct contents added,
    * removed, and retained (the incremental-pipeline health check before
    * shipping a refreshed training mix; a "refresh" that removes 40% of
    * content is a fetch regression, not a data update). Content identity
    * is md5 of the text (engine-portable; swap in blake2b via the
    * composition note on [[crossSourceDupMatrix]]).
    *
    * Shape: each side collapses to its distinct hash set map-side, then
    * ONE full-outer equi-join on the digest feeds a single count
    * aggregate — no driver collection, digest-width shuffles only. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(md5(col(textCol)).as("h")).distinct()
      .withColumn("in_old", lit(1))
    val n = newDocs.select(md5(col(textCol)).as("h")).distinct()
      .withColumn("in_new", lit(1))
    o.join(n, Seq("h"), "full_outer")
      .agg(
        sum(when(col("in_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("in_old").isNotNull && col("in_new").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"))
  }

  /** Distinct word-`n`-gram projection keyed by the engine-portable
    * 60-bit md5-prefix hash ([[graft.functions.Md5Prefix60]], the q163
    * derivation) — the shared kernel of [[ngramNovelty]] and
    * [[crossSourceNgramContainment]]. One spread tokenize/explode, one
    * map-side-combined distinct; identity is defined AT THE HASH so any
    * engine with md5 reproduces the exact sets. */
  private[graft] def md5GramSet(docs: DataFrame, n: Int,
                                keys: Seq[String]): DataFrame = {
    val g = keys.map(col)
    val toked = Spread.cpu(docs)
      .select(g :+ split(col("text"), " ").as("wd"): _*)
      .filter(size(col("wd")) >= n)
    // r16: fused native gram digest (the [[simHashMd5]] note) — one
    // primitive pass instead of the interpreted HOF + per-gram
    // md5_prefix60; values identical, the cross-key distinct unchanged.
    toked.select(g :+ explode(
        graft.functions.Md5ShingleFunctions.md5ShingleHashes(col("wd"), n))
        .as("h"): _*)
      .distinct()
  }

  /** N-gram novelty between two corpus snapshots: how much of the new
    * corpus' distinct `n`-gram set is UNSEEN in the old — the
    * diversity-delta audit behind "did this refresh actually add new
    * content, or re-shuffle the same text?" (a near-zero novelty rate on
    * a large byte delta is re-crawl churn; [[corpusDiff]] counts docs,
    * this counts n-grams, catching remixes document identity misses).
    *
    * Shape: each side collapses to its distinct gram-hash set map-side
    * (8-byte shuffle keys), then ONE left join of the new set onto the
    * old feeds a 1-row aggregate; novelty is floor-micros over exact
    * Longs. This is the EXACT form — at corpus scale where the distinct
    * gram sets themselves are enormous, the sketch path is
    * `approx_count_distinct` over each side plus their union
    * (|A∩B| = |A|+|B|−|A∪B|), trading the oracle-exact count for a
    * shuffle of sketch buffers instead of the gram stream — the q155
    * HLL-union infrastructure. */
  def ngramNovelty(oldDocs: DataFrame, newDocs: DataFrame,
                   n: Int = 5): DataFrame = {
    val o = md5GramSet(oldDocs, n, Nil).withColumn("in_old", lit(1))
    md5GramSet(newDocs, n, Nil)
      .join(o, Seq("h"), "left")
      .agg(count(lit(1)).as("n_new_grams"),
        // coalesce: an EMPTY new corpus aggregates sum() to null, and
        // the degenerate row must read (0, 0, 0), not (0, null, 0)
        coalesce(sum(when(col("in_old").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_novel"))
      .select(col("n_new_grams"), col("n_novel"),
        Micros.ratio(col("n_novel"), col("n_new_grams")).as("novelty_micros"))
  }

  /** Cross-source n-gram containment: for every ORDERED source pair
    * (a, b), |grams(a) ∩ grams(b)| / |grams(a)| — the template-reuse
    * audit [[crossSourceDupMatrix]]'s exact-document identity misses
    * (boilerplate rewrapped around new text shows up here first).
    * Containment is directional, so both (a, b) and (b, a) rows appear.
    *
    * Shape: one distinct (source, gram-hash) PROJECTION feeds the
    * per-source gram counts and both self-join sides; per-hash join
    * fanout is bounded by #sources² (a SMALL constant — sources are an
    * operational handful; never corpus-sized). Ratios are floor-micros
    * over exact Longs. The projection is plan-shared but, absent
    * runtime exchange reuse, evaluated once per consumer — a one-off
    * audit at corpus scale should materialize [[sourceNgramSets]] to a
    * table first and call [[crossSourceNgramContainmentFrom]] on it
    * (the precomputed-projection pattern of
    * `minHashLshAgainstCorpusBanded`). */
  def crossSourceNgramContainment(docs: DataFrame, n: Int = 5,
                                  sourceCol: String = "source"): DataFrame =
    crossSourceNgramContainmentFrom(md5GramSet(
      docs.select(col(sourceCol).as("source"), col("text")), n, Seq("source")))

  /** The distinct (source, 60-bit md5-prefix gram-hash) projection the
    * cross-source audits consume — exposed so a corpus-scale run can
    * materialize it ONCE (parquet/registry table) and feed every audit
    * from the stored 8-byte keys instead of re-shingling text per
    * consumer. */
  def sourceNgramSets(docs: DataFrame, n: Int = 5,
                      sourceCol: String = "source"): DataFrame =
    md5GramSet(docs.select(col(sourceCol).as("source"), col("text")),
      n, Seq("source"))

  /** [[crossSourceNgramContainment]] over a PRECOMPUTED
    * [[sourceNgramSets]] frame `(source, h)`. */
  def crossSourceNgramContainmentFrom(grams: DataFrame): DataFrame = {
    val sh = grams
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n_grams"))
    sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("source").as("source_a"),
        col("n_grams").as("n_grams_a")), "source_a")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_grams_a"),
        Micros.ratio(col("n_shared"), col("n_grams_a"))
          .as("containment_micros"))
  }

  /** Query-by-document text similarity search: top-`k` most Jaccard-similar
    * corpus documents for each query doc, via the shingle inverted index —
    * the search-shaped twin of [[jaccardNearDupPairs]]. The query side of
    * the index join is the (small) query set, so join work is
    * Σ_{query shingles} df, not Σ df² over the corpus; ranking windows
    * only over per-query candidate lists (never the corpus), ordered by
    * raw Jaccard with a doc_id tiebreak so the top-k set is
    * deterministic. */
  def jaccardTopK(docs: DataFrame, queryIds: Seq[Long], k: Int,
                  n: Int = 3): DataFrame = {
    val sh = Spread.cpu(docs).select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    val sizes = sh.select(col("doc_id"),
      org.apache.spark.sql.functions.size(col("s")).as("nsh"))
    val ex = sh.select(col("doc_id"), explode(col("s")).as("sg"))
    val qx = ex.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("q_id"), col("sg"))
    val shared = qx.join(ex, "sg")
      .filter(col("q_id") =!= col("doc_id"))
      .groupBy("q_id", "doc_id").agg(count(lit(1)).as("shared"))
    val scored = shared
      .join(sizes.select(col("doc_id").as("q_id"), col("nsh").as("nq")), "q_id")
      .join(sizes, "doc_id")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("nq") + col("nsh") - col("shared")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("jaccard").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), round(col("jaccard"), 4).as("jaccard"),
        col("rnk"))
  }

  /** Incremental near-dup screening: MinHash-LSH candidates BETWEEN an
    * existing corpus and an incoming batch (the near-dup twin of
    * [[dedupAgainstCorpus]]'s exact check). Band keys join across the two
    * sides only — never corpus×corpus — so per-batch work is
    * Σ_{incoming bands} (corpus band df): proportional to the batch, not
    * the corpus. At 100 TB the corpus band table is computed once and
    * persisted (it is a pure projection of the corpus, bucketable by
    * band); each arriving batch then pays one equi-join against it plus
    * confirm joins bounded by its own candidates. Confirm = exact
    * Jaccard on hashed shingles, same as [[minHashLshPairs]].
    *
    * doc_ids are assumed globally unique across both sides (the same
    * id-space contract as [[dedupAgainstCorpus]]): identity pairs are
    * filtered, so replaying a batch already merged into the corpus does
    * not flood the output with each doc matching itself at 1.0.
    *
    * `maxBandSize` > 0 caps the CORPUS side's band buckets (see
    * [[capBands]]): per-batch candidate work is Σ over incoming bands of
    * the corpus band df, so a hot corpus bucket makes every future batch
    * pay for it — the cap bounds each batch at maxBandSize candidates
    * per incoming band row. The incoming side is batch-sized and needs
    * no cap. */
  def minHashLshAgainstCorpus(corpus: DataFrame, incoming: DataFrame,
                              minJaccard: Double, n: Int = 3,
                              maxBandSize: Int = 0): DataFrame = {
    val shC = corpus.select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    val shI = incoming.select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    def bands(sh: DataFrame) =
      sh.select(col("doc_id"), explode(bandKeysCol(col("s"))).as("band"))
    val cands = bands(shI).as("i").join(capBands(bands(shC), maxBandSize).as("c"),
        col("i.band") === col("c.band") && col("i.doc_id") =!= col("c.doc_id"))
      .select(col("i.doc_id").as("doc_new"), col("c.doc_id").as("doc_corpus"))
      .distinct()
    val shCc = shC.join(cands.select(col("doc_corpus").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val shIc = shI.join(cands.select(col("doc_new").as("doc_id")),
      Seq("doc_id"), "left_semi")
    confirmJaccard(cands, shIc, shCc, "doc_new", "doc_corpus", minJaccard)
  }

  /** The MinHash-LSH band projection of a document frame: one
    * `(doc_id, band)` row per (doc, band) — the persistable candidate
    * index of [[minHashLshAgainstCorpus]]. A streaming/incremental
    * deployment materializes THIS (32 longs per doc) once per admitted
    * document and feeds it to [[minHashLshAgainstCorpusBanded]], so each
    * batch's screen never re-shingles the corpus. */
  def minHashBandProjection(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      explode(bandKeysCol(hashedShingles(col("text"), n))).as("band"))

  /** [[minHashLshAgainstCorpus]] with the corpus's band projection
    * PRECOMPUTED (`corpusBands` = [[minHashBandProjection]] of `corpus`,
    * appended incrementally as documents are admitted): identical output,
    * but per-batch corpus-side prep is a scan of the compact band index —
    * never a re-shingle of corpus text.
    *
    * Batch-proportional by construction:
    *  - the corpus band index is first SEMI-JOINED to the batch's own
    *    band keys (a broadcast-sized set), so the hot-band count and the
    *    candidate join only ever touch corpus bands the batch actually
    *    probes — per-band counts are unchanged by that prune (pruning is
    *    band-complete), so `maxBandSize` semantics match the recompute
    *    path exactly;
    *  - corpus TEXT is touched only for confirmed-candidate docs (a
    *    semi-join prune BEFORE the shingle recompute), i.e. shingle work
    *    on the corpus side is candidate-proportional.
    *
    * `corpusBands` may contain benign surplus from at-least-once appends:
    * duplicate band rows collapse in the candidate `distinct()`, and
    * bands of a doc_id absent from `corpus` die in the confirm semi-join. */
  def minHashLshAgainstCorpusBanded(corpus: DataFrame, corpusBands: DataFrame,
                                    incoming: DataFrame, minJaccard: Double,
                                    n: Int = 3,
                                    maxBandSize: Int = 0): DataFrame = {
    val shI = incoming.select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    val bandsI = shI.select(col("doc_id"), explode(bandKeysCol(col("s"))).as("band"))
    val probed = corpusBands.select(col("doc_id"), col("band"))
      .join(bandsI.select("band").distinct(), Seq("band"), "left_semi")
    val cands = bandsI.as("i").join(capBands(probed, maxBandSize).as("c"),
        col("i.band") === col("c.band") && col("i.doc_id") =!= col("c.doc_id"))
      .select(col("i.doc_id").as("doc_new"), col("c.doc_id").as("doc_corpus"))
      .distinct()
    val shCc = corpus
      .join(cands.select(col("doc_corpus").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), hashedShingles(col("text"), n).as("s"))
    val shIc = shI.join(cands.select(col("doc_new").as("doc_id")),
      Seq("doc_id"), "left_semi")
    confirmJaccard(cands, shIc, shCc, "doc_new", "doc_corpus", minJaccard)
  }

  /** Token offsets whose k-gram occurs ≥2 times corpus-wide — the shared
    * candidate stage of [[duplicateSpans]] / [[removeDuplicateSpans]].
    * Dup grams via groupBy + semi-join rather than count-over-window:
    * both shuffle the gram stream once on h, but the window adds a full
    * per-partition sort where the aggregate is hash-based (measured
    * equal-or-faster, and partial aggregation shrinks the second
    * exchange to the distinct grams). */
  private def dupGramStarts(docs: DataFrame, k: Int): DataFrame = {
    val g = docs.select(col("doc_id"),
      posexplode(graft.functions.ShingleFunctions
        .shinglePosHashes(split(col("text"), " "), k)).as(Seq("pos", "h")))
    val dup = g.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    g.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
  }

  /** Exact duplicate-span detection (the suffix-dedup idea of "remove
    * repeated substrings" recast as a bucketed join): every token position
    * whose k-gram occurs ≥2 times anywhere in the corpus is marked, and
    * per-doc overlapping marks merge (gaps-and-islands) into maximal
    * half-open token spans [span_start, span_end). Span semantics: a span
    * covers text that also exists verbatim elsewhere (or again in the same
    * doc); removal policy — drop all, keep one canonical occurrence — is a
    * caller choice over this table.
    *
    * Scale shape: positional gram hashes are one fused native pass per row
    * ([[graft.functions.ShinglePosHashes]]); the duplicate-gram filter is
    * a groupBy + semi-join on 8-byte hashes (never gram strings); the
    * merge window partitions by doc_id — no corpus-wide window, no
    * all-pairs stage anywhere. Gram identity is the 64-bit hash (same
    * 2⁻⁶⁴ argument as the inverted-index joins, so the string-gram DuckDB
    * oracle stays valid). */
  def duplicateSpans(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val marks = dupGramStarts(docs, k)
      .withColumn("e", col("pos") + k)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marks
      .withColumn("f", when(col("pos") > coalesce(prevMaxEnd, lit(-1L)), 1L)
        .otherwise(0L))
      .withColumn("island", sum("f").over(w))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"), max("e").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select("doc_id", "span_start", "span_end", "n_grams")
  }

  /** Cut every [[duplicateSpans]] span out of its document and reassemble
    * the remaining tokens in order ("drop-all" policy: a span whose text
    * exists verbatim elsewhere is removed from every occurrence; docs
    * left with zero tokens drop out entirely). Removal needs no island
    * merge at all: the cut set is just the union of covered positions —
    * each duplicated gram start explodes to its k offsets, distinct'd,
    * and the cut is a pure equi anti-join on (doc_id, pos); reassembly is
    * the same sort-free collect_list/array_sort shape as [[chunkDedup]].
    * Nothing here ever windows, range-joins, or joins corpus-wide. */
  def removeDuplicateSpans(docs: DataFrame, k: Int = 5): DataFrame = {
    val cut = dupGramStarts(docs, k)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
    val kept = toks.join(cut, Seq("doc_id", "pos"), "left_anti")
    kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        // r17: collect_list + array_sort, native getField extraction —
        // see scrubSharedNgramSpansFrom for why listagg was reverted
        array_join(array_sort(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok"), " ").as("clean_text"))
  }

  /** Fixed-size word windows for [[chunkDedup]]: chunk i = words
    * [i*size, (i+1)*size), last chunk ragged. */
  def wordChunks(text: Column, size: Int): Column = {
    val words = split(text, " ")
    transform(
      sequence(lit(0),
        ceil(org.apache.spark.sql.functions.size(words).cast("double") / size)
          .cast("int") - 1),
      i => array_join(slice(words, i * size + 1, lit(size)), " "))
  }
}
