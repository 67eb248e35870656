package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions
import graft.ops.{Curation, Dedup, Graph, Multimodal, Profile, Robots, Similarity, Spread, TextAnalysis, Warc, WebText}
import RelationalQueries.Q

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (driver north star; SURVEY.md §2.3). All designed scale-first:
  *  - dedup / near-dup use hash-groupBy and inverted-index / LSH-band
  *    equi-joins — never an all-pairs cross join;
  *  - cosine top-k broadcasts the (small) query set against the corpus;
  *    the LSH-bucketed ANN variant is the 100 TB path;
  *  - text analysis is pure `functions._` higher-order expressions inside
  *    whole-stage codegen.
  * The reference anchors: blake2b-256 content addressing
  * (`/root/reference/src/catenae/utils.py:42-61`) and schemaless JSON text
  * payloads (`utils.py:19-39`).
  */
object PipelineQueries {

  private def q(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  private def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Oracle-SQL mirror of [[graft.ops.WebText.registeredDomain]] over a
    * URL expression — host extract, `www.` strip, and the GENERATED
    * public-suffix alternation spliced from the same Scala constant
    * (single source of truth: growing the suffix table updates every
    * domain oracle at once). */
  private def rdSql(expr: String): String =
    "regexp_extract(regexp_replace(regexp_extract(lower(" + expr +
      "), '//[^/:?#]*'), '^//(www\\.)?', ''), '" +
      WebText.RegisteredDomainRegex + "', 1)"

  private def toks: Column = split(col("text"), " ")

  /** The planted-near-dup embedding corpus shared by q63 and q79: each
    * vector plus a perturbed copy (vec_id + 100000, x → x + 0.2·x·x —
    * only IEEE-exact mul/add in an association order both engines
    * reproduce, so Spark and the oracles build BIT-IDENTICAL corpora).
    * One definition: the formula, association, and id offset are
    * load-bearing for both queries' oracles and SimilaritySpec. */
  private def plantedNearDupEmbeddings(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    base.unionAll(base.select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.2) * x * x).as("embedding")))
  }

  // ------------------------------------------------------------------ dedup

  /** Exact dedup: group-by content, keep first doc id. At scale the group
    * key is the blake2b-256 content hash (see [[graft.ops.Dedup.exactByHash]]
    * — same survivors, 32-byte shuffle key instead of full text; ScalaTest
    * asserts the equivalence). The oracle groups by raw text, which DuckDB
    * can express. */
  val q30ExactDedup: Q = q("q30_exact_dedup",
    """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")
      .orderBy("doc_id")
  }

  /** Exact dedup keyed on the blake2b-256 content hash (the reference's
    * canonical content address, `utils.py:42-61`) — the 100 TB shape: the
    * shuffle key is the 32-byte digest, not the document text. The query
    * output drops the engine-internal hash column so DuckDB can verify the
    * values (group-by raw text yields identical survivors — blake2b is
    * collision-free on any real corpus); HashingSpec pins the digest bytes
    * themselves against Python hashlib vectors. */
  val q31HashDedup: Q = q("q31_hash_dedup",
    """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.exactByHash(Tables.documents(s, d), col("text"), col("doc_id"))
      .select("doc_id", "dup_count")
      .orderBy("doc_id")
  }

  /** Near-duplicate pairs via 3-gram shingle inverted index: explode
    * distinct shingles, equi-self-join on shingle, count shared, exact
    * Jaccard ≥ 0.6 on candidates only. Linear in corpus + Σ df² join work —
    * the exact-verification stage of a MinHash pipeline, never all-pairs. */
  val q32JaccardNeardup: Q = q("q32_jaccard_neardup",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 3) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.jaccardNearDupPairs(Tables.documents(s, d), minJaccard = 0.6)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH banding near-dup: shingle → 128 minhashes → 32 bands →
    * band-bucket equi-join for candidates → exact Jaccard confirm ≥ 0.8.
    * Candidate generation is O(docs × bands) instead of the inverted
    * index's Σ df². The confirm stage makes the output EXACT, so the
    * oracle is the same inverted-index SQL as q32 at threshold 0.8: a
    * true pair at j ≥ 0.8 escapes all 32 bands with probability
    * ≤ (1−0.8⁴)³² ≈ 5·10⁻⁸ (DedupSpec additionally pins recall == exact
    * on this corpus). */
  val q33MinhashLsh: Q = q("q33_minhash_lsh",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 3) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.minHashLshPairs(Tables.documents(s, d), minJaccard = 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash-64 fingerprint per document (rows-only; hamming-distance
    * near-dup check in ScalaTest). */
  val q34Simhash: Q = rowsOnly("q34_simhash") { (s, d) =>
    Dedup.simHash(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** SimHash near-dup pairs via 16-bit band buckets (pigeonhole-complete
    * for hamming ≤ 3). Rows-only; DedupSpec pins the candidate guarantee.
    * The hot-bucket cap is passed EXPLICITLY (it is also the default,
    * which became lossy-by-default in round 10): a rows-only query must
    * visibly own the lossy/exact choice since no oracle would catch a
    * count shift. 16-bit bands = 65k bucket values, so the fixture sits
    * far below the cap and the pair set equals the exact contract
    * (DedupSpec asserts equality against brute force). */
  val q36SimhashNeardup: Q = rowsOnly("q36_simhash_neardup") { (s, d) =>
    Dedup.simHashNearDupPairs(Tables.documents(s, d),
        maxBucketSize = Dedup.DefaultHotKeyCap)
      .orderBy("doc_a", "doc_b")
  }

  /** Content-defined rolling-hash fingerprint — polynomial hash over the
    * character stream, exactly reproducible in SQL (list_reduce). */
  val q35Fingerprint: Q = q("q35_fingerprint",
    """SELECT doc_id, list_reduce(
      |    list_prepend(CAST(0 AS BIGINT), list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, c) -> (acc * 257 + c) % 2147483647) AS fingerprint
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"),
        aggregate(filter(split(col("text"), ""), c => c =!= ""), lit(0L),
          (acc, c) => (acc * 257 + ascii(c)) % 2147483647L).as("fingerprint"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- similarity search

  /** Brute-force cosine top-5: small query set (vec_id < 10) broadcast
    * against the corpus; rank on round(cos,4) with id tie-break so both
    * engines agree bit-for-bit. */
  val q40CosineTopk: Q = q("q40_cosine_topk",
    """WITH qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
      |            FROM embeddings WHERE vec_id < 10),
      |cand AS (SELECT vec_id AS c_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
      |sims AS (
      |  SELECT q_id, c_id, label,
      |    round(list_dot_product(qe, ce) /
      |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 4) AS cos_sim
      |  FROM qv CROSS JOIN cand WHERE q_id <> c_id)
      |SELECT q_id, rnk, c_id, label, cos_sim FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk
      |  FROM sims)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.cosineTopK(
        queries = emb.filter(col("vec_id") < 10),
        corpus = emb, k = 5)
      .orderBy("q_id", "rnk")
  }

  /** LSH-bucketed approximate NN (random-hyperplane signatures → bucket
    * equi-join): the 100 TB path — candidates share a signature bucket, no
    * cross join. Rows-only oracle; ScalaTest measures recall vs q40. */
  val q41AnnLsh: Q = rowsOnly("q41_ann_lsh") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.annLsh(queries = emb.filter(col("vec_id") < 10),
        corpus = emb, k = 5)
      .orderBy("q_id", "rnk")
  }

  /** Embedding-cosine near-dup pairs over a bounded frame (vec_id < 400):
    * the exact confirm stage of an ANN-bucketed dedup pipeline. The fixture
    * vectors are random (max pairwise cos ≈ 0.51), so 0.4 marks the
    * "suspiciously similar" tail. */
  val q43CosineNeardup: Q = q("q43_cosine_neardup",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |           FROM embeddings WHERE vec_id < 400)
      |SELECT vec_a, vec_b, cos_sim FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim,
      |    list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS raw
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |WHERE raw >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    Similarity.cosineNearDupPairs(
        Tables.embeddings(s, d).filter(col("vec_id") < 400), minCos = 0.4)
      .orderBy("vec_a", "vec_b")
  }

  /** The composed at-scale cosine near-dup path over the FULL embeddings
    * table: LSH-bucket candidates → exact cosine confirm — no vec_id
    * bound, no quadratic stage ([[Similarity.lshCosineNearDupPairs]]).
    *
    * The fixture embeddings are i.i.d. random (max pairwise cos ≈ 0.6 at
    * sf0.1 — random high-dim vectors have no true near-dups), which is
    * outside the regime LSH near-dup targets. So the query plants one
    * deterministic near-dup per vector: a copy (vec_id + 100000) perturbed
    * element-wise by x → x + 0.2·x·x. Only IEEE-exact double ops (mul/add,
    * same association order in both engines), so Spark and DuckDB build
    * bit-identical corpora; each planted pair lands at cos ≈ 0.998 while
    * the random background stays ≤ 0.61 — at minCos = 0.9 the planted
    * pairs are exactly the answer, with a wide margin on both sides. The
    * oracle re-derives the pair set quadratically in SQL, so a green hash
    * match proves the LSH path loses no qualifying pair (recall 1.0 at
    * the fixed plane seed; SimilaritySpec asserts the same equality in
    * Scala against the quadratic confirm). */
  val q63LshCosineNeardup: Q = q("q63_lsh_cosine_neardup",
    """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |aug AS (SELECT vec_id, v FROM base
      |        UNION ALL
      |        SELECT vec_id + 100000, list_transform(v, x -> x + 0.2 * x * x) FROM base),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim,
      |    list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS raw
      |  FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, cos_sim FROM pairs WHERE raw >= 0.9
      |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    val aug = plantedNearDupEmbeddings(s, d)
    Similarity.lshCosineNearDupPairs(aug, minCos = 0.9)
      .orderBy("vec_a", "vec_b")
  }

  /** IVF approximate NN (k-means coarse quantizer, nprobe cells per
    * query). Rows-only; SimilaritySpec measures recall vs exact. */
  val q44AnnIvf: Q = rowsOnly("q44_ann_ivf") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.annIvf(s, queries = emb.filter(col("vec_id") < 10),
        corpus = emb, k = 5)
      .orderBy("q_id", "rnk")
  }

  /** Per-label embedding stats (norms via higher-order fns, no UDF).
    * avg_norm sums per-row integer micros (order-free — the q110-class
    * fix; avg_dim is an exact integer sum, so plain avg is already
    * order-free there). */
  val q42EmbeddingStats: Q = q("q42_embedding_stats",
    """WITH g AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
      |  sum(CAST(round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |    * 1000000.0, 0) AS BIGINT)) AS sm,
      |  round(avg(len(embedding)), 2) AS avg_dim
      |  FROM embeddings GROUP BY label)
      |SELECT label, n,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n) // (200*n)
      |        ELSE -((-2*sm + 100*n) // (200*n)) END) / 10000.0 AS avg_norm,
      |  avg_dim
      |FROM g ORDER BY label""".stripMargin) { (s, d) =>
    val e = col("embedding").cast("array<double>")
    Tables.embeddings(s, d)
      .select(col("label"),
        round(Similarity.norm(e) * lit(1000000.0), 0).cast("long").as("norm_micros"),
        size(col("embedding")).cast("long").as("dim"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum("norm_micros").as("sum_micros"),
        round(avg("dim"), 2).as("avg_dim"))
      .select(col("label"), col("n"),
        TextAnalysis.microAvg4("sum_micros", "n").as("avg_norm"), col("avg_dim"))
      .orderBy("label")
  }

  // ----------------------------------------------------------- text analysis

  /** Token frequency over the whole corpus (explode → groupBy; partial
    * aggregation makes this a map-side-combine wordcount). */
  val q50TokenCounts: Q = q("q50_token_counts",
    """SELECT tok, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY n DESC, tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
  }

  /** Per-language corpus rollup. */
  val q51LangStats: Q = q("q51_lang_stats",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  round(avg(n_chars), 2) AS avg_chars,
      |  round(avg(len(string_split(text, ' '))), 2) AS avg_tokens,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("source")).as("n_sources"),
           round(avg("n_chars"), 2).as("avg_chars"),
           round(avg(size(toks)), 2).as("avg_tokens"),
           sum(size(toks).cast("long")).as("total_tokens"))
      .orderBy("lang")
  }

  /** Per-document quality scoring: token/char ratios, stopword ratio,
    * uniqueness — the standard pre-training quality-filter features. */
  val q52DocQuality: Q = q("q52_doc_quality",
    """SELECT doc_id, lang,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / len(string_split(text, ' ')), 4) AS uniq_ratio,
      |  round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |        / len(string_split(text, ' ')), 4) AS avg_token_len,
      |  round(CAST(len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of'))) AS DOUBLE)
      |        / len(string_split(text, ' ')), 4) AS stopword_ratio
      |FROM documents WHERE doc_id < 150 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val nTok = size(toks).cast("long")
    Tables.documents(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"), col("lang"),
        nTok.as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        round(size(array_distinct(toks)).cast("double") / nTok, 4).as("uniq_ratio"),
        round((length(col("text")) - nTok + 1).cast("double") / nTok, 4).as("avg_token_len"),
        round(size(filter(toks, t => t.isin("the", "a", "of"))).cast("double") / nTok, 4)
          .as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Heuristic language-ID: CJK script gate, then stopword-profile argmax
    * (tie → lexicographically larger lang, matching the array_max-on-struct
    * tie-break in [[TextAnalysis.langId]]). The profiles are fixed data, so
    * the whole heuristic is SQL-expressible and oracle-checked. */
  val q53LangId: Q = q("q53_lang_id",
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      |scored AS (
      |  SELECT doc_id, text, toks,
      |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','value','data','row'))) AS DOUBLE) / len(toks) AS s_en,
      |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','von','mit','ein'))) AS DOUBLE) / len(toks) AS s_de,
      |    CAST(len(list_filter(toks, t -> t IN ('el','la','de','los','las','es','un','una'))) AS DOUBLE) / len(toks) AS s_es,
      |    CAST(len(list_filter(toks, t -> t IN ('le','la','les','de','et','est','un','une'))) AS DOUBLE) / len(toks) AS s_fr
      |  FROM t)
      |SELECT doc_id,
      |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |       WHEN greatest(s_en, s_de, s_es, s_fr) > 0 THEN
      |         CASE WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
      |              WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
      |              WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
      |              ELSE 'de' END
      |       ELSE 'unknown' END AS pred_lang,
      |  round(greatest(s_en, s_de, s_es, s_fr), 3) AS lang_score,
      |  CAST(len(toks) AS BIGINT) AS n_tokens_ws,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens_bpe
      |FROM scored ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.langId(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Multimodal plumbing: text treated as an opaque binary blob column with
    * typed metadata — byte length + leading-bytes fingerprint. The decode /
    * feature-extract stage is [[graft.ops.Multimodal]] (deterministic stub:
    * no media libs in the container; Spark-side schema/partitioning real). */
  val q54BinaryMeta: Q = q("q54_binary_meta",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  lower(substr(hex(encode(text)), 1, 16)) AS head_hex
      |FROM documents WHERE doc_id < 150 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bin = encode(col("text"), "UTF-8")
    Tables.documents(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"),
        length(bin).cast("long").as("n_bytes"),
        lower(substring(hex(bin), 1, 16)).as("head_hex"))
      .orderBy("doc_id")
  }

  /** Reference hash-fn parity surface (blake2b-256/512, sha3-512 —
    * `utils.py:42-57`): rows-only (DuckDB lacks these); ScalaTest pins
    * precomputed Python hashlib vectors. */
  val q55HashFns: Q = rowsOnly("q55_hash_fns") { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id"),
        GraftFunctions.blake2b_256(col("text")).as("b2b_256"),
        GraftFunctions.blake2b_512(col("text")).as("b2b_512"),
        GraftFunctions.sha3_512(col("text")).as("sha3_512"),
        GraftFunctions.uidFor(col("doc_id")).as("uid"))
      .orderBy("doc_id")
  }

  /** Full curation pipeline (quality gate → exact dedup → near-dup
    * removal → per-lang stats) — oracle-checked end to end: the MinHash-LSH
    * near-dup stage exact-confirms its candidates at j ≥ 0.8, so the SQL
    * mirror (inverted-index exact Jaccard, same drop-higher-id rule)
    * produces identical survivors w.h.p. (miss ≈ 5·10⁻⁸/pair, see q33).
    * CurationSpec separately proves the invariants (survivor subset, no
    * surviving near-dup pair, idempotence). */
  val q60Curation: Q = q("q60_curation",
    """WITH toksed AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents),
      |quality AS (
      |  SELECT doc_id, lang, text FROM toksed
      |  WHERE len(toks) >= 5
      |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.05),
      |exact AS (
      |  SELECT doc_id, lang, text FROM quality
      |  WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY text)),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM exact),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |drops AS (
      |  SELECT DISTINCT doc_b AS doc_id FROM cand
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      |survivors AS (
      |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops))
      |SELECT lang, count(*) AS n_docs,
      |  round(avg(len(string_split(text, ' '))), 2) AS avg_tokens,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM survivors GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Curation.stats(Curation.curate(Tables.documents(s, d)))
  }

  /** Spark-builtin cryptographic hash surface with a real value oracle
    * (DuckDB shares sha256/md5); the reference-parity digests (blake2b,
    * sha3 — absent from DuckDB) stay in q55 + HashingSpec's hashlib
    * vectors. */
  val q56BuiltinHash: Q = q("q56_builtin_hash",
    """SELECT doc_id, sha256(text) AS sha256_hex, md5(text) AS md5_hex
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        sha2(col("text"), 256).as("sha256_hex"),
        md5(col("text")).as("md5_hex"))
      .orderBy("doc_id")
  }

  /** Sketch heavy hitters — count-min candidates + exact confirm, so the
    * output is EXACT (the sketch only over-approximates the candidate set)
    * and oracle-checkable: tokens with ≥ 1% of all token occurrences. */
  val q57HeavyHitters: Q = q("q57_heavy_hitters",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tot AS (SELECT CAST(floor(0.01 * count(*)) AS BIGINT) AS thr FROM tok)
      |SELECT tok, count(*) AS n FROM tok GROUP BY tok
      |HAVING count(*) >= (SELECT thr FROM tot)
      |ORDER BY n DESC, tok""".stripMargin) { (s, d) =>
    TextAnalysis.heavyHitters(Tables.documents(s, d), minShare = 0.01)
  }

  /** Incremental dedup of a "new batch" (doc_id ≥ 400) against an existing
    * "corpus" (doc_id < 400): broadcast Bloom prefilter + exact anti-join
    * on the blake2b content hash — exact, so the oracle is a plain
    * NOT EXISTS on raw text. The 100 TB shape: definitely-new rows pass
    * with no join at all. */
  val q58IncrementalDedup: Q = q("q58_incremental_dedup",
    """SELECT n.doc_id FROM documents n
      |WHERE n.doc_id >= 400 AND NOT EXISTS (
      |  SELECT 1 FROM documents c WHERE c.doc_id < 400 AND c.text = n.text)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val corpusHashes = docs.filter(col("doc_id") < 400)
      .select(GraftFunctions.blake2b_256(col("text")).as("content_hash"))
    Dedup.dedupAgainstCorpus(docs.filter(col("doc_id") >= 400), corpusHashes,
        expectedItems = 400)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Typed-UDAF surface in the registry: group-wise MinHash signature per
    * (lang, source) — the signature of the shingle UNION of the group
    * (MinHash is a lattice homomorphism, so partial aggregation merges
    * map-side and the shuffle carries 128 longs per group, not shingles).
    * Rows-only: signature values are engine-internal; NativeHashSpec pins
    * them against a direct union computation. */
  val q62GroupMinhash: Q = rowsOnly("q62_group_minhash") { (s, d) =>
    import graft.ops.MinHashSignatureAgg
    Tables.documents(s, d)
      .select(col("lang"), col("source"), Dedup.shingles(col("text")).as("sh"))
      .groupBy("lang", "source")
      .agg(MinHashSignatureAgg.asColumn(Seq(col("sh"))).as("sig"))
      .select(col("lang"), col("source"),
        size(col("sig")).cast("long").as("sig_len"),
        // stable 16-hex fingerprint of the signature for eyeballing
        lower(hex(xxhash64(concat_ws(",", col("sig"))))).as("sig_hash"))
      .orderBy("lang", "source")
  }

  /** Deterministic hash split ([[Curation.hashSplit]]): the oracle
    * recomputes the md5-bucket assignment independently, so a green hash
    * match proves the split is engine- and run-stable — the property that
    * makes it leakage-safe. */
  val q64HashSplit: Q = q("q64_hash_split",
    """WITH s AS (
      |  SELECT text, CASE WHEN b < 205 THEN 'train' WHEN b < 230 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM (SELECT text, ('0x' || substr(md5(text), 1, 2))::INTEGER AS b
      |        FROM documents))
      |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    Curation.hashSplit(Tables.documents(s, d))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
      .orderBy("split")
  }

  /** C4/Gopher quality-gate summary ([[Curation.qualityGates]]): per
    * source, how many docs fail each gate and how many pass all. The
    * oracle recomputes every metric from scratch in SQL. */
  val q65QualityGates: Q = q("q65_quality_gates",
    """WITH t AS (SELECT source, text, string_split(text, ' ') AS toks FROM documents),
      |m AS (SELECT source, len(toks) AS nt,
      |  ((length(text) - len(toks) + 1))::DOUBLE / len(toks) AS mwl,
      |  len(list_distinct(toks))::DOUBLE / len(toks) AS uniq,
      |  list_max(list_transform(list_distinct(toks),
      |    w -> len(list_filter(toks, x -> x = w))))::DOUBLE / len(toks) AS topshare
      |  FROM t)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(*) FILTER (WHERE nt < 20 OR nt > 100000) AS BIGINT) AS fail_len,
      |  CAST(count(*) FILTER (WHERE mwl < 3.0 OR mwl > 10.0) AS BIGINT) AS fail_word_len,
      |  CAST(count(*) FILTER (WHERE uniq < 0.35) AS BIGINT) AS fail_uniq,
      |  CAST(count(*) FILTER (WHERE topshare > 0.15) AS BIGINT) AS fail_rep,
      |  CAST(count(*) FILTER (WHERE nt BETWEEN 20 AND 100000
      |    AND mwl BETWEEN 3.0 AND 10.0 AND uniq >= 0.35
      |    AND topshare <= 0.15) AS BIGINT) AS n_pass
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Curation.qualityGates(Tables.documents(s, d))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count_if(!col("gate_len")).as("fail_len"),
        count_if(!col("gate_word_len")).as("fail_word_len"),
        count_if(!col("gate_uniq")).as("fail_uniq"),
        count_if(!col("gate_rep")).as("fail_rep"),
        count_if(col("passes")).as("n_pass"))
      .orderBy("source")
  }

  /** Gopher repetition score per document ([[TextAnalysis.topBigramShare]]):
    * top-bigram dominance via the exploded wordcount shape (map-side
    * combined). Oracle mirrors the same two-level aggregation in SQL. */
  val q66Repetition: Q = q("q66_repetition",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |e AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |c AS (SELECT doc_id, bg, count(*) AS c FROM e GROUP BY doc_id, bg)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  round(max(c)::DOUBLE / CAST(sum(c) AS BIGINT), 4) AS top_bigram_share
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.topBigramShare(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Sequence packing ([[Curation.packSequences]]): per-(lang, bin)
    * document and token counts of the concat-and-chunk layout. */
  val q67SeqPack: Q = q("q67_seq_pack",
    """WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum FROM t)
      |SELECT lang, CAST(floor((cum - n_tokens)::DOUBLE / 512) AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin) { (s, d) =>
    Curation.packSequences(Tables.documents(s, d), binTokens = 512)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** Int8 embedding quantization ([[Similarity.quantizeInt8]]): scale,
    * quantized vector, and max dequantization error per vector — every
    * arithmetic step (abs/max/mul/floor/div) is IEEE-exact and
    * association-order-matched, so the oracle rebuilds the quantized
    * vectors bit-identically in SQL. */
  val q68EmbedQuant: Q = q("q68_embed_quant",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  127.0 / list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
      |qv AS (SELECT vec_id, v, scale,
      |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS q
      |  FROM s)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  array_to_string(q, ',') AS q_csv,
      |  round(list_max(list_transform(range(1, len(v) + 1),
      |    i -> abs(v[i] - floor(v[i] * scale + 0.5) / scale))), 6) AS max_abs_err
      |FROM qv ORDER BY vec_id""".stripMargin) { (s, d) =>
    // The library op keeps the real array<int>; the registered query
    // projects it to a CSV string so the harness' pandas comparator (which
    // can't hash array cells) stays usable — int→string is engine-identical.
    Similarity.quantizeInt8(Tables.embeddings(s, d))
      .select(col("vec_id"), col("scale"),
        concat_ws(",", col("q").cast("array<string>")).as("q_csv"),
        col("max_abs_err"))
      .orderBy("vec_id")
  }

  /** Unigram LM quality score ([[TextAnalysis.unigramLogProb]]) — the
    * corpus is its own language model here; ln parity at 4-decimal
    * rounding is established by q20. */
  val q69UnigramLogprob: Q = q("q69_unigram_logprob",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |             FROM documents),
      |freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM freq),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  sum(CAST(round(ln(c::DOUBLE / tot) * 1000000.0, 0) AS BIGINT)) AS sm
      |  FROM tok JOIN freq USING (tok) CROSS JOIN tot GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n_tokens) // (200*n_tokens)
      |        ELSE -((-2*sm + 100*n_tokens) // (200*n_tokens)) END) / 10000.0
      |    AS avg_logprob
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextAnalysis.unigramLogProb(docs, docs).orderBy("doc_id")
  }

  /** Quantized cosine top-k ([[Similarity.quantizedCosineTopK]]): the
    * int8 ANN ranking; the oracle rebuilds the quantization and ranks
    * the same integer dot products in SQL (int8 values are exact in
    * doubles, so the chain is bit-deterministic). SimilaritySpec pins
    * recall vs the full-precision ranking. */
  val q71QuantTopk: Q = q("q71_quant_topk",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  127.0 / list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
      |qv AS (SELECT vec_id,
      |  list_transform(v, x -> floor(x * scale + 0.5)) AS q FROM s),
      |qn AS (SELECT vec_id AS q_id, q AS qe,
      |       sqrt(list_dot_product(q, q)) AS qnorm FROM qv WHERE vec_id < 10),
      |cn AS (SELECT vec_id AS c_id, q AS ce,
      |       sqrt(list_dot_product(q, q)) AS cnorm FROM qv),
      |sims AS (
      |  SELECT q_id, c_id,
      |    round(list_dot_product(qe, ce) / (qnorm * cnorm), 4) AS cos_q
      |  FROM cn CROSS JOIN qn WHERE q_id <> c_id)
      |SELECT q_id, rnk, c_id, cos_q FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_q DESC, c_id) AS BIGINT) AS rnk
      |  FROM sims)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.quantizedCosineTopK(
        queries = emb.filter(col("vec_id") < 10), corpus = emb, k = 5)
      .orderBy("q_id", "rnk")
  }

  /** The capstone composition — the full prepare-training-data flow as
    * one DataFrame program: curate (quality gate → exact dedup →
    * near-dup removal) → leakage-safe hash split → per-(split, lang)
    * sequence packing; output is the per-stream packing summary. The
    * oracle mirrors every stage in SQL: q60's curation chain (exact
    * Jaccard == the MinHash confirm at ≥0.8) + q64's md5-bucket split +
    * q67's window cumsum. */
  val q70PrepareCorpus: Q = q("q70_prepare_corpus",
    """WITH toksed AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents),
      |quality AS (
      |  SELECT doc_id, lang, text FROM toksed
      |  WHERE len(toks) >= 5
      |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.05),
      |exact AS (
      |  SELECT doc_id, lang, text FROM quality
      |  WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY text)),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM exact),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |drops AS (
      |  SELECT DISTINCT doc_b AS doc_id FROM cand
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      |survivors AS (
      |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
      |splits AS (
      |  SELECT doc_id, lang, text,
      |    CASE WHEN b < 205 THEN 'train' WHEN b < 230 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT *, ('0x' || substr(md5(text), 1, 2))::INTEGER AS b
      |        FROM survivors)),
      |packed AS (
      |  SELECT split, lang, n_tokens,
      |    CAST(floor((cum - n_tokens)::DOUBLE / 512) AS BIGINT) AS bin
      |  FROM (SELECT split, lang, len(string_split(text, ' ')) AS n_tokens,
      |          sum(len(string_split(text, ' '))) OVER (
      |            PARTITION BY split, lang ORDER BY doc_id
      |            ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM splits))
      |SELECT split, lang, CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM packed GROUP BY split, lang ORDER BY split, lang""".stripMargin) { (s, d) =>
    val prepared = Curation.packSequences(
      Curation.hashSplit(Curation.curate(Tables.documents(s, d))),
      binTokens = 512, streamCols = Seq("split", "lang"))
    prepared.groupBy("split", "lang")
      .agg(countDistinct("bin").as("n_bins"), count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"))
      .orderBy("split", "lang")
  }

  /** Near-dup cluster canonicalization ([[Dedup.nearDupClusters]]):
    * confirmed MinHash-LSH pairs collapsed into connected components via
    * alternating star contraction (O(log n) rounds at any diameter), each
    * doc labelled with its cluster's smallest id — the step between "pair
    * list" and "one survivor per group". The oracle recomputes the exact
    * pair set (same inverted-index SQL as q33) and closes it with a
    * recursive CTE: min reachable label == component min. */
  val q72DedupClusters: Q = q("q72_dedup_clusters",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |cc(node, lbl) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.node)
      |SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
      |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDupClusters(Tables.documents(s, d), 0.8).orderBy("doc_id")
  }

  /** Chunk-granular dedup with reassembly ([[Dedup.chunkDedup]] over
    * 10-word windows) — Dolma/RefinedWeb "paragraph dedup": only the
    * globally-first occurrence of each chunk survives, documents are
    * rebuilt from their surviving chunks, fully-duplicated documents
    * vanish. */
  val q73ChunkDedup: Q = q("q73_chunk_dedup",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |chunks AS (
      |  SELECT doc_id, unnest(range(0, CAST(ceil(len(words) / 10.0) AS INT))) AS pos,
      |         words
      |  FROM w),
      |parts AS (
      |  SELECT doc_id, pos,
      |    array_to_string(list_slice(words, pos * 10 + 1, pos * 10 + 10), ' ') AS part
      |  FROM chunks),
      |firsts AS (
      |  SELECT doc_id, pos, part FROM (
      |    SELECT doc_id, pos, part,
      |      row_number() OVER (PARTITION BY part ORDER BY doc_id, pos) AS rk
      |    FROM parts) WHERE rk = 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |  string_agg(part, ' ' ORDER BY pos) AS dedup_text
      |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.chunkDedup(Tables.documents(s, d), Dedup.wordChunks(col("text"), 10))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination ([[Curation.contaminationFlags]]): training
    * docs (doc_id % 17 ≠ 0) sharing any 5-gram with the eval slice
    * (doc_id % 17 = 0), with the shared-shingle count. Spark joins on
    * native 64-bit shingle hashes against a broadcast eval set; the
    * oracle re-derives the overlap from raw string 5-grams (identical
    * w.h.p. — the q32/q33 hash-identity argument). */
  val q74Decontaminate: Q = q("q74_decontaminate",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(wd) - 3),
      |    i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] || ' ' || wd[i+3]
      |         || ' ' || wd[i+4])) AS s
      |  FROM w),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |ev AS (SELECT DISTINCT sg FROM ex WHERE doc_id % 17 = 0)
      |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |FROM ex e JOIN ev USING (sg)
      |WHERE e.doc_id % 17 <> 0
      |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.contaminationFlags(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0), n = 5)
      .orderBy("doc_id")
  }

  /** PII redaction ([[Curation.redactPii]]): the fixture corpus is
    * PII-free, so the query deterministically plants an email, a
    * dash-phone and an IPv4 per document (a function of doc_id, mirrored
    * in the oracle), then masks them and counts matches per kind. */
  val q75PiiRedact: Q = q("q75_pii_redact",
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |      || ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      || ' from host ' || CAST(doc_id % 254 + 1 AS VARCHAR) || '.0.113.7'
      |      AS text
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
      |    '\+?[0-9]+(-[0-9]+)+', '<PHONE>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text,
      |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all(text,
      |    '\+?[0-9]+(-[0-9]+)+')) AS BIGINT) AS n_phones
      |FROM planted ORDER BY doc_id""".stripMargin) { (s, d) =>
    val planted = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" or call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from host "),
        (pmod(col("doc_id"), lit(254)) + 1).cast("string"), lit(".0.113.7"))
        .as("text"))
    Spread.cpu(planted).select(col("doc_id"),
      Curation.redactPii(col("text")).as("redacted"),
      regexp_count(col("text"), lit(Curation.EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(Curation.Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(Curation.PhoneRe)).cast("long").as("n_phones"))
      .orderBy("doc_id")
  }

  /** Temperature resampling summary ([[Curation.temperatureResample]]):
    * per-language keep-rate sqrt(n_min/n_lang) with the md5-bucket keep
    * decision; sqrt because IEEE requires it correctly rounded, so the
    * oracle's threshold is bit-identical. */
  val q76TemperatureMix: Q = q("q76_temperature_mix",
    """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      |m AS (SELECT min(n_lang) AS n_min FROM c),
      |r AS (SELECT lang, n_lang,
      |        sqrt(CAST(n_min AS DOUBLE) / n_lang) AS keep_rate FROM c, m),
      |k AS (SELECT d.lang, r.n_lang, r.keep_rate,
      |        CASE WHEN ('0x' || substr(md5(d.text), 1, 6))::BIGINT
      |               < r.keep_rate * 16777216
      |             THEN 1 ELSE 0 END AS kept
      |      FROM documents d JOIN r USING (lang))
      |SELECT lang, CAST(max(n_lang) AS BIGINT) AS n_in,
      |  CAST(sum(kept) AS BIGINT) AS n_kept,
      |  round(max(keep_rate), 6) AS keep_rate
      |FROM k GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Curation.temperatureResample(Tables.documents(s, d))
      .groupBy("lang")
      .agg(max("n_lang").as("n_in"),
        sum(col("kept").cast("long")).as("n_kept"),
        round(max("keep_rate"), 6).as("keep_rate"))
      .orderBy("lang")
  }

  /** Per-source document cap ([[Curation.domainCap]]): top-5 docs per
    * source by unique-token ratio (doc_id tiebreak) — the anti-flooding
    * quota of RefinedWeb/C4 pipelines. Oracle: the same row_number
    * window in SQL. The ratio is a ratio of two integers, identically
    * rounded in both engines, and the tiebreak makes the keep set
    * deterministic. */
  val q77DomainCap: Q = q("q77_domain_cap",
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS uniq_ratio
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, round(uniq_ratio, 4) AS uniq_ratio,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY uniq_ratio DESC, doc_id ASC) AS INTEGER) AS domain_rank
      |  FROM scored)
      |SELECT doc_id, source, uniq_ratio, domain_rank
      |FROM ranked WHERE domain_rank <= 5 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val uniqRatio =
      size(array_distinct(toks)).cast("double") / size(toks)
    Curation.domainCap(
      Tables.documents(s, d).withColumn("uniq_ratio", uniqRatio),
      domain = col("source"), quality = col("uniq_ratio"), cap = 5)
      .select(col("doc_id"), col("source"),
        round(col("uniq_ratio"), 4).as("uniq_ratio"), col("domain_rank"))
      .orderBy("doc_id")
  }

  /** Cluster-canonical dedup survivors — the endpoint the clusters exist
    * for: every document except non-canonical members of a near-dup
    * cluster. This is NOT the same as dropping the larger side of each
    * pair (q60/q70's rule): with pairs (1,9) and (5,9), pair-dropping
    * keeps {1,5} while the cluster {1,5,9} keeps only 1 — cluster
    * semantics dedups transitively even when the pair set skips an
    * edge. */
  val q78ClusterSurvivors: Q = q("q78_cluster_survivors",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |cc(node, lbl) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.node),
      |drops AS (
      |  SELECT node FROM cc GROUP BY node HAVING node <> min(lbl))
      |SELECT doc_id, lang FROM documents
      |WHERE doc_id NOT IN (SELECT node FROM drops)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val drops = Dedup.nearDupClusters(docs, 0.8)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(drops, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Semantic dedup clusters (SemDeDup-style, Abbas et al. 2023):
    * embedding-space near-dup pairs from the LSH-bucketed cosine path
    * (q63's machinery, planted perturbed copies) collapsed into
    * connected components — each group of semantically-identical vectors
    * gets one canonical id, the unit a semantic-dedup pass keeps.
    * Oracle: the exact quadratic pair SQL closed with a recursive CTE. */
  val q79SemanticClusters: Q = q("q79_semantic_clusters",
    """WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |aug AS (SELECT vec_id, v FROM base
      |        UNION ALL
      |        SELECT vec_id + 100000, list_transform(v, x -> x + 0.2 * x * x) FROM base),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9),
      |edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
      |          UNION SELECT vec_b, vec_a FROM pairs),
      |cc(node, lbl) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.node)
      |SELECT node AS vec_id, CAST(min(lbl) AS BIGINT) AS cluster_id
      |FROM cc GROUP BY node ORDER BY vec_id""".stripMargin) { (s, d) =>
    val aug = plantedNearDupEmbeddings(s, d)
    Dedup.connectedComponents(
        Similarity.lshCosineNearDupPairs(aug, minCos = 0.9)
          .select("vec_a", "vec_b"))
      .withColumnRenamed("node", "vec_id")
      .orderBy("vec_id")
  }

  /** Bigram LM quality score ([[TextAnalysis.bigramLogProb]]): mean
    * conditional ln p(w2|w1) under the corpus bigram model — q69's
    * plumbing one model order up. ln-parity per the q69/q20 precedent. */
  val q80BigramLogprob: Q = q("q80_bigram_logprob",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |  unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM t WHERE len(w) >= 2),
      |freq AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
      |prefix AS (SELECT w1, count(*) AS cp FROM bg GROUP BY 1),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  sum(CAST(round(ln(c::DOUBLE / cp) * 1000000.0, 0) AS BIGINT)) AS sm
      |  FROM bg JOIN freq USING (w1, w2) JOIN prefix USING (w1)
      |  GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n_bigrams) // (200*n_bigrams)
      |        ELSE -((-2*sm + 100*n_bigrams) // (200*n_bigrams)) END) / 10000.0
      |    AS avg_logprob
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextAnalysis.bigramLogProb(docs, docs).orderBy("doc_id")
  }

  /** Query-by-document text similarity search ([[Dedup.jaccardTopK]]):
    * top-3 most similar corpus docs per query doc (doc_id < 8) via the
    * shingle inverted index — search-shaped, never all-pairs. Determinism:
    * Jaccard from integer arithmetic is engine-identical, ties break on
    * doc_id. */
  val q81TextSearch: Q = q("q81_text_search",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |qx AS (SELECT doc_id AS q_id, sg FROM ex WHERE doc_id < 8),
      |sc AS (
      |  SELECT q.q_id, e.doc_id, count(*) AS shared
      |  FROM qx q JOIN ex e USING (sg)
      |  WHERE e.doc_id <> q.q_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT sc.q_id, sc.doc_id,
      |    CAST(sc.shared AS DOUBLE) / (sq.n + sd.n - sc.shared) AS j
      |  FROM sc
      |  JOIN sizes sq ON sc.q_id = sq.doc_id
      |  JOIN sizes sd ON sc.doc_id = sd.doc_id),
      |ranked AS (SELECT q_id, doc_id, round(j, 4) AS jaccard,
      |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY j DESC, doc_id)
      |    AS INTEGER) AS rnk
      |  FROM scored)
      |SELECT q_id, doc_id, jaccard, rnk FROM ranked WHERE rnk <= 3
      |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    Dedup.jaccardTopK(Tables.documents(s, d), queryIds = (0L until 8L).toSeq,
        k = 3)
      .orderBy("q_id", "rnk")
  }

  /** Exact duplicate-span detection ([[Dedup.duplicateSpans]]): maximal
    * merged token spans whose 5-grams occur ≥2 times corpus-wide —
    * suffix-dedup semantics as a bucketed join + per-doc islands merge.
    * Oracle re-derives spans from string 5-grams (hash-identity
    * argument, as q74). */
  val q82DupSpans: Q = q("q82_dup_spans",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |  unnest(range(0, len(w) - 4)) AS pos,
      |  unnest(list_transform(range(1, len(w) - 3),
      |    i -> array_to_string(w[i:i+4], ' '))) AS gram
      |  FROM t WHERE len(w) >= 5),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      |m AS (SELECT doc_id, pos, pos + 5 AS e FROM g
      |  WHERE gram IN (SELECT gram FROM dup)),
      |fl AS (SELECT doc_id, pos, e,
      |  CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |  THEN 1 ELSE 0 END AS f FROM m),
      |isl AS (SELECT doc_id, pos, e,
      |  sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM fl)
      |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
      |  CAST(max(e) AS BIGINT) AS span_end, CAST(count(*) AS BIGINT) AS n_grams
      |FROM isl GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
    Dedup.duplicateSpans(Tables.documents(s, d), k = 5)
      .orderBy("doc_id", "span_start")
  }

  /** Span removal ([[Dedup.removeDuplicateSpans]]): q82's spans cut from
    * every doc, survivors reassembled in token order (drop-all policy;
    * fully-duplicated docs vanish). Oracle re-derives the spans from
    * string 5-grams and cuts with a NOT EXISTS range predicate. */
  val q84SpanClean: Q = q("q84_span_clean",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |  unnest(range(0, len(w) - 4)) AS pos,
      |  unnest(list_transform(range(1, len(w) - 3),
      |    i -> array_to_string(w[i:i+4], ' '))) AS gram
      |  FROM t WHERE len(w) >= 5),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      |m AS (SELECT doc_id, pos, pos + 5 AS e FROM g
      |  WHERE gram IN (SELECT gram FROM dup)),
      |fl AS (SELECT doc_id, pos, e,
      |  CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |  THEN 1 ELSE 0 END AS f FROM m),
      |isl AS (SELECT doc_id, pos, e,
      |  sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM fl),
      |sp AS (SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
      |  FROM isl GROUP BY doc_id, island),
      |tokpos AS (SELECT doc_id, unnest(range(0, len(w))) AS pos,
      |  unnest(w) AS tok FROM t),
      |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
      |  WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = tp.doc_id
      |    AND tp.pos >= sp.span_start AND tp.pos < sp.span_end))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |  string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.removeDuplicateSpans(Tables.documents(s, d), k = 5).orderBy("doc_id")
  }

  /** TF-IDF keyword extraction ([[TextAnalysis.tfIdfTopK]]): top-3 terms
    * per doc by tf·ln(N/df), term-asc tiebreak. The rank cut is
    * engine-stable because the score chain is the same correctly-rounded
    * IEEE ops on both sides. */
  val q83TfidfTopk: Q = q("q83_tfidf_topk",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.tok, tf.tf, dfx.df,
      |  tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df) AS tfidf
      |  FROM tf JOIN dfx USING (tok) CROSS JOIN n),
      |rk AS (SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf,
      |  CAST(df AS BIGINT) AS df, round(tfidf, 4) AS tfidf,
      |  CAST(row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, tok) AS INTEGER) AS rnk
      |  FROM sc)
      |SELECT doc_id, tok, tf, df, tfidf, rnk FROM rk WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    TextAnalysis.tfIdfTopK(Tables.documents(s, d), topK = 3)
      .orderBy("doc_id", "rnk")
  }

  /** Incremental near-dup screening ([[Dedup.minHashLshAgainstCorpus]]):
    * even doc_ids play the indexed corpus, odd ids the arriving batch;
    * LSH bands join only ACROSS the two sides. Oracle = the cross-side
    * inverted-index SQL at j≥0.8 (the q33 exact-confirm trick: band
    * recall is 1.0 at this threshold, so the confirmed output is
    * SQL-recomputable). */
  val q86IncrementalNeardup: Q = q("q86_incremental_neardup",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |cx AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 2 = 0),
      |ix AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 2 = 1),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT i.doc_id AS doc_new, c.doc_id AS doc_corpus, count(*) AS shared
      |  FROM ix i JOIN cx c ON i.sg = c.sg
      |  GROUP BY 1, 2)
      |SELECT doc_new, doc_corpus,
      |  round(CAST(shared AS DOUBLE) / (ni.n + nc.n - shared), 3) AS jaccard
      |FROM pairs
      |JOIN sizes ni ON doc_new = ni.doc_id
      |JOIN sizes nc ON doc_corpus = nc.doc_id
      |WHERE CAST(shared AS DOUBLE) / (ni.n + nc.n - shared) >= 0.8
      |ORDER BY doc_new, doc_corpus""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.minHashLshAgainstCorpus(
        corpus = docs.filter(col("doc_id") % 2 === 0),
        incoming = docs.filter(col("doc_id") % 2 === 1),
        minJaccard = 0.8)
      .orderBy("doc_new", "doc_corpus")
  }

  /** Fixed-ratio corpus mixing ([[Curation.mixCorpus]]): per-language
    * keep-rates hitting 50/20/15/10/5 target shares at the largest total
    * the data allows. Oracle recomputes T = min(n/w), the rates, and the
    * md5-bucket keeps independently (q76's determinism arguments: the
    * rate chain is the same IEEE op sequence in both engines, and the
    * bucket rule is the shared md5 prefix). */
  val q85CorpusMix: Q = q("q85_corpus_mix",
    """WITH wts(lang, target_share) AS (VALUES
      |  ('en', 0.50), ('zh', 0.20), ('es', 0.15), ('de', 0.10), ('fr', 0.05)),
      |c AS (SELECT d.lang, count(*) AS n_in,
      |        CAST(max(w.target_share) AS DOUBLE) AS target_share
      |      FROM documents d JOIN wts w USING (lang) GROUP BY d.lang),
      |t AS (SELECT min(CAST(n_in AS DOUBLE) / target_share) AS t_max FROM c),
      |r AS (SELECT lang, n_in, target_share,
      |        target_share * t_max / n_in AS keep_rate FROM c, t),
      |k AS (SELECT d.lang, r.n_in, r.keep_rate,
      |        CASE WHEN ('0x' || substr(md5(d.text), 1, 6))::BIGINT
      |               < r.keep_rate * 16777216
      |             THEN 1 ELSE 0 END AS kept
      |      FROM documents d JOIN r USING (lang))
      |SELECT lang, CAST(max(n_in) AS BIGINT) AS n_in,
      |  CAST(sum(kept) AS BIGINT) AS n_kept,
      |  round(max(keep_rate), 6) AS keep_rate
      |FROM k GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Curation.mixCorpus(Tables.documents(s, d),
        Map("en" -> 0.50, "zh" -> 0.20, "es" -> 0.15, "de" -> 0.10,
          "fr" -> 0.05))
      .groupBy("lang")
      .agg(max("n_in").as("n_in"),
        sum(col("kept").cast("long")).as("n_kept"),
        round(max("keep_rate"), 6).as("keep_rate"))
      .orderBy("lang")
  }

  /** Per-label centroid outliers ([[Similarity.centroidOutliers]]):
    * top-5 vectors per label by cosine distance to the label centroid.
    * Oracle recomputes centroids (dim-wise avg, list ordered by dim) and
    * the identical 1 − dot/(‖v‖·‖c‖) chain; ranking margins dwarf the
    * centroid means' summation-order noise (~1 ulp). */
  val q87CentroidOutliers: Q = q("q87_centroid_outliers",
    """WITH ex AS (SELECT label,
      |  unnest(range(1, len(embedding) + 1)) AS dim,
      |  unnest(embedding::DOUBLE[]) AS v FROM embeddings),
      |cd AS (SELECT label, dim, avg(v) AS c FROM ex GROUP BY 1, 2),
      |cent AS (SELECT label, list(c ORDER BY dim) AS cvec FROM cd
      |  GROUP BY label),
      |np AS (SELECT e.vec_id, e.label, e.embedding::DOUBLE[] AS ev, c.cvec,
      |  sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |    * sqrt(list_dot_product(c.cvec, c.cvec)) AS nprod
      |  FROM embeddings e JOIN cent c USING (label)),
      |sc AS (SELECT vec_id, label,
      |  CASE WHEN nprod = 0 THEN 2.0
      |       ELSE 1.0 - list_dot_product(ev, cvec) / nprod END AS dist
      |  FROM np),
      |rk AS (SELECT vec_id, label, round(dist, 4) AS centroid_dist,
      |  CAST(row_number() OVER (PARTITION BY label
      |    ORDER BY dist DESC, vec_id) AS INTEGER) AS rnk
      |  FROM sc)
      |SELECT vec_id, label, centroid_dist, rnk FROM rk WHERE rnk <= 5
      |ORDER BY label, rnk""".stripMargin) { (s, d) =>
    Similarity.centroidOutliers(Tables.embeddings(s, d), topK = 5)
      .orderBy("label", "rnk")
  }

  /** BM25 ranked retrieval ([[TextAnalysis.bm25TopK]]): the first 5 docs
    * query the rest of the corpus; top-5 hits per query. Scores sum
    * per-term contributions as integer micros (exact, order-free — see
    * the op's scaladoc), so the oracle mirrors the whole chain: each
    * per-term idf·tfnorm is one IEEE mul/div/ln sequence written with
    * identical association in both engines (q20/q69 ln-parity
    * precedent), then scaled, rounded, and summed as BIGINT. */
  val q88Bm25Topk: Q = q("q88_bm25_topk",
    """WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS toks
      |               FROM documents WHERE doc_id >= 5),
      |tf AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM corpus),
      |tfc AS (SELECT doc_id, dl, tok, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM corpus),
      |dfreq AS (SELECT tok, count(*) AS df FROM tfc GROUP BY 1),
      |qt AS (SELECT doc_id AS query_id,
      |         unnest(list_distinct(string_split(text, ' '))) AS tok
      |       FROM documents WHERE doc_id < 5),
      |contrib AS (
      |  SELECT qt.query_id, t.doc_id,
      |    CAST(round(
      |      ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5)
      |               / (CAST(f.df AS DOUBLE) + 0.5))
      |      * ((CAST(t.tf AS DOUBLE) * 2.2) /
      |         (CAST(t.tf AS DOUBLE)
      |          + 1.2 * (0.25 + 0.75 * (CAST(t.dl AS DOUBLE) / s.avgdl))))
      |      * 1000000.0, 0) AS BIGINT) AS micros
      |  FROM tfc t JOIN qt ON t.tok = qt.tok
      |  JOIN dfreq f ON t.tok = f.tok CROSS JOIN stats s),
      |scored AS (SELECT query_id, doc_id, sum(micros) AS score_micros,
      |             count(*) AS n_terms
      |           FROM contrib GROUP BY 1, 2),
      |rk AS (SELECT query_id, doc_id,
      |         round(CAST(score_micros AS DOUBLE) / 1000000.0, 4) AS score,
      |         n_terms,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY score_micros DESC, doc_id) AS rnk
      |       FROM scored)
      |SELECT query_id, doc_id, score, n_terms, rnk FROM rk WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextAnalysis.bm25TopK(
        queries = docs.filter(col("doc_id") < 5),
        corpus = docs.filter(col("doc_id") >= 5), topK = 5)
      .orderBy("query_id", "rnk")
  }

  /** Edit-distance near-dup ([[Dedup.editDistancePairs]]): shingle-sharing
    * candidates (≥3 shared 3-grams), confirmed Levenshtein ≤ 20. On the
    * fixtures the margin is wide — true near-dups sit at distance ≤ 8,
    * the nearest non-dup candidate at > 60 — so the threshold isn't
    * load-bearing. The oracle mirrors the candidate gate exactly (the
    * operator's semantics are candidate-bounded, like q32). */
  val q89EditDistance: Q = q("q89_edit_distance",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, levenshtein(da.text, db.text) AS dist
      |FROM pairs
      |JOIN documents da ON doc_a = da.doc_id
      |JOIN documents db ON doc_b = db.doc_id
      |WHERE shared >= 3 AND levenshtein(da.text, db.text) <= 20
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.editDistancePairs(Tables.documents(s, d), maxDist = 20,
        minSharedShingles = 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Block-partitioned kNN graph ([[Similarity.knnGraphBlocked]]): each
    * vector's exact top-3 cosine neighbors within its label block (the
    * IVF-cell shape — an equi-join on the block id, never a cartesian).
    * The oracle re-derives the within-block quadratic ranking; the rank
    * order uses the RAW cosine chain, identical IEEE ops both sides. */
  val q90KnnGraph: Q = q("q90_knn_graph",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id, a.label, b.vec_id AS neighbor_id,
      |    list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS raw
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
      |rk AS (SELECT vec_id, label, neighbor_id, round(raw, 4) AS cos_sim,
      |         row_number() OVER (PARTITION BY vec_id
      |           ORDER BY raw DESC, neighbor_id) AS rnk
      |       FROM pairs)
      |SELECT vec_id, label, neighbor_id, cos_sim, rnk FROM rk WHERE rnk <= 3
      |ORDER BY vec_id, rnk""".stripMargin) { (s, d) =>
    Similarity.knnGraphBlocked(Tables.embeddings(s, d), k = 3)
      .orderBy("vec_id", "rnk")
  }

  /** Content-defined chunking ([[Dedup.cdcChunks]]): boundaries where the
    * trailing 5-gram's md5 bucket ≡ 0 (mod 16) — shift-resistant chunks
    * (ClusterDedupSpec proves prefix-edit alignment survives). The
    * boundary rule is the shared engine-portable md5-bucket, so the
    * oracle re-derives the whole chunking: same windows, same buckets,
    * same cumsum chunk ids, same reassembled chunk texts. */
  val q102CdcChunks: Q = q("q102_cdc_chunks",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS j FROM tk),
      |fl AS (SELECT doc_id, j, toks[j] AS tok,
      |         CASE WHEN j > 5 AND
      |           ('0x' || substr(md5(array_to_string(toks[j-5:j-1], ' ')), 1, 6))::BIGINT
      |             % 16 = 0
      |         THEN 1 ELSE 0 END AS nc
      |       FROM pos),
      |ch AS (SELECT doc_id, j, tok,
      |         CAST(sum(nc) OVER (PARTITION BY doc_id ORDER BY j
      |           ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS chunk_idx
      |       FROM fl)
      |SELECT doc_id, chunk_idx, CAST(min(j) AS BIGINT) AS start_pos,
      |  count(*) AS n_toks, string_agg(tok, ' ' ORDER BY j) AS chunk_text
      |FROM ch GROUP BY doc_id, chunk_idx
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Dedup.cdcChunks(Tables.documents(s, d), window = 5, modulus = 16)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Tokenizer-vocabulary learning ([[TextAnalysis.learnWpeMerges]]):
    * 8 BPE merge rounds over the corpus word stream. Rows-only — the
    * loop is iterative (each round's counts depend on the previous
    * merge), not single-statement SQL; ClusterDedupSpec pins the full
    * merge table against a sequential local reference implementation. */
  val q103WpeMerges: Q = rowsOnly("q103_wpe_merges") { (s, d) =>
    TextAnalysis.learnWpeMerges(Tables.documents(s, d), nMerges = 8)
      .orderBy("merge_rank")
  }

  /** Tokenizer ENCODE ([[TextAnalysis.applyWpeMerges]]): apply a fixed
    * 6-merge vocabulary (incl. one second-order merge, "table hash"+agg)
    * to every document and fingerprint the resulting segmentation. The
    * oracle re-implements sequential-by-rank global leftmost merging as
    * a recursive CTE: RE2 has no lookarounds, so each rank iterates a
    * padded capture-group replace to its fixpoint — equivalent to the
    * engine's single lookaround pass for merges with left ≠ right
    * (competing self-pair chains are the one divergent case, excluded
    * here and covered by ClusterDedupSpec instead). The md5 is over the
    * token sequence joined with unit separators (joiners rendered as
    * spaces), so a single token regrouped differently flips the hash. */
  val q108WpeEncode: Q = q("q108_wpe_encode",
    """WITH RECURSIVE m(rank, l, r) AS (
      |  SELECT * FROM (VALUES
      |    (1, 'table', 'hash'), (2, 'part', 'filter'), (3, 'customer', 'join'),
      |    (4, 'table' || chr(1) || 'hash', 'agg'), (5, 'merge', 'group'),
      |    (6, 'slow', 'key')) v(rank, l, r)),
      |enc(doc_id, rank, txt) AS (
      |  SELECT doc_id, 1, ' ' || text || ' ' FROM documents
      |  WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, CASE WHEN nxt = txt THEN rank + 1 ELSE rank END, nxt
      |  FROM (SELECT e.doc_id, e.rank, e.txt,
      |          regexp_replace(e.txt, '( )' || m.l || ' ' || m.r || '( )',
      |            '\1' || m.l || chr(1) || m.r || '\2', 'g') AS nxt
      |        FROM enc e JOIN m ON m.rank = e.rank) s),
      |fin AS (SELECT doc_id, substr(txt, 2, length(txt) - 2) AS t
      |        FROM enc WHERE rank = 7)
      |SELECT doc_id,
      |  CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(string_split(t, ' '),
      |    x -> contains(x, chr(1)))) AS BIGINT) AS n_merged,
      |  md5(replace(replace(t, ' ', chr(31)), chr(1), ' ')) AS enc_md5
      |FROM fin ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val merges = Seq(
      (1L, "table", "hash"), (2L, "part", "filter"), (3L, "customer", "join"),
      (4L, "table hash", "agg"), (5L, "merge", "group"), (6L, "slow", "key"))
      .toDF("merge_rank", "left", "right")
    TextAnalysis.applyWpeMerges(Tables.documents(s, d), merges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("token").contains(" "), 1L).otherwise(0L)).as("n_merged"),
        md5(expr("listagg(token, '\u001f') WITHIN GROUP (ORDER BY pos)")
          .cast("binary")).as("enc_md5"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing ([[Curation.perplexityBuckets]]):
    * q69's unigram LM score cut into head/middle/tail thirds by ntile
    * over (rounded score desc, doc_id) — deterministic because q69
    * already pins the rounded scores engine-identical and the tiebreak
    * totalizes the order. */
  val q109PplBuckets: Q = q("q109_ppl_buckets",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |             FROM documents),
      |freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM freq),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  sum(CAST(round(ln(c::DOUBLE / tot) * 1000000.0, 0) AS BIGINT)) AS sm
      |  FROM tok JOIN freq USING (tok) CROSS JOIN tot
      |  GROUP BY doc_id),
      |sc AS (SELECT doc_id, n_tokens,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n_tokens) // (200*n_tokens)
      |        ELSE -((-2*sm + 100*n_tokens) // (200*n_tokens)) END) / 10000.0
      |    AS avg_logprob
      |  FROM g)
      |SELECT doc_id, n_tokens, avg_logprob,
      |  CAST(ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS INTEGER)
      |    AS bucket
      |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.perplexityBuckets(docs, docs, buckets = 3).orderBy("doc_id")
  }

  /** DSIR importance log-ratio ([[Curation.dsirLogRatio]]): target = the
    * English slice, pool = the whole corpus; add-one smoothing over the
    * pool vocabulary. The oracle recomputes both smoothed models and the
    * identical two-ln per-token chain (ln-parity per the q69/q20
    * precedent), rounded to integer micros per token and summed as
    * BIGINT — order-free on both engines (the q88 convention). */
  val q110DsirWeights: Q = q("q110_dsir_weights",
    """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |raw AS (SELECT tok, count(*) AS cr FROM t GROUP BY tok),
      |tgt AS (SELECT tok, count(*) AS ct FROM t WHERE lang = 'en' GROUP BY tok),
      |model AS (SELECT r.tok, r.cr, coalesce(g.ct, 0) AS ct
      |          FROM raw r LEFT JOIN tgt g USING (tok)),
      |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
      |               CAST(count(*) AS BIGINT) AS v FROM model),
      |tgt_tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM tgt),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  sum(CAST(round((ln((ct + 1)::DOUBLE / (cr + 1))
      |          + ln((tr + v)::DOUBLE / (tt + v))) * 1000000.0, 0) AS BIGINT)) AS sm
      |  FROM t JOIN model USING (tok) CROSS JOIN tot CROSS JOIN tgt_tot
      |  GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n_tokens) // (200*n_tokens)
      |        ELSE -((-2*sm + 100*n_tokens) // (200*n_tokens)) END) / 10000.0
      |    AS avg_logratio
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.dsirLogRatio(docs, docs.filter(col("lang") === "en"))
      .orderBy("doc_id")
  }

  /** Tokenizer encode to ids ([[TextAnalysis.buildVocab]] +
    * [[TextAnalysis.encodeToIds]]): top-64 frequency vocabulary
    * (count desc, token asc — a total order, so ids are engine-stable),
    * documents truncated to 16 positions, OOV → id 64. Exploded
    * (doc_id, pos, token_id) output — the packer-input shape. */
  val q111EncodeIds: Q = q("q111_encode_ids",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tok AS (SELECT doc_id, unnest(range(0, len(w))) AS pos,
      |               unnest(w) AS tok FROM t),
      |vc AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
      |vocab AS (SELECT tok, token_id FROM (
      |  SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) - 1 AS BIGINT)
      |    AS token_id FROM vc) WHERE token_id < 64)
      |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |  coalesce(v.token_id, 64) AS token_id
      |FROM tok LEFT JOIN vocab v USING (tok)
      |WHERE pos < 16
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val vocab = TextAnalysis.buildVocab(docs, vocabSize = 64)
    TextAnalysis.encodeToIds(docs, vocab, maxLen = 16, unkId = 64L)
      .orderBy("doc_id", "pos")
  }

  /** K-means hard assignment ([[Similarity.kmeansAssign]]) against the
    * deterministic initial centroids (the 8 lowest-vec_id vectors —
    * [[Similarity.kmeansFit]]'s init): per-cluster membership counts.
    * Squared-L2 argmin with a lower-index tiebreak, exactly the
    * [[graft.functions.IvfCells]] rule; assignment margins on the random
    * fixture vectors dwarf summation-order noise (q87/q90 precedent).
    * The iterative [[Similarity.kmeansFit]] trainer is pinned against a
    * sequential reference in SimilaritySpec (driver loops are not
    * single-statement SQL — the q103 argument). */
  val q113KmeansAssign: Q = q("q113_kmeans_assign",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      |      FROM e ORDER BY vec_id LIMIT 8),
      |d AS (SELECT e.vec_id, c.cid,
      |        list_sum(list_transform(range(1, len(e.v) + 1),
      |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
      |      FROM e CROSS JOIN c),
      |a AS (SELECT vec_id, cid,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |      FROM d)
      |SELECT CAST(cid AS BIGINT) AS cluster,
      |  CAST(count(*) AS BIGINT) AS n_members,
      |  min(vec_id) AS first_member
      |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cluster""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val centers = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .orderBy("vec_id").limit(8)
      .collect().map(_.getSeq[Double](1).toArray)
    Similarity.kmeansAssign(emb, centers)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), min("vec_id").as("first_member"))
      .orderBy("cluster")
  }

  /** DSIR resampling step ([[Curation.gumbelTopK]] over
    * [[Curation.dsirLogRatio]] scores): top-50 by importance score plus
    * deterministic md5-derived Gumbel noise — the Gumbel-max trick makes
    * this an exp(score)-weighted draw without replacement. The oracle
    * recomputes the identical score chain (q110) and the identical
    * noise arithmetic; the k-boundary is decided by the RAW key in both
    * engines, rounding is display-only. */
  val q115GumbelSample: Q = q("q115_gumbel_sample",
    """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |raw AS (SELECT tok, count(*) AS cr FROM t GROUP BY tok),
      |tgt AS (SELECT tok, count(*) AS ct FROM t WHERE lang = 'en' GROUP BY tok),
      |model AS (SELECT r.tok, r.cr, coalesce(g.ct, 0) AS ct
      |          FROM raw r LEFT JOIN tgt g USING (tok)),
      |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
      |               CAST(count(*) AS BIGINT) AS v FROM model),
      |tgt_tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM tgt),
      |sc0 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  sum(CAST(round((ln((ct + 1)::DOUBLE / (cr + 1))
      |          + ln((tr + v)::DOUBLE / (tt + v))) * 1000000.0, 0) AS BIGINT)) AS sm
      |  FROM t JOIN model USING (tok) CROSS JOIN tot CROSS JOIN tgt_tot
      |  GROUP BY doc_id),
      |sc AS (SELECT doc_id, n_tokens,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n_tokens) // (200*n_tokens)
      |        ELSE -((-2*sm + 100*n_tokens) // (200*n_tokens)) END) / 10000.0
      |    AS avg_logratio
      |  FROM sc0),
      |g AS (SELECT d.doc_id, sc.n_tokens, sc.avg_logratio,
      |        sc.avg_logratio - ln(-ln(
      |          (('0x' || substr(md5(d.text), 1, 6))::BIGINT + 0.5)
      |            / 16777216.0)) AS gk
      |      FROM documents d JOIN sc USING (doc_id))
      |SELECT doc_id, n_tokens, avg_logratio, round(gk, 4) AS gumbel_key
      |FROM g ORDER BY gk DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val scored = docs.select(col("doc_id"), col("text"))
      .join(Curation.dsirLogRatio(docs, docs.filter(col("lang") === "en")),
        "doc_id")
    Curation.gumbelTopK(scored, col("avg_logratio"), k = 50)
      .select(col("doc_id"), col("n_tokens"), col("avg_logratio"),
        round(col("gumbel_key"), 4).as("gumbel_key"))
  }

  /** MMR diverse selection ([[Similarity.mmrSelect]]): top-10 by maximal
    * marginal relevance against vec 0's embedding — the greedy
    * relevance-vs-redundancy pick is a sequential driver loop (the q103
    * argument), so rows-only; SimilaritySpec pins exact equality with a
    * sequential greedy reference and the diversity behavior on a planted
    * near-duplicate. */
  val q114MmrSelect: Q = rowsOnly("q114_mmr_select") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    Similarity.mmrSelect(emb, qv, k = 10, lambda = 0.7)
      .withColumn("mmr_score", round(col("mmr_score"), 4))
      .orderBy("rank")
  }

  /** Hybrid retrieval via reciprocal-rank fusion
    * ([[TextAnalysis.rrfFuse]]): the q88 BM25 list and the q81 Jaccard
    * list (both widened to top-10, queries doc_id < 5) fused as
    * Σ 1/(60+rnk), final top-5 per query. The oracle re-derives BOTH
    * input rankings with their own queries' exact chains and fuses with
    * the identical arithmetic (each contribution is one exact-operand
    * division; two-term sums are order-free). */
  val q116RrfFusion: Q = q("q116_rrf_fusion",
    """WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS toks
      |               FROM documents WHERE doc_id >= 5),
      |tf AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM corpus),
      |tfc AS (SELECT doc_id, dl, tok, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
      |stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM corpus),
      |dfreq AS (SELECT tok, count(*) AS df FROM tfc GROUP BY 1),
      |qt AS (SELECT doc_id AS query_id,
      |         unnest(list_distinct(string_split(text, ' '))) AS tok
      |       FROM documents WHERE doc_id < 5),
      |contrib AS (
      |  SELECT qt.query_id, t.doc_id,
      |    CAST(round(
      |      ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5)
      |               / (CAST(f.df AS DOUBLE) + 0.5))
      |      * ((CAST(t.tf AS DOUBLE) * 2.2) /
      |         (CAST(t.tf AS DOUBLE)
      |          + 1.2 * (0.25 + 0.75 * (CAST(t.dl AS DOUBLE) / s.avgdl))))
      |      * 1000000.0, 0) AS BIGINT) AS micros
      |  FROM tfc t JOIN qt ON t.tok = qt.tok
      |  JOIN dfreq f ON t.tok = f.tok CROSS JOIN stats s),
      |bmscore AS (SELECT query_id, doc_id, sum(micros) AS score_micros
      |            FROM contrib GROUP BY 1, 2),
      |bm AS (SELECT q_id, doc_id, rnk FROM (
      |  SELECT query_id AS q_id, doc_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_micros DESC, doc_id) AS rnk
      |  FROM bmscore) WHERE rnk <= 10),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |qx AS (SELECT doc_id AS q_id, sg FROM ex WHERE doc_id < 5),
      |sc AS (
      |  SELECT q.q_id, e.doc_id, count(*) AS shared
      |  FROM qx q JOIN ex e USING (sg)
      |  WHERE e.doc_id <> q.q_id
      |  GROUP BY 1, 2),
      |jscored AS (
      |  SELECT sc.q_id, sc.doc_id,
      |    CAST(sc.shared AS DOUBLE) / (sq.n + sd.n - sc.shared) AS j
      |  FROM sc
      |  JOIN sizes sq ON sc.q_id = sq.doc_id
      |  JOIN sizes sd ON sc.doc_id = sd.doc_id),
      |jc AS (SELECT q_id, doc_id, rnk FROM (
      |  SELECT q_id, doc_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY j DESC, doc_id) AS rnk
      |  FROM jscored) WHERE rnk <= 10),
      |uni AS (SELECT q_id, doc_id, 1.0 / (60 + rnk) AS contrib FROM bm
      |        UNION ALL
      |        SELECT q_id, doc_id, 1.0 / (60 + rnk) FROM jc),
      |fus AS (SELECT q_id, doc_id, sum(contrib) AS rrf,
      |          CAST(count(*) AS BIGINT) AS n_lists
      |        FROM uni GROUP BY 1, 2),
      |fr AS (SELECT q_id, doc_id, rrf, n_lists,
      |         row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id)
      |           AS rnk
      |       FROM fus)
      |SELECT q_id, doc_id, round(rrf, 6) AS rrf_score, n_lists,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM fr WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bm = TextAnalysis.bm25TopK(
        queries = docs.filter(col("doc_id") < 5),
        corpus = docs.filter(col("doc_id") >= 5), topK = 10)
      .select(col("query_id").as("q_id"), col("doc_id"), col("rnk"))
    val jc = Dedup.jaccardTopK(docs, queryIds = (0L until 5L).toSeq, k = 10)
      .select(col("q_id"), col("doc_id"), col("rnk"))
    TextAnalysis.rrfFuse(Seq(bm, jc), k = 60, topK = 5)
      .orderBy("q_id", "rnk")
  }

  /** PCA projection ([[Similarity.pcaFit]] + [[Similarity.pcaProject]]):
    * top-2 principal components of the embedding corpus (one-pass
    * covariance, driver-side Jacobi eigensolve — control-plane sized),
    * per-vector projections of the centered embeddings. Rows-only: the
    * eigensolve is an iterative driver computation (the q103/q113
    * argument); SimilaritySpec pins a hand-derived 2D fixture,
    * orthonormality, and eigenvalue/variance agreement. */
  val q117PcaProject: Q = rowsOnly("q117_pca_project") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = Similarity.pcaFit(emb, k = 2)
    Similarity.pcaProject(emb, model)
      .select(col("vec_id"), col("label"),
        round(col("pc1"), 4).as("pc1"), round(col("pc2"), 4).as("pc2"))
      .orderBy("vec_id")
  }

  /** Product-quantization encode ([[Similarity.pqTrain]] iters=0 +
    * [[Similarity.pqEncode]]): 64-dim embeddings split into m=4
    * subspaces of 16 dims, ksub=8 codebook entries per subspace — the
    * deterministic untrained quantizer (codebook s = the 16-dim slices
    * of the 8 lowest-vec_id vectors, kmeansFit's init; the q113
    * argument: the iterative trainer is SimilaritySpec-pinned, the
    * assignment rule is the SQL-mirrorable part). Per-subspace argmin is
    * squared-L2 with lower-index ties (the IvfCells rule); codes emitted
    * as four scalar BIGINT columns — the driver comparator cannot hash
    * array cells (q68 lesson). */
  val q118PqEncode: Q = q("q118_pq_encode",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      |       FROM e ORDER BY vec_id LIMIT 8),
      |sub AS (SELECT unnest(range(0, 4)) AS sid),
      |d AS (SELECT e.vec_id, sub.sid, cb.cid,
      |        list_sum(list_transform(range(1, 17),
      |          i -> (e.v[sub.sid * 16 + i] - cb.cv[sub.sid * 16 + i])
      |             * (e.v[sub.sid * 16 + i] - cb.cv[sub.sid * 16 + i]))) AS dist
      |      FROM e CROSS JOIN sub CROSS JOIN cb),
      |a AS (SELECT vec_id, sid, cid,
      |        row_number() OVER (PARTITION BY vec_id, sid
      |                           ORDER BY dist, cid) AS rn
      |      FROM d)
      |SELECT vec_id,
      |  CAST(max(CASE WHEN sid = 0 THEN cid END) AS BIGINT) AS c0,
      |  CAST(max(CASE WHEN sid = 1 THEN cid END) AS BIGINT) AS c1,
      |  CAST(max(CASE WHEN sid = 2 THEN cid END) AS BIGINT) AS c2,
      |  CAST(max(CASE WHEN sid = 3 THEN cid END) AS BIGINT) AS c3
      |FROM a WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 0)
    Similarity.pqEncode(emb, model)
      .select(col("vec_id"),
        get(col("codes"), lit(0)).cast("long").as("c0"),
        get(col("codes"), lit(1)).cast("long").as("c1"),
        get(col("codes"), lit(2)).cast("long").as("c2"),
        get(col("codes"), lit(3)).cast("long").as("c3"))
      .orderBy("vec_id")
  }

  /** PQ asymmetric-distance top-k ([[Similarity.pqAdcTopK]] over the
    * q118 quantizer): vec 0's embedding as the query, distance table on
    * the driver, per-row cost = 4 lookups + adds over the codes — the
    * embedding column is never scanned. Distances surface as micros
    * (round(d·10⁶) BIGINT, the q116 pattern) so both engines hash an
    * integer; the oracle's per-row sum is ORDERED (`ORDER BY sid`, the
    * same s=0..3 left-to-right accumulation as the op), so code-
    * colliding rows tie bit-exactly in BOTH engines and fall to the
    * vec_id break — without the ordering, DuckDB's per-group
    * accumulation order is undefined and a colliding pair near the
    * boundary could flip nondeterministically. */
  val q119PqAdcTopk: Q = q("q119_pq_adc_topk",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      |       FROM e ORDER BY vec_id LIMIT 8),
      |sub AS (SELECT unnest(range(0, 4)) AS sid),
      |d AS (SELECT e.vec_id, sub.sid, cb.cid,
      |        list_sum(list_transform(range(1, 17),
      |          i -> (e.v[sub.sid * 16 + i] - cb.cv[sub.sid * 16 + i])
      |             * (e.v[sub.sid * 16 + i] - cb.cv[sub.sid * 16 + i]))) AS dist
      |      FROM e CROSS JOIN sub CROSS JOIN cb),
      |a AS (SELECT vec_id, sid, cid,
      |        row_number() OVER (PARTITION BY vec_id, sid
      |                           ORDER BY dist, cid) AS rn
      |      FROM d),
      |qd AS (SELECT sid, cid, dist FROM d WHERE vec_id = 0),
      |adc AS (SELECT a.vec_id, sum(qd.dist ORDER BY qd.sid) AS dist
      |        FROM a JOIN qd ON a.sid = qd.sid AND a.cid = qd.cid
      |        WHERE a.rn = 1 GROUP BY a.vec_id),
      |r AS (SELECT vec_id, dist,
      |        row_number() OVER (ORDER BY dist, vec_id) AS rnk FROM adc)
      |SELECT CAST(rnk AS BIGINT) AS rnk, vec_id,
      |  CAST(round(dist * 1000000, 0) AS BIGINT) AS adc_micros
      |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 0)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    Similarity.pqAdcTopK(Similarity.pqEncode(emb, model), model, qv, k = 20)
      .select(col("rnk"), col("vec_id"),
        round(col("adc_dist") * 1000000, 0).cast("long").as("adc_micros"))
      .orderBy("rnk")
  }

  /** PQ reconstruction-error profile ([[Similarity.pqEncode]] →
    * [[Similarity.pqDecode]] → per-label squared-L2 error): how much
    * fidelity the q118 quantizer costs, by label. The oracle needs no
    * reconstruct at all — the error of a decoded vector IS the sum of
    * its winning per-subspace argmin distances, already computed in the
    * assignment chain. Spark genuinely decodes (codebook-literal
    * element_at lookups) and differences against the original, so the
    * parity check covers the decode path end-to-end; the oracle's
    * per-vector sum is ORDERED (`ORDER BY sid` — deterministic
    * run-to-run), but still associates per-subspace where Spark sums
    * positionally, and per-label avgs accumulate in engine order —
    * both ~8 orders below the micros grain. */
  val q120PqReconError: Q = q("q120_pq_recon_error",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
      |sub AS (SELECT unnest(range(0, 4)) AS sid),
      |d AS (SELECT e.vec_id, sub.sid, cb.cid,
      |        list_sum(list_transform(range(1, 17),
      |          i -> (e.v[sub.sid * 16 + i] - cb.cv[sub.sid * 16 + i])
      |             * (e.v[sub.sid * 16 + i] - cb.cv[sub.sid * 16 + i]))) AS dist
      |      FROM e CROSS JOIN sub CROSS JOIN cb),
      |a AS (SELECT vec_id, sid, cid, dist,
      |        row_number() OVER (PARTITION BY vec_id, sid
      |                           ORDER BY dist, cid) AS rn
      |      FROM d),
      |err AS (SELECT vec_id, sum(dist ORDER BY sid) AS err FROM a
      |        WHERE rn = 1 GROUP BY vec_id)
      |SELECT e.label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(round(avg(err.err) * 1000000, 0) AS BIGINT) AS avg_err_micros
      |FROM err JOIN e USING (vec_id)
      |GROUP BY e.label ORDER BY e.label""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 0)
    val dec = Similarity.pqDecode(Similarity.pqEncode(emb, model), model)
      .withColumnRenamed("embedding", "recon")
    emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .join(dec, "vec_id")
      .select(col("label"), aggregate(
        zip_with(col("v"), col("recon"), (x, y) => (x - y) * (x - y)),
        lit(0d), (acc, x) => acc + x).as("err"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("err") * 1000000, 0).cast("long").as("avg_err_micros"))
      .orderBy("label")
  }

  /** IVF-PQ batch search ([[Similarity.pqIndex]] +
    * [[Similarity.annIvfPq]]): the composed 100 TB ANN path — coarse
    * cells prune candidates, PQ codes replace the float vectors at scan
    * time, scoring decodes per index row below the broadcast cell join.
    * Both trainers are the bounded-sample driver-side kind
    * ([[Similarity.trainIvfCenters]] /
    * [[Similarity.pqTrainSampledResidual]] — codebooks fit on IVF
    * residuals, the faiss by_residual recipe that preserves within-cell
    * ranking; the recurring-deployment shape: the only distributed jobs
    * are the index projection and the search join). Rows-only
    * (iterative trainers — the q44/q103 argument); SimilaritySpec pins
    * planted-near-dup retrieval, candidate containment, clustered-blob
    * recall ≥ 0.6, and the dirty-row refuse contract. */
  val q121IvfpqSearch: Q = rowsOnly("q121_ivfpq_search") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val centers = Similarity.trainIvfCenters(emb, nlist = 16)
    val model = Similarity.pqTrainSampledResidual(emb, centers, m = 8,
      ksub = 16, iters = 2)
    // the index is MATERIALIZED before searching — the add half of the
    // train/add/search contract (annIvfPq scaladoc: searching the raw
    // pqIndex plan inline re-expands the encode expressions into every
    // decode reference, measured 14x on this query)
    val index = Similarity.pqIndex(emb, centers, model).localCheckpoint()
    Similarity.annIvfPq(emb.filter(col("vec_id") < 10), index, centers,
        model, k = 5)
      .orderBy("q_id", "rnk")
  }

  /** IVF-PQ pure-ADC batch search ([[Similarity.annIvfPqAdc]]): the
    * faiss IndexIVFPQ shape — all query distance tables driver-built
    * into ONE plan literal, scoring = m lookups + adds per candidate
    * pair (vs q121's decode-then-cosine at dim mults), metric
    * approximate squared-L2 ascending. Rows-only (iterative trainers);
    * SimilaritySpec pins per-pair ADC == driver table sums, planted
    * near-dup rank-1 retrieval, and the loud dirty-query failure. */
  val q122IvfpqAdc: Q = rowsOnly("q122_ivfpq_adc") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val centers = Similarity.trainIvfCenters(emb, nlist = 16)
    val model = Similarity.pqTrainSampledResidual(emb, centers, m = 8,
      ksub = 16, iters = 2)
    val index = Similarity.pqIndex(emb, centers, model).localCheckpoint()
    Similarity.annIvfPqAdc(emb.filter(col("vec_id") < 10), index, centers,
        model, k = 5)
      .withColumn("adc_dist", round(col("adc_dist"), 4))
      .orderBy("q_id", "rnk")
  }

  /** q32's inverted index with the stop-shingle cap
    * ([[Dedup.jaccardNearDupPairs]] `maxShingleDf`): shingles in more
    * than `2` documents are boilerplate and excluded from BOTH the
    * candidate index and the per-doc set sizes — "Jaccard over
    * non-boilerplate shingles", the quadratic-bomb defense a crawl
    * corpus needs (one hot shingle in d docs is d²/2 candidate pairs).
    * The cap is tiny here so the fixture actually exercises it (max df
    * at sf0.01 is 7; a real deployment caps in the thousands). */
  val q123JaccardStopshingles: Q = q("q123_jaccard_stopshingles",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |dfs AS (SELECT sg, count(*) AS df FROM ex0 GROUP BY sg),
      |ex AS (SELECT doc_id, sg FROM ex0 JOIN dfs USING (sg) WHERE df <= 2),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 3) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.jaccardNearDupPairs(Tables.documents(s, d), minJaccard = 0.6,
        maxShingleDf = 2)
      .orderBy("doc_a", "doc_b")
  }

  /** q72's near-dup clustering with the exact-duplicate collapse in
    * front ([[Dedup.nearDupClustersCollapsed]]): identical texts
    * collapse to one representative before the quadratic candidate
    * stage, members rejoin via linear star edges — a doc duplicated d
    * times costs d edges instead of d² candidate pairs (measured 125×
    * runtime at 10× corpus of exact copies without the collapse). Same
    * output as q72 on this corpus (identical texts pair at Jaccard 1
    * anyway); the oracle derives it independently through the collapsed
    * route. */
  val q124CollapsedClusters: Q = q("q124_collapsed_clusters",
    """WITH RECURSIVE reps AS (
      |  SELECT text, min(doc_id) AS rep FROM documents GROUP BY text),
      |rd AS (SELECT d.doc_id, d.text FROM documents d
      |       JOIN reps r ON d.doc_id = r.rep),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM rd),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      |star AS (
      |  SELECT r.rep AS a, d.doc_id AS b FROM documents d
      |  JOIN reps r ON d.text = r.text AND d.doc_id <> r.rep),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs
      |          UNION SELECT a, b FROM star
      |          UNION SELECT b, a FROM star),
      |cc(node, lbl) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.node)
      |SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
      |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDupClustersCollapsed(Tables.documents(s, d), 0.8)
      .orderBy("doc_id")
  }

  /** q79's semantic dedup with the exact-duplicate collapse in front
    * ([[Similarity.semanticClustersCollapsed]]): bit-identical
    * embeddings (planted exact copies at vec_id+200000, alongside q79's
    * perturbed copies at +100000) collapse to one representative before
    * the LSH pair stage — identical vectors share EVERY LSH bucket, so
    * uncollapsed they are a guaranteed quadratic blow-up (measured 50×
    * at 10× corpus). Members rejoin via star edges; the oracle derives
    * the same clusters through the collapsed route with quadratic
    * rep-pair SQL closed by a recursive CTE. */
  val q125SemanticCollapsed: Q = q("q125_semantic_collapsed",
    """WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |aug AS (SELECT vec_id, v FROM base
      |        UNION ALL
      |        SELECT vec_id + 100000, list_transform(v, x -> x + 0.2 * x * x) FROM base
      |        UNION ALL
      |        SELECT vec_id + 200000, v FROM base),
      |reps AS (SELECT v, min(vec_id) AS rep FROM aug GROUP BY v),
      |rv AS (SELECT rep AS vec_id, v FROM reps),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM rv a JOIN rv b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9),
      |star AS (
      |  SELECT r.rep AS a, g.vec_id AS b FROM aug g
      |  JOIN reps r ON g.v = r.v AND g.vec_id <> r.rep),
      |edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
      |          UNION SELECT vec_b, vec_a FROM pairs
      |          UNION SELECT a, b FROM star
      |          UNION SELECT b, a FROM star),
      |cc(node, lbl) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.node)
      |SELECT node AS vec_id, CAST(min(lbl) AS BIGINT) AS cluster_id
      |FROM cc GROUP BY node ORDER BY vec_id""".stripMargin) { (s, d) =>
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val aug = plantedNearDupEmbeddings(s, d).unionAll(base.select(
      (col("vec_id") + 200000L).as("vec_id"), col("embedding")))
    Similarity.semanticClustersCollapsed(aug, minCos = 0.9)
      .orderBy("vec_id")
  }

  /** Little-endian hex rendering of a 16/32-bit value — builds binary
    * container fields via unhex (q126's WAV synthesis). */
  private def leHex16(c: Column): Column = {
    val h = lpad(hex(c.cast("long")), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }
  private def leHex32(c: Column): Column = {
    val h = lpad(hex(c.cast("long")), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Audio-container metadata ([[graft.ops.Multimodal.decodeAvPayloads]] /
    * [[graft.ops.AvHeaders]]): each doc gets a complete synthesized PCM
    * WAV payload (RIFF/WAVE/fmt/data, parameters varied per doc_id) built
    * byte-for-byte via hex → unhex, and the REAL header parser reads the
    * metadata back. The oracle computes the same metadata from the
    * construction arithmetic directly — so a parser that misreads any
    * little-endian offset, chunk bound, or the floor-division duration
    * diverges. (The JDK AudioSystem cross-check lives in
    * RuntimeExtrasSpec, the ImageIO analog.) */
  val q126WavMeta: Q = q("q126_wav_meta",
    """WITH p AS (SELECT doc_id,
      |  doc_id % 2 + 1 AS ch,
      |  8000 + (doc_id % 5) * 1000 AS rate,
      |  (doc_id % 50 + 10) * (doc_id % 2 + 1) * 2 AS data_size
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id, CAST(44 + data_size AS BIGINT) AS n_bytes,
      |  'audio' AS kind, 'wav' AS format,
      |  CAST(ch AS INT) AS channels, CAST(rate AS INT) AS sample_rate,
      |  CAST((data_size * 1000) // (rate * ch * 2) AS BIGINT) AS duration_ms
      |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ch = col("doc_id") % 2 + 1
    val rate = lit(8000) + (col("doc_id") % 5) * 1000
    val blockAlign = ch * 2
    val dataSize = (col("doc_id") % 50 + 10) * blockAlign
    val wavHex = concat(
      lit("52494646"), leHex32(dataSize + 36), lit("57415645"), // RIFF size WAVE
      lit("666D7420"), leHex32(lit(16)), leHex16(lit(1)),       // fmt_ 16 PCM
      leHex16(ch), leHex32(rate), leHex32(rate * blockAlign),
      leHex16(blockAlign), leHex16(lit(16)),
      lit("64617461"), leHex32(dataSize),                       // data size
      repeat(lit("00"), dataSize.cast("int")))                  // ONE size formula
    val payloads = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), unhex(wavHex).as("payload"))
    graft.ops.Multimodal.decodeAvPayloads(s, payloads).toDF()
      .select(col("doc_id"), col("n_bytes"), col("kind"), col("format"),
        col("channels"), col("sample_rate"), col("duration_ms"))
      .orderBy("doc_id")
  }

  /** Video-container metadata — q126's MP4 sibling: a minimal ISO-BMFF
    * file per doc (ftyp + moov/mvhd/trak/tkhd, all sizes/fields
    * big-endian so plain `hex` renders them) with per-doc timescale,
    * duration, and 16.16 fixed-point track dims; [[graft.ops.AvHeaders]]
    * walks the real box tree to read them back while the oracle
    * recomputes the construction arithmetic (including the floor-divided
    * ms duration). */
  val q127Mp4Meta: Q = q("q127_mp4_meta",
    """WITH p AS (SELECT doc_id,
      |  600 + (doc_id % 4) * 200 AS ts,
      |  (doc_id % 500 + 50) * 10 AS dur,
      |  320 + (doc_id % 8) * 160 AS w,
      |  240 + (doc_id % 6) * 120 AS h
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id, CAST(232 AS BIGINT) AS n_bytes, 'video' AS kind,
      |  'mp4/isom' AS format, CAST((dur * 1000) // ts AS BIGINT) AS duration_ms,
      |  CAST(w AS INT) AS width, CAST(h AS INT) AS height
      |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    def beHex32(c: Column): Column = lpad(hex(c.cast("long")), 8, "0")
    def fixed1616(c: Column): Column = concat(lpad(hex(c.cast("long")), 4, "0"), lit("0000"))
    val ts = lit(600) + (col("doc_id") % 4) * 200
    val dur = (col("doc_id") % 500 + 50) * 10
    val w = lit(320) + (col("doc_id") % 8) * 160
    val h = lit(240) + (col("doc_id") % 6) * 120
    val zeros = (n: Int) => lit("00" * n)
    val mp4Hex = concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"), // ftyp isom
      lit("000000D8"), lit("6D6F6F76"),                                   // moov
      lit("0000006C"), lit("6D766864"), zeros(12),                        // mvhd v0
      beHex32(ts), beHex32(dur), zeros(80),
      lit("00000064"), lit("7472616B"),                                   // trak
      lit("0000005C"), lit("746B6864"), zeros(12),                        // tkhd v0
      lit("00000001"), zeros(4), beHex32(dur), zeros(16), zeros(36),
      fixed1616(w), fixed1616(h))
    val payloads = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), unhex(mp4Hex).as("payload"))
    graft.ops.Multimodal.decodeAvPayloads(s, payloads).toDF()
      .select(col("doc_id"), col("n_bytes"), col("kind"), col("format"),
        col("duration_ms"), col("width"), col("height"))
      .orderBy("doc_id")
  }

  /** Mixed-media dispatch ([[graft.ops.Multimodal.decodeAvPayloads]]):
    * ONE payload column carrying five container families by doc_id % 5 —
    * GIF image, PCM WAV, ISO-BMFF MP4 video, raw text (unrecognized),
    * and FLAC (STREAMINFO bit-packed rate/channels/bits/total-samples,
    * the [[graft.ops.AvHeaders]] addition this round) — and the
    * dispatcher must route every row to the right parser and field set.
    * All payloads are synthesized byte-for-byte in the plan (hex →
    * unhex, q126/q127 style) and the oracle recomputes each branch's
    * construction arithmetic, so a misrouted family or a misread
    * bit-field diverges. */
  val q129MixedMedia: Q = q("q129_mixed_media",
    """WITH p AS (SELECT doc_id, text, doc_id % 5 AS m
      |  FROM documents WHERE doc_id < 250)
      |SELECT doc_id,
      |  CAST(CASE m WHEN 0 THEN 10
      |    WHEN 1 THEN 44 + (doc_id % 50 + 10) * (doc_id % 2 + 1) * 2
      |    WHEN 2 THEN 232
      |    WHEN 3 THEN octet_length(encode(text))
      |    ELSE 42 END AS BIGINT) AS n_bytes,
      |  CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' WHEN 2 THEN 'video'
      |    WHEN 3 THEN 'unknown' ELSE 'audio' END AS kind,
      |  CASE m WHEN 0 THEN 'gif' WHEN 1 THEN 'wav' WHEN 2 THEN 'mp4/isom'
      |    WHEN 3 THEN 'unknown' ELSE 'flac' END AS format,
      |  CAST(CASE WHEN m IN (1, 4) THEN doc_id % 2 + 1
      |    WHEN m = 0 THEN 3 ELSE 0 END AS INT) AS channels,
      |  CAST(CASE WHEN m = 1 THEN 8000 + (doc_id % 3) * 4000
      |    WHEN m = 4 THEN 22050 + (doc_id % 3) * 11025
      |    ELSE 0 END AS INT) AS sample_rate,
      |  CAST(CASE
      |    WHEN m = 1 THEN ((doc_id % 50 + 10) * 1000) // (8000 + (doc_id % 3) * 4000)
      |    WHEN m = 2 THEN ((doc_id % 500 + 50) * 10 * 1000) // (600 + (doc_id % 4) * 200)
      |    WHEN m = 4 THEN ((doc_id % 97 + 10) * 1000 * 1000) // (22050 + (doc_id % 3) * 11025)
      |    ELSE 0 END AS BIGINT) AS duration_ms,
      |  CAST(CASE WHEN m = 0 THEN 100 + doc_id % 53
      |    WHEN m = 2 THEN 320 + (doc_id % 8) * 160 ELSE 0 END AS INT) AS width,
      |  CAST(CASE WHEN m = 0 THEN 80 + doc_id % 41
      |    WHEN m = 2 THEN 240 + (doc_id % 6) * 120 ELSE 0 END AS INT) AS height
      |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 5
    // GIF: signature + little-endian logical screen descriptor
    val gw = lit(100) + col("doc_id") % 53
    val gh = lit(80) + col("doc_id") % 41
    val gifHex = concat(lit("474946383961"), leHex16(gw), leHex16(gh))
    // WAV: the q126 synthesis with moduli coprime to the branch selector
    // (doc_id % 5 is constant inside a branch — a % 5 parameter would be
    // a single value, testing nothing)
    val ch = col("doc_id") % 2 + 1
    val rate = lit(8000) + (col("doc_id") % 3) * 4000
    val blockAlign = ch * 2
    val dataSize = (col("doc_id") % 50 + 10) * blockAlign
    val wavHex = concat(
      lit("52494646"), leHex32(dataSize + 36), lit("57415645"),
      lit("666D7420"), leHex32(lit(16)), leHex16(lit(1)),
      leHex16(ch), leHex32(rate), leHex32(rate * blockAlign),
      leHex16(blockAlign), leHex16(lit(16)),
      lit("64617461"), leHex32(dataSize),
      repeat(lit("00"), dataSize.cast("int")))
    // MP4: the q127 synthesis verbatim
    def beHex32(c: Column): Column = lpad(hex(c.cast("long")), 8, "0")
    def fixed1616(c: Column): Column =
      concat(lpad(hex(c.cast("long")), 4, "0"), lit("0000"))
    val ts = lit(600) + (col("doc_id") % 4) * 200
    val dur = (col("doc_id") % 500 + 50) * 10
    val w = lit(320) + (col("doc_id") % 8) * 160
    val h = lit(240) + (col("doc_id") % 6) * 120
    val zeros = (n: Int) => lit("00" * n)
    val mp4Hex = concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"),
      lit("000000D8"), lit("6D6F6F76"),
      lit("0000006C"), lit("6D766864"), zeros(12),
      beHex32(ts), beHex32(dur), zeros(80),
      lit("00000064"), lit("7472616B"),
      lit("0000005C"), lit("746B6864"), zeros(12),
      lit("00000001"), zeros(4), beHex32(dur), zeros(16), zeros(36),
      fixed1616(w), fixed1616(h))
    // FLAC: fLaC + last-block STREAMINFO (type 0, length 34) with the
    // 64-bit rate(20)|channels-1(3)|bps-1(5)|total(36) field bit-packed
    val fch = col("doc_id") % 2 + 1
    val frate = lit(22050) + (col("doc_id") % 3) * 11025
    val ftotal = (col("doc_id") % 97 + 10) * 1000
    val packed = shiftleft(frate.cast("long"), 44)
      .bitwiseOR(shiftleft((fch - 1).cast("long"), 41))
      .bitwiseOR(lit(15L << 36)) // bits-per-sample 16
      .bitwiseOR(ftotal.cast("long"))
    val flacHex = concat(lit("664C6143"), lit("80"), lit("000022"),
      lit("1000"), lit("1000"), lit("000000"), lit("000000"),
      lpad(hex(packed), 16, "0"), lit("00" * 16))
    val payload = when(m === 3, encode(col("text"), "UTF-8"))
      .otherwise(unhex(
        when(m === 0, gifHex).when(m === 1, wavHex)
          .when(m === 2, mp4Hex).otherwise(flacHex)))
    val payloads = Tables.documents(s, d).filter(col("doc_id") < 250)
      .select(col("doc_id"), payload.as("payload"))
    graft.ops.Multimodal.decodeAvPayloads(s, payloads).toDF()
      .select(col("doc_id"), col("n_bytes"), col("kind"), col("format"),
        col("channels"), col("sample_rate"), col("duration_ms"),
        col("width"), col("height"))
      .orderBy("doc_id")
  }

  /** Normalize-then-dedup ([[Dedup.exactDedupNormalized]]): the
    * C4/RefinedWeb canonicalization (lowercase → strip non-alnum →
    * collapse whitespace → trim) in front of exact dedup, catching
    * trivially-reformatted duplicates without a pair stage. The oracle
    * groups by the identical RE2∩Java regex chain; like q31, the
    * blake2b key column is dropped from the compare (DuckDB lacks it —
    * the hash↔text keying equivalence is q31's established check,
    * plus the planted-variant DedupSpec test). */
  val q128NormalizedDedup: Q = q("q128_normalized_dedup",
    """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
      |FROM documents
      |GROUP BY trim(regexp_replace(regexp_replace(
      |  regexp_replace(lower(text), 'ς', 'σ', 'g'),
      |  '[^\p{L}\p{N} \t\n\r\f]', '', 'g'), '[ \t\n\r\f]+', ' ', 'g'))
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.exactDedupNormalized(Tables.documents(s, d), col("text"), col("doc_id"))
      .select("doc_id", "dup_count")
      .orderBy("doc_id")
  }

  /** Link-graph ranking ([[Graph.pageRankMicro]]): 3 power-iteration
    * rounds of integer-micros PageRank over a directed graph derived
    * deterministically from lineitem (orderkey-bucket → partkey-bucket
    * edges, self-loops dropped, deduplicated). Every engine that follows
    * the documented integer recurrence reproduces the ranks bit-for-bit
    * — the oracle unrolls the three rounds as chained CTEs with the
    * same floor divisions, so a contribution mis-join, a missed
    * dangling-node left join, or any float sum in the loop diverges. */
  val q130PageRank: Q = q("q130_pagerank",
    """WITH e AS (SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
      |           FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
      |s1 AS (SELECT e.dst AS node, sum(r0.r // d.deg) AS s FROM e
      |       JOIN r0 ON r0.node = e.src JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r1 AS (SELECT n.node, CAST(150000 + (850000 * COALESCE(s1.s, 0)) // 1000000 AS BIGINT) AS r
      |       FROM n LEFT JOIN s1 ON s1.node = n.node),
      |s2 AS (SELECT e.dst AS node, sum(r1.r // d.deg) AS s FROM e
      |       JOIN r1 ON r1.node = e.src JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r2 AS (SELECT n.node, CAST(150000 + (850000 * COALESCE(s2.s, 0)) // 1000000 AS BIGINT) AS r
      |       FROM n LEFT JOIN s2 ON s2.node = n.node),
      |s3 AS (SELECT e.dst AS node, sum(r2.r // d.deg) AS s FROM e
      |       JOIN r2 ON r2.node = e.src JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r3 AS (SELECT n.node, CAST(150000 + (850000 * COALESCE(s3.s, 0)) // 1000000 AS BIGINT) AS r
      |       FROM n LEFT JOIN s3 ON s3.node = n.node)
      |SELECT node, r AS rank_micro FROM r3 ORDER BY node""".stripMargin) { (s, d) =>
    Graph.pageRankMicro(
      Tables.lineitem(s, d).select(
        (col("l_orderkey") % 100).as("src"), (col("l_partkey") % 100).as("dst")),
      iters = 3)
      .orderBy("node")
  }

  /** Sharded training-data export ([[Curation.exportShards]]): stable
    * shard membership (first 16 md5 bits mod 16) plus a deterministic
    * within-shard order (md5-rank — the hash shuffle) for every
    * document. The oracle recomputes both from the same md5 arithmetic,
    * so an off-by-one in the hex slice, a different modulus, or an
    * unstable window order diverges. */
  val q131ExportShards: Q = q("q131_export_shards",
    """WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key FROM documents),
      |s AS (SELECT doc_id, key,
      |        CAST(('0x' || substr(key, 1, 4))::INTEGER % 16 AS INT) AS shard FROM k)
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS INT) AS shard_pos
      |FROM s ORDER BY shard, shard_pos""".stripMargin) { (s, d) =>
    Curation.exportShards(Tables.documents(s, d), col("doc_id"), numShards = 16)
      .select("doc_id", "shard", "shard_pos")
      .orderBy("shard", "shard_pos")
  }

  /** PMI collocation mining ([[TextAnalysis.pmiCollocations]]): top
    * word pairs by pointwise mutual information with a min-count prune.
    * The oracle recomputes the same all-integer count ratio and the one
    * ln (q20/q69 parity precedent) in integer micros; ties break on the
    * pair, so the top-k boundary is engine-stable. */
  val q132PmiCollocations: Q = q("q132_pmi_collocations",
    """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |              unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |       FROM t WHERE len(w) >= 2),
      |uc AS (SELECT unnest(w) AS w FROM t),
      |u AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uc GROUP BY 1),
      |f AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
      |      HAVING count(*) >= 5),
      |tot AS (SELECT CAST(sum(len(w)) AS BIGINT) AS n_tok,
      |               CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS n_big FROM t)
      |SELECT w1, w2, c12 AS pair_count,
      |  CAST(round(ln((c12::DOUBLE * n_tok * n_tok) / (n_big::DOUBLE * u1.c * u2.c))
      |    * 1000000.0, 0) AS BIGINT) AS pmi_micro
      |FROM f CROSS JOIN tot
      |JOIN u u1 ON u1.w = f.w1
      |JOIN u u2 ON u2.w = f.w2
      |ORDER BY pmi_micro DESC, w1, w2 LIMIT 50""".stripMargin) { (s, d) =>
    TextAnalysis.pmiCollocations(Tables.documents(s, d), minCount = 5, topK = 50)
  }

  /** Misra-Gries heavy hitters ([[TextAnalysis.heavyHittersMG]]): the
    * bounded-state sketch path with exact confirm. minShare 0.02 >
    * 1/(k+1) = 1/65, so the sketch's superset guarantee holds and the
    * confirmed output equals the exact frequency filter — which is
    * precisely what the oracle computes. */
  val q133MgHeavyHitters: Q = q("q133_mg_heavy_hitters",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tot AS (SELECT CAST(floor(0.02 * count(*)) AS BIGINT) AS thr FROM tok)
      |SELECT tok, count(*) AS n FROM tok GROUP BY tok
      |HAVING count(*) >= (SELECT thr FROM tot)
      |ORDER BY n DESC, tok""".stripMargin) { (s, d) =>
    TextAnalysis.heavyHittersMG(Tables.documents(s, d), minShare = 0.02, k = 64)
  }

  /** Markov rank of the event-transition graph
    * ([[Graph.pageRankWeightedMicro]] over q99's transition derivation):
    * per-user consecutive event pairs become weighted edges
    * (w = transition count), and 3 weighted power-iteration rounds
    * approximate the damped stationary distribution — "which event type
    * does user flow accumulate in". String nodes ride through the
    * weighted op untouched; the oracle re-derives the edges with the
    * q99 lead-window idiom and unrolls the same integer recurrence. */
  val q134EventPagerank: Q = q("q134_event_pagerank",
    """WITH o AS (SELECT user_id, event_type,
      |             lead(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS next_type
      |           FROM events),
      |e AS (SELECT event_type AS src, next_type AS dst, CAST(count(*) AS BIGINT) AS w
      |      FROM o WHERE next_type IS NOT NULL AND next_type <> event_type
      |      GROUP BY 1, 2),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |dg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wt FROM e GROUP BY 1),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
      |s1 AS (SELECT e.dst AS node, CAST(sum((r0.r * e.w) // d.wt) AS BIGINT) AS s FROM e
      |       JOIN r0 ON r0.node = e.src JOIN dg d ON d.src = e.src GROUP BY e.dst),
      |r1 AS (SELECT n.node, CAST(150000 + (850000 * COALESCE(s1.s, 0)) // 1000000 AS BIGINT) AS r
      |       FROM n LEFT JOIN s1 ON s1.node = n.node),
      |s2 AS (SELECT e.dst AS node, CAST(sum((r1.r * e.w) // d.wt) AS BIGINT) AS s FROM e
      |       JOIN r1 ON r1.node = e.src JOIN dg d ON d.src = e.src GROUP BY e.dst),
      |r2 AS (SELECT n.node, CAST(150000 + (850000 * COALESCE(s2.s, 0)) // 1000000 AS BIGINT) AS r
      |       FROM n LEFT JOIN s2 ON s2.node = n.node),
      |s3 AS (SELECT e.dst AS node, CAST(sum((r2.r * e.w) // d.wt) AS BIGINT) AS s FROM e
      |       JOIN r2 ON r2.node = e.src JOIN dg d ON d.src = e.src GROUP BY e.dst),
      |r3 AS (SELECT n.node, CAST(150000 + (850000 * COALESCE(s3.s, 0)) // 1000000 AS BIGINT) AS r
      |       FROM n LEFT JOIN s3 ON s3.node = n.node)
      |SELECT node AS event_type, r AS rank_micro FROM r3
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val edges = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull && col("next_type") =!= col("event_type"))
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    Graph.pageRankWeightedMicro(edges, iters = 3)
      .select(col("node").as("event_type"), col("rank_micro"))
      .orderBy("event_type")
  }

  /** Semantic decontamination
    * ([[Similarity.semanticContaminationFlags]]): the q63 planted
    * variants as the "training pool", raw vec_id < 50 as the "eval
    * benchmark" — planted copies of eval vectors land at cos ≈ 0.998
    * (contaminated) while the random background stays ≤ ~0.6. The
    * oracle re-derives the exact per-train argmax quadratically with
    * the identical rounded-cosine chain and lowest-eval-id tiebreak. */
  val q136SemanticDecon: Q = q("q136_semantic_decon",
    """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |ev AS (SELECT vec_id AS eval_id, v AS ee FROM base WHERE vec_id < 50),
      |tr AS (SELECT vec_id + 100000 AS vec_id,
      |         list_transform(v, x -> x + 0.2 * x * x) AS te FROM base),
      |sims AS (SELECT tr.vec_id, ev.eval_id,
      |    round(list_dot_product(te, ee) /
      |      (sqrt(list_dot_product(te, te)) * sqrt(list_dot_product(ee, ee))), 4) AS c
      |  FROM tr CROSS JOIN ev),
      |best AS (SELECT vec_id, c, eval_id,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, eval_id) AS rn
      |  FROM sims)
      |SELECT vec_id, c >= 0.9 AS contaminated, eval_id AS best_eval_id,
      |  c AS best_cos
      |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val train = base.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.2) * x * x).as("embedding"))
    Similarity.semanticContaminationFlags(train, base.filter(col("vec_id") < 50),
        minCos = 0.9)
      .orderBy("vec_id")
  }

  /** Per-source KL mixture drift ([[TextAnalysis.sourceKlDivergence]]):
    * how far each source's unigram distribution sits from the corpus
    * blend. The oracle recomputes the identical per-term double chain
    * (div → ln → mul) and sums the same HALF_UP integer micros — any
    * count mis-join, a smoothing term that shouldn't exist, or a float
    * sum in the reduction diverges. */
  val q137SourceKl: Q = q("q137_source_kl",
    """WITH tok AS (SELECT source AS src, unnest(string_split(text, ' ')) AS w
      |             FROM documents),
      |sw AS (SELECT src, w, CAST(count(*) AS BIGINT) AS c_sw FROM tok GROUP BY 1, 2),
      |st AS (SELECT src, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
      |gw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
      |tot AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n FROM sw)
      |SELECT src AS source, n_s AS n_tokens,
      |  CAST(sum(CAST(round((c_sw::DOUBLE / n_s) *
      |    ln((c_sw::DOUBLE * n) / (n_s::DOUBLE * c_w)) * 1000000.0, 0) AS BIGINT))
      |    AS BIGINT) AS kl_micro
      |FROM sw JOIN st USING (src) JOIN gw USING (w) CROSS JOIN tot
      |GROUP BY src, n_s ORDER BY source""".stripMargin) { (s, d) =>
    TextAnalysis.sourceKlDivergence(Tables.documents(s, d))
      .orderBy("source")
  }

  /** Quality-priority survivors ([[Dedup.nearDupSurvivorsByScore]]):
    * q78's cluster canonicalization with the realistic keep rule —
    * longest member (n_chars, ties → lowest doc_id) survives each
    * near-dup cluster instead of the arbitrary min-id. The oracle
    * extends the q72/q78 recursive-CTE closure with a per-cluster
    * ranking window over the same score. */
  val q138BestSurvivors: Q = q("q138_best_survivors",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |cc(node, lbl) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.node),
      |memb AS (SELECT node, min(lbl) AS cl FROM cc GROUP BY node),
      |ranked AS (SELECT node, row_number() OVER (PARTITION BY cl
      |    ORDER BY d.n_chars DESC, node) AS rn
      |  FROM memb JOIN documents d ON d.doc_id = memb.node),
      |drops AS (SELECT node FROM ranked WHERE rn > 1)
      |SELECT doc_id, n_chars FROM documents
      |WHERE doc_id NOT IN (SELECT node FROM drops)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDupSurvivorsByScore(Tables.documents(s, d), col("n_chars"),
        minJaccard = 0.8)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** Containment near-dup ([[Dedup.overlapCoefficientPairs]]): plants a
    * 12-word prefix fragment of each doc_id < 25 document (id + 200000)
    * — the fragment's shingles are a subset of its source's, so the
    * overlap coefficient hits 1.0 while Jaccard sits near
    * 10/n_source (invisible to q32's threshold). The oracle re-derives
    * the same augmented corpus and |A∩B|/min(|A|,|B|) score with string
    * shingles (the q32 hash-identity argument). */
  val q139Containment: Q = q("q139_containment",
    """WITH aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000,
      |    array_to_string(string_split(text, ' ')[1:12], ' ')
      |  FROM documents WHERE doc_id < 25),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS s
      |  FROM aug),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(CAST(shared AS DOUBLE) / least(sa.n, sb.n), 3) AS overlap
      |FROM pairs
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val docsDf = Tables.documents(s, d)
    val frag = docsDf.filter(col("doc_id") < 25)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 12)).as("text"))
    Dedup.overlapCoefficientPairs(
        docsDf.select("doc_id", "text").unionAll(frag), minOverlap = 0.9)
      .orderBy("doc_a", "doc_b")
  }

  /** NFC-canonical dedup ([[GraftFunctions.nfcNormalize]] →
    * [[Dedup.exactByHash]]): each doc_id < 50 document appears twice,
    * once suffixed with composed é (U+00E9) and once with decomposed
    * e + U+0301 — byte-distinct, canonically equal. NFC folds each pair
    * to one group (dup_count 2 everywhere); the oracle normalizes with
    * DuckDB's `nfc_normalize` and groups on the text (the q31
    * hash↔text keying equivalence; the blake2b key column is dropped
    * from the compare). */
  val q140NfcDedup: Q = q("q140_nfc_dedup",
    """WITH aug AS (
      |  SELECT doc_id, text || chr(233) AS text
      |  FROM documents WHERE doc_id < 50
      |  UNION ALL
      |  SELECT doc_id + 1000, text || 'e' || chr(769)
      |  FROM documents WHERE doc_id < 50)
      |SELECT min(doc_id) AS doc_id, count(*) AS dup_count
      |FROM aug GROUP BY nfc_normalize(text)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).filter(col("doc_id") < 50)
    val aug = base
      .select(col("doc_id"), concat(col("text"), lit("\u00e9")).as("text"))
      .unionAll(base.select((col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit("e\u0301")).as("text")))
    Dedup.exactByHash(aug, GraftFunctions.nfcNormalize(col("text")), col("doc_id"))
      .select("doc_id", "dup_count")
      .orderBy("doc_id")
  }

  /** Winnowing fingerprints ([[Dedup.winnowingFingerprints]], the MOSS
    * selection): min-md5 shingle of every 4-window with the
    * rightmost-tie rule, both engines agreeing through the single
    * sortable `md5 ‖ padded-reversed-pos` encoding — a selection
    * off-by-one, a tie broken leftward, or a tail window counted
    * diverges. */
  val q141Winnowing: Q = q("q141_winnowing",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents
      |           WHERE doc_id < 100 AND len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, unnest(range(1, len(wd) - 1)) AS i,
      |         len(wd) - 2 AS m, wd FROM t),
      |h AS (SELECT doc_id, i - 1 AS pos, m,
      |        md5(array_to_string(wd[i:i+2], ' ')) ||
      |          lpad(CAST(999999999 - (i - 1) AS VARCHAR), 9, '0') AS enc
      |      FROM sh),
      |win AS (SELECT doc_id, pos, m,
      |        min(enc) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      |        FROM h),
      |sel AS (SELECT DISTINCT doc_id,
      |        CAST(999999999 - CAST(substr(wmin, 33, 9) AS BIGINT) AS BIGINT) AS pos,
      |        substr(wmin, 1, 32) AS fp
      |        FROM win WHERE pos <= m - 4)
      |SELECT doc_id, pos, fp FROM sel
      |ORDER BY doc_id, pos, fp""".stripMargin) { (s, d) =>
    Dedup.winnowingFingerprints(
        Tables.documents(s, d).filter(col("doc_id") < 100), n = 3, w = 4)
      .orderBy("doc_id", "pos", "fp")
  }

  /** HITS hubs/authorities ([[Graph.hitsMicro]], 2 rounds) over the
    * q130 lineitem-derived graph. The oracle unrolls both rounds —
    * each half-round is the in/out-edge sum plus the integer
    * max-rescale — so a swapped join side, a float normalization, or a
    * missing dangling-node zero diverges. */
  val q142Hits: Q = q("q142_hits",
    """WITH e AS (SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
      |           FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS v FROM n),
      |a1r AS (SELECT e.dst AS node, CAST(sum(h0.v) AS BIGINT) AS v FROM e
      |        JOIN h0 ON h0.node = e.src GROUP BY e.dst),
      |ma1 AS (SELECT max(v) AS mx FROM a1r),
      |a1 AS (SELECT n.node, CASE WHEN ma1.mx IS NULL OR ma1.mx = 0 THEN 0
      |         ELSE (COALESCE(a1r.v, 0) * 1000000) // ma1.mx END AS v
      |       FROM n LEFT JOIN a1r ON a1r.node = n.node CROSS JOIN ma1),
      |h1r AS (SELECT e.src AS node, CAST(sum(a1.v) AS BIGINT) AS v FROM e
      |        JOIN a1 ON a1.node = e.dst GROUP BY e.src),
      |mh1 AS (SELECT max(v) AS mx FROM h1r),
      |h1 AS (SELECT n.node, CASE WHEN mh1.mx IS NULL OR mh1.mx = 0 THEN 0
      |         ELSE (COALESCE(h1r.v, 0) * 1000000) // mh1.mx END AS v
      |       FROM n LEFT JOIN h1r ON h1r.node = n.node CROSS JOIN mh1),
      |a2r AS (SELECT e.dst AS node, CAST(sum(h1.v) AS BIGINT) AS v FROM e
      |        JOIN h1 ON h1.node = e.src GROUP BY e.dst),
      |ma2 AS (SELECT max(v) AS mx FROM a2r),
      |a2 AS (SELECT n.node, CASE WHEN ma2.mx IS NULL OR ma2.mx = 0 THEN 0
      |         ELSE (COALESCE(a2r.v, 0) * 1000000) // ma2.mx END AS v
      |       FROM n LEFT JOIN a2r ON a2r.node = n.node CROSS JOIN ma2),
      |h2r AS (SELECT e.src AS node, CAST(sum(a2.v) AS BIGINT) AS v FROM e
      |        JOIN a2 ON a2.node = e.dst GROUP BY e.src),
      |mh2 AS (SELECT max(v) AS mx FROM h2r),
      |h2 AS (SELECT n.node, CASE WHEN mh2.mx IS NULL OR mh2.mx = 0 THEN 0
      |         ELSE (COALESCE(h2r.v, 0) * 1000000) // mh2.mx END AS v
      |       FROM n LEFT JOIN h2r ON h2r.node = n.node CROSS JOIN mh2)
      |SELECT n.node, CAST(a2.v AS BIGINT) AS authority_micro,
      |  CAST(h2.v AS BIGINT) AS hub_micro
      |FROM n JOIN a2 ON a2.node = n.node JOIN h2 ON h2.node = n.node
      |ORDER BY n.node""".stripMargin) { (s, d) =>
    Graph.hitsMicro(
      Tables.lineitem(s, d).select(
        (col("l_orderkey") % 100).as("src"), (col("l_partkey") % 100).as("dst")),
      iters = 2)
      .orderBy("node")
  }

  /** URL canonicalization + registered-domain rollup
    * ([[graft.ops.WebText.canonicalUrl]] / `registeredDomain`) — step 0
    * of crawl curation: messy URLs (mixed-case scheme/host, `www.`,
    * default port, doubled slashes, `utm_*` tracking params, fragments)
    * are synthesized deterministically per doc, canonicalized, and
    * rolled up by eTLD+1. The whole chain is regex/CASE syntax with
    * identical Java-regex/RE2 semantics (no backreferences, no
    * lookaround), so the oracle runs the LITERAL same transforms — a
    * drifted canon rule changes dedup keys and diverges. Shuffle-free
    * until the final rollup. */
  val q143UrlCanon: Q = q("q143_url_canon",
    """WITH raw AS (SELECT doc_id,
      |  'HTTP://WWW.' || upper(source) ||
      |  CASE WHEN doc_id % 7 = 0 THEN '.CO.UK' ELSE '.Example.COM' END ||
      |  ':80/a//b/' || CAST(doc_id % 5 AS VARCHAR) ||
      |  CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
      |  '?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '&utm_campaign=x' ELSE '' END ||
      |  '#sec' || CAST(doc_id % 4 AS VARCHAR) AS u FROM documents),
      |c1 AS (SELECT doc_id, regexp_replace(u, '#.*$', '', 'g') AS u FROM raw),
      |c2 AS (SELECT doc_id, u,
      |  lower(regexp_extract(u, '^[^/]*//[^/]*')) AS auth0 FROM c1),
      |c3 AS (SELECT doc_id, substr(u, length(auth0) + 1) AS rest0,
      |  regexp_replace(auth0, '//www\.', '//', 'g') AS auth1 FROM c2),
      |c4 AS (SELECT doc_id,
      |  CASE WHEN auth1 LIKE 'http://%' AND auth1 LIKE '%:80'
      |         THEN substr(auth1, 1, length(auth1) - 3)
      |       WHEN auth1 LIKE 'https://%' AND auth1 LIKE '%:443'
      |         THEN substr(auth1, 1, length(auth1) - 4)
      |       ELSE auth1 END AS auth,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(rest0, '/{2,}', '/', 'g'),
      |    '&(utm_[a-z]*|fbclid|gclid)=[^&]*', '', 'g'),
      |    '\?(utm_[a-z]*|fbclid|gclid)=[^&]*&', '?', 'g'),
      |    '\?(utm_[a-z]*|fbclid|gclid)=[^&]*$', '', 'g'),
      |    '[?&]$', '', 'g') AS r4 FROM c3),
      |c5 AS (SELECT doc_id, auth ||
      |  CASE WHEN r4 LIKE '%/' AND length(r4) > 1 AND r4 NOT LIKE '%?%'
      |       THEN substr(r4, 1, length(r4) - 1) ELSE r4 END AS canon FROM c4),
      |c6 AS (SELECT doc_id, canon,
      |  """.stripMargin + rdSql("canon") + """ AS rd FROM c5)
      |SELECT rd AS domain, CAST(count(*) AS BIGINT) AS n_urls,
      |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
      |  min(canon) AS sample_url
      |FROM c6 GROUP BY rd ORDER BY rd""".stripMargin) { (s, d) =>
    import graft.ops.WebText
    val messy = concat(
      lit("HTTP://WWW."), upper(col("source")),
      when(col("doc_id") % 7 === 0, ".CO.UK").otherwise(".Example.COM"),
      lit(":80/a//b/"), (col("doc_id") % 5).cast("string"),
      when(col("doc_id") % 3 === 0, "/").otherwise(""),
      lit("?utm_source=feed&id="), (col("doc_id") % 13).cast("string"),
      when(col("doc_id") % 2 === 0, "&utm_campaign=x").otherwise(""),
      lit("#sec"), (col("doc_id") % 4).cast("string"))
    Tables.documents(s, d)
      .select(col("doc_id"), WebText.canonicalUrl(messy).as("canon"))
      .withColumn("domain", WebText.registeredDomain(col("canon")))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct("canon").as("n_canonical"),
        min("canon").as("sample_url"))
      .orderBy("domain")
  }

  /** HTML boilerplate strip ([[graft.ops.WebText.visibleText]]): each doc
    * is wrapped in a deterministic HTML shell (head/style, h1, anchor
    * with entities, script, comment), the visible text is re-extracted,
    * and the roundtrip is verified row-by-row: `ok` = the extraction
    * recovered exactly `"Doc <id> " + text + " <link> & more"` — so a
    * missed script block, un-decoded entity, or broken whitespace
    * collapse flips rows to false and diverges. The oracle runs the
    * literal same RE2∩Java regex chain. Pure per-row codegen. */
  val q144HtmlStrip: Q = q("q144_html_strip",
    """WITH h AS (SELECT doc_id, text,
      |  '<html><head><style>p{}</style></head><body><h1>Doc ' ||
      |  CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
      |  '</p><a href="/x?a=1&amp;b=2">&lt;link&gt; &amp; more</a>' ||
      |  '<script>var x=1;</script><!-- hidden --></body></html>' AS html
      |  FROM documents),
      |v AS (SELECT doc_id, text, trim(regexp_replace(
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |  regexp_replace(regexp_replace(html,
      |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |    '(?s)<!--.*?-->', ' ', 'g'),
      |    '<[^>]*>', ' ', 'g'),
      |    '&nbsp;', ' ', 'g'),
      |    '&lt;', '<', 'g'),
      |    '&gt;', '>', 'g'),
      |    '&quot;', '"', 'g'),
      |    '&#39;', '''', 'g'),
      |    '&amp;', '&', 'g'), '\s+', ' ', 'g')) AS vis FROM h)
      |SELECT doc_id, CAST(length(vis) AS BIGINT) AS vis_len, md5(vis) AS vis_md5,
      |  CAST(CASE WHEN vis = 'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
      |    || ' <link> & more' THEN 1 ELSE 0 END AS INT) AS ok
      |FROM v ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.ops.WebText
    val html = concat(
      lit("<html><head><style>p{}</style></head><body><h1>Doc "),
      col("doc_id").cast("string"), lit("</h1><p>"), col("text"),
      lit("</p><a href=\"/x?a=1&amp;b=2\">&lt;link&gt; &amp; more</a>"),
      lit("<script>var x=1;</script><!-- hidden --></body></html>"))
    val expected = concat(lit("Doc "), col("doc_id").cast("string"),
      lit(" "), col("text"), lit(" <link> & more"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), WebText.visibleText(html).as("vis"))
      .select(col("doc_id"), length(col("vis")).cast("long").as("vis_len"),
        md5(col("vis")).as("vis_md5"),
        (col("vis") === expected).cast("int").as("ok"))
      .orderBy("doc_id")
  }

  /** Media curation gates ([[graft.ops.Multimodal.curationGates]]) over a
    * mixed synthesized corpus (GIF / WAV / MP4 / raw-text by doc_id % 4)
    * whose moduli are chosen to strike EVERY gate: undersized and
    * extreme-aspect images, over-compressed thumbnails (header + pad
    * bytes vs pixel count), sub-500 ms and low-sample-rate audio,
    * short video — the LAION-style header-only cleaning pass. The
    * decoder parses the real container bytes; the oracle recomputes the
    * construction arithmetic AND the gate cascade, so a misread header
    * field or a reordered gate changes a (kind, reason) count. */
  val q145MediaGates: Q = q("q145_media_gates",
    """WITH p AS (SELECT doc_id, text, doc_id % 4 AS m
      |  FROM documents WHERE doc_id < 400),
      |f AS (SELECT doc_id, m,
      |  CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |         WHEN 2 THEN 'video' ELSE 'unknown' END AS kind,
      |  CASE m WHEN 0 THEN CAST(10 + (doc_id % 4) * 40 AS BIGINT)
      |         WHEN 1 THEN CAST(44 + (doc_id % 90) * (doc_id % 2 + 1) * 2 AS BIGINT)
      |         WHEN 2 THEN CAST(232 AS BIGINT)
      |         ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
      |  CASE m WHEN 0 THEN 16 + doc_id % 120
      |         WHEN 2 THEN 40 + (doc_id % 8) * 80 ELSE 0 END AS w,
      |  CASE m WHEN 0 THEN 16 + doc_id % 90
      |         WHEN 2 THEN 48 + (doc_id % 6) * 72 ELSE 0 END AS h,
      |  CASE m WHEN 1 THEN ((doc_id % 90) * 1000) // (4000 + (doc_id % 5) * 2000)
      |         WHEN 2 THEN ((doc_id % 500 + 50) * 10 * 1000) // (600 + (doc_id % 4) * 200)
      |         ELSE 0 END AS dur_ms,
      |  CASE m WHEN 1 THEN 4000 + (doc_id % 5) * 2000 ELSE 0 END AS rate
      |  FROM p),
      |g AS (SELECT kind,
      |  CASE WHEN kind = 'unknown' THEN 'unknown_format'
      |    WHEN kind = 'image' AND NOT (w >= 64 AND h >= 64) THEN 'too_small'
      |    WHEN kind = 'image' AND NOT (w <= h * 3 AND h <= w * 3) THEN 'bad_aspect'
      |    WHEN kind = 'image' AND NOT (n_bytes * 1000000 >= w * h * 10000)
      |      THEN 'over_compressed'
      |    WHEN kind = 'audio' AND NOT (dur_ms BETWEEN 500 AND 600000)
      |      THEN 'bad_duration'
      |    WHEN kind = 'audio' AND rate < 8000 THEN 'low_sample_rate'
      |    WHEN kind = 'video' AND NOT (dur_ms BETWEEN 500 AND 600000)
      |      THEN 'bad_duration'
      |    WHEN kind = 'video' AND NOT (w >= 64 AND h >= 64) THEN 'too_small'
      |    WHEN kind = 'video' AND NOT (w <= h * 3 AND h <= w * 3) THEN 'bad_aspect'
      |    ELSE 'keep' END AS outcome FROM f)
      |SELECT kind, outcome, CAST(count(*) AS BIGINT) AS n
      |FROM g GROUP BY kind, outcome ORDER BY kind, outcome""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 4
    // GIF header + pad bytes: n_bytes drives the bytes-per-pixel gate
    val gw = lit(16) + col("doc_id") % 120
    val gh = lit(16) + col("doc_id") % 90
    val gifHex = concat(lit("474946383961"), leHex16(gw), leHex16(gh),
      repeat(lit("00"), (col("doc_id") % 4).cast("int") * 40))
    // WAV with sub-gate sample rates and durations
    val ch = col("doc_id") % 2 + 1
    val rate = lit(4000) + (col("doc_id") % 5) * 2000
    val blockAlign = ch * 2
    val dataSize = (col("doc_id") % 90) * blockAlign
    val wavHex = concat(
      lit("52494646"), leHex32(dataSize + 36), lit("57415645"),
      lit("666D7420"), leHex32(lit(16)), leHex16(lit(1)),
      leHex16(ch), leHex32(rate), leHex32(rate * blockAlign),
      leHex16(blockAlign), leHex16(lit(16)),
      lit("64617461"), leHex32(dataSize),
      repeat(lit("00"), dataSize.cast("int")))
    // MP4 with undersized/short-video moduli (q127 container layout)
    def beHex32(c: Column): Column = lpad(hex(c.cast("long")), 8, "0")
    def fixed1616(c: Column): Column =
      concat(lpad(hex(c.cast("long")), 4, "0"), lit("0000"))
    val ts = lit(600) + (col("doc_id") % 4) * 200
    val dur = (col("doc_id") % 500 + 50) * 10
    val vw = lit(40) + (col("doc_id") % 8) * 80
    val vh = lit(48) + (col("doc_id") % 6) * 72
    val zeros = (n: Int) => lit("00" * n)
    val mp4Hex = concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"),
      lit("000000D8"), lit("6D6F6F76"),
      lit("0000006C"), lit("6D766864"), zeros(12),
      beHex32(ts), beHex32(dur), zeros(80),
      lit("00000064"), lit("7472616B"),
      lit("0000005C"), lit("746B6864"), zeros(12),
      lit("00000001"), zeros(4), beHex32(dur), zeros(16), zeros(36),
      fixed1616(vw), fixed1616(vh))
    val payload = when(m === 3, encode(col("text"), "UTF-8"))
      .otherwise(unhex(
        when(m === 0, gifHex).when(m === 1, wavHex).otherwise(mp4Hex)))
    val payloads = Tables.documents(s, d).filter(col("doc_id") < 400)
      .select(col("doc_id"), payload.as("payload"))
    graft.ops.Multimodal.curationGates(
        graft.ops.Multimodal.decodeAvPayloads(s, payloads).toDF())
      .withColumn("outcome", coalesce(col("drop_reason"), lit("keep")))
      .groupBy("kind", "outcome").agg(count(lit(1)).as("n"))
      .orderBy("kind", "outcome")
  }

  /** Hashed-feature linear scorer
    * ([[graft.ops.Classifier.pseudoScoreMicros]]) — the inference shape
    * of a fastText/CCNet quality classifier with the weight table as a
    * closed-form integer-micro function of the md5-hashed feature id, so
    * Spark and the oracle score BIT-identically (a trained model's float
    * weights cannot be value-oracled across engines; training quality is
    * ClassifierSpec's job + q147). Per-row higher-order aggregate, no
    * shuffle, no UDF. */
  val q146LogregScore: Q = q("q146_logreg_score",
    """SELECT doc_id, CAST(list_sum(list_transform(string_split(text, ' '),
      |    t -> ((('0x' || substr(md5(t), 1, 6))::BIGINT % 4096)
      |          * 2654435761) % 1000001 - 500000)) AS BIGINT) AS z_micro,
      |  CAST(CASE WHEN list_sum(list_transform(string_split(text, ' '),
      |    t -> ((('0x' || substr(md5(t), 1, 6))::BIGINT % 4096)
      |          * 2654435761) % 1000001 - 500000)) > 0
      |    THEN 1 ELSE 0 END AS INT) AS kept
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.ops.Classifier.pseudoScoreMicros(col("text"), 4096).as("z_micro"))
      .withColumn("kept", (col("z_micro") > 0).cast("int"))
      .orderBy("doc_id")
  }

  /** Trained quality classifier end-to-end
    * ([[graft.ops.Classifier.trainLogRegHashed]]): label = doc mentions
    * the planted token, train batch-GD logistic regression on a bounded
    * doc_id sample (train-on-sample / score-the-corpus — the 100 TB
    * deployment shape), then score ALL documents and report per-label
    * counts above/below the 0.5 threshold. Rows-only: float sums are
    * engine-ordered; ClassifierSpec gates loss descent + holdout
    * accuracy, and the output row count (label × decision) is stable. */
  val q147LogregTrain: Q = rowsOnly("q147_logreg_train") { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("y", array_contains(split(col("text"), " "), "spark").cast("int"))
    val model = graft.ops.Classifier.trainLogRegHashed(
      s, docs.filter(col("doc_id") < 2000), labelCol = "y",
      dim = 512, rounds = 3, lr = 1.0)
    graft.ops.Classifier.scoreWith(docs, model)
      .groupBy(col("y")) // exactly 2 rows regardless of decision flips
      .agg(count(lit(1)).as("n"),
        sum((col("score") > 0.5).cast("long")).as("n_kept"))
      .orderBy("y")
  }

  /** Gopher quality-rule battery ([[graft.ops.Curation.gopherRules]]):
    * the published Rae-et-al. heuristics in integer micros, run over
    * fixture docs with planted symbol spam (`#` runs) and numeric spam
    * striking the symbol/alpha gates on top of the corpus's natural
    * word-count/word-length/stopword variation. The oracle recomputes
    * every ratio with the identical integral-micros arithmetic and the
    * identical first-fail order, then compares per-reason rollups. */
  val q148GopherRules: Q = q("q148_gopher_rules",
    """WITH t AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 11 = 0 THEN ' # # # # #' ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0
      |    THEN ' 111 222 333 444 555 666 777 888 999' ELSE '' END AS text
      |  FROM documents),
      |m AS (SELECT doc_id, len(string_split(text, ' ')) AS nt,
      |  ((length(text) - len(string_split(text, ' ')) + 1) * 1000000)
      |    // len(string_split(text, ' ')) AS mean_wlen,
      |  (len(list_filter(string_split(text, ' '),
      |     x -> x = '#' OR x = '…' OR x LIKE '...%')) * 1000000)
      |    // len(string_split(text, ' ')) AS symbol_micros,
      |  (len(list_filter(string_split(text, ' '),
      |     x -> regexp_matches(x, '[a-zA-Z]'))) * 1000000)
      |    // len(string_split(text, ' ')) AS alpha_micros,
      |  len(list_intersect(list_distinct(string_split(text, ' ')),
      |     ['the', 'a', 'value', 'table'])) AS stop_hits
      |  FROM t),
      |g AS (SELECT doc_id, nt,
      |  CASE WHEN NOT (nt BETWEEN 15 AND 100000) THEN 'word_count'
      |    WHEN NOT (mean_wlen BETWEEN 3000000 AND 10000000) THEN 'word_length'
      |    WHEN symbol_micros > 100000 THEN 'symbol_ratio'
      |    WHEN alpha_micros < 800000 THEN 'alpha_ratio'
      |    WHEN stop_hits < 2 THEN 'stopwords'
      |    ELSE 'keep' END AS outcome FROM m)
      |SELECT outcome, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS total_words,
      |  CAST(min(doc_id) AS BIGINT) AS sample_doc
      |FROM g GROUP BY outcome ORDER BY outcome""".stripMargin) { (s, d) =>
    val spam = concat(col("text"),
      when(col("doc_id") % 11 === 0, " # # # # #").otherwise(""),
      when(col("doc_id") % 13 === 0,
        " 111 222 333 444 555 666 777 888 999").otherwise(""))
    Curation.gopherRules(
        Tables.documents(s, d).withColumn("text", spam))
      .withColumn("outcome", coalesce(col("first_fail"), lit("keep")))
      .groupBy("outcome")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        min("doc_id").as("sample_doc"))
      .orderBy("outcome")
  }

  /** Deterministic label propagation ([[graft.ops.Graph.labelPropagation]])
    * over the q142 lineitem-derived graph, 2 synchronous rounds. The
    * oracle unrolls both rounds — per round a neighbor-label count and
    * the (count DESC, label ASC) argmax via `row_number` — so a changed
    * tie-break, a missed symmetrization, or an off-by-one round count
    * relabels nodes and diverges. */
  val q149LabelProp: Q = q("q149_label_prop",
    """WITH e0 AS (SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
      |           FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 100),
      |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |n AS (SELECT DISTINCT src AS node FROM e),
      |l0 AS (SELECT node, node AS label FROM n),
      |c1 AS (SELECT e.src AS node, l0.label, count(*) AS c
      |       FROM e JOIN l0 ON l0.node = e.dst GROUP BY 1, 2),
      |l1 AS (SELECT node, label FROM (
      |  SELECT node, label, row_number() OVER (
      |    PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM c1)
      |  WHERE rn = 1),
      |c2 AS (SELECT e.src AS node, l1.label, count(*) AS c
      |       FROM e JOIN l1 ON l1.node = e.dst GROUP BY 1, 2),
      |l2 AS (SELECT node, label FROM (
      |  SELECT node, label, row_number() OVER (
      |    PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM c2)
      |  WHERE rn = 1)
      |SELECT node, label FROM l2 ORDER BY node""".stripMargin) { (s, d) =>
    Graph.labelPropagation(
      Tables.lineitem(s, d).select(
        (col("l_orderkey") % 100).as("src"), (col("l_partkey") % 100).as("dst")),
      rounds = 2)
      .orderBy("node")
  }

  /** Luhn card detection ([[graft.ops.Curation.luhnValid]] /
    * `validCards`): each doc gets a 16-digit separator-formatted card
    * candidate whose last four digits come from doc_id — so validity
    * varies across the corpus and BOTH engines must run the actual
    * checksum (plus a fixed 14-digit "order id" run that the regex
    * catches but Luhn rejects or accepts identically). The oracle
    * recomputes the reverse/double/digit-sum fold digit-for-digit. */
  val q150CardLuhn: Q = q("q150_card_luhn",
    """WITH t AS (SELECT doc_id, text || ' pay 4532 0151 1283 ' ||
      |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |  ' ref 12345678901234 end' AS text
      |  FROM documents WHERE doc_id < 300),
      |c AS (SELECT doc_id,
      |  regexp_extract_all(text, '\b(?:\d[ -]?){12,18}\d\b') AS cands FROM t),
      |v AS (SELECT doc_id, len(cands) AS n_cands,
      |  len(list_filter(list_transform(cands,
      |        x -> regexp_replace(x, '[^0-9]', '', 'g')),
      |    dg -> length(dg) BETWEEN 13 AND 19 AND
      |      list_sum(list_transform(range(1, length(dg) + 1),
      |        i -> CASE WHEN i % 2 = 0 THEN
      |          CASE WHEN CAST(substr(reverse(dg), i, 1) AS INT) * 2 > 9
      |            THEN CAST(substr(reverse(dg), i, 1) AS INT) * 2 - 9
      |            ELSE CAST(substr(reverse(dg), i, 1) AS INT) * 2 END
      |          ELSE CAST(substr(reverse(dg), i, 1) AS INT) END)) % 10 = 0))
      |  AS n_valid FROM c)
      |SELECT doc_id, CAST(n_cands AS BIGINT) AS n_cands,
      |  CAST(n_valid AS BIGINT) AS n_valid
      |FROM v ORDER BY doc_id""".stripMargin) { (s, d) =>
    val text2 = concat(col("text"), lit(" pay 4532 0151 1283 "),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ref 12345678901234 end"))
    Tables.documents(s, d).filter(col("doc_id") < 300)
      .select(col("doc_id"),
        size(regexp_extract_all(text2, lit(Curation.CardCandRe), lit(0)))
          .cast("long").as("n_cands"),
        size(Curation.validCards(text2)).cast("long").as("n_valid"))
      .orderBy("doc_id")
  }

  /** Entity resolution ([[graft.ops.Entity.blockedMatches]]): every part
    * name is mutated into a dirty variant (appended char / truncation /
    * leetspeak substitution past the blocking prefix, by key mod 3) and
    * matched back against the canonical name corpus — prefix-block
    * equi-join + length band + `levenshtein ≤ 2` confirm, scored with
    * the native codegen'd [[graft.functions.JaroWinklerSim]] expression.
    * The oracle re-runs blocking/confirm with its own levenshtein and
    * its own jaro_winkler_similarity — so the custom expression's
    * arithmetic (match window, transposition halving, 0.7 boost
    * threshold, 4-char prefix cap) is value-checked against an
    * independent implementation, to 4 decimals, on every row. */
  val q151EntityMatch: Q = q("q151_entity_match",
    """WITH corpus AS (SELECT DISTINCT p_name AS name FROM part),
      |v AS (SELECT p_partkey AS qid,
      |  CASE p_partkey % 3
      |    WHEN 0 THEN p_name || 'x'
      |    WHEN 1 THEN substr(p_name, 1, length(p_name) - 1)
      |    ELSE substr(p_name, 1, 2) || replace(substr(p_name, 3), 'e', '3')
      |  END AS name FROM part),
      |m AS (SELECT qid, v.name AS q_name, c.name AS c_name,
      |    levenshtein(v.name, c.name) AS edit,
      |    jaro_winkler_similarity(v.name, c.name) AS jw
      |  FROM v JOIN corpus c
      |    ON lower(substr(v.name, 1, 2)) = lower(substr(c.name, 1, 2))
      |   AND abs(length(v.name) - length(c.name)) <= 2
      |  WHERE levenshtein(v.name, c.name) <= 2)
      |SELECT qid, CAST(count(*) AS BIGINT) AS n_match,
      |  CAST(min(edit) AS INT) AS best_edit,
      |  round(max(jw), 4) AS best_jw
      |FROM m GROUP BY qid ORDER BY qid""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val corpus = part.select(col("p_name").as("name")).distinct()
    val variants = part.select(col("p_partkey").as("qid"),
      when(col("p_partkey") % 3 === 0, concat(col("p_name"), lit("x")))
        .when(col("p_partkey") % 3 === 1,
          col("p_name").substr(lit(1), length(col("p_name")) - 1))
        .otherwise(concat(substring(col("p_name"), 1, 2),
          replace(col("p_name").substr(lit(3), lit(1000000)), lit("e"), lit("3"))))
        .as("name"))
    graft.ops.Entity.blockedMatches(variants, corpus, maxEdit = 2)
      .groupBy("qid")
      .agg(count(lit(1)).as("n_match"),
        min("edit").cast("int").as("best_edit"),
        round(max("jw"), 4).as("best_jw"))
      .orderBy("qid")
  }

  /** Deterministic stratified sampling
    * ([[graft.ops.Curation.stratifiedSample]]): hard cap of 20 docs per
    * source, membership = the 20 smallest md5(text) per stratum (ties by
    * doc_id). The oracle re-runs the identical window rank — a changed
    * tie-break or hash key changes the kept set. */
  val q152StratifiedSample: Q = q("q152_stratified_sample",
    """WITH r AS (SELECT doc_id, source, row_number() OVER (
      |  PARTITION BY source ORDER BY md5(text), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, source FROM r WHERE rk <= 20
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.stratifiedSample(Tables.documents(s, d), "source", 20)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** Homoglyph-spoofing detection
    * ([[graft.ops.TextAnalysis.mixedScriptSignals]]): docs with
    * doc_id % 9 == 0 get every Latin 'a' swapped for Cyrillic 'а'
    * (renders identically, breaks every hash), then the detector counts
    * mixed-script tokens and the confusable-fold skeleton must restore
    * the original text exactly. The oracle replants, re-detects with the
    * same code-point ranges, and re-folds with the same translate table. */
  val q153MixedScript: Q = q("q153_mixed_script",
    """WITH t AS (SELECT doc_id, text,
      |  CASE WHEN doc_id % 9 = 0 THEN replace(text, 'a', 'а')
      |       ELSE text END AS text2
      |  FROM documents WHERE doc_id < 500),
      |m AS (SELECT doc_id, text,
      |  len(list_filter(string_split(text2, ' '),
      |    x -> regexp_matches(x, '[A-Za-z]')
      |      AND regexp_matches(x, '[Ѐ-ӿ]'))) AS n_mixed,
      |  translate(text2, 'аеорсухАВЕКМНОРСТХ', 'aeopcyxABEKMHOPCTX')
      |    AS skeleton FROM t)
      |SELECT doc_id, CAST(n_mixed AS BIGINT) AS n_mixed,
      |  CAST(CASE WHEN n_mixed > 0 THEN 1 ELSE 0 END AS INT) AS spoofed,
      |  CAST(CASE WHEN skeleton = text THEN 1 ELSE 0 END AS INT)
      |    AS skeleton_restores
      |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val spoofed = Tables.documents(s, d).filter(col("doc_id") < 500)
      .withColumn("text2",
        when(col("doc_id") % 9 === 0, replace(col("text"), lit("a"), lit("а")))
          .otherwise(col("text")))
    TextAnalysis.mixedScriptSignals(spoofed, textCol = "text2")
      .select(col("doc_id"), col("n_mixed"),
        (col("n_mixed") > 0).cast("int").as("spoofed"),
        (col("skeleton") === col("text")).cast("int").as("skeleton_restores"))
      .orderBy("doc_id")
  }

  /** Mergeable HLL sketch COLUMNS (Datasketches via Spark's
    * `hll_sketch_agg`/`hll_union_agg`): per-source distinct-token
    * profiles built independently, then unioned WITHOUT re-reading the
    * corpus — the sketch-column workflow a 100 TB profile store needs
    * (build per shard/day, merge on demand; registers are max-combined,
    * so union of per-shard sketches equals the sketch of the union —
    * SketchSpec asserts that identity and a ≤5% error vs exact).
    * Rows-only: estimates are implementation-specific (order-free and
    * run-deterministic, but not an arithmetic the SQL oracle shares). */
  val q155HllUnion: Q = rowsOnly("q155_hll_union") { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val per = tok.groupBy("source").agg(hll_sketch_agg(col("tok")).as("sk"))
    val perOut = per.select(col("source"),
      hll_sketch_estimate(col("sk")).cast("long").as("est_distinct_tokens"))
    val total = per
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long")
        .as("est_distinct_tokens"))
      .withColumn("source", lit("__TOTAL__"))
      .select("source", "est_distinct_tokens")
    perOut.unionByName(total).orderBy("source")
  }

  /** Round-8 curation pipeline v2 — the NEW stages composed end-to-end
    * and oracle-checked as one flow: HTML wrap→strip roundtrip
    * ([[graft.ops.WebText.visibleText]]), Luhn-validated card redaction
    * ([[graft.ops.Curation.redactCards]] — cards planted on doc_id % 17
    * with doc_id-derived check digits, so validity varies), Gopher rule
    * gating, exact dedup, and a 25-per-source stratified cap. The
    * oracle reruns redaction (the same prepend-then-fold over validated
    * candidates via `list_reduce`), every Gopher ratio, the dedup rule,
    * and the sample window. One shortcut, justified by q144: the
    * wrap→strip roundtrip is the identity on this corpus (q144's `ok`
    * column proves it per-row; no doc contains tags/entities/digits),
    * so the oracle folds that stage — Spark still executes it. */
  val q156CurationV2: Q = q("q156_curation_v2",
    """WITH wc AS (SELECT doc_id, source, text ||
      |    CASE WHEN doc_id % 17 = 0 THEN ' card 4532 0151 1283 ' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t0
      |  FROM documents),
      |red AS (SELECT doc_id, source, list_reduce(
      |  list_prepend(t0, list_filter(
      |    regexp_extract_all(t0, '\b(?:\d[ -]?){12,18}\d\b'),
      |    x -> length(regexp_replace(x, '[^0-9]', '', 'g')) BETWEEN 13 AND 19
      |      AND list_sum(list_transform(
      |        range(1, length(regexp_replace(x, '[^0-9]', '', 'g')) + 1),
      |        i -> CASE WHEN i % 2 = 0 THEN
      |          CASE WHEN CAST(substr(reverse(regexp_replace(x, '[^0-9]', '', 'g')), i, 1) AS INT) * 2 > 9
      |            THEN CAST(substr(reverse(regexp_replace(x, '[^0-9]', '', 'g')), i, 1) AS INT) * 2 - 9
      |            ELSE CAST(substr(reverse(regexp_replace(x, '[^0-9]', '', 'g')), i, 1) AS INT) * 2 END
      |          ELSE CAST(substr(reverse(regexp_replace(x, '[^0-9]', '', 'g')), i, 1) AS INT)
      |        END)) % 10 = 0)),
      |  (acc, c) -> replace(acc, c, '<CARD>')) AS text FROM wc),
      |g AS (SELECT doc_id, source, text,
      |  len(string_split(text, ' ')) AS nt,
      |  ((length(text) - len(string_split(text, ' ')) + 1) * 1000000)
      |    // len(string_split(text, ' ')) AS mw,
      |  (len(list_filter(string_split(text, ' '),
      |     x -> x = '#' OR x = '…' OR x LIKE '...%')) * 1000000)
      |    // len(string_split(text, ' ')) AS sym,
      |  (len(list_filter(string_split(text, ' '),
      |     x -> regexp_matches(x, '[a-zA-Z]'))) * 1000000)
      |    // len(string_split(text, ' ')) AS alpha,
      |  len(list_intersect(list_distinct(string_split(text, ' ')),
      |     ['the', 'a', 'value', 'table'])) AS sh
      |  FROM red),
      |keep AS (SELECT doc_id, source, text FROM g
      |  WHERE nt BETWEEN 15 AND 100000 AND mw BETWEEN 3000000 AND 10000000
      |    AND sym <= 100000 AND alpha >= 800000 AND sh >= 2),
      |ex AS (SELECT doc_id, source, text FROM keep
      |  WHERE doc_id IN (SELECT min(doc_id) FROM keep GROUP BY text)),
      |rk AS (SELECT doc_id, source, text, row_number() OVER (
      |  PARTITION BY source ORDER BY md5(text), doc_id) AS rk FROM ex)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM rk WHERE rk <= 25 GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import graft.ops.WebText
    val withCard = concat(col("text"),
      when(col("doc_id") % 17 === 0, concat(lit(" card 4532 0151 1283 "),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""))
    val html = concat(lit("<html><body><p>"), withCard,
      lit("</p><script>var x=1;</script><!-- c --></body></html>"))
    // materialize the cleaned text once (localCheckpoint, the mmrSelect
    // pattern): project-pushdown would otherwise inline the strip+redact
    // chain into EVERY downstream gopher metric (≈8× per-row
    // re-evaluation, measured 3.5 s for the gate stage alone vs 0.6 s
    // against materialized rows) — and a real pipeline persists its
    // cleaned corpus at exactly this point anyway
    val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
      Curation.redactCards(WebText.visibleText(html)).as("text"))
      .localCheckpoint()
    val gated = Curation.gopherRules(base).filter(col("keep"))
      .select("doc_id", "source", "text")
    val mins = gated.groupBy("text").agg(min("doc_id").as("doc_id"))
    val exact = gated.join(mins, Seq("doc_id", "text"), "left_semi")
    val capped = Curation.stratifiedSample(exact, "source", 25)
    capped.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
      .orderBy("source")
  }

  /** Cross-source rank normalization ([[graft.ops.Curation.rankNormalize]]):
    * per-source percent_rank of doc length, then a global "top 30% of
    * each source" gate — the cutoff that means the same thing for every
    * source regardless of its raw score distribution. Oracle reruns the
    * identical window; ties share ranks, so the check is exact. */
  val q158RankNormalize: Q = q("q158_rank_normalize",
    """WITH r AS (SELECT doc_id, source, n_chars, percent_rank() OVER (
      |  PARTITION BY source ORDER BY n_chars) AS pct FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN pct >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
      |  CAST(min(CASE WHEN pct >= 0.7 THEN n_chars END) AS BIGINT) AS top_cutoff_chars
      |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Curation.rankNormalize(Tables.documents(s, d), "source", "n_chars")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pct") >= 0.7, 1L).otherwise(0L)).as("n_top"),
        min(when(col("pct") >= 0.7, col("n_chars"))).as("top_cutoff_chars"))
      .orderBy("source")
  }

  /** Compression-ratio quality signal
    * ([[graft.ops.TextAnalysis.compressionSignals]]): DEFLATE ratio per
    * doc, rolled up per source with a "suspiciously compressible"
    * (ratio < 0.35) count — the boilerplate/repetition gate. Rows-only
    * (zlib byte counts are codec-internal); ProfileSearchSpec pins the
    * discriminative behavior and determinism. */
  val q159CompressionQuality: Q = rowsOnly("q159_compression_quality") { (s, d) =>
    val sig = graft.ops.TextAnalysis.compressionSignals(s, Tables.documents(s, d))
    sig.join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ratio_micros").as("ratio_micros_sum"),
        sum((col("ratio_micros") < 350000L).cast("long")).as("n_boilerplate"))
      .orderBy("source")
  }

  /** PII exposure audit: per-source counts of each PII family BEFORE
    * redaction — the report a data-governance pass wants next to
    * [[graft.ops.Curation.redactPii]] (which strips; this measures).
    * PII is planted deterministically (email/IP/phone/card rotating by
    * doc_id % 4) and counted with the SAME regexes both engines share;
    * the card column counts only Luhn-VALID candidates, so the checksum
    * arithmetic is exercised again in aggregate form. */
  val q160PiiStats: Q = q("q160_pii_stats",
    """WITH t AS (SELECT doc_id, source, text ||
      |  CASE doc_id % 4
      |    WHEN 0 THEN ' mail bob@example.com and eve@test.org'
      |    WHEN 1 THEN ' from 10.0.113.9'
      |    WHEN 2 THEN ' call +1-555-0100'
      |    ELSE ' pay 4532 0151 1283 ' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END AS text
      |  FROM documents),
      |m AS (SELECT source,
      |  len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ip,
      |  len(regexp_extract_all(text, '\+?[0-9]+(-[0-9]+)+')) AS n_phone,
      |  len(list_filter(list_transform(
      |    regexp_extract_all(text, '\b(?:\d[ -]?){12,18}\d\b'),
      |    x -> regexp_replace(x, '[^0-9]', '', 'g')),
      |    dg -> length(dg) BETWEEN 13 AND 19 AND
      |      list_sum(list_transform(range(1, length(dg) + 1),
      |        i -> CASE WHEN i % 2 = 0 THEN
      |          CASE WHEN CAST(substr(reverse(dg), i, 1) AS INT) * 2 > 9
      |            THEN CAST(substr(reverse(dg), i, 1) AS INT) * 2 - 9
      |            ELSE CAST(substr(reverse(dg), i, 1) AS INT) * 2 END
      |          ELSE CAST(substr(reverse(dg), i, 1) AS INT)
      |        END)) % 10 = 0)) AS n_card FROM t)
      |SELECT source, CAST(sum(n_email) AS BIGINT) AS emails,
      |  CAST(sum(n_ip) AS BIGINT) AS ips,
      |  CAST(sum(n_phone) AS BIGINT) AS phones,
      |  CAST(sum(n_card) AS BIGINT) AS cards
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val planted = concat(col("text"),
      when(col("doc_id") % 4 === 0, " mail bob@example.com and eve@test.org")
        .when(col("doc_id") % 4 === 1, " from 10.0.113.9")
        .when(col("doc_id") % 4 === 2, " call +1-555-0100")
        .otherwise(concat(lit(" pay 4532 0151 1283 "),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))))
    Tables.documents(s, d)
      .select(col("source"),
        size(regexp_extract_all(planted, lit(Curation.EmailRe), lit(0))).as("e"),
        size(regexp_extract_all(planted, lit(Curation.Ipv4Re), lit(0))).as("i"),
        size(regexp_extract_all(planted, lit(Curation.PhoneRe), lit(0))).as("p"),
        size(Curation.validCards(planted)).as("c"))
      .groupBy("source")
      .agg(sum("e").as("emails"), sum("i").as("ips"),
        sum("p").as("phones"), sum("c").as("cards"))
      .orderBy("source")
  }

  /** Order-free corpus fingerprint: per source, the sum of per-doc
    * md5-prefix integers (mod 2⁴⁰ per element — overflow headroom for
    * 2²² docs/group under ANSI arithmetic) plus the doc count. Equal
    * fingerprints ⟺ equal content multisets w.h.p., computable by ANY
    * engine in any order — the "did this corpus version change?"
    * primitive that costs one aggregation and no sort. */
  val q161CorpusFingerprint: Q = q("q161_corpus_fingerprint",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT)
      |    AS fingerprint
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"),
        // r17: first 40 md5 bits = md5_prefix60 >> 20 — native kernel,
        // value-identical to conv(substring(md5(text),1,10),16,10)
        shiftright(graft.functions.Md5Functions.md5Prefix60(col("text")), 20)
          .as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("h").as("fingerprint"))
      .orderBy("source")
  }

  /** Within-document run collapse
    * ([[graft.ops.TextAnalysis.collapseTokenRuns]]): planted
    * "very very very very" runs (doc_id % 5) plus the corpus's natural
    * consecutive repeats collapse to one occurrence; the oracle reruns
    * the identical index-filter chain and compares token counts AND the
    * md5 of the collapsed text, so a dropped first-token guard or an
    * off-by-one in the predecessor compare diverges. */
  val q162CollapseRuns: Q = q("q162_collapse_runs",
    """WITH t AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' very very very very good'
      |       ELSE '' END AS tx FROM documents WHERE doc_id < 400),
      |c AS (SELECT doc_id, string_split(tx, ' ') AS a FROM t),
      |r AS (SELECT doc_id, len(a) AS n_before,
      |  array_to_string(list_transform(
      |    list_filter(range(1, len(a) + 1), i -> i = 1 OR a[i] <> a[i-1]),
      |    i -> a[i]), ' ') AS collapsed FROM c)
      |SELECT doc_id, CAST(n_before AS BIGINT) AS n_before,
      |  CAST(len(string_split(collapsed, ' ')) AS BIGINT) AS n_after,
      |  md5(collapsed) AS collapsed_md5
      |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tx = concat(col("text"),
      when(col("doc_id") % 5 === 0, " very very very very good").otherwise(""))
    val collapsed = TextAnalysis.collapseTokenRuns(tx)
    Tables.documents(s, d).filter(col("doc_id") < 400)
      .select(col("doc_id"),
        size(split(tx, " ")).cast("long").as("n_before"),
        size(split(collapsed, " ")).cast("long").as("n_after"),
        md5(collapsed).as("collapsed_md5"))
      .orderBy("doc_id")
  }

  /** Engine-portable SimHash ([[graft.ops.Dedup.simHashMd5]]): 60-bit
    * fingerprint from md5-derived shingle hashes with a strict-majority
    * bit vote — the FULL value oracle the fast internal-hash q34 can't
    * have (its fnv ordering is JVM-internal). The oracle re-derives
    * shingling, 15-hex-char hash, per-bit vote, and bit reassembly in
    * integer space; any drift in tie rule, bit width, or distinctness
    * diverges. Doc-keyed aggregations only. */
  val q163SimhashMd5: Q = q("q163_simhash_md5",
    """WITH toked AS (SELECT doc_id, string_split(text, ' ') AS wd
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh0 AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(wd) - 1),
      |    i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2])) AS s FROM toked),
      |ex AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(s) AS sg FROM sh0)),
      |bits AS (SELECT doc_id, j, (1::BIGINT << j) AS p,
      |    (h // (1::BIGINT << j)) % 2 AS bit
      |  FROM ex, (SELECT unnest(range(0, 60)) AS j)),
      |votes AS (SELECT doc_id, j, p, sum(bit) AS ones, count(*) AS m
      |  FROM bits GROUP BY 1, 2, 3)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN 2 * ones > m THEN p ELSE 0 END) AS BIGINT)
      |    AS simhash60,
      |  CAST(max(m) AS BIGINT) AS n_shingles
      |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.simHashMd5(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Perceptual image near-dup ([[graft.ops.Multimodal.perceptualHashes]]
    * + `imageNearDupPairs`): deterministic smooth images are rendered per
    * doc (bilinear 4×4 lattice seeded by doc_id), with planted RESIZED
    * (16² re-render, id+100000) and RE-ENCODED (bmp container, id+200000)
    * duplicates — the image-dedup cases byte-identity cannot catch; the
    * banded hamming join retrieves them. Rows-only: pixel decode is not
    * SQL-expressible (RuntimeExtrasSpec gates planted-dup recall,
    * re-encode hamming-0 collision, and junk exclusion). */
  val q164ImagePhash: Q = rowsOnly("q164_image_phash") { (s, d) =>
    val base = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("doc_id").as("seed"))
    val resized = base.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("seed"))
    val reenc = base.filter(col("doc_id") % 3 === 1)
      .select((col("doc_id") + 200000L).as("doc_id"), col("seed"))
    val payloads = Multimodal.syntheticImagePayloads(s, base, 32, "png")
      .union(Multimodal.syntheticImagePayloads(s, resized, 16, "png"))
      .union(Multimodal.syntheticImagePayloads(s, reenc, 32, "bmp"))
    val hashes = Multimodal.perceptualHashes(s, payloads).toDF()
    // cap passed explicitly (rows-only query — own the lossy/exact
    // choice visibly); the ~330-image fixture sits far below it, and
    // RuntimeExtrasSpec's planted-dup recall would catch a capped drop
    Multimodal.imageNearDupPairs(hashes, maxHamming = 6,
        maxBucketSize = graft.ops.Dedup.DefaultHotKeyCap)
      .orderBy("doc_a", "doc_b")
  }

  /** Engine-portable group MinHash ([[graft.ops.Dedup.groupMinHashMd5]]):
    * per (lang, source), 16 md5-keyed min-hash lattice entries over the
    * group's shingle multiset — the FULL value oracle the internal-hash
    * q62 UDAF can't have. The oracle re-derives shingling, the
    * `md5(i|sg)` 60-bit hash, and the per-(group, i) min; the lattice
    * property (min over multiset = min over union) means neither side
    * needs a distinct. Map-side partial min → k longs per group shuffle. */
  val q165GroupMinhashMd5: Q = q("q165_group_minhash_md5",
    """WITH toked AS (SELECT lang, source, string_split(text, ' ') AS wd
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |ex AS (SELECT lang, source, unnest(list_transform(
      |    range(1, len(wd) - 1),
      |    i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2])) AS sg FROM toked),
      |hx AS (SELECT lang, source, j,
      |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || sg), 1, 15))
      |      AS BIGINT) AS h
      |  FROM ex, (SELECT unnest(range(0, 16)) AS j))
      |SELECT lang, source, CAST(j AS BIGINT) AS hash_idx,
      |  CAST(min(h) AS BIGINT) AS minhash
      |FROM hx GROUP BY lang, source, j
      |ORDER BY lang, source, hash_idx""".stripMargin) { (s, d) =>
    Dedup.groupMinHashMd5(Tables.documents(s, d), Seq("lang", "source"))
      .orderBy("lang", "source", "hash_idx")
  }

  /** Engine-portable SimHash near-dup PAIRS
    * ([[graft.ops.Dedup.simHashMd5NearDupPairs]]): the banded hamming
    * join over md5-derived fingerprints, confirmed ≤ 6 — the pair-set
    * oracle the internal-hash q36 can't have. Planted EXACT copies
    * (id+600000, hamming 0 guaranteed) and two-token-appended variants
    * (id+700000, low hamming for long docs) make the result non-trivially
    * populated. The oracle re-derives the fingerprints (the q163 CTE over
    * the same planted corpus) and confirms by QUADRATIC xor-popcount —
    * so it also proves the band join is pigeonhole-COMPLETE: any pair the
    * banding missed would appear in the oracle and hash-diverge.
    * `maxBucketSize = 0` requests the exact uncapped contract the
    * quadratic oracle demands; the default hot-bucket cap (the 100 TB
    * setting) gets its own mirrored-cap oracle in q186. */
  val q166SimhashPairsMd5: Q = q("q166_simhash_pairs_md5",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 600000, text FROM documents
      |    WHERE doc_id % 13 = 0
      |  UNION ALL SELECT doc_id + 700000, text || ' zq zq' FROM documents
      |    WHERE doc_id % 11 = 0),
      |toked AS (SELECT doc_id, string_split(text, ' ') AS wd FROM corpus
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh0 AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(wd) - 1),
      |    i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2])) AS s FROM toked),
      |ex AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(s) AS sg FROM sh0)),
      |bits AS (SELECT doc_id, j, (1::BIGINT << j) AS p,
      |    (h // (1::BIGINT << j)) % 2 AS bit
      |  FROM ex, (SELECT unnest(range(0, 60)) AS j)),
      |votes AS (SELECT doc_id, j, p, sum(bit) AS ones, count(*) AS m
      |  FROM bits GROUP BY 1, 2, 3),
      |sig AS (SELECT doc_id,
      |    CAST(sum(CASE WHEN 2 * ones > m THEN p ELSE 0 END) AS BIGINT) AS h
      |  FROM votes GROUP BY doc_id),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    xor(a.h, b.h) AS x
      |  FROM sig a, sig b WHERE a.doc_id < b.doc_id),
      |hm AS (SELECT doc_a, doc_b, len(list_filter(range(0, 60),
      |    j -> (x // (1::BIGINT << j)) % 2 = 1)) AS hamming FROM pr)
      |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
      |FROM hm WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select("doc_id", "text")
    val corpus = base
      .unionAll(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 600000L).as("doc_id"), col("text")))
      .unionAll(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 700000L).as("doc_id"),
          concat(col("text"), lit(" zq zq")).as("text")))
    Dedup.simHashMd5NearDupPairs(corpus, maxHamming = 6, maxBucketSize = 0)
      .orderBy("doc_a", "doc_b")
  }

  /** Host-level link graph from raw HTML
    * ([[graft.ops.WebText.resolvedLinkRows]] + `hostLinkEdges`): hrefs
    * extracted per page in ALL forms (single- and double-quoted,
    * `&amp;` decoded) and RFC 3986-resolved against the page URL — the
    * planted protocol-relative mirror link becomes a cross-host edge,
    * the rooted `/relative/skip` resolves to its own host and dies in
    * the self-edge filter — both endpoints reduced to their registered
    * domain, self-edges dropped, weighted edges aggregated —
    * the crawl-side input to the q130 PageRank / q142 HITS host ranking.
    * The oracle runs the IDENTICAL extraction regex and domain chain in
    * RE2 over the same synthesized pages, with the resolved relative
    * forms reconstructed as ground truth, so drift in the regex, the
    * resolution, the entity decode, the eTLD+1 table, or the self-edge
    * rule all hash-diverge. */
  val q167HostLinkGraph: Q = q("q167_host_link_graph",
    """WITH p AS (SELECT doc_id, source,
      |  'http://www.' || source || '.org/p/' || CAST(doc_id AS VARCHAR)
      |    AS page_url,
      |  '<p>' || text || '</p><a href="HTTP://WWW.' || upper(source) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '.Example.COM:80'
      |       ELSE '.sample.NET' END ||
      |  '/l/' || CAST(doc_id % 7 AS VARCHAR) || '?utm_source=z&amp;x=' ||
      |  CAST(doc_id % 3 AS VARCHAR) ||
      |  '">t1</a><a class=''m'' href=''https://cdn' ||
      |  CAST(doc_id % 4 AS VARCHAR) || '.assets.co.uk/lib.js?v=' ||
      |  CAST(doc_id % 5 AS VARCHAR) ||
      |  '''>t2</a><a href="//mirror.example.org/m/' ||
      |  CAST(doc_id % 3 AS VARCHAR) ||
      |  '">pp</a><a href="/relative/skip">r</a><a data-href="http://decoy.bad/x">d</a><a href=''https://' ||
      |  source || '.org/nav''>self</a>' AS html FROM documents),
      |lk AS (SELECT page_url, unnest(regexp_extract_all(html,
      |    '(?is)<a\s(?:[^>]*?[\s"''])?href\s*=\s*["''](https?://[^"''<>\s]+)["'']', 1))
      |    AS raw FROM p),
      |dl AS (SELECT page_url, replace(raw, '&amp;', '&') AS link FROM lk
      |  UNION ALL SELECT page_url, 'http://mirror.example.org/m/' ||
      |    CAST(doc_id % 3 AS VARCHAR) FROM p
      |  UNION ALL SELECT page_url,
      |    'http://www.' || source || '.org/relative/skip' FROM p),
      |ed AS (SELECT
      |  """.stripMargin + rdSql("page_url") + """ AS src_domain,
      |  """.stripMargin + rdSql("link") + """ AS dst_domain FROM dl)
      |SELECT src_domain, dst_domain, CAST(count(*) AS BIGINT) AS n_links
      |FROM ed WHERE src_domain <> '' AND dst_domain <> ''
      |  AND src_domain <> dst_domain
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    WebText.hostLinkEdges(
        Tables.documents(s, d)
          .select(crawlPageUrl.as("url"), crawlPageHtml.as("html")),
        "url", "html")
      .orderBy("src_domain", "dst_domain")
  }

  /** The shared synthetic crawl-page fixture of q167/q175-era queries
    * and the q195 frontier capstone: per-doc page URL + HTML with mixed
    * link cases (messy absolute t1 link, cdn link, protocol-relative
    * mirror link, relative skip, data-href decoy, same-host self
    * link). Byte-identical to the oracle-side reconstruction —
    * load-bearing for every consumer. */
  private def crawlPageUrl: Column =
    concat(lit("http://www."), col("source"), lit(".org/p/"),
      col("doc_id").cast("string"))
  /** (domain, text) base shared by q201/q209 — registered domain from
    * the [[crawlPageUrl]] fixture; one definition so the two "same
    * domain" oracles can never silently diverge. */
  private def domainDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(WebText.registeredDomain(crawlPageUrl).as("domain"),
        col("text"))
  private def crawlPageHtml: Column = concat(
    lit("<p>"), col("text"), lit("</p><a href=\"HTTP://WWW."),
    upper(col("source")),
    when(col("doc_id") % 2 === 0, ".Example.COM:80").otherwise(".sample.NET"),
    lit("/l/"), (col("doc_id") % 7).cast("string"),
    lit("?utm_source=z&amp;x="), (col("doc_id") % 3).cast("string"),
    lit("\">t1</a><a class='m' href='https://cdn"),
    (col("doc_id") % 4).cast("string"),
    lit(".assets.co.uk/lib.js?v="), (col("doc_id") % 5).cast("string"),
    lit("'>t2</a><a href=\"//mirror.example.org/m/"),
    (col("doc_id") % 3).cast("string"),
    lit("\">pp</a><a href=\"/relative/skip\">r</a>" +
      "<a data-href=\"http://decoy.bad/x\">d</a><a href='https://"),
    col("source"), lit(".org/nav'>self</a>"))

  /** Encoding-anomaly audit ([[graft.ops.TextAnalysis.encodingSignals]]):
    * mojibake / replacement-char / control-char / nbsp counters and the
    * keep flag over a corpus with PLANTED artifacts (id-modulus cases
    * strike every counter: a classic two-byte accented-letter artifact,
    * the cp1252 curly-quote triple, U+FFFD, a bell control char, an
    * nbsp). The oracle builds byte-identical text via chr() code points
    * and runs the SAME \x{..} character-class regexes in RE2 — a drift
    * in any class boundary or the flag rule diverges. */
  val q168EncodingSignals: Q = q("q168_encoding_signals",
    """WITH t AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 9 = 0 THEN ' caf' || chr(195) || chr(169)
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0
      |       THEN ' it' || chr(226) || chr(8364) || chr(8482) || 's'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 10 = 0 THEN ' x' || chr(65533) ELSE '' END ||
      |  CASE WHEN doc_id % 12 = 0 THEN chr(7) ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN chr(160) || 'end' ELSE '' END AS tx
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(tx,
      |    '[\x{00C2}-\x{00C5}][\x{00A0}-\x{00BF}]|\x{00E2}\x{20AC}[\x{2122}\x{201C}\x{201D}\x{0153}\x{2022}\x{2013}\x{2014}\x{00A6}]'))
      |    AS BIGINT) AS n_mojibake,
      |  CAST(len(regexp_extract_all(tx, '\x{FFFD}')) AS BIGINT)
      |    AS n_replacement,
      |  CAST(len(regexp_extract_all(tx,
      |    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]'))
      |    AS BIGINT) AS n_control,
      |  CAST(len(regexp_extract_all(tx, '\x{00A0}')) AS BIGINT) AS n_nbsp,
      |  CAST(CASE WHEN len(regexp_extract_all(tx,
      |    '[\x{00C2}-\x{00C5}][\x{00A0}-\x{00BF}]|\x{00E2}\x{20AC}[\x{2122}\x{201C}\x{201D}\x{0153}\x{2022}\x{2013}\x{2014}\x{00A6}]')) = 0
      |    AND len(regexp_extract_all(tx, '\x{FFFD}')) = 0
      |    AND len(regexp_extract_all(tx,
      |    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]')) = 0
      |    THEN 1 ELSE 0 END AS INT) AS enc_ok
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    // planted artifacts via \u escapes (not raw glyphs), mirroring the
    // oracle's chr() code points byte for byte
    val planted = concat(col("text"),
      when(col("doc_id") % 9 === 0, lit(" caf\u00c3\u00a9")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit(" it\u00e2\u20ac\u2122s")).otherwise(lit("")),
      when(col("doc_id") % 10 === 0, lit(" x\ufffd")).otherwise(lit("")),
      when(col("doc_id") % 12 === 0, lit("\u0007")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("\u00a0end")).otherwise(lit("")))
    TextAnalysis.encodingSignals(
        Tables.documents(s, d).select(col("doc_id"), planted.as("text")))
      .select("doc_id", "n_mojibake", "n_replacement", "n_control",
        "n_nbsp", "enc_ok")
      .orderBy("doc_id")
  }

  /** Corpus-frequency boilerplate-line removal
    * ([[graft.ops.Dedup.removeBoilerplateLines]]): lines repeating ≥ 10
    * times across the corpus are cut from every document, survivors
    * reassembled in order — the CCNet/RefinedWeb rule, distinct from
    * q73's keep-first chunk dedup. Multi-line docs are synthesized by
    * splitting the word-salad text on two common words (plain `replace`,
    * no regex — byte-identical in both engines) and PLANTING nav-chrome
    * footers on id moduli (250 and 167 occurrences — both far over
    * threshold, so both must vanish; natural phrase lines stay under it
    * except the short collision-prone ones, which both engines count
    * identically). The oracle recomputes the frequency table and the
    * anti-join in DuckDB and reassembles with `string_agg ORDER BY pos`,
    * so a drift in line splitting, the threshold rule, or reassembly
    * order hash-diverges. */
  val q169BoilerplateLines: Q = q("q169_boilerplate_lines",
    """WITH t AS (SELECT doc_id,
      |  replace(replace(text, ' table ', chr(10)), ' value ', chr(10)) ||
      |  CASE WHEN doc_id % 2 = 0
      |       THEN chr(10) || 'Subscribe to our newsletter' ELSE '' END ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN chr(10) || 'All rights reserved.' ELSE '' END AS tx
      |  FROM documents),
      |ln AS (SELECT doc_id, unnest(list_transform(range(1, len(l)+1),
      |    i -> {'pos': i, 'line': l[i]}), recursive := true)
      |  FROM (SELECT doc_id, string_split(tx, chr(10)) AS l FROM t)),
      |hv AS (SELECT line FROM ln GROUP BY line HAVING count(*) >= 10),
      |kp AS (SELECT doc_id, pos, line FROM ln ANTI JOIN hv USING (line))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |  string_agg(line, chr(10) ORDER BY pos) AS clean_text
      |FROM kp GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tx = concat(
      replace(replace(col("text"), lit(" table "), lit("\n")),
        lit(" value "), lit("\n")),
      when(col("doc_id") % 2 === 0,
        lit("\nSubscribe to our newsletter")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        lit("\nAll rights reserved.")).otherwise(lit("")))
    Dedup.removeBoilerplateLines(
        Tables.documents(s, d).select(col("doc_id"), tx.as("text")),
        minRepeats = 10)
      .orderBy("doc_id")
  }

  /** Within-document duplicate-line signals
    * ([[graft.ops.TextAnalysis.dupLineSignals]]): Gopher/MassiveText's
    * dup-line and dup-line-char fractions in exact integral micros.
    * Lines synthesized as in q169; ids %4 get a PLANTED twice-repeated
    * line, so a quarter of the corpus must show nonzero dup fractions
    * with exactly-computable values. Oracle recomputes the per-(doc,line)
    * counts and both ratios with BIGINT floor division. */
  val q170DupLines: Q = q("q170_dup_lines",
    """WITH t AS (SELECT doc_id,
      |  replace(replace(text, ' table ', chr(10)), ' value ', chr(10)) ||
      |  CASE WHEN doc_id % 4 = 0
      |       THEN chr(10) || 'repeat me' || chr(10) || 'repeat me'
      |       ELSE '' END AS tx
      |  FROM documents),
      |ln AS (SELECT doc_id, unnest(string_split(tx, chr(10))) AS line FROM t),
      |per AS (SELECT doc_id, line, count(*) AS c, len(line) AS l
      |        FROM ln GROUP BY doc_id, line)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
      |  CAST(CASE WHEN sum(c) = 0 THEN 0
      |    ELSE (sum(c-1) * 1000000) // sum(c) END AS BIGINT) AS dup_line_micros,
      |  CAST(CASE WHEN sum(c*l) = 0 THEN 0
      |    ELSE (sum((c-1)*l) * 1000000) // sum(c*l) END AS BIGINT)
      |    AS dup_char_micros
      |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tx = concat(
      replace(replace(col("text"), lit(" table "), lit("\n")),
        lit(" value "), lit("\n")),
      when(col("doc_id") % 4 === 0,
        lit("\nrepeat me\nrepeat me")).otherwise(lit("")))
    TextAnalysis.dupLineSignals(
        Tables.documents(s, d).select(col("doc_id"), tx.as("text")))
      .orderBy("doc_id")
  }

  /** Top n-gram character fraction
    * ([[graft.ops.TextAnalysis.topNgramCharFraction]], n=2): the most
    * frequent bigram's character mass over the doc's characters, with
    * the deterministic (count desc, gram asc) tie-break — Gopher's
    * "top-2-gram char fraction" companion to q66's count-share. The
    * word-salad corpus repeats bigrams naturally, so no planting is
    * needed; the oracle re-derives the argmax with a QUALIFY window and
    * the same floor-division micros. */
  val q171TopNgramChars: Q = q("q171_top_ngram_chars",
    """WITH w AS (SELECT doc_id, len(text) AS tchars,
      |    string_split(text, ' ') AS wd
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |g AS (SELECT doc_id, tchars, unnest(list_transform(range(1, len(wd)),
      |    i -> wd[i] || ' ' || wd[i+1])) AS gram FROM w),
      |c AS (SELECT doc_id, tchars, gram, count(*) AS c FROM g GROUP BY 1,2,3),
      |b AS (SELECT doc_id, tchars, gram, c, row_number() OVER
      |    (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn FROM c)
      |SELECT doc_id, gram AS top_gram, CAST(c AS BIGINT) AS top_count,
      |  CAST((c * len(gram) * 1000000) // tchars AS BIGINT)
      |    AS top_char_micros
      |FROM b WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.topNgramCharFraction(
        Tables.documents(s, d).select("doc_id", "text"), n = 2)
      .orderBy("doc_id")
  }

  /** Duplicate n-gram coverage ([[graft.ops.TextAnalysis.dupNgramCoverage]],
    * n=5): share of token characters covered by the UNION of duplicated
    * 5-gram occurrences — overlap-safe, unlike count×len summing. Ids %3
    * get their own first five words appended, planting a guaranteed
    * duplicated 5-gram (and, via overlap with neighbors, a coverage
    * union the double-counting formula would overstate). The oracle
    * mirrors the union: duplicated grams → distinct covered token
    * indexes → summed token lengths, BIGINT floor micros. */
  val q172DupNgramCoverage: Q = q("q172_dup_ngram_coverage",
    """WITH t AS (SELECT doc_id,
      |  text || CASE WHEN doc_id % 3 = 0 AND len(string_split(text,' ')) >= 5
      |    THEN ' ' || array_to_string(string_split(text,' ')[1:5], ' ')
      |    ELSE '' END AS tx FROM documents),
      |w AS (SELECT doc_id, string_split(tx, ' ') AS wd FROM t),
      |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(wd)+1),
      |    i -> {'tpos': i, 'tok': wd[i]}), recursive := true) FROM w),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(wd)-3),
      |    i -> {'gpos': i, 'gram': wd[i]||' '||wd[i+1]||' '||wd[i+2]||' '||
      |      wd[i+3]||' '||wd[i+4]}), recursive := true) FROM w),
      |dp AS (SELECT doc_id, gram, count(*) AS c, list(gpos) AS ps
      |  FROM g GROUP BY doc_id, gram HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(gpos, gpos+5)) AS tpos
      |  FROM (SELECT doc_id, unnest(ps) AS gpos FROM dp)),
      |cc AS (SELECT doc_id, sum(len(tok)) AS cov
      |  FROM cov JOIN tok USING (doc_id, tpos) GROUP BY doc_id),
      |tt AS (SELECT doc_id, sum(len(tok)) AS tot FROM tok GROUP BY doc_id)
      |SELECT doc_id,
      |  CAST((coalesce(cov, 0) * 1000000) // tot AS BIGINT)
      |    AS dup_ngram_micros
      |FROM tt LEFT JOIN cc USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val wd = split(col("text"), " ")
    val tx = concat(col("text"),
      when(col("doc_id") % 3 === 0 && size(wd) >= 5,
        concat(lit(" "), array_join(slice(wd, 1, 5), " "))).otherwise(lit("")))
    TextAnalysis.dupNgramCoverage(
        Tables.documents(s, d).select(col("doc_id"), tx.as("text")), n = 5)
      .orderBy("doc_id")
  }

  /** Key-concentration audit ([[graft.ops.Profile.keyConcentration]]):
    * Gini, top-1/top-5 shares, and effective key count over a SKEWED
    * synthetic domain key (half the corpus on one key, the rest spread
    * over 16 md5-hex buckets) — uniform `source` would make every share
    * trivial. The oracle re-derives the ranks with the same
    * (count, key) tie-breaks and the same floor'd-micros identities, so
    * drift in the Gini formula, rank order, or rounding diverges. */
  val q173KeyConcentration: Q = q("q173_key_concentration",
    """WITH t AS (SELECT CASE WHEN doc_id % 2 = 0 THEN 'big'
      |    ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) END AS key
      |  FROM documents),
      |c AS (SELECT key, count(*) AS n FROM t GROUP BY 1),
      |r AS (SELECT key, n,
      |    row_number() OVER (ORDER BY n ASC, key ASC) AS i,
      |    row_number() OVER (ORDER BY n DESC, key ASC) AS j FROM c)
      |SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(n) AS BIGINT) AS total,
      |  CAST(floor((2.0 * sum(i * n) - (count(*) + 1) * sum(n)) * 1000000
      |    / (count(*) * sum(n))) AS BIGINT) AS gini_micros,
      |  CAST(floor(sum(CASE WHEN j = 1 THEN n ELSE 0 END) * 1000000.0
      |    / sum(n)) AS BIGINT) AS top1_micros,
      |  CAST(floor(sum(CASE WHEN j <= 5 THEN n ELSE 0 END) * 1000000.0
      |    / sum(n)) AS BIGINT) AS topk_micros,
      |  CAST(floor(sum(n) * 1.0 * sum(n) * 1000 / sum(n * n)) AS BIGINT)
      |    AS eff_keys_x1000
      |FROM r""".stripMargin) { (s, d) =>
    Profile.keyConcentration(
      Tables.documents(s, d).select(
        when(col("doc_id") % 2 === 0, lit("big"))
          .otherwise(substring(md5(col("doc_id").cast("string")), 1, 1))
          .as("dom")), "dom", topK = 5)
  }

  /** Sliding-window chunking ([[graft.ops.Curation.slidingChunks]],
    * size 12 / stride 4): overlapping retrieval windows with the natural
    * shorter tail. The oracle mirrors the ceil-division window count and
    * the 1-based clamped list slice, so off-by-ones in the start grid,
    * the tail handling, or the ≤size single-chunk rule diverge on
    * every document. */
  val q174SlidingChunks: Q = q("q174_sliding_chunks",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wd
      |  FROM documents),
      |p AS (SELECT doc_id, wd, len(wd) AS n,
      |  CASE WHEN len(wd) <= 12 THEN 1
      |       ELSE (len(wd) - 12 + 3) // 4 + 1 END AS nch FROM w),
      |e AS (SELECT doc_id, wd, unnest(range(0, nch)) AS i FROM p)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
      |  CAST(len(wd[i*4+1 : i*4+12]) AS BIGINT) AS n_tokens,
      |  array_to_string(wd[i*4+1 : i*4+12], ' ') AS chunk
      |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Curation.slidingChunks(Tables.documents(s, d).select("doc_id", "text"),
        chunkTokens = 12, stride = 4)
      .orderBy("doc_id", "chunk_id")
  }

  /** Anchor-text aggregation ([[graft.ops.WebText.anchorTexts]]): the
    * label other authors give a link target, aggregated per registered
    * target domain — the crawl-side relevance/training-pair signal.
    * Synthesized anchors exercise nested-markup strip, double-space
    * collapse, and entity decode INCLUDING the escaped-entity order case
    * (`&amp;lt;` must surface as `&lt;`, not `<`). The oracle runs the
    * identical span regex, per-span group extraction, decode chain, and
    * eTLD+1 reduction in RE2. */
  val q175AnchorTexts: Q = q("q175_anchor_texts",
    """WITH p AS (SELECT doc_id,
      |  '<p>x</p><a href="http://t' || CAST(doc_id % 5 AS VARCHAR) ||
      |  '.example.org/p?a=1&amp;b=2">visit <b>T&amp;T</b>  no. ' ||
      |  CAST(doc_id % 3 AS VARCHAR) || '</a><a class=''x'' href=''https://cdn' ||
      |  CAST(doc_id % 4 AS VARCHAR) ||
      |  '.assets.net/f''>asset &#39;v&#39; &amp;lt;tag&amp;gt;</a>' ||
      |  '<a href="/rel">skip</a>' AS html FROM documents),
      |m AS (SELECT doc_id, unnest(list_transform(regexp_extract_all(html,
      |    '(?is)<a\s(?:[^>]*?[\s"''])?href\s*=\s*["''](https?://[^"''<>\s]+)["''][^>]*>(.*?)</a>', 0),
      |  x -> {'href': replace(regexp_extract(x,
      |        '(?is)<a\s(?:[^>]*?[\s"''])?href\s*=\s*["''](https?://[^"''<>\s]+)["''][^>]*>(.*?)</a>', 1),
      |        '&amp;', '&'),
      |       'anchor': trim(regexp_replace(
      |        replace(replace(replace(replace(replace(regexp_replace(regexp_extract(x,
      |          '(?is)<a\s(?:[^>]*?[\s"''])?href\s*=\s*["''](https?://[^"''<>\s]+)["''][^>]*>(.*?)</a>', 2),
      |          '<[^>]*>', ' ', 'g'),
      |         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
      |        '\s+', ' ', 'g'))}), recursive := true)
      |  FROM p),
      |d AS (SELECT
      |  """.stripMargin + rdSql("href") + """ AS dst_domain, anchor FROM m)
      |SELECT dst_domain, anchor, CAST(count(*) AS BIGINT) AS n
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    import graft.ops.WebText
    val html = concat(
      lit("<p>x</p><a href=\"http://t"), (col("doc_id") % 5).cast("string"),
      lit(".example.org/p?a=1&amp;b=2\">visit <b>T&amp;T</b>  no. "),
      (col("doc_id") % 3).cast("string"),
      lit("</a><a class='x' href='https://cdn"),
      (col("doc_id") % 4).cast("string"),
      lit(".assets.net/f'>asset &#39;v&#39; &amp;lt;tag&amp;gt;</a>"),
      lit("<a href=\"/rel\">skip</a>"))
    Tables.documents(s, d)
      .select(explode(WebText.anchorTexts(html)).as("p"))
      .select(WebText.registeredDomain(col("p.href")).as("dst_domain"),
        col("p.anchor").as("anchor"))
      .groupBy("dst_domain", "anchor")
      .agg(count(lit(1)).as("n"))
      .orderBy("dst_domain", "anchor")
  }

  /** Zipf-fit audit ([[graft.ops.TextAnalysis.zipfFit]]): slope/intercept
    * of ln(freq) on ln(rank) over the top-100 tokens. Every point is
    * rounded to integer micros BEFORE the normal-equation sums (the q137
    * ln-parity + order-free-integer-sum discipline), so both engines
    * compute byte-identical integer sums and the only floats are the two
    * final divisions, rounded to 6dp. Deterministic rank tie-break by
    * token. */
  val q176ZipfFit: Q = q("q176_zipf_fit",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1
      |      ORDER BY n DESC, tok ASC LIMIT 100),
      |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS r
      |      FROM c),
      |p AS (SELECT CAST(round(ln(r) * 1000000.0, 0) AS BIGINT) AS x,
      |             CAST(round(ln(n) * 1000000.0, 0) AS BIGINT) AS y FROM r),
      |s AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
      |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM p)
      |SELECT CAST(k AS BIGINT) AS n_points,
      |  round(CAST(k*sxy - sx*sy AS DOUBLE)
      |      / CAST(k*sxx - sx*sx AS DOUBLE), 6) AS slope,
      |  round((CAST(sy AS DOUBLE)/k - (CAST(k*sxy - sx*sy AS DOUBLE)
      |      / CAST(k*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)/k)
      |    / 1000000.0, 6) AS intercept
      |FROM s""".stripMargin) { (s, d) =>
    TextAnalysis.zipfFit(Tables.documents(s, d).select("text"), topN = 100)
  }

  /** Lexical-diversity screen ([[graft.ops.TextAnalysis.lexicalDiversity]]):
    * per-doc token/type counts, type-token ratio, and hapax share in
    * exact floor'd micros — no planting needed, the word-salad corpus
    * exercises every ratio naturally. */
  val q177LexicalDiversity: Q = q("q177_lexical_diversity",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |per AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS n_types,
      |  CAST((count(*) * 1000000) // sum(c) AS BIGINT) AS ttr_micros,
      |  CAST((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000)
      |    // count(*) AS BIGINT) AS hapax_micros
      |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.lexicalDiversity(Tables.documents(s, d)
        .select("doc_id", "text"))
      .orderBy("doc_id")
  }

  /** Cross-source duplication matrix
    * ([[graft.ops.Dedup.crossSourceDupMatrix]]): distinct shared contents
    * per source pair — a planted 'mirror' source re-hosting every 7th
    * document makes the matrix non-trivial (each real source shares its
    * own mirrored slice). Oracle recomputes the distinct (source, md5)
    * projection and the ordered self-join in DuckDB. */
  val q178CrossSourceDup: Q = q("q178_cross_source_dup",
    """WITH c AS (SELECT source, text FROM documents
      |  UNION ALL SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0),
      |sh AS (SELECT DISTINCT source, md5(text) AS h FROM c)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(count(*) AS BIGINT) AS n_shared
      |FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select("source", "text")
    val corpus = base.unionAll(
      Tables.documents(s, d).filter(col("doc_id") % 7 === 0)
        .select(lit("mirror").as("source"), col("text")))
    Dedup.crossSourceDupMatrix(corpus).orderBy("source_a", "source_b")
  }

  /** Corpus snapshot diff ([[graft.ops.Dedup.corpusDiff]]): added /
    * removed / retained distinct contents between the corpus and a
    * synthetic refresh that drops every 10th doc and edits every 9th —
    * all three counters provably nonzero. Oracle mirrors the distinct
    * hash sets and the full-outer flags. */
  val q179CorpusDiff: Q = q("q179_corpus_diff",
    """WITH o AS (SELECT DISTINCT md5(text) AS h, 1 AS in_old
      |  FROM documents),
      |n0 AS (SELECT CASE WHEN doc_id % 9 = 0 THEN text || ' v2'
      |    ELSE text END AS text FROM documents WHERE doc_id % 10 <> 0),
      |n AS (SELECT DISTINCT md5(text) AS h, 1 AS in_new FROM n0),
      |j AS (SELECT o.in_old, n.in_new FROM o FULL JOIN n USING (h))
      |SELECT
      |  CAST(sum(CASE WHEN in_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(sum(CASE WHEN in_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(CASE WHEN in_old IS NOT NULL AND in_new IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
      |FROM j""".stripMargin) { (s, d) =>
    val old = Tables.documents(s, d).select("text")
    val refreshed = Tables.documents(s, d)
      .filter(col("doc_id") % 10 =!= 0)
      .select(when(col("doc_id") % 9 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
    Dedup.corpusDiff(old, refreshed)
  }

  /** Heaps-law vocabulary-growth fit ([[graft.ops.TextAnalysis.heapsFit]]):
    * one (ln tokens, ln types) point per source, micros least squares —
    * the q176 Zipf audit's vocabulary-growth companion. Oracle mirrors
    * the per-source wordcount, micros rounding, and normal equations. */
  val q180HeapsFit: Q = q("q180_heaps_fit",
    """WITH tok AS (SELECT source AS g, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |per AS (SELECT g, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |pts0 AS (SELECT g, sum(c) AS ntok, count(*) AS ntyp FROM per GROUP BY 1),
      |p AS (SELECT CAST(round(ln(ntok) * 1000000.0, 0) AS BIGINT) AS x,
      |             CAST(round(ln(ntyp) * 1000000.0, 0) AS BIGINT) AS y
      |      FROM pts0),
      |s AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
      |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM p)
      |SELECT CAST(k AS BIGINT) AS n_points,
      |  round(CAST(k*sxy - sx*sy AS DOUBLE)
      |      / CAST(k*sxx - sx*sx AS DOUBLE), 6) AS slope,
      |  round((CAST(sy AS DOUBLE)/k - (CAST(k*sxy - sx*sy AS DOUBLE)
      |      / CAST(k*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)/k)
      |    / 1000000.0, 6) AS intercept
      |FROM s""".stripMargin) { (s, d) =>
    TextAnalysis.heapsFit(Tables.documents(s, d))
  }

  /** Per-source length-distribution drift
    * ([[graft.ops.TextAnalysis.lengthDriftBySource]]): max binned-CDF
    * gap vs the corpus in micros, CDFs floor-quantized per side. Oracle
    * densifies the same source × bin grid and mirrors the integral
    * floors. */
  val q181LengthDrift: Q = q("q181_length_drift",
    """WITH binned AS (SELECT source AS g,
      |    CAST(least((n_chars // 64), 63) AS BIGINT) AS b FROM documents
      |  WHERE n_chars IS NOT NULL),
      |per AS (SELECT g, b, count(*) AS c FROM binned GROUP BY 1, 2),
      |grid AS (SELECT g, b FROM (SELECT DISTINCT g FROM per),
      |         (SELECT unnest(range(0, 64)) AS b)),
      |fill AS (SELECT grid.g, grid.b, coalesce(per.c, 0) AS c
      |  FROM grid LEFT JOIN per ON grid.g = per.g AND grid.b = per.b),
      |cums AS (SELECT g, b, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY b) AS cum FROM fill),
      |tot AS (SELECT g, max(cum) AS n_g FROM cums GROUP BY 1),
      |allc AS (SELECT b, sum(c) AS call FROM cums GROUP BY 1),
      |alls AS (SELECT b, sum(call) OVER (ORDER BY b) AS cum_all FROM allc),
      |n AS (SELECT count(*) AS n_all FROM documents
      |  WHERE n_chars IS NOT NULL),
      |f AS (SELECT cums.g, tot.n_g,
      |    (cums.cum * 1000000) // tot.n_g AS f_g,
      |    (alls.cum_all * 1000000) // n.n_all AS f_all
      |  FROM cums JOIN tot ON cums.g = tot.g
      |  JOIN alls ON cums.b = alls.b CROSS JOIN n)
      |SELECT g AS source, CAST(max(n_g) AS BIGINT) AS n_docs,
      |  CAST(max(abs(f_g - f_all)) AS BIGINT) AS ks_micros
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    TextAnalysis.lengthDriftBySource(Tables.documents(s, d)).orderBy("source")
  }

  /** Per-source duplication rate ([[graft.ops.Dedup.dupRateBySource]]):
    * share of each source's docs whose content appears ≥2× in the
    * corpus, exact micros — planted mirror docs (every 5th doc re-hosted
    * under a 'mirror' source) make every real source carry nonzero
    * duplication. Oracle mirrors the digest copy-count join. */
  val q182DupRateBySource: Q = q("q182_dup_rate_by_source",
    """WITH c AS (SELECT source, text FROM documents
      |  UNION ALL SELECT 'mirror', text FROM documents WHERE doc_id % 5 = 0),
      |keyed AS (SELECT source, md5(text) AS h FROM c),
      |copies AS (SELECT h, count(*) AS n_copies FROM keyed GROUP BY 1),
      |j AS (SELECT keyed.source, copies.n_copies
      |  FROM keyed LEFT JOIN copies ON keyed.h = copies.h)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup,
      |  CAST((sum(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) * 1000000)
      |    // count(*) AS BIGINT) AS dup_rate_micros
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select("source", "text")
    val corpus = base.unionAll(
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(lit("mirror").as("source"), col("text")))
    Dedup.dupRateBySource(corpus).orderBy("source")
  }

  /** N-gram novelty between snapshots ([[graft.ops.Dedup.ngramNovelty]]):
    * share of the refreshed corpus' distinct 5-gram hash set unseen in
    * the original — the q179 refresh fixture (drop every 10th doc, edit
    * every 9th) guarantees a nonzero-but-small novelty. Oracle
    * re-derives the 60-bit md5-prefix gram sets (the q163 derivation)
    * and the left-join flags. */
  val q183NgramNovelty: Q = q("q183_ngram_novelty",
    """WITH n0 AS (SELECT CASE WHEN doc_id % 9 = 0 THEN text || ' v2'
      |    ELSE text END AS text FROM documents WHERE doc_id % 10 <> 0),
      |og AS (SELECT DISTINCT h FROM (
      |  SELECT CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h FROM (
      |    SELECT unnest(list_distinct(list_transform(
      |      range(1, len(wd) - 3),
      |      i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] || ' '
      |        || wd[i+3] || ' ' || wd[i+4]))) AS sg
      |    FROM (SELECT string_split(text, ' ') AS wd FROM documents)
      |    WHERE len(wd) >= 5))),
      |ng AS (SELECT DISTINCT h FROM (
      |  SELECT CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h FROM (
      |    SELECT unnest(list_distinct(list_transform(
      |      range(1, len(wd) - 3),
      |      i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] || ' '
      |        || wd[i+3] || ' ' || wd[i+4]))) AS sg
      |    FROM (SELECT string_split(text, ' ') AS wd FROM n0)
      |    WHERE len(wd) >= 5))),
      |j AS (SELECT ng.h, og.h AS oh FROM ng LEFT JOIN og ON ng.h = og.h)
      |SELECT CAST(count(*) AS BIGINT) AS n_new_grams,
      |  CAST(coalesce(sum(CASE WHEN oh IS NULL THEN 1 ELSE 0 END), 0)
      |    AS BIGINT) AS n_novel,
      |  CAST(CASE WHEN count(*) = 0 THEN 0 ELSE
      |    (coalesce(sum(CASE WHEN oh IS NULL THEN 1 ELSE 0 END), 0)
      |      * 1000000) // count(*) END AS BIGINT) AS novelty_micros
      |FROM j""".stripMargin) { (s, d) =>
    val old = Tables.documents(s, d).select("text")
    val refreshed = Tables.documents(s, d)
      .filter(col("doc_id") % 10 =!= 0)
      .select(when(col("doc_id") % 9 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
    Dedup.ngramNovelty(old, refreshed)
  }

  /** Cross-source n-gram containment
    * ([[graft.ops.Dedup.crossSourceNgramContainment]]): directional
    * template-reuse matrix over 60-bit md5-prefix 5-gram sets, with the
    * q178 planted mirror source (every 7th doc re-hosted) guaranteeing
    * full containment rows. Oracle mirrors the distinct (source, hash)
    * projection, both-direction self-join, and floor-micros ratio. */
  val q184SourceContainment: Q = q("q184_source_containment",
    """WITH c AS (SELECT source, text FROM documents
      |  UNION ALL SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0),
      |sh AS (SELECT DISTINCT source,
      |    CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h FROM (
      |  SELECT source, unnest(list_distinct(list_transform(
      |    range(1, len(wd) - 3),
      |    i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] || ' '
      |      || wd[i+3] || ' ' || wd[i+4]))) AS sg
      |  FROM (SELECT source, string_split(text, ' ') AS wd FROM c)
      |  WHERE len(wd) >= 5)),
      |sizes AS (SELECT source, count(*) AS n_grams FROM sh GROUP BY 1),
      |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
      |    count(*) AS n_shared
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.source <> b.source
      |  GROUP BY 1, 2)
      |SELECT p.source_a, p.source_b,
      |  CAST(p.n_shared AS BIGINT) AS n_shared,
      |  CAST(z.n_grams AS BIGINT) AS n_grams_a,
      |  CAST((p.n_shared * 1000000) // z.n_grams AS BIGINT)
      |    AS containment_micros
      |FROM pairs p JOIN sizes z ON p.source_a = z.source
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select("source", "text")
    val corpus = base.unionAll(
      Tables.documents(s, d).filter(col("doc_id") % 7 === 0)
        .select(lit("mirror").as("source"), col("text")))
    Dedup.crossSourceNgramContainment(corpus).orderBy("source_a", "source_b")
  }

  /** WARC crawl-archive ingestion ([[graft.ops.Warc.parseWarc]]):
    * deterministic multi-record WARC chunks are synthesized from
    * `documents` (8 records per chunk, the q164 synthetic-payload
    * idiom), parsed back by the hostile-input-hardened cursor, and
    * checked against an oracle that RECONSTRUCTS every envelope field
    * from the source rows — uri from doc_id, Content-Length as UTF-8
    * octets, body md5 — so any header, length, or cursor bug diverges
    * on real multi-byte text. */
  val q185WarcIngest: Q = q("q185_warc_ingest",
    """SELECT CAST(doc_id // 8 AS BIGINT) AS chunk_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
      |    - 1 AS BIGINT) AS rec_idx,
      |  'response' AS warc_type,
      |  'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'text/plain' AS content_type,
      |  CAST(strlen(text) AS BIGINT) AS content_length,
      |  md5(text) AS body_md5,
      |  TRUE AS valid,
      |  CASE WHEN doc_id % 8 = 3 THEN 'length' ELSE '' END
      |    AS truncated_reason
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY chunk_id, rec_idx""".stripMargin) { (s, d) =>
    // the synthesis drops null-text rows; the oracle filters identically
    // (symmetric by construction — see syntheticWarcChunks' scaladoc)
    val chunks = Warc.syntheticWarcChunks(
      Tables.documents(s, d).select("doc_id", "text"))
    Warc.parseWarc(s, chunks).toDF().orderBy("chunk_id", "rec_idx")
  }

  /** The hot-bucket-CAPPED simhash pair path
    * ([[graft.ops.Dedup.simHashMd5NearDupPairs]] at the default
    * `maxBucketSize`-style cap, here 16 to bite on a 500-doc fixture) —
    * the 100 TB setting q166 deliberately opts out of. A planted HOT
    * group (40 byte-identical boilerplate docs, id+900000) concentrates
    * one fingerprint into every band bucket it touches, so the cap
    * provably fires: all 780 intra-group pairs (and nothing that pairs
    * only through those hot buckets) vanish, while the small planted
    * copies (id+600000, bucket size ~2) survive untouched. The oracle
    * MIRRORS the full capped machinery — 8-bit band decomposition,
    * strictly-greater-than-cap bucket drop, band-bucket candidate join,
    * quadratic xor-popcount confirm — so the cap's exact lossy semantics
    * (not just its row count) are cross-engine-pinned. */
  val q186SimhashPairsCapped: Q = q("q186_simhash_pairs_capped",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 600000, text FROM documents
      |    WHERE doc_id % 13 = 0
      |  UNION ALL SELECT doc_id + 900000,
      |    'graft hot boilerplate navigation footer graft hot boilerplate navigation footer'
      |    FROM documents WHERE doc_id < 40),
      |toked AS (SELECT doc_id, string_split(text, ' ') AS wd FROM corpus
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh0 AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(wd) - 1),
      |    i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2])) AS s FROM toked),
      |ex AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(s) AS sg FROM sh0)),
      |bits AS (SELECT doc_id, j, (1::BIGINT << j) AS p,
      |    (h // (1::BIGINT << j)) % 2 AS bit
      |  FROM ex, (SELECT unnest(range(0, 60)) AS j)),
      |votes AS (SELECT doc_id, j, p, sum(bit) AS ones, count(*) AS m
      |  FROM bits GROUP BY 1, 2, 3),
      |sig AS (SELECT doc_id,
      |    CAST(sum(CASE WHEN 2 * ones > m THEN p ELSE 0 END) AS BIGINT) AS h
      |  FROM votes GROUP BY doc_id),
      |bands AS (SELECT doc_id, h, b,
      |    (h // (1::BIGINT << (b * 8))) % 256 AS bbits
      |  FROM sig, (SELECT unnest(range(0, 8)) AS b)),
      |keep AS (SELECT b, bbits FROM bands GROUP BY 1, 2
      |  HAVING count(*) <= 16),
      |kept AS (SELECT bands.doc_id, bands.h, bands.b, bands.bbits
      |  FROM bands JOIN keep USING (b, bbits)),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.h AS ha, b.h AS hb
      |  FROM kept a JOIN kept b
      |    ON a.b = b.b AND a.bbits = b.bbits AND a.doc_id < b.doc_id),
      |hm AS (SELECT doc_a, doc_b, len(list_filter(range(0, 60),
      |    j -> (xor(ha, hb) // (1::BIGINT << j)) % 2 = 1)) AS hamming
      |  FROM cand)
      |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
      |FROM hm WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).select("doc_id", "text")
    val corpus = base
      .unionAll(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 600000L).as("doc_id"), col("text")))
      .unionAll(base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 900000L).as("doc_id"),
          lit("graft hot boilerplate navigation footer graft hot " +
            "boilerplate navigation footer").as("text")))
    Dedup.simHashMd5NearDupPairs(corpus, maxHamming = 6, maxBucketSize = 16)
      .orderBy("doc_a", "doc_b")
  }

  /** Value oracle for the image near-dup PAIR stage
    * ([[graft.ops.Multimodal.imageNearDupPairs]]): q164 is rows-only
    * end-to-end because pixel decode is not SQL-expressible — but the
    * banded hamming join it feeds is. Here deterministic md5-derived
    * 60-bit fingerprints stand in for perceptual hashes (the q166
    * trick), with planted near-dups (id+100000, three bits flipped via
    * xor 21 → hamming 3) and planted UNDECODED rows (id+200000,
    * decoded = false, zero hash) that the pair stage must exclude. The
    * oracle re-derives the fingerprints and confirms by quadratic
    * xor-popcount, so the band decomposition, the decoded filter, and
    * the confirm threshold are all value-pinned; `maxBucketSize = 0`
    * requests the exact contract the quadratic oracle demands (capped
    * semantics are value-pinned by q186 on the shared machinery). */
  val q187ImagePairOracle: Q = q("q187_image_pair_oracle",
    """WITH fp AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM documents),
      |planted AS (SELECT doc_id, h FROM fp
      |  UNION ALL SELECT doc_id + 100000, xor(h, 21) FROM fp
      |    WHERE doc_id % 5 = 0),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    xor(a.h, b.h) AS x
      |  FROM planted a, planted b WHERE a.doc_id < b.doc_id),
      |hm AS (SELECT doc_a, doc_b, len(list_filter(range(0, 60),
      |    j -> (x // (1::BIGINT << j)) % 2 = 1)) AS hamming FROM pr)
      |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
      |FROM hm WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val fp = Tables.documents(s, d).select(col("doc_id"),
      graft.functions.Md5Functions.md5Prefix60(col("text")).as("d_hash"))
    val hashes = fp.withColumn("decoded", lit(true))
      .unionAll(fp.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          col("d_hash").bitwiseXOR(lit(21L)).as("d_hash"), lit(true).as("decoded")))
      .unionAll(fp.select((col("doc_id") + 200000L).as("doc_id"),
        lit(0L).as("d_hash"), lit(false).as("decoded")))
    Multimodal.imageNearDupPairs(hashes, maxHamming = 6, maxBucketSize = 0)
      .orderBy("doc_a", "doc_b")
  }

  /** `.warc.gz` ingestion ([[graft.ops.Warc.syntheticWarcGzipChunks]] +
    * `parseWarc`): the CommonCrawl layout — one gzip member per record,
    * members concatenated into a chunk — inflated member-by-member and
    * parsed through the same cursor as plain WARC. The oracle is the
    * q185 full envelope reconstruction, UNCHANGED: the compression layer
    * must be perfectly transparent, so any header-flag, member-boundary,
    * or trailer bug in the inflater shows up as a missing/shifted/
    * corrupted record against the reconstruction. (WarcSpec covers the
    * hostile cases: truncated members, garbage between members, FLG
    * extra fields, decompression-bomb clamp.) */
  val q188WarcGzip: Q = q("q188_warc_gzip",
    """SELECT CAST(doc_id // 8 AS BIGINT) AS chunk_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
      |    - 1 AS BIGINT) AS rec_idx,
      |  'response' AS warc_type,
      |  'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'text/plain' AS content_type,
      |  CAST(strlen(text) AS BIGINT) AS content_length,
      |  md5(text) AS body_md5,
      |  TRUE AS valid,
      |  CASE WHEN doc_id % 8 = 3 THEN 'length' ELSE '' END
      |    AS truncated_reason
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY chunk_id, rec_idx""".stripMargin) { (s, d) =>
    val chunks = Warc.syntheticWarcGzipChunks(s,
      Tables.documents(s, d).select("doc_id", "text"))
    Warc.parseWarc(s, chunks).toDF().orderBy("chunk_id", "rec_idx")
  }

  /** Crawl→corpus capstone: the whole ingestion-to-training-set front
    * half in ONE composed plan — `.warc.gz` synthesis → member inflate +
    * envelope parse ([[graft.ops.Warc.parseWarcText]], bodies carried as
    * text) → URL canonicalization of the messy per-record target URIs
    * ([[graft.ops.WebText.canonicalUrl]]: case, `www.`, default port,
    * doubled slashes, `utm_*`, fragment) → Gopher-style quality gates
    * ([[graft.ops.Curation.qualityGates]]) → exact content dedup keyed
    * on the blake2b content hash ([[graft.ops.Dedup.exactByHash]],
    * survivor = lexicographic-min canonical URL). The oracle rebuilds
    * every stage from the source rows — canonical URL from doc_id, the
    * four gate predicates, the group-by-text dedup — so a drift ANYWHERE
    * in the chain (inflater, cursor, canon regexes, gate thresholds,
    * survivor rule) diverges. Proves the new ingestion path composes
    * with the existing curation surface. */
  val q189WarcCorpus: Q = q("q189_warc_corpus",
    """WITH src AS (SELECT doc_id, text FROM documents
      |  WHERE text IS NOT NULL),
      |canon AS (SELECT
      |  'http://example.com/doc/' || CAST(doc_id AS VARCHAR) ||
      |    '?x=' || CAST(doc_id % 3 AS VARCHAR) AS url,
      |  text, string_split(text, ' ') AS toks FROM src),
      |gated AS (SELECT url, text, len(toks) AS n_tokens FROM canon
      |  WHERE len(toks) BETWEEN 20 AND 100000
      |    AND (length(text) - len(toks) + 1)::DOUBLE / len(toks)
      |      BETWEEN 3.0 AND 10.0
      |    AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.35
      |    AND (SELECT max(c) FROM (
      |        SELECT count(*) AS c FROM unnest(toks) AS u(t) GROUP BY t))
      |      ::DOUBLE / len(toks) <= 0.15)
      |SELECT min(url) AS url, CAST(count(*) AS BIGINT) AS dup_count,
      |  CAST(min(n_tokens) AS BIGINT) AS n_tokens
      |FROM gated GROUP BY text ORDER BY url""".stripMargin) { (s, d) =>
    import graft.ops.WebText
    val messyUri = concat(lit("HTTP://WWW.Example.COM:80//doc//"),
      col("doc_id"), lit("?utm_source=warc&x="),
      (col("doc_id") % 3).cast("string"), lit("#frag"))
    val chunks = Warc.syntheticWarcGzipChunks(s,
      Tables.documents(s, d).select("doc_id", "text"), uri = messyUri)
    val parsed = Warc.parseWarcText(s, chunks).toDF()
      .filter(col("valid"))
      .select(WebText.canonicalUrl(col("target_uri")).as("url"),
        col("body").as("text"))
    val gated = Curation.qualityGates(parsed).filter(col("passes"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    graft.ops.Dedup.exactByHash(
        gated.withColumn("graft_key",
          struct(col("url"), col("n_tokens"))),
        col("text"), col("graft_key"))
      .select(col("doc_id.url").as("url"), col("dup_count"),
        col("doc_id.n_tokens").as("n_tokens"))
      .orderBy("url")
  }

  /** HTTP response splitting behind the WARC layer
    * ([[graft.ops.Http.splitResponse]] over
    * [[graft.ops.Warc.parseWarcText]] bodies): a WARC `response`
    * record's block is the FULL captured HTTP response, so the pipeline
    * must strip the status line + headers before any text op — here
    * documents are wrapped in deterministic HTTP responses (status /
    * media type / charset varied by doc_id moduli, one cohort left
    * UN-wrapped to pin the pass-through branch), pushed through
    * synthesis → parse → split, and the oracle RECONSTRUCTS the
    * expected status/type/charset/body directly from the synthesis
    * parameters — the extraction is checked against ground truth, not
    * against a shared regex. */
  val q190HttpSplit: Q = q("q190_http_split",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN NULL
      |       WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS status_code,
      |  CASE WHEN doc_id % 7 = 0 THEN ''
      |       WHEN doc_id % 2 = 0 THEN 'text/html'
      |       ELSE 'text/plain' END AS content_type,
      |  CASE WHEN doc_id % 7 = 0 THEN ''
      |       WHEN doc_id % 3 = 0 THEN 'utf-8'
      |       WHEN doc_id % 3 = 1 THEN 'iso-8859-1'
      |       ELSE '' END AS charset,
      |  (doc_id % 7 <> 0) AS is_http,
      |  text AS body
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.ops.Http
    val crlf = "\r\n"
    val payload = when(col("doc_id") % 7 === 0, col("text")).otherwise(concat(
      lit("HTTP/1.1 "),
      when(col("doc_id") % 5 === 0, "404 Not Found").otherwise("200 OK"),
      lit(crlf), lit("Server: synth" + crlf),
      lit("Content-Type: "),
      when(col("doc_id") % 2 === 0, "text/html").otherwise("text/plain"),
      when(col("doc_id") % 3 === 0, lit("; charset=UTF-8"))
        .when(col("doc_id") % 3 === 1, lit("; charset=\"iso-8859-1\""))
        .otherwise(lit("")),
      lit(crlf + crlf), col("text")))
    val chunks = Warc.syntheticWarcChunks(
      Tables.documents(s, d).select(col("doc_id"), payload.as("text")))
    val parsed = Warc.parseWarcText(s, chunks).toDF().filter(col("valid"))
      .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long")
        .as("doc_id"), col("body").as("payload"))
    Http.splitResponse(parsed, "payload")
      .select("doc_id", "status_code", "content_type", "charset", "is_http",
        "body")
      .orderBy("doc_id")
  }

  /** CDX-style WARC record index ([[graft.ops.Warc.parseWarcIndex]]):
    * per-record byte locators inside the chunk payload — the artifact
    * that buys random access into crawl segments. The oracle rebuilds
    * each record STRING from the source row and derives every locator
    * as a running sum of octet lengths, so any cursor drift (a header
    * byte miscounted, a CRLF attributed to the wrong record) moves an
    * offset and hash-diverges. Gzip-member locator semantics
    * (compressed spans) are spec-gated in WarcSpec — gzip sizes are not
    * SQL-derivable. */
  val q191WarcIndex: Q = q("q191_warc_index",
    """WITH src AS (SELECT doc_id, text FROM documents
      |  WHERE text IS NOT NULL),
      |rec AS (SELECT doc_id, doc_id // 8 AS chunk_id,
      |  'WARC/1.0' || e'\r\n' || 'WARC-Type: response' || e'\r\n' ||
      |  'WARC-Target-URI: http://example.com/doc/' ||
      |    CAST(doc_id AS VARCHAR) || e'\r\n' ||
      |  CASE WHEN doc_id % 8 = 3
      |    THEN 'WARC-Truncated: length' || e'\r\n' ELSE '' END ||
      |  'Content-Type: text/plain' || e'\r\n' ||
      |  'Content-Length: ' || CAST(strlen(text) AS VARCHAR) ||
      |    e'\r\n\r\n' || text || e'\r\n\r\n' AS r,
      |  md5(text) AS body_md5 FROM src),
      |loc AS (SELECT chunk_id, doc_id, body_md5, strlen(r) AS rb,
      |  row_number() OVER (PARTITION BY chunk_id ORDER BY doc_id) - 1
      |    AS rec_idx,
      |  sum(strlen(r)) OVER (PARTITION BY chunk_id ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) - strlen(r) AS off FROM rec)
      |SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(rec_idx AS BIGINT) AS rec_idx,
      |  'response' AS warc_type,
      |  'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  CAST(off AS BIGINT) AS rec_offset, CAST(rb AS BIGINT) AS rec_bytes,
      |  body_md5, TRUE AS valid
      |FROM loc ORDER BY chunk_id, rec_idx""".stripMargin) { (s, d) =>
    val chunks = Warc.syntheticWarcChunks(
      Tables.documents(s, d).select("doc_id", "text"))
    Warc.parseWarcIndex(s, chunks).orderBy("chunk_id", "rec_idx")
  }

  /** robots.txt parsing ([[graft.ops.Robots.parseRobots]]): per-host
    * synthetic robots files exercising the REP grammar — comments,
    * blank lines, mixed-case directive keys, stray CRs, a VALUELESS
    * `Disallow:` (allows all — must be dropped), and consecutive
    * `User-agent:` lines stacking onto one group. The oracle
    * reconstructs the expected rule rows from the synthesis parameters
    * (ground truth, not a mirrored parser). */
  val q192RobotsRules: Q = q("q192_robots_rules",
    """WITH hosts AS (SELECT DISTINCT source AS host,
      |  strlen(source) % 3 AS m FROM documents),
      |expect AS (
      |  SELECT host, 1 AS group_id, '*' AS user_agent,
      |    'disallow' AS directive, '/private' AS path_prefix FROM hosts
      |  UNION ALL SELECT host, 1, '*', 'allow', '/private/ok' FROM hosts
      |  UNION ALL SELECT host, 2, 'graftbot', 'disallow',
      |    '/x' || CAST(m AS VARCHAR) FROM hosts
      |  UNION ALL SELECT host, 2, 'graftbot', 'allow', '/pub' FROM hosts
      |  UNION ALL SELECT host, 2, 'otherbot', 'disallow',
      |    '/x' || CAST(m AS VARCHAR) FROM hosts
      |  UNION ALL SELECT host, 2, 'otherbot', 'allow', '/pub' FROM hosts)
      |SELECT host, CAST(group_id AS BIGINT) AS group_id, user_agent,
      |  directive, path_prefix
      |FROM expect ORDER BY host, group_id, user_agent, directive,
      |  path_prefix""".stripMargin) { (s, d) =>
    import graft.ops.Robots
    val robots = Tables.documents(s, d).select(col("source")).distinct()
      .select(col("source").as("host"), concat(
        lit("# synthetic robots file\n\n"),
        lit("User-agent: *\r\n"),                 // stray CR: CRLF file
        lit("DISALLOW: /private\n"),              // mixed-case key
        lit("Allow: /private/ok   # inline comment\n"),
        lit("Disallow:\n"),                       // valueless: allows all
        lit("\nUser-agent: graftbot\n"),
        lit("User-agent: otherbot\n"),            // stacked UA lines
        lit("Disallow: /x"), (length(col("host")) % 3).cast("string"),
        lit("\nAllow: /pub\n")).as("robots_txt"))
    Robots.parseRobots(robots)
      .orderBy("host", "group_id", "user_agent", "directive", "path_prefix")
  }

  /** robots.txt URL admission ([[graft.ops.Robots.isAllowed]]): the
    * q192 rules applied to a URL corpus for TWO agents — `graftbot`
    * (host publishes an agent-specific group, which REPLACES the `*`
    * group per the RFC: its `/private` paths come out ALLOWED) and
    * `unknownbot` (falls back to `*`, where the longest-prefix rule
    * makes `/private/ok/…` allowed but `/private/…` blocked, allow
    * winning the longer prefix). The oracle derives each verdict from
    * the synthesis moduli — group selection, longest-prefix, tie rules
    * all pinned against ground truth. */
  val q193RobotsGate: Q = q("q193_robots_gate",
    """SELECT doc_id, source AS host,
      |  CASE WHEN doc_id % 4 = 0 THEN '/pub/a'
      |       WHEN doc_id % 4 = 1
      |         THEN '/x' || CAST(strlen(source) % 3 AS VARCHAR) || '/page'
      |       WHEN doc_id % 4 = 2 THEN '/private/ok/x'
      |       ELSE '/private/y' END AS path,
      |  agent,
      |  CASE WHEN agent = 'graftbot' THEN doc_id % 4 <> 1
      |       ELSE doc_id % 4 <> 3 END AS allowed
      |FROM documents CROSS JOIN
      |  (SELECT unnest(['graftbot', 'unknownbot']) AS agent)
      |ORDER BY doc_id, agent""".stripMargin) { (s, d) =>
    import graft.ops.Robots
    val robots = Tables.documents(s, d).select(col("source")).distinct()
      .select(col("source").as("host"), concat(
        lit("User-agent: *\nDisallow: /private\nAllow: /private/ok\n\n"),
        lit("User-agent: graftbot\nUser-agent: otherbot\nDisallow: /x"),
        (length(col("host")) % 3).cast("string"),
        lit("\nAllow: /pub\n")).as("robots_txt"))
    val rules = Robots.parseRobots(robots)
    val urls = Tables.documents(s, d).select(col("doc_id"),
      col("source").as("host"),
      when(col("doc_id") % 4 === 0, lit("/pub/a"))
        .when(col("doc_id") % 4 === 1,
          concat(lit("/x"), (length(col("source")) % 3).cast("string"),
            lit("/page")))
        .when(col("doc_id") % 4 === 2, lit("/private/ok/x"))
        .otherwise(lit("/private/y")).as("path"))
    Seq("graftbot", "unknownbot").map { a =>
        Robots.isAllowed(urls, rules, a).withColumn("agent", lit(a))
      }.reduce(_.unionAll(_))
      .select("doc_id", "host", "path", "agent", "allowed")
      .orderBy("doc_id", "agent")
  }

  /** Cross-document repeated-span scrub
    * ([[graft.ops.Dedup.scrubSharedNgramSpans]], n=5, minDf=2): tokens
    * covered by any 5-gram shared across ≥2 documents are cut in place
    * — ids %4 get one fixed 5-gram appended (a guaranteed cross-doc
    * shared span whose boundary grams stay unique, so EXACTLY those
    * five tokens scrub), and the fixture's planted exact-dup pairs
    * scrub to empty. The oracle mirrors the whole machinery: 60-bit
    * md5-prefix gram identity, distinct-doc df, positions-union
    * coverage, ordered reassembly. */
  val q194ScrubSpans: Q = q("q194_scrub_spans",
    """WITH t AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 4 = 0 THEN ' zq aq bq cq dq' ELSE '' END AS tx
      |  FROM documents),
      |w AS (SELECT doc_id, string_split(tx, ' ') AS wd FROM t),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(wd) - 3),
      |    i -> {'gpos': i, 'h': CAST(('0x' || substr(md5(
      |      wd[i]||' '||wd[i+1]||' '||wd[i+2]||' '||wd[i+3]||' '||wd[i+4]),
      |      1, 15)) AS BIGINT)}), recursive := true) FROM w),
      |hv AS (SELECT h FROM g GROUP BY h
      |  HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(gpos, gpos + 5)) AS p
      |  FROM g JOIN hv USING (h)),
      |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(wd) + 1),
      |    i -> {'p': i, 'tok': wd[i]}), recursive := true) FROM w),
      |kept AS (SELECT tok.doc_id, count(*) AS n_kept,
      |    string_agg(tok.tok, ' ' ORDER BY tok.p) AS text
      |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
      |  WHERE cov.doc_id IS NULL GROUP BY tok.doc_id)
      |SELECT w.doc_id, CAST(len(wd) AS BIGINT) AS n_tokens,
      |  CAST(len(wd) - coalesce(n_kept, 0) AS BIGINT) AS n_scrubbed,
      |  coalesce(kept.text, '') AS text
      |FROM w LEFT JOIN kept ON w.doc_id = kept.doc_id
      |ORDER BY w.doc_id""".stripMargin) { (s, d) =>
    val tx = concat(col("text"),
      when(col("doc_id") % 4 === 0, lit(" zq aq bq cq dq")).otherwise(lit("")))
    Dedup.scrubSharedNgramSpans(
        Tables.documents(s, d).select(col("doc_id"), tx.as("text")),
        n = 5, minDf = 2)
      .orderBy("doc_id")
  }

  /** Crawl-frontier capstone — the "what to fetch next" composition a
    * crawler runs over every snapshot: out-links extracted from the
    * crawled pages in ALL forms and RFC 3986-resolved
    * ([[graft.ops.WebText.resolvedLinkRows]] — the rooted
    * `/relative/skip` and the protocol-relative mirror link now enter
    * the frontier as fetchable URLs), scored by
    * in-link count per target, already-fetched URLs anti-joined away,
    * robots.txt admission applied per target domain
    * ([[graft.ops.Robots.isAllowed]]: `Disallow: /l/3` for everyone),
    * and the survivors ranked top-3 per registered domain. The oracle
    * re-derives the entire chain — extraction regex, domain reduction,
    * in-link counts, the crawled-set anti-join, the robots verdict, the
    * (inlinks desc, url asc) rank — from the same synthesized pages. */
  val q195CrawlFrontier: Q = q("q195_crawl_frontier",
    """WITH p AS (SELECT doc_id, source,
      |  '<p>' || text || '</p><a href="HTTP://WWW.' || upper(source) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '.Example.COM:80'
      |       ELSE '.sample.NET' END ||
      |  '/l/' || CAST(doc_id % 7 AS VARCHAR) || '?utm_source=z&amp;x=' ||
      |  CAST(doc_id % 3 AS VARCHAR) ||
      |  '">t1</a><a class=''m'' href=''https://cdn' ||
      |  CAST(doc_id % 4 AS VARCHAR) || '.assets.co.uk/lib.js?v=' ||
      |  CAST(doc_id % 5 AS VARCHAR) ||
      |  '''>t2</a><a href="//mirror.example.org/m/' ||
      |  CAST(doc_id % 3 AS VARCHAR) ||
      |  '">pp</a><a href="/relative/skip">r</a><a data-href="http://decoy.bad/x">d</a><a href=''https://' ||
      |  source || '.org/nav''>self</a>' AS html FROM documents),
      |lk AS (SELECT unnest(regexp_extract_all(html,
      |    '(?is)<a\s(?:[^>]*?[\s"''])?href\s*=\s*["''](https?://[^"''<>\s]+)["'']', 1))
      |    AS raw FROM p),
      |dl AS (SELECT replace(raw, '&amp;', '&') AS link FROM lk
      |  UNION ALL SELECT 'http://mirror.example.org/m/' ||
      |    CAST(doc_id % 3 AS VARCHAR) FROM p
      |  UNION ALL SELECT
      |    'http://www.' || source || '.org/relative/skip' FROM p),
      |inl AS (SELECT link,
      |  """.stripMargin + rdSql("link") + """ AS domain,
      |  count(*) AS inlinks FROM dl GROUP BY 1, 2),
      |crawled AS (SELECT DISTINCT
      |  'HTTP://WWW.' || upper(source) || '.Example.COM:80/l/' ||
      |  CAST(doc_id % 7 AS VARCHAR) || '?utm_source=z&x=' ||
      |  CAST(doc_id % 3 AS VARCHAR) AS link
      |  FROM documents WHERE doc_id % 2 = 0),
      |fresh AS (SELECT * FROM inl
      |  WHERE link NOT IN (SELECT link FROM crawled)),
      |gated AS (SELECT link, domain, inlinks FROM fresh
      |  WHERE substr(regexp_extract(link,
      |    '^[a-zA-Z]+://[^/]*(/.*)?$', 1), 1, 4) <> '/l/3')
      |SELECT domain, link AS url, CAST(inlinks AS BIGINT) AS inlinks,
      |  CAST(row_number() OVER (PARTITION BY domain
      |    ORDER BY inlinks DESC, link ASC) AS BIGINT) AS rank
      |FROM gated
      |QUALIFY rank <= 3 ORDER BY domain, rank""".stripMargin) { (s, d) =>
    val pages = Tables.documents(s, d)
      .select(crawlPageUrl.as("url"), crawlPageHtml.as("html"))
    val links = WebText.resolvedLinkRows(pages, "url", "html")
      .select(col("link"))
    val inl = links
      .select(col("link"), WebText.registeredDomain(col("link")).as("domain"))
      .groupBy("link", "domain").agg(count(lit(1)).as("inlinks"))
    val crawled = Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
      .select(concat(lit("HTTP://WWW."), upper(col("source")),
        lit(".Example.COM:80/l/"), (col("doc_id") % 7).cast("string"),
        lit("?utm_source=z&x="), (col("doc_id") % 3).cast("string"))
        .as("link"))
      .distinct()
    val fresh = inl.join(crawled, Seq("link"), "left_anti")
    val robots = inl.select(col("domain")).distinct()
      .select(col("domain").as("host"),
        lit("User-agent: *\nDisallow: /l/3\n").as("robots_txt"))
    val rules = Robots.parseRobots(robots)
    val urls = fresh.select(col("link"), col("domain").as("host"),
      regexp_extract(col("link"), "^[a-zA-Z]+://[^/]*(/.*)?$", 1).as("path"),
      col("inlinks"))
    val gated = Robots.isAllowed(urls, rules, "graftbot")
      .filter(col("allowed"))
    val w = Window.partitionBy("host")
      .orderBy(col("inlinks").desc, col("link").asc)
    gated.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("host").as("domain"), col("link").as("url"),
        col("inlinks"), col("rank"))
      .orderBy("domain", "rank")
  }

  /** Sitemap parsing ([[graft.ops.WebText.sitemapEntries]]): per-host
    * sitemap XML synthesized from the fixture (one `<url>` per doc in
    * doc_id order, `<lastmod>` present for ids %3, whitespace inside
    * tags to exercise the trim), re-exploded into (host, loc, lastmod)
    * rows. Ground-truth oracle: the expected entries come straight from
    * the source rows, not from a mirrored regex. */
  val q196Sitemap: Q = q("q196_sitemap",
    """SELECT source AS host,
      |  'http://' || source || '.org/p/' || CAST(doc_id AS VARCHAR) AS loc,
      |  CASE WHEN doc_id % 3 = 0
      |       THEN '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
      |       ELSE '' END AS lastmod
      |FROM documents ORDER BY host, loc""".stripMargin) { (s, d) =>
    val entry = concat(
      lit("<url>\n  <loc> http://"), col("source"), lit(".org/p/"),
      col("doc_id").cast("string"), lit(" </loc>"),
      when(col("doc_id") % 3 === 0, concat(lit("\n  <LastMod>2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        lit("</LastMod>"))).otherwise(lit("")),
      lit("\n</url>"))
    val sitemaps = Tables.documents(s, d)
      .groupBy(col("source").as("host"))
      .agg(concat(lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
        array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), entry.as("e")))),
          x => x.getField("e")), "\n"), lit("\n</urlset>")).as("xml"))
    sitemaps.select(col("host"),
        explode(WebText.sitemapEntries(col("xml"))).as("u"))
      .select(col("host"), col("u.loc").as("loc"), col("u.lastmod").as("lastmod"))
      .orderBy("host", "loc")
  }

  /** Classifier-threshold calibration sweep
    * ([[graft.ops.Classifier.thresholdSweep]]): the precision/recall
    * operating curve over a deterministic score (token count mod 10 —
    * ten distinct thresholds) against a planted label rule. The oracle
    * re-derives the per-threshold confusion counts with the same
    * descending cumulative windows and the exact floor-micros ratios. */
  val q197ThresholdSweep: Q = q("q197_threshold_sweep",
    """WITH s AS (SELECT
      |  CAST(len(string_split(text, ' ')) % 10 AS BIGINT) AS threshold,
      |  (doc_id % 3 = 0) AS label FROM documents),
      |a AS (SELECT threshold,
      |  sum(CASE WHEN label THEN 1 ELSE 0 END) AS pos,
      |  sum(CASE WHEN label THEN 0 ELSE 1 END) AS neg
      |  FROM s GROUP BY 1),
      |c AS (SELECT threshold,
      |  sum(pos) OVER (ORDER BY threshold DESC
      |    ROWS UNBOUNDED PRECEDING) AS tp,
      |  sum(neg) OVER (ORDER BY threshold DESC
      |    ROWS UNBOUNDED PRECEDING) AS fp,
      |  sum(pos) OVER () AS totpos FROM a)
      |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(totpos - tp AS BIGINT) AS fn,
      |  CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_micros,
      |  CAST((tp * 1000000) // totpos AS BIGINT) AS recall_micros
      |FROM c ORDER BY threshold""".stripMargin) { (s, d) =>
    import graft.ops.Classifier
    val scored = Tables.documents(s, d).select(
      (size(split(col("text"), " ")) % 10).cast("long").as("score"),
      (col("doc_id") % 3 === 0).as("label"))
    Classifier.thresholdSweep(scored, "score", "label")
      .orderBy("threshold")
  }

  /** Byte-level WARC synthesis shared by q198/q199: one response record
    * whose block is `httpBytes` (envelope Content-Length counts the
    * true octets via binary length), assembled into 8-record chunk
    * payloads by binary concatenation in doc_id order. ONE definition —
    * a drift between the two byte-path fixtures would silently
    * desynchronize their oracles. */
  private def httpWarcRecordBytes(httpBytes: Column,
      uri: Column = concat(lit("http://example.com/doc/"),
        col("doc_id"))): Column = concat(
    encode(concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: "), uri,
      lit("\r\nContent-Type: application/http; msgtype=response\r\n" +
        "Content-Length: "),
      length(httpBytes).cast("string"), lit("\r\n\r\n")), "UTF-8"),
    httpBytes, encode(lit("\r\n\r\n"), "UTF-8"))

  private def binaryWarcChunks(docs: DataFrame, recBytes: Column): DataFrame =
    docs.filter(col("text").isNotNull)
      .select((col("doc_id") / 8).cast("long").as("chunk_id"), col("doc_id"),
        recBytes.as("rec"))
      .groupBy("chunk_id")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("rec"))))
        .as("members"))
      .select(col("chunk_id"),
        aggregate(col("members"), lit(Array.emptyByteArray),
          (acc, m) => concat(acc, m.getField("rec"))).as("payload"))

  /** Charset-aware bytes→text decode
    * ([[graft.ops.Warc.parseWarcHttpDocs]] /
    * `Http.splitResponseBytes`): WARC records are synthesized at the
    * BYTE level — the HTTP header octets are UTF-8 but the entity body
    * is encoded in the charset the header DECLARES (latin-1 for one
    * cohort, with planted accented chars that round-trip only if the
    * decoder honors the declaration; a quoted charset param and an
    * unsupported `x-bogus` name cover the parse and fallback paths) —
    * and the envelope Content-Length counts the true octets. The
    * oracle reconstructs the decoded text and every HTTP field from
    * the source rows: an eager-UTF-8 decoder corrupts the latin-1
    * cohort's accents and hash-diverges. */
  val q198CharsetDecode: Q = q("q198_charset_decode",
    """SELECT doc_id, 200 AS status_code, 'text/plain' AS content_type,
      |  CASE WHEN doc_id % 4 = 0 THEN 'iso-8859-1'
      |       WHEN doc_id % 4 = 3 THEN 'x-bogus'
      |       ELSE 'utf-8' END AS charset,
      |  text || ' café ñ über' AS text,
      |  TRUE AS valid
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val accent = lit(" café ñ über")
    val tx = concat(col("text"), accent)
    val csName = when(col("doc_id") % 4 === 0, "ISO-8859-1")
      .when(col("doc_id") % 4 === 1, "UTF-8")
      .when(col("doc_id") % 4 === 2, "\"UTF-8\"") // quoted param form
      .otherwise("x-bogus")                       // unsupported → fallback
    val bodyBytes = when(col("doc_id") % 4 === 0, encode(tx, "ISO-8859-1"))
      .otherwise(encode(tx, "UTF-8"))
    val httpBytes = concat(
      encode(concat(lit("HTTP/1.1 200 OK\r\nServer: synth\r\n" +
        "Content-Type: text/plain; charset="), csName, lit("\r\n\r\n")),
        "UTF-8"),
      bodyBytes)
    val chunks = binaryWarcChunks(Tables.documents(s, d),
      httpWarcRecordBytes(httpBytes))
    Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid"))
      .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long")
        .as("doc_id"), col("status_code"), col("content_type"),
        col("charset"), col("text"), col("valid"))
      .orderBy("doc_id")
  }

  /** WARC→WET extraction — the conversion CommonCrawl itself publishes
    * (WET files are the plain-text rendering of WARC response bodies):
    * HTML documents ride the full byte path (WARC envelope → HTTP split
    * → charset decode, [[graft.ops.Warc.parseWarcHttpDocs]]) and the
    * boilerplate-stripped visible text
    * ([[graft.ops.WebText.visibleText]]) comes out with its token
    * count. Ground-truth oracle: the deterministic HTML shell makes the
    * expected WET text reconstructable from the source row, so a bug
    * anywhere in the five composed layers diverges. */
  val q199WetExtract: Q = q("q199_wet_extract",
    """SELECT doc_id, trim('Title ' || text) AS wet_text,
      |  CAST(len(string_split(trim('Title ' || text), ' ')) AS BIGINT)
      |    AS n_tokens
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val html = concat(
      lit("<html><head><style>h1{color:red}</style></head><body>" +
        "<h1>Title</h1><p>"), col("text"),
      lit("</p><script>var a=1;</script><!-- note --></body></html>"))
    val httpBytes = concat(
      encode(lit("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n\r\n"), "UTF-8"),
      encode(html, "UTF-8"))
    val chunks = binaryWarcChunks(Tables.documents(s, d),
      httpWarcRecordBytes(httpBytes))
    Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid") && col("content_type") === "text/html")
      .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long")
        .as("doc_id"), WebText.visibleText(col("text")).as("wet_text"))
      .withColumn("n_tokens",
        size(split(col("wet_text"), " ")).cast("long"))
      .orderBy("doc_id")
  }

  /** Magic-byte MIME sniffing ([[graft.ops.Multimodal.sniffMime]]):
    * twelve payload cohorts carrying real container signatures (PDF,
    * PNG, GIF, JPEG, RIFF-wrapped WAV/WEBP, gzip, zip, ISO-BMFF ftyp,
    * EBML, whitespace-led HTML, and an unrecognized-text fallback) are
    * synthesized from hex literals and classified from the BYTES alone
    * — the mislabeled-Content-Type audit. Ground-truth oracle: the
    * expected type per cohort. */
  val q200MimeSniff: Q = q("q200_mime_sniff",
    """SELECT doc_id, CASE CAST(doc_id % 12 AS INT)
      |  WHEN 0 THEN 'application/pdf'
      |  WHEN 1 THEN 'image/png'
      |  WHEN 2 THEN 'image/gif'
      |  WHEN 3 THEN 'image/jpeg'
      |  WHEN 4 THEN 'audio/wav'
      |  WHEN 5 THEN 'image/webp'
      |  WHEN 6 THEN 'application/gzip'
      |  WHEN 7 THEN 'application/zip'
      |  WHEN 8 THEN 'video/mp4'
      |  WHEN 9 THEN 'video/webm'
      |  WHEN 10 THEN 'text/html'
      |  ELSE 'application/octet-stream' END AS mime
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 12
    val payload =
      when(m === 0, unhex(lit("255044462D312E34")))
        .when(m === 1, unhex(lit("89504E470D0A1A0A0000000D49484452")))
        .when(m === 2, unhex(lit("474946383961")))
        .when(m === 3, unhex(lit("FFD8FFE000104A464946")))
        .when(m === 4, unhex(lit("524946462400000057415645666D7420")))
        .when(m === 5, unhex(lit("524946460000000057454250")))
        .when(m === 6, unhex(lit("1F8B0800")))
        .when(m === 7, unhex(lit("504B030414")))
        .when(m === 8, unhex(lit("000000186674797069736F6D")))
        .when(m === 9, unhex(lit("1A45DFA3")))
        .when(m === 10,
          encode(concat(lit("  <!DOCTYPE html><p>"), col("text")), "UTF-8"))
        .otherwise(encode(col("text"), "UTF-8"))
    Tables.documents(s, d)
      .select(col("doc_id"), Multimodal.sniffMime(payload).as("mime"))
      .orderBy("doc_id")
  }

  /** Host-reputation rollup — the domain-level scorecard crawl curation
    * actually acts on (keep/drop/cap decisions are made per DOMAIN, not
    * per page): registered domain from the page URL, Gopher gate pass
    * rate, within-domain exact-dup rate, and token volume, one row per
    * domain. Composes [[graft.ops.WebText.registeredDomain]] +
    * [[graft.ops.Curation.qualityGates]] + exact floor-micros ratios;
    * the corpus collapses in ONE domain-keyed aggregate. The oracle
    * re-derives the gates and both ratios with domain ground truth. */
  val q201DomainReputation: Q = q("q201_domain_reputation",
    """WITH g AS (SELECT source || '.org' AS domain, text,
      |  string_split(text, ' ') AS toks FROM documents),
      |m AS (SELECT domain, text, len(toks) AS nt,
      |  CASE WHEN len(toks) BETWEEN 20 AND 100000
      |    AND (length(text) - len(toks) + 1)::DOUBLE / len(toks)
      |      BETWEEN 3.0 AND 10.0
      |    AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.35
      |    AND (SELECT max(c) FROM (
      |        SELECT count(*) AS c FROM unnest(toks) AS u(t) GROUP BY t))
      |      ::DOUBLE / len(toks) <= 0.15
      |  THEN 1 ELSE 0 END AS pass FROM g)
      |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST((sum(pass) * 1000000) // count(*) AS BIGINT) AS pass_micros,
      |  CAST(((count(*) - count(DISTINCT text)) * 1000000) // count(*)
      |    AS BIGINT) AS dup_micros,
      |  CAST(sum(nt) AS BIGINT) AS total_tokens
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Curation.qualityGates(domainDocs(s, d))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("n_pass"),
        countDistinct("text").as("n_distinct"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
      .select(col("domain"), col("n_docs"),
        graft.ops.Micros.ratio(col("n_pass"), col("n_docs"))
          .as("pass_micros"),
        graft.ops.Micros.ratio(col("n_docs") - col("n_distinct"),
          col("n_docs")).as("dup_micros"),
        col("total_tokens"))
      .orderBy("domain")
  }

  /** Interpolated bigram LM scoring
    * ([[graft.ops.TextAnalysis.interpolatedBigramLogProb]]): Jelinek-
    * Mercer `0.7·cb/c(prev) + 0.3·(cu+1)/(N+V)` with the unigram floor
    * for first tokens — the context-sensitive fluency score between
    * q69's unigram and a full KenLM. The oracle rebuilds both model
    * tables and the per-token interpolation term for term (association
    * order mirrored for bit-identical doubles), micro-rounds per token,
    * and re-applies the exact integer half-up average. */
  val q202BigramBackoff: Q = q("q202_bigram_backoff",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wd
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(list_transform(range(1, len(wd) + 1),
      |    i -> {'pos': i, 'tok': wd[i]}), recursive := true) FROM w),
      |st AS (SELECT doc_id, pos, tok,
      |    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM tok),
      |uni AS (SELECT tok, count(*) AS cu FROM tok GROUP BY tok),
      |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS v FROM uni),
      |big AS (SELECT prev, tok, count(*) AS cb FROM st
      |  WHERE prev IS NOT NULL GROUP BY 1, 2),
      |sc AS (SELECT s.doc_id,
      |  CASE WHEN s.prev IS NULL OR pu.cu IS NULL
      |    THEN (coalesce(u.cu, 0) + 1)::DOUBLE / (n + v)
      |    ELSE 0.7 * (coalesce(b.cb, 0)::DOUBLE / pu.cu) +
      |         0.3 * ((coalesce(u.cu, 0) + 1)::DOUBLE / (n + v)) END AS p
      |  FROM st s LEFT JOIN uni u ON s.tok = u.tok
      |  LEFT JOIN big b ON s.prev = b.prev AND s.tok = b.tok
      |  LEFT JOIN uni pu ON s.prev = pu.tok
      |  CROSS JOIN tot),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  sum(CAST(round(ln(p) * 1000000.0, 0) AS BIGINT)) AS sm
      |  FROM sc GROUP BY 1)
      |SELECT doc_id, n_tokens,
      |  (CASE WHEN sm >= 0 THEN (2*sm + 100*n_tokens) // (200*n_tokens)
      |        ELSE -((-2*sm + 100*n_tokens) // (200*n_tokens)) END) / 10000.0
      |    AS avg_logprob
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextAnalysis.interpolatedBigramLogProb(docs, docs).orderBy("doc_id")
  }

  /** Crawl-delay politeness schedule
    * ([[graft.ops.Robots.parseCrawlDelays]] +
    * [[graft.ops.Robots.politenessSchedule]]): per-host robots files
    * declare `Crawl-delay: 10` for `*` and an agent-specific group for
    * `graftbot` whose delay varies by a host modulus — fractional
    * seconds (0.5 → 500 ms), integer (2 → 2000 ms), or NONE (the
    * agent's group replaces `*` wholesale, so the declared 10 s must
    * NOT leak through: the host falls to the caller default 1000 ms).
    * Each host's URLs then get sequential slots spaced by its delay.
    * The oracle re-derives the delay from the synthesis modulus and the
    * slots from a row_number window — group selection, no-fallback
    * rule, ms conversion, and slot arithmetic all pinned. */
  val q203CrawlDelay: Q = q("q203_crawl_delay",
    """WITH urls AS (SELECT source AS host,
      |  '/doc/' || CAST(doc_id AS VARCHAR) AS url FROM documents),
      |d AS (SELECT DISTINCT source AS host,
      |  CASE WHEN ascii(substr(source, -1)) % 3 = 0 THEN 500
      |       WHEN ascii(substr(source, -1)) % 3 = 1 THEN 2000
      |       ELSE 1000 END AS delay_ms FROM documents),
      |r AS (SELECT host, url, delay_ms,
      |  CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
      |    AS BIGINT) AS slot
      |  FROM urls JOIN d USING (host))
      |SELECT host, url, CAST(delay_ms AS BIGINT) AS delay_ms, slot,
      |  CAST(slot * delay_ms AS BIGINT) AS fetch_offset_ms
      |FROM r ORDER BY host, slot""".stripMargin) { (s, d) =>
    import graft.ops.Robots
    val m = ascii(substring(col("source"), -1, 1)) % 3
    val robots = Tables.documents(s, d).select(col("source")).distinct()
      .select(col("source").as("host"), concat(
        lit("User-agent: *\nCrawl-delay: 10\n\n" +
          "User-agent: graftbot\nAllow: /\n"),
        when(m === 0, lit("Crawl-delay: 0.5\n"))
          .when(m === 1, lit("Crawl-delay: 2\n"))
          .otherwise(lit(""))).as("robots_txt"))
    val delays = Robots.parseCrawlDelays(robots, "graftbot")
    val urls = Tables.documents(s, d).select(col("source").as("host"),
      concat(lit("/doc/"), col("doc_id").cast("string")).as("url"))
    Robots.politenessSchedule(urls, delays, defaultDelayMs = 1000L)
      .select("host", "url", "delay_ms", "slot", "fetch_offset_ms")
      .orderBy("host", "slot")
  }

  /** Token-budget mixture plan ([[graft.ops.Curation.mixturePlan]]):
    * sources collapse to two classes by a length modulus, weighted
    * 0.5 / 0.25 with a deliberately absent third class at 0.25 (exact
    * binary fractions summing to exactly 1.0, so the Scala-side weight
    * normalization and the oracle's literal division are the same
    * doubles bit for bit). The oracle re-derives targets, floor-micros
    * rates, exact integral epoch ceilings, and the
    * upsample/downsample/empty mode labels. */
  val q204MixturePlan: Q = q("q204_mixture_plan",
    """WITH c AS (SELECT CASE WHEN strlen(source) % 2 = 0
      |    THEN 'even' ELSE 'odd' END AS source,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT * FROM (VALUES ('even', 0.5), ('odd', 0.25),
      |  ('books', 0.25)) t(source, w)),
      |j AS (SELECT w.source, coalesce(c.n_tokens, 0) AS n_tokens,
      |  CAST(floor(w.w / 1.0 * 1000000) AS BIGINT) AS target_tokens
      |  FROM w LEFT JOIN c USING (source))
      |SELECT source, n_tokens, target_tokens,
      |  CAST(CASE WHEN n_tokens = 0 THEN 0
      |    ELSE (target_tokens * 1000000) // n_tokens END AS BIGINT)
      |    AS rate_micros,
      |  CAST(CASE WHEN n_tokens = 0 THEN 0
      |    ELSE (target_tokens + n_tokens - 1) // n_tokens END AS BIGINT)
      |    AS epochs,
      |  CASE WHEN n_tokens = 0 THEN 'empty'
      |       WHEN target_tokens > n_tokens THEN 'upsample'
      |       WHEN target_tokens < n_tokens THEN 'downsample'
      |       ELSE 'exact' END AS mode
      |FROM j ORDER BY source""".stripMargin) { (s, d) =>
    import graft.ops.Curation
    val counts = Tables.documents(s, d)
      .groupBy(when(length(col("source")) % 2 === 0, "even")
        .otherwise("odd").as("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    Curation.mixturePlan(counts,
        Map("even" -> 0.5, "odd" -> 0.25, "books" -> 0.25),
        budgetTokens = 1000000L)
      .orderBy("source")
  }

  /** Calibration / reliability bins
    * ([[graft.ops.Classifier.calibrationBins]]): a uniform
    * md5-bucket pseudo-probability against a doc_id-modulus label —
    * statistically independent, so a well-behaved table shows every
    * bin's observed positive rate near 0.25 while the mean predicted
    * score climbs with the bin, i.e. the per-bin |gap| IS the
    * miscalibration the audit exists to expose. The oracle mirrors the
    * bucket score, the bin clamp, the floor-micros score sum, and both
    * integral ratios. */
  val q205Calibration: Q = q("q205_calibration",
    """WITH s AS (SELECT
      |  ('0x' || substr(md5(text), 1, 6))::BIGINT / 16777216.0 AS score,
      |  doc_id % 4 = 0 AS label FROM documents),
      |b AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
      |  CAST(floor(score * 1000000) AS BIGINT) AS sm, label FROM s),
      |g AS (SELECT bin, count(*) AS n,
      |  sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
      |  sum(sm) AS sms FROM b GROUP BY bin)
      |SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(sms // n AS BIGINT) AS mean_score_micros,
      |  CAST((n_pos * 1000000) // n AS BIGINT) AS frac_pos_micros,
      |  CAST(abs(sms // n - (n_pos * 1000000) // n) AS BIGINT)
      |    AS gap_micros
      |FROM g ORDER BY bin""".stripMargin) { (s, d) =>
    import graft.ops.Classifier
    val scored = Tables.documents(s, d).select(
      // r17: native md5_prefix24 (value-identical, no hex round-trip)
      (graft.functions.Md5Functions.md5Prefix24(col("text")) /
        lit(16777216.0)).as("score"),
      (col("doc_id") % 4 === 0).as("label"))
    Classifier.calibrationBins(scored, "score", "label", bins = 10)
      .orderBy("bin")
  }

  /** Token-budget contiguous sharding
    * ([[graft.ops.Curation.tokenBudgetShards]] over
    * [[graft.ops.Relational.globalRunningSum]]): docs pack into ~1000-
    * token shards in doc_id order via the two-phase distributed prefix
    * sum — quantile bands + per-band window + broadcast band offsets —
    * never a single-partition corpus window. The oracle computes the
    * same prefix sum with DuckDB's (single-node-fine) global window and
    * the same exact floor divide: any band-boundary placement must
    * reproduce it bit for bit. */
  val q206TokenShards: Q = q("q206_token_shards",
    """WITH t AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (SELECT doc_id, n_tokens,
      |  CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS cum_tokens FROM t)
      |SELECT doc_id, n_tokens, cum_tokens,
      |  CAST((cum_tokens - n_tokens) // 1000 AS BIGINT) AS shard
      |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.ops.Curation
    val t = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Curation.tokenBudgetShards(t, "n_tokens", targetTokens = 1000L)
      .select("doc_id", "n_tokens", "cum_tokens", "shard")
      .orderBy("doc_id")
  }

  /** Change-rate revisit schedule
    * ([[graft.ops.WebText.revisitSchedule]]): three synthesized fetches
    * per URL with a doc-modulus gap and change pattern — some URLs
    * change every visit (clamp to the 1h floor), some never (estimate
    * span, then the 30-day ceiling for slow movers), single-change and
    * no-change cohorts cover the `max(changes, 1)` denominator floor.
    * The oracle re-derives the whole policy: span, exact floor divide,
    * both clamp bounds, next-fetch arithmetic. */
  val q207Revisit: Q = q("q207_revisit",
    """WITH h AS (SELECT
      |  source || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |  1700000000000 + doc_id + k * (doc_id % 5 + 1) * 36000000
      |    AS fetch_ts_ms,
      |  k > 0 AND (doc_id + k) % 3 = 0 AS changed
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS k)),
      |a AS (SELECT url, count(*) AS n_fetches,
      |  sum(CASE WHEN changed THEN 1 ELSE 0 END) AS n_changes,
      |  max(fetch_ts_ms) - min(fetch_ts_ms) AS span,
      |  max(fetch_ts_ms) AS last_fetch_ms FROM h GROUP BY url),
      |s AS (SELECT url, CAST(n_fetches AS BIGINT) AS n_fetches,
      |  CAST(n_changes AS BIGINT) AS n_changes,
      |  CAST(last_fetch_ms AS BIGINT) AS last_fetch_ms,
      |  CAST(least(greatest(
      |    span // (CASE WHEN n_changes > 1 THEN n_changes ELSE 1 END),
      |    3600000), 2592000000) AS BIGINT) AS interval_ms FROM a)
      |SELECT url, n_fetches, n_changes, last_fetch_ms, interval_ms,
      |  CAST(last_fetch_ms + interval_ms AS BIGINT) AS next_fetch_ms
      |FROM s ORDER BY url""".stripMargin) { (s, d) =>
    import graft.ops.WebText
    val history = Tables.documents(s, d)
      .select(concat(col("source"), lit("/doc/"),
          col("doc_id").cast("string")).as("url"),
        col("doc_id"), explode(array(lit(0), lit(1), lit(2))).as("k"))
      .select(col("url"),
        (lit(1700000000000L) + col("doc_id") +
          col("k") * (col("doc_id") % 5 + 1) * 36000000L).as("fetch_ts_ms"),
        (col("k") > 0 && (col("doc_id") + col("k")) % 3 === 0).as("changed"))
    WebText.revisitSchedule(history).orderBy("url")
  }

  /** Largest-remainder exact budget allocation
    * ([[graft.ops.Curation.allocateBudget]]): a prime token budget
    * (1,000,003 — guaranteed floor shortfall) split across per-source
    * token weights. The oracle reruns the method in HUGEINT — exact
    * products, floor divide, remainder rank with the ascending-key tie
    * rule — and doubles as the Σ alloc == budget proof (summing the
    * oracle's own column). */
  val q208AllocBudget: Q = q("q208_alloc_budget",
    """WITH c AS (SELECT source,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM c),
      |b AS (SELECT source, w,
      |  CAST((1000003::HUGEINT * w) // tw AS BIGINT) AS base,
      |  (1000003::HUGEINT * w) % tw AS rem FROM c, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
      |  CAST(1000003 - sum(base) OVER () AS BIGINT) AS extra FROM b)
      |SELECT source, w,
      |  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc
      |FROM r ORDER BY source""".stripMargin) { (s, d) =>
    import graft.ops.Curation
    val counts = Tables.documents(s, d).groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("w"))
    Curation.allocateBudget(counts, "source", "w", budget = 1000003L)
      .orderBy("source")
  }

  /** Crawl-budget capstone — the q70/q189/q195 composition idiom over
    * the two newest ops: registered domain → Gopher gates → per-domain
    * PASSING-token weights (a domain with zero passing docs gets no
    * budget at all, filtered before allocation — [[graft.ops.Curation
    * .allocateBudget]] rightly raises on zero weights) → exact
    * largest-remainder split of a prime fetch budget, so the per-domain
    * fetch quotas sum to the budget to the unit. The oracle rebuilds
    * every stage: the q201 gate battery, the passing-token rollup, and
    * the HUGEINT allocation with ascending-domain ties. */
  val q209CrawlBudget: Q = q("q209_crawl_budget",
    """WITH g AS (SELECT source || '.org' AS domain, text,
      |  string_split(text, ' ') AS toks FROM documents),
      |m AS (SELECT domain, len(toks) AS nt,
      |  CASE WHEN len(toks) BETWEEN 20 AND 100000
      |    AND (length(text) - len(toks) + 1)::DOUBLE / len(toks)
      |      BETWEEN 3.0 AND 10.0
      |    AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.35
      |    AND (SELECT max(c) FROM (
      |        SELECT count(*) AS c FROM unnest(toks) AS u(t) GROUP BY t))
      |      ::DOUBLE / len(toks) <= 0.15
      |  THEN 1 ELSE 0 END AS pass FROM g),
      |c AS (SELECT domain,
      |  CAST(sum(CASE WHEN pass = 1 THEN nt ELSE 0 END) AS BIGINT) AS w
      |  FROM m GROUP BY domain HAVING sum(pass) > 0),
      |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM c),
      |b AS (SELECT domain, w,
      |  CAST((99991::HUGEINT * w) // tw AS BIGINT) AS base,
      |  (99991::HUGEINT * w) % tw AS rem FROM c, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, domain) AS rk,
      |  CAST(99991 - sum(base) OVER () AS BIGINT) AS extra FROM b)
      |SELECT domain, w,
      |  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc
      |FROM r ORDER BY domain""".stripMargin) { (s, d) =>
    import graft.ops.Curation
    val weights = Curation.qualityGates(domainDocs(s, d))
      .filter(col("passes"))
      .groupBy("domain")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("w"))
    Curation.allocateBudget(weights, "domain", "w", budget = 99991L)
      .orderBy("domain")
  }

  /** Value oracle for the vector-LSH ANN candidate stage
    * ([[graft.ops.Similarity.annLshMd5]]): q41's random-hyperplane
    * signatures are engine-internal, but the machinery they feed —
    * explode per-table bucket ids → bucket equi-join → distinct id
    * pairs → vector re-attach → exact-cosine confirm → per-query
    * top-k — is not. Deterministic md5-derived buckets
    * (`md5_prefix60(vec_id || ':' || t) % 32 + t·10⁶` over 4 tables)
    * stand in for the plane signatures, and the oracle re-derives the
    * buckets and the candidate join from DuckDB's own md5 builtin, so
    * the whole candidate/confirm/rank pipeline is value-pinned
    * cross-engine (the q186/q187 trick applied to the vector family).
    * [[graft.ops.Similarity.annLsh]] stays the recall path (q41,
    * rows-only + SimilaritySpec recall floors). */
  val q210AnnLshOracle: Q = q("q210_ann_lsh_oracle",
    """WITH qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |cv AS (SELECT vec_id AS c_id, label, embedding::DOUBLE[] AS ce
      |  FROM embeddings),
      |ts AS (SELECT unnest(range(0, 4)) AS t),
      |qb AS (SELECT q_id,
      |    CAST(('0x' || substr(md5(q_id || ':' || t), 1, 15)) AS BIGINT)
      |      % 32 + t * 1000000 AS bucket
      |  FROM qv, ts),
      |cb AS (SELECT c_id,
      |    CAST(('0x' || substr(md5(c_id || ':' || t), 1, 15)) AS BIGINT)
      |      % 32 + t * 1000000 AS bucket
      |  FROM cv, ts),
      |ids AS (SELECT DISTINCT q_id, c_id FROM cb JOIN qb USING (bucket)
      |  WHERE q_id <> c_id),
      |sims AS (SELECT q_id, c_id, label,
      |    round(list_dot_product(qe, ce) /
      |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
      |      4) AS cos_sim
      |  FROM ids JOIN qv USING (q_id) JOIN cv USING (c_id))
      |SELECT q_id, rnk, c_id, label, cos_sim FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk
      |  FROM sims)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.annLshMd5(queries = emb.filter(col("vec_id") < 10),
        corpus = emb, k = 5, buckets = 32, tables = 4)
      .orderBy("q_id", "rnk")
  }

  /** Shared q211/q212 fixture: every document body wrapped in the chrome
    * a real crawl page carries — a link-dense nav `<div>`, a short
    * `<h1>` title, the body `<p>`, a short caption `<p>` BETWEEN two
    * body paragraphs (the bridge case), a second body `<p>`, and a
    * link-dense footer. The ~21 sub-80-char documents at sf0.01 make the
    * good/short classification genuinely data-dependent. */
  private def chromePages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("text").isNotNull).select(
      concat(lit("http://site"), (col("doc_id") % 7).cast("string"),
        lit(".example.org/a/"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<div class=\"nav\"><a href=\"http://site0.example.org/\">Home</a> " +
          "<a href=\"http://site0.example.org/about\">About us</a> " +
          "<a href=\"http://site0.example.org/contact\">Contact</a></div>" +
          "<h1>Story "), col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><p>Figure 1: a short caption</p><p>"), col("text"),
        lit(" closing remarks</p><div class=\"footer\">" +
          "<a href=\"http://site0.example.org/terms\">Terms</a> " +
          "<a href=\"http://site0.example.org/privacy\">Privacy</a> " +
          "(c) example</div>")).as("html"))

  /** Shared q211/q212 oracle prefix: the same chrome-page synthesis +
    * block split + per-block visible-text/link-density scoring
    * ([[graft.ops.WebText.contentBlocks]]), re-derived from DuckDB's
    * RE2 builtins (`regexp_split_to_array` + indexed `list_transform`
    * — 1-based `i` shifted to the 0-based split position). */
  /** The q211/q212 chrome-page fixture as a bare SELECT (pages CTE
    * body) — [[blocksSqlFrom]] wraps it; q215 supplies its own pages. */
  private val chromePagesSql: String =
    """SELECT
      |  'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/a/' ||
      |    CAST(doc_id AS VARCHAR) AS url,
      |  '<div class="nav"><a href="http://site0.example.org/">Home</a> ' ||
      |  '<a href="http://site0.example.org/about">About us</a> ' ||
      |  '<a href="http://site0.example.org/contact">Contact</a></div>' ||
      |  '<h1>Story ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
      |  '</p><p>Figure 1: a short caption</p><p>' || text ||
      |  ' closing remarks</p><div class="footer">' ||
      |  '<a href="http://site0.example.org/terms">Terms</a> ' ||
      |  '<a href="http://site0.example.org/privacy">Privacy</a> ' ||
      |  '(c) example</div>' AS html
      |  FROM documents WHERE text IS NOT NULL""".stripMargin

  /** Block split + per-block scoring stages, parameterized by a pages
    * CTE (`url`, `html`): the DuckDB mirror of
    * [[graft.ops.WebText.contentBlocks]], ending in a `blocks` CTE.
    * The split pattern is SPLICED from the Scala constant — the two
    * engines can never drift. */
  private def blocksSqlFrom(pages: String): String =
    "WITH p AS (" + pages + "),\n" +
    """pre AS (SELECT url, regexp_replace(regexp_replace(regexp_replace(html,
      |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |    '(?s)<!--.*?-->', ' ', 'g') AS h FROM p),
      |arr AS (SELECT url, regexp_split_to_array(h,
      |    '""".stripMargin + WebText.BlockTagPattern + """') AS a FROM pre),
      |rb AS (SELECT url, unnest(list_transform(a,
      |    (x, i) -> {'block_idx': CAST(i - 1 AS BIGINT), 'raw': x}),
      |    recursive := true) FROM arr),
      |vt AS (SELECT url, block_idx,
      |  trim(regexp_replace(replace(replace(replace(replace(replace(
      |    regexp_replace(regexp_replace(raw, '<[^>]*>', ' ', 'g'),
      |      '&nbsp;', ' ', 'g'),
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |    '&amp;', '&'), '\s+', ' ', 'g')) AS block_text,
      |  trim(regexp_replace(replace(replace(replace(replace(replace(
      |    regexp_replace(regexp_replace(
      |      regexp_replace(raw, '(?is)<a[\s>].*?</a>', '', 'g'),
      |      '<[^>]*>', ' ', 'g'), '&nbsp;', ' ', 'g'),
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |    '&amp;', '&'), '\s+', ' ', 'g')) AS non_anchor
      |  FROM rb),
      |sc AS (SELECT url, block_idx, block_text,
      |    CAST(strlen(block_text) AS BIGINT) AS n_chars,
      |    CAST(strlen(block_text) - strlen(non_anchor) AS BIGINT) AS lc
      |  FROM vt WHERE strlen(block_text) > 0),
      |blocks AS (SELECT url, block_idx, block_text, n_chars,
      |    CAST((lc * 1000000) // n_chars AS BIGINT) AS link_density_micros,
      |    (n_chars >= 80 AND (lc * 1000000) // n_chars <= 500000) AS is_good
      |  FROM sc)""".stripMargin

  private val contentBlocksSql: String = blocksSqlFrom(chromePagesSql)

  /** The [[graft.ops.WebText.mainContent]] selection + per-page
    * aggregation mirror, appended after a `blocks` CTE. */
  private val mainContentTailSql: String =
    """,
      |k AS (SELECT *, is_good OR (link_density_micros <= 500000
      |    AND coalesce(lag(is_good) OVER
      |      (PARTITION BY url ORDER BY block_idx), FALSE)
      |    AND coalesce(lead(is_good) OVER
      |      (PARTITION BY url ORDER BY block_idx), FALSE)) AS keep
      |  FROM blocks)
      |SELECT url, CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS n_chars_kept,
      |  coalesce(string_agg(CASE WHEN keep THEN block_text END, chr(10)
      |    ORDER BY block_idx), '') AS main_text
      |FROM k GROUP BY url ORDER BY url""".stripMargin

  /** Block-level segmentation signals ([[graft.ops.WebText.contentBlocks]])
    * over chrome-wrapped pages: every split position, visible text,
    * char count, link density, and good/chrome classification
    * value-pinned cross-engine (nav/footer blocks must score link-dense,
    * bodies link-sparse, in BOTH engines, or main-content selection
    * diverges). */
  val q211ContentBlocks: Q = q("q211_content_blocks",
    contentBlocksSql +
      """
        |SELECT url, block_idx, block_text, n_chars, link_density_micros,
        |  is_good
        |FROM blocks ORDER BY url, block_idx""".stripMargin) { (s, d) =>
    WebText.contentBlocks(chromePages(s, d)).orderBy("url", "block_idx")
  }

  /** Main-content extraction ([[graft.ops.WebText.mainContent]], the
    * jusText keep-the-dense-run selection): good blocks plus short
    * link-sparse blocks bridged by good neighbors, re-joined in block
    * order. The planted caption between two body paragraphs must
    * survive exactly when both bodies classify good (text ≥ 80 chars),
    * and the nav-adjacent `<h1>` must always drop — both re-derived by
    * the oracle's lag/lead windows. */
  val q212MainContent: Q = q("q212_main_content",
    contentBlocksSql + mainContentTailSql) { (s, d) =>
    WebText.mainContent(chromePages(s, d)).orderBy("url")
  }

  /** One planted sentence per language [[graft.ops.TextAnalysis]]
    * identifies — 14 latin-script (trigram-scored) + 9 script-gated.
    * Lower-case only (sidesteps locale-sensitive upper→lower edge cases
    * like Turkish İ), no apostrophes (SQL literals). */
  private val plantedLangTexts: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog and runs to the hills of the north",
    "de" -> "der schnelle braune fuchs springt über den faulen hund und die schöne sonne scheint nicht",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso y los niños que juegan en la calle",
    "fr" -> "le renard brun rapide saute par dessus le chien paresseux et les enfants de la ville",
    "it" -> "la volpe marrone che salta sopra il cane pigro della città vecchia negli anni della gioventù",
    "pt" -> "a raposa marrom que salta sobre o cão preguiçoso e as crianças do povoado não são assim",
    "nl" -> "de snelle bruine vos springt over de luie hond en het kind van een der oude huizen",
    "sv" -> "den snabba bruna räven hoppar över den lata hunden och att det för alla var mycket bra",
    "da" -> "den hurtige brune ræv springer over den dovne hund og der er meget at se til den tid",
    "fi" -> "nopea ruskea kettu hyppää laiskan koiran yli ja on aivan kaunista että sataa tänään",
    "pl" -> "szybki brązowy lis przeskakuje nad leniwym psem i nie ma niczego nowego na polach",
    "cs" -> "rychlá hnědá liška skáče přes líného psa a je to na poli se psem pro všechny lidi",
    "tr" -> "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve bir daha buraya gelir",
    "ro" -> "vulpea maro rapida sare peste cainele lenes si copiii din sat merg pe drumul cel lung",
    "ru" -> "быстрая коричневая лиса прыгает через ленивую собаку",
    "el" -> "η γρηγορη καφε αλεπου πηδαει πανω απο το τεμπελικο σκυλι",
    "ar" -> "الثعلب البني السريع يقفز فوق الكلب الكسول",
    "he" -> "השועל החום המהיר קופץ מעל הכלב העצלן",
    "hi" -> "तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है",
    "th" -> "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้ามสุนัขขี้เกียจ",
    "zh" -> "敏捷的棕色狐狸跳过了懒狗",
    "ja" -> "すばやい茶色のきつねはのろまな犬を飛び越えます",
    "ko" -> "빠른 갈색 여우가 게으른 개를 뛰어넘는다",
    // mixed-script guard case: ONE Greek letter in English prose must
    // NOT fire the el script gate (min-share rule) — trigram argmax wins
    "en" -> "the constant π is used once but the quick brown fox still jumps over the lazy dog")

  /** Trigram-profile language ID
    * ([[graft.ops.TextAnalysis.langIdTrigram]]) — the broad-language
    * successor to q53's stopword heuristic. Docs < 115 carry planted
    * sentences cycling through all 23 languages plus a mixed-script
    * guard case (one Greek letter in English prose — the script gate's
    * min-share rule must NOT fire); the rest keep the
    * (en-ish) word-salad bodies. The oracle embeds the IDENTICAL
    * 14×15 trigram model (generated from the same Scala constant — one
    * source of truth) and re-derives normalization, codepoint trigram
    * extraction, weight-sum scoring, micros normalization, argmax with
    * lang tie-break, script gates, and the unknown fallback. */
  /** Generated-SQL building blocks shared by q213/q216: the planted
    * fixture CTEs + trigram scoring up to `best`, and the gate CASE
    * fragments — all derived from the SAME Scala constants the Spark
    * side uses. `predLangSql` is the per-doc verdict expression over
    * aliases `f` (feat) / `b` (best). */
  private val langIdFixtureCtes: String = {
    val nSent = plantedLangTexts.size
    val sentValues = plantedLangTexts.zipWithIndex
      .map { case ((_, t), k) => s"($k, '$t')" }.mkString(", ")
    val profValues = TextAnalysis.trigramProfileRows
      .map { case (l, t, w) => s"('$l', '$t', $w)" }.mkString(", ")
    s"""WITH sent(k, txt) AS (VALUES $sentValues),
       |corpus AS (
       |  SELECT d.doc_id, s.txt AS text FROM documents d
       |    JOIN sent s ON d.doc_id % $nSent = s.k WHERE d.doc_id < 115
       |  UNION ALL SELECT doc_id, text FROM documents
       |    WHERE doc_id >= 115 AND text IS NOT NULL),
       |prof(lang, trigram, w) AS (VALUES $profValues),
       |feat AS (SELECT doc_id, text,
       |    ' ' || trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
       |      || ' ' AS s FROM corpus),
       |tri AS (SELECT doc_id, unnest(list_transform(
       |    range(1, length(s) - 1), i -> substr(s, i, 3))) AS trigram
       |  FROM feat),
       |hits AS (SELECT doc_id, lang, CAST(sum(w) AS BIGINT) AS w
       |  FROM tri JOIN prof USING (trigram) GROUP BY 1, 2),
       |best AS (SELECT doc_id, lang, w FROM (SELECT *, row_number()
       |    OVER (PARTITION BY doc_id ORDER BY w DESC, lang DESC) AS rk
       |  FROM hits) WHERE rk = 1)""".stripMargin
  }

  /** One script gate as RE2 SQL — the char-class hit AND the
    * minimum in-script character share, mirroring
    * [[graft.ops.TextAnalysis.ScriptGateMinShareMicros]] exactly
    * (length-minus-stripped count, floor-divided micros). */
  private def gateCondSql(re: String): String =
    s"(regexp_matches(f.text, '$re') AND " +
      s"(CAST(length(f.text) - length(regexp_replace(f.text, '$re', '', 'g'))" +
      " AS BIGINT) * 1000000) // greatest(length(f.text), 1) >= " +
      s"${TextAnalysis.ScriptGateMinShareMicros})"

  private val langGateCases: String = TextAnalysis.scriptGatesRe2
    .map { case (l, re) => s"WHEN ${gateCondSql(re)} THEN '$l'" }
    .mkString(" ")

  private val predLangSql: String =
    s"CASE $langGateCases ELSE coalesce(b.lang, 'unknown') END"

  /** The q213 planted multilingual corpus, Spark side (the same rows
    * the `sent`/`corpus` CTEs build). */
  private def plantedLangCorpus(s: SparkSession, d: String): DataFrame = {
    val nSent = plantedLangTexts.size
    val sentences = plantedLangTexts.map(_._2)
    val base = Tables.documents(s, d)
    base.filter(col("doc_id") < 115)
      .select(col("doc_id"),
        element_at(array(sentences.map(lit): _*),
          (col("doc_id") % nSent + 1).cast("int")).as("text"))
      .unionAll(base.filter(col("doc_id") >= 115 && col("text").isNotNull)
        .select("doc_id", "text"))
  }

  val q213LangIdTrigram: Q = {
    val anyGate = TextAnalysis.scriptGatesRe2
      .map { case (_, re) => gateCondSql(re) }
      .mkString(" OR ")
    q("q213_lang_id_trigram",
      langIdFixtureCtes +
      s"""
         |SELECT f.doc_id,
         |  $predLangSql AS pred_lang,
         |  CAST(CASE WHEN $anyGate THEN 1000000
         |    WHEN b.lang IS NOT NULL
         |      THEN (b.w * 1000000) // greatest(length(f.s) - 2, 0)
         |    ELSE 0 END AS BIGINT) AS score_micros,
         |  CAST(greatest(length(f.s) - 2, 0) AS BIGINT) AS n_trigrams
         |FROM feat f LEFT JOIN best b USING (doc_id)
         |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.langIdTrigram(plantedLangCorpus(s, d)).orderBy("doc_id")
    }
  }

  /** Multilingual corpus budgeting capstone: trigram language ID →
    * per-language whitespace-token weights → EXACT largest-remainder
    * budget allocation (Σ alloc == budget to the unit) — the "how many
    * tokens of each language go into the mix" planning step of a
    * multilingual pretraining corpus, every stage reusing an
    * oracle-pinned component (q213 langid, q208 allocation). The
    * oracle rebuilds the language verdicts, the per-lang token rollup,
    * and the HUGEINT remainder method end-to-end. */
  val q216LangBudget: Q = q("q216_lang_budget",
    langIdFixtureCtes +
    s""",
       |pred AS (SELECT f.doc_id, f.text,
       |    $predLangSql AS pred_lang
       |  FROM feat f LEFT JOIN best b USING (doc_id)),
       |w AS (SELECT pred_lang,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
       |  FROM pred GROUP BY 1),
       |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM w),
       |alloc AS (SELECT pred_lang, w,
       |    CAST((99991::HUGEINT * w) // tw AS BIGINT) AS base,
       |    (99991::HUGEINT * w) % tw AS rem FROM w, t),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, pred_lang)
       |    AS rk,
       |  CAST(99991 - sum(base) OVER () AS BIGINT) AS extra FROM alloc)
       |SELECT pred_lang, w,
       |  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc
       |FROM r ORDER BY pred_lang""".stripMargin) { (s, d) =>
    val corpus = plantedLangCorpus(s, d)
    val langs = TextAnalysis.langIdTrigram(corpus)
      .select("doc_id", "pred_lang")
    val weights = corpus.join(langs, Seq("doc_id"))
      .groupBy("pred_lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("w"))
    Curation.allocateBudget(weights, "pred_lang", "w", budget = 99991L)
      .orderBy("pred_lang")
  }

  /** (canonical, dirty-variant) non-ASCII name pairs for q214 —
    * accents stripped/added, CJK char swap, Cyrillic truncation, Greek
    * diacritics dropped, Hebrew spelling variant. Lowercase only; all
    * pairs share a 2-codepoint blocking prefix and sit within the
    * codepoint length band. */
  private val nonAsciiNames: Seq[(String, String)] = Seq(
    "josé garcía" -> "jose garcia",
    "françois müller" -> "francois muller",
    "björk guðmundsdóttir" -> "björk gudmundsdottir",
    "café noir später" -> "café noir spater",
    "山田太郎 研究所" -> "山田太郎 研九所",
    "андрей соколов" -> "андрей сокол",
    "ελένη παπαδοπούλου" -> "ελενη παπαδοπουλου",
    "קפה ירושלים" -> "קפה ירושלם")

  /** Non-ASCII record linkage ([[graft.ops.Entity.jwMatches]]): the
    * byte-based [[graft.functions.JaroWinklerSim]] scorer is
    * bit-identical to DuckDB's jaro_winkler_similarity on EVERY string,
    * so accented/CJK/Cyrillic/Greek/Hebrew name variants are now
    * value-oracle-able — closing the r10 documented ASCII-only parity
    * scope. Pure-JW confirm (no levenshtein: Spark counts codepoints,
    * DuckDB bytes — not portable beyond ASCII); blocking prefix and
    * length band are codepoint-based in both engines. */
  val q214JwNonAscii: Q = {
    val canonValues = nonAsciiNames.zipWithIndex
      .map { case ((c, _), k) => s"($k, '$c')" }.mkString(", ")
    val varValues = nonAsciiNames.zipWithIndex
      .map { case ((_, v), k) => s"($k, '$v')" }.mkString(", ")
    q("q214_jw_nonascii",
      s"""WITH canon(k, name) AS (VALUES $canonValues),
         |var(k, name) AS (VALUES $varValues),
         |corpus AS (SELECT DISTINCT c.name FROM documents d
         |  JOIN canon c ON d.doc_id % 8 = c.k WHERE d.doc_id < 40),
         |q AS (SELECT d.doc_id AS qid, v.name FROM documents d
         |  JOIN var v ON d.doc_id % 8 = v.k
         |  WHERE d.doc_id >= 40 AND d.doc_id < 80),
         |m AS (SELECT qid, q.name AS q_name, c.name AS c_name,
         |    jaro_winkler_similarity(q.name, c.name) AS jw
         |  FROM q JOIN corpus c
         |    ON lower(substr(q.name, 1, 2)) = lower(substr(c.name, 1, 2))
         |   AND abs(length(q.name) - length(c.name)) <= 4
         |  WHERE jaro_winkler_similarity(q.name, c.name) >= 0.8)
         |SELECT qid, q_name, c_name, round(jw, 4) AS jw
         |FROM m ORDER BY qid, c_name""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d)
      val canon = array(nonAsciiNames.map(p => lit(p._1)): _*)
      val variant = array(nonAsciiNames.map(p => lit(p._2)): _*)
      val corpus = base.filter(col("doc_id") < 40)
        .select(element_at(canon, (col("doc_id") % 8 + 1).cast("int"))
          .as("name")).distinct()
      val queries = base.filter(col("doc_id") >= 40 && col("doc_id") < 80)
        .select(col("doc_id").as("qid"),
          element_at(variant, (col("doc_id") % 8 + 1).cast("int")).as("name"))
      graft.ops.Entity.jwMatches(queries, corpus, minJw = 0.8)
        .withColumn("jw", round(col("jw"), 4))
        .orderBy("qid", "c_name")
    }
  }

  /** The WET path upgraded with main-content extraction: q199 strips
    * tags page-wide (nav text and all); this runs the FULL crawl stack
    * — byte-level WARC synthesis → member parse → HTTP split →
    * charset decode ([[graft.ops.Warc.parseWarcHttpDocs]]) → block
    * segmentation + jusText selection ([[graft.ops.WebText.mainContent]])
    * — so the extracted corpus is the article bodies WITHOUT the
    * planted nav/footer chrome. The oracle synthesizes the same HTML
    * directly (the WARC/HTTP layers are proven transparent by
    * q185/q188/q190/q198) and re-derives the shared blocks pipeline +
    * selection. */
  val q215WetMainContent: Q = q("q215_wet_main_content",
    blocksSqlFrom(
      """SELECT 'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
        |  '<html><head><style>p{color:red}</style></head><body>' ||
        |  '<div class="nav"><a href="http://example.com/">Home</a> ' ||
        |  '<a href="http://example.com/about">About us</a> ' ||
        |  '<a href="http://example.com/contact">Contact</a></div>' ||
        |  '<h1>Story ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |  '</p><p>Figure 1: a short caption</p><p>' || text ||
        |  ' closing remarks</p><div class="footer">' ||
        |  '<a href="http://example.com/terms">Terms</a> ' ||
        |  '<a href="http://example.com/privacy">Privacy</a> ' ||
        |  '(c) example</div><script>var a=1;</script><!-- note -->' ||
        |  '</body></html>' AS html
        |  FROM documents WHERE text IS NOT NULL""".stripMargin) +
      mainContentTailSql) { (s, d) =>
    val html = concat(
      lit("<html><head><style>p{color:red}</style></head><body>" +
        "<div class=\"nav\"><a href=\"http://example.com/\">Home</a> " +
        "<a href=\"http://example.com/about\">About us</a> " +
        "<a href=\"http://example.com/contact\">Contact</a></div>" +
        "<h1>Story "), col("doc_id").cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><p>Figure 1: a short caption</p><p>"), col("text"),
      lit(" closing remarks</p><div class=\"footer\">" +
        "<a href=\"http://example.com/terms\">Terms</a> " +
        "<a href=\"http://example.com/privacy\">Privacy</a> " +
        "(c) example</div><script>var a=1;</script><!-- note -->" +
        "</body></html>"))
    val httpBytes = concat(
      encode(lit("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n\r\n"), "UTF-8"),
      encode(html, "UTF-8"))
    val chunks = binaryWarcChunks(Tables.documents(s, d),
      httpWarcRecordBytes(httpBytes))
    val pages = Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid") && col("content_type") === "text/html")
      .select(col("target_uri").as("url"), col("text").as("html"))
    WebText.mainContent(pages).orderBy("url")
  }

  /** Page-level robots directives
    * ([[graft.ops.WebText.metaRobotsSignals]]): six meta cohorts —
    * index/follow, upper-case NOINDEX, unquoted name= + spaced
    * directive list, noindex,nofollow, NO robots meta, and
    * content-FIRST attribute order with `none` — each alongside
    * `description`/`viewport` decoy metas whose content carries the
    * word "noindex" (the name filter must not read them). GROUND-TRUTH
    * oracle: expected directives/flags derived straight from the
    * synthesis modulus, so the extraction is checked against intent,
    * not a shared regex. */
  val q217MetaRobots: Q = q("q217_meta_robots",
    """SELECT 'http://example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
      |  CASE CAST(doc_id % 6 AS INT)
      |    WHEN 0 THEN 'follow,index' WHEN 1 THEN 'noindex'
      |    WHEN 2 THEN 'archive,nofollow' WHEN 3 THEN 'nofollow,noindex'
      |    WHEN 4 THEN '' ELSE 'none' END AS directives,
      |  CAST(doc_id % 6 AS INT) IN (1, 3, 5) AS noindex,
      |  CAST(doc_id % 6 AS INT) IN (2, 3, 5) AS nofollow
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY url""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 6
    val robots =
      when(m === 0, lit("<meta name=\"robots\" content=\"index, follow\">"))
        .when(m === 1, lit("<meta name=\"robots\" content=\"NOINDEX\">"))
        .when(m === 2, lit("<meta name=robots content=\"nofollow , archive\">"))
        .when(m === 3, lit("<meta name=\"robots\" content=\"noindex,nofollow\">"))
        .when(m === 4, lit(""))
        .otherwise(lit("<meta content=\"none\" name='robots'>"))
    val html = concat(
      lit("<html><head><meta name=\"description\" content=\"noindex decoy\">"),
      robots,
      lit("<meta name=\"viewport\" content=\"width=device-width\"></head>" +
        "<body><p>"), col("text"), lit("</p></body></html>"))
    val pages = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(concat(lit("http://example.com/p/"),
        col("doc_id").cast("string")).as("url"), html.as("html"))
    WebText.metaRobotsSignals(pages).orderBy("url")
  }

  /** UT1-style blocklist category gate
    * ([[graft.ops.Curation.blocklistSignals]]): planted term suffixes on
    * overlapping moduli (gambling ≥2 hits → flagged; pharma 2 → flagged;
    * a SINGLE piracy term → counted but NOT flagged — the
    * one-stray-mention-survives rule) over the built-in demo blocklist.
    * The oracle embeds the same term table (generated from the same
    * Scala constant) and re-derives tokenization, per-category counts,
    * the threshold, and the clean-doc left join. */
  val q218Blocklist: Q = {
    val blValues = Curation.defaultBlocklistRows
      .map { case (c, t) => s"('$c', '$t')" }.mkString(", ")
    q("q218_blocklist",
      s"""WITH bl(category, term) AS (VALUES $blValues),
         |t AS (SELECT doc_id, text
         |    || CASE WHEN doc_id % 7 = 0
         |         THEN ' casino jackpot casino poker' ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0
         |         THEN ' viagra pills viagra' ELSE '' END
         |    || CASE WHEN doc_id % 13 = 0
         |         THEN ' keygen now' ELSE '' END AS text2
         |  FROM documents WHERE text IS NOT NULL),
         |tok AS (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text2), '[^a-z0-9]+'),
         |    x -> x <> '')) AS term FROM t),
         |pc AS (SELECT doc_id, category, count(*) AS n
         |  FROM tok JOIN bl USING (term) GROUP BY 1, 2),
         |pd AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_hits,
         |    coalesce(string_agg(CASE WHEN n >= 2 THEN category END, ','
         |      ORDER BY category), '') AS flagged_categories
         |  FROM pc GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(pd.n_hits, 0) AS n_hits,
         |  coalesce(pd.flagged_categories, '') AS flagged_categories,
         |  coalesce(pd.flagged_categories <> '', FALSE) AS flagged
         |FROM t LEFT JOIN pd USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val text2 = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" casino jackpot casino poker"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" viagra pills viagra"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit(" keygen now")).otherwise(lit("")))
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), text2.as("text"))
      Curation.blocklistSignals(docs, Curation.defaultBlocklist(s),
          threshold = 2)
        .orderBy("doc_id")
    }
  }

  /** Redirect-chain resolution ([[graft.ops.WebText.resolveRedirects]]):
    * modulus-planted 301 chains — two-hop (1→2→3), one-hop (2→3), and a
    * 7↔8 two-cycle that must flag `truncated` at the hop limit — with a
    * GROUND-TRUTH oracle: expected final URL, hop count, and flags
    * derived arithmetically from the moduli (tracing the walk by hand),
    * not by re-running a walk in SQL. The planted Location headers
    * exercise RFC 9110's relative forms through the walk — m=1 a dotted
    * relative path (`x/../<id+2>`), m=2 root-relative (`/<id+1>`), m=7
    * protocol-relative (`//host/<id+1>`), m=8 absolute — and the oracle
    * pins the SAME absolute final URLs, so a resolution bug anywhere
    * breaks the chain equi-join and diverges. (m=1's hop target is
    * <id+1>, spelled `x/../<id+1>`.) */
  val q219Redirects: Q = q("q219_redirects",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 10 AS INT) AS m,
      |  'http://s.example.com/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents)
      |SELECT url,
      |  CASE m WHEN 1 THEN 'http://s.example.com/' || CAST(doc_id + 2 AS VARCHAR)
      |         WHEN 2 THEN 'http://s.example.com/' || CAST(doc_id + 1 AS VARCHAR)
      |         WHEN 7 THEN url
      |         WHEN 8 THEN url
      |         ELSE url END AS final_url,
      |  CAST(CASE m WHEN 1 THEN 2 WHEN 2 THEN 1
      |         WHEN 7 THEN 4 WHEN 8 THEN 4 ELSE 0 END AS BIGINT) AS n_hops,
      |  m IN (1, 2, 7, 8) AS redirected,
      |  m IN (7, 8) AS truncated
      |FROM t ORDER BY url""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 10
    def u(id: Column): Column =
      concat(lit("http://s.example.com/"), id.cast("string"))
    val responses = Tables.documents(s, d).select(
      u(col("doc_id")).as("url"),
      when(m.isin(1, 2, 7, 8), 301).otherwise(200).as("status_code"),
      when(m === 1, // dotted relative: "/<id>" dir is "/", x/.. cancels
          concat(lit("x/../"), (col("doc_id") + 1).cast("string")))
        .when(m === 2, // root-relative
          concat(lit("/"), (col("doc_id") + 1).cast("string")))
        .when(m === 7, // protocol-relative
          concat(lit("//s.example.com/"), (col("doc_id") + 1).cast("string")))
        .when(m === 8, u(col("doc_id") - 1)) // absolute
        .otherwise(lit("")).as("location"))
    WebText.resolveRedirects(responses, maxHops = 4).orderBy("url")
  }

  /** Two-level sitemap discovery
    * ([[graft.ops.WebText.sitemapIndexEntries]] → join-as-fetch →
    * [[graft.ops.WebText.sitemapEntries]]): every host shards its URLs
    * across three child sitemaps behind a `<sitemapindex>` (the 50k-URL
    * protocol cap's standard layout); the pipeline parses the index,
    * fans out to the child documents by loc, and parses each urlset —
    * index-level lastmod carried through to prove the index parse reads
    * it. GROUND-TRUTH oracle: every output row reconstructed from the
    * source rows and moduli. */
  val q220SitemapIndex: Q = q("q220_sitemap_index",
    """SELECT source AS host,
      |  'http://' || source || '.org/sitemap' ||
      |    CAST(doc_id % 3 AS VARCHAR) || '.xml' AS sitemap_loc,
      |  '2026-02-0' || CAST(doc_id % 3 + 1 AS VARCHAR) AS sitemap_lastmod,
      |  'http://' || source || '.org/p/' || CAST(doc_id AS VARCHAR) AS loc
      |FROM documents ORDER BY host, sitemap_loc, loc""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d)
    val entry = concat(lit("<url>\n <loc> http://"), col("source"),
      lit(".org/p/"), col("doc_id").cast("string"), lit(" </loc>\n</url>"))
    val children = base
      .groupBy(col("source").as("host"),
        (col("doc_id") % 3).cast("string").as("shard"))
      .agg(concat(lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
        array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), entry.as("e")))),
          x => x.getField("e")), "\n"), lit("\n</urlset>")).as("xml"))
      .withColumn("child_loc", concat(lit("http://"), col("host"),
        lit(".org/sitemap"), col("shard"), lit(".xml")))
    val indexEntry = concat(lit("<sitemap>\n <loc> "), col("child_loc"),
      lit(" </loc>\n <LastMod>2026-02-0"),
      (col("shard").cast("int") + 1).cast("string"),
      lit("</LastMod>\n</sitemap>"))
    val index = children
      .groupBy(col("host").as("ix_host"))
      .agg(concat(lit("<sitemapindex>\n"),
        array_join(transform(array_sort(
          collect_list(struct(col("child_loc"), indexEntry.as("e")))),
          x => x.getField("e")), "\n"), lit("\n</sitemapindex>")).as("ixml"))
    val fanout = index.select(col("ix_host"),
        explode(WebText.sitemapIndexEntries(col("ixml"))).as("sm"))
      .select(col("ix_host"), col("sm.loc").as("sitemap_loc"),
        col("sm.lastmod").as("sitemap_lastmod"))
    fanout.join(children,
        fanout("ix_host") === children("host") &&
          fanout("sitemap_loc") === children("child_loc"))
      .select(col("host"), col("sitemap_loc"), col("sitemap_lastmod"),
        explode(WebText.sitemapEntries(col("xml"))).as("u"))
      .select(col("host"), col("sitemap_loc"), col("sitemap_lastmod"),
        col("u.loc").as("loc"))
      .orderBy("host", "sitemap_loc", "loc")
  }

  /** robots.txt sitemap discovery ([[graft.ops.Robots.sitemapUrls]]):
    * per-host robots files carrying a normal-case Sitemap line with a
    * trailing comment, and (on even-length hosts) a second SITEMAP:
    * line with no space — inside a User-agent group, which must NOT
    * matter (the directive is group-independent per RFC 9309 §2.3).
    * GROUND-TRUTH oracle from the planted synthesis. */
  val q221RobotsSitemaps: Q = q("q221_robots_sitemaps",
    """WITH h AS (SELECT DISTINCT source FROM documents),
      |u AS (SELECT source,
      |    'http://' || source || '.org/sitemap0.xml' AS sitemap_url FROM h
      |  UNION ALL SELECT source, 'http://' || source || '.org/extra.xml'
      |  FROM h WHERE length(source) % 2 = 0)
      |SELECT source AS host, sitemap_url FROM u
      |ORDER BY host, sitemap_url""".stripMargin) { (s, d) =>
    val txt = concat(
      lit("User-agent: *\nDisallow: /tmp\n# a comment line\n" +
        "Sitemap: http://"), col("source"),
      lit(".org/sitemap0.xml   # trailing comment\n"),
      when(length(col("source")) % 2 === 0,
        concat(lit("SITEMAP:http://"), col("source"),
          lit(".org/extra.xml\n"))).otherwise(lit("")),
      lit("User-agent: bot\nDisallow: /\n"))
    val hosts = Tables.documents(s, d).select(col("source")).distinct()
      .select(col("source").as("host"), txt.as("robots_txt"))
    Robots.sitemapUrls(hosts).orderBy("host", "sitemap_url")
  }

  /** RFC 3986 relative-reference resolution over raw pages
    * ([[graft.ops.WebText.resolvedLinkRows]] / `resolveUrl`): each page
    * sits at `/a/b/page.html?x=1#top` and links every reference form a
    * real page emits — absolute, protocol-relative, root-relative,
    * plain relative, `../` dotted, over-root `../../../`, query-only,
    * fragment-only (dropped), and `mailto:` (dropped) — with docs ≡ 0
    * (mod 5) carrying a `<base href="/bb/">` that re-roots every
    * RELATIVE resolution (but not the rooted/absolute forms).
    * GROUND-TRUTH oracle: every expected absolute URL is spelled out
    * from the moduli by hand-tracing the RFC algorithm, so any drift in
    * merge, dot-segment removal, base-href handling, or the http(s)
    * filter diverges. */
  val q222ResolveLinks: Q = q("q222_resolve_links",
    """WITH t AS (SELECT doc_id,
      |  'http://www.' || source || '.org' AS h,
      |  'http://www.' || source || '.org/a/b/page.html?x=1#top' AS url,
      |  doc_id % 5 = 0 AS hb,
      |  CAST(doc_id % 2 AS VARCHAR) AS m2, CAST(doc_id % 3 AS VARCHAR) AS m3,
      |  CAST(doc_id % 4 AS VARCHAR) AS m4, CAST(doc_id % 5 AS VARCHAR) AS m5
      |  FROM documents),
      |links AS (
      |  SELECT url, 'http://abs.example.net/z/' || m3 AS link FROM t
      |  UNION ALL SELECT url, 'http://peer.example.org/pp/' || m4 FROM t
      |  UNION ALL SELECT url, h || '/root/' || m5 FROM t
      |  UNION ALL SELECT url, h ||
      |    CASE WHEN hb THEN '/bb/img/' ELSE '/a/b/img/' END
      |    || m2 || '.png' FROM t
      |  UNION ALL SELECT url, h ||
      |    CASE WHEN hb THEN '/up/' ELSE '/a/up/' END || m3 FROM t
      |  UNION ALL SELECT url, h || '/deep/' || m2 FROM t
      |  UNION ALL SELECT url, h ||
      |    CASE WHEN hb THEN '/bb/?page=' ELSE '/a/b/page.html?page=' END
      |    || m2 FROM t)
      |SELECT url, link FROM links ORDER BY url, link""".stripMargin) { (s, d) =>
    val m2 = (col("doc_id") % 2).cast("string")
    val m3 = (col("doc_id") % 3).cast("string")
    val m4 = (col("doc_id") % 4).cast("string")
    val m5 = (col("doc_id") % 5).cast("string")
    val html = concat(
      lit("<html><head>"),
      when(col("doc_id") % 5 === 0, lit("<base href=\"/bb/\">"))
        .otherwise(lit("")),
      lit("</head><body><a href=\"http://abs.example.net/z/"), m3,
      lit("\">abs</a><a href='//peer.example.org/pp/"), m4,
      lit("'>pr</a><a href=\"/root/"), m5,
      lit("\">rr</a><a href=\"img/"), m2,
      lit(".png\">rel</a><a href=\"../up/"), m3,
      lit("\">up</a><a href=\"../../../deep/"), m2,
      lit("\">deep</a><a href=\"?page="), m2,
      lit("\">q</a><a href=\"#sec\">frag</a>" +
        "<a href=\"mailto:a@b.c\">m</a></body></html>"))
    val pages = Tables.documents(s, d).select(
      concat(lit("http://www."), col("source"),
        lit(".org/a/b/page.html?x=1#top")).as("url"), html.as("html"))
    WebText.resolvedLinkRows(pages, "url", "html")
      .select("url", "link").orderBy("url", "link")
  }

  /** Meta-charset fallback in the byte decode path
    * ([[graft.ops.Http.splitResponseBytes]] behind the full WARC→HTTP
    * stack): five cohorts whose Content-Type header declares NO charset
    * — HTML5 `<meta charset>` with a latin-1 body (an eager UTF-8 read
    * corrupts the é/ñ/ü bytes), the legacy `http-equiv` form in both
    * attribute orders, a decoy page whose only `charset=` lives inside
    * a description attribute (must NOT be picked — sniffing it as
    * utf-16 would garble the decode), and a meta-less page (UTF-8
    * default). GROUND-TRUTH oracle: the expected decoded text is the
    * source html itself and the expected charset token per cohort is
    * spelled out, so a sniff that fires wrongly, misses, or mis-orders
    * header-vs-meta precedence diverges byte-for-byte. */
  /** Value oracle for the IVF probe/rank machinery
    * ([[graft.ops.Similarity.annIvfWith]] with FIXED literal centers —
    * the q113 trick extended from assignment to the full search):
    * the 8 lowest-vec_id embeddings are the quantizer, queries probe
    * their 3 nearest cells (squared-L2, ties to lower index), the
    * corpus assigns top-1, candidates join on cell, and exact cosine
    * ranks top-5 per query. The oracle re-derives cell distances, both
    * probe/assign ranks, the candidate join, self-exclusion, and the
    * cosine rank from DuckDB's own list arithmetic — value-pinning the
    * last big ANN machine that was rows-only (q44/q121 keep the
    * trained path under SimilaritySpec recall floors). */
  val q226IvfProbeRank: Q = q("q226_ivf_probe_rank",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
      |  FROM embeddings),
      |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      |      FROM e ORDER BY vec_id LIMIT 8),
      |qd AS (SELECT e.vec_id AS q_id, e.v AS qe, c.cid,
      |        list_sum(list_transform(range(1, len(e.v) + 1),
      |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
      |      FROM e CROSS JOIN c WHERE e.vec_id < 10),
      |qc AS (SELECT q_id, qe, cid FROM (SELECT *, row_number()
      |    OVER (PARTITION BY q_id ORDER BY dist, cid) AS rn FROM qd)
      |  WHERE rn <= 3),
      |cd AS (SELECT e.vec_id AS c_id, e.label, e.v AS ce, c.cid,
      |        list_sum(list_transform(range(1, len(e.v) + 1),
      |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
      |      FROM e CROSS JOIN c),
      |cc AS (SELECT c_id, label, ce, cid FROM (SELECT *, row_number()
      |    OVER (PARTITION BY c_id ORDER BY dist, cid) AS rn FROM cd)
      |  WHERE rn = 1),
      |sims AS (SELECT q_id, c_id, label,
      |    round(list_dot_product(qe, ce) /
      |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
      |      4) AS cos_sim
      |  FROM qc JOIN cc USING (cid) WHERE q_id <> c_id)
      |SELECT q_id, rnk, c_id, label, cos_sim FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk
      |  FROM sims)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val centers = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .orderBy("vec_id").limit(8)
      .collect().map(_.getSeq[Double](1).toArray)
    Similarity.annIvfWith(queries = emb.filter(col("vec_id") < 10),
        corpus = emb, centers = centers, k = 5, nprobe = 3)
      .orderBy("q_id", "rnk")
  }

  /** Crawl-scheduler capstone — the full "when do we fetch what, at
    * what cost" planning pass over the round-11/12 ops in ONE composed
    * plan: 3xx chains resolved to canonical targets with RELATIVE
    * Location headers ([[graft.ops.WebText.resolveRedirects]]), fetch
    * history re-keyed onto the resolved final URL (a recrawl of a
    * redirecting URL is a fetch of its target), change-rate revisit
    * scheduling ([[graft.ops.WebText.revisitSchedule]]), a due-now
    * horizon filter, per-host robots crawl delays
    * ([[graft.ops.Robots.parseCrawlDelays]]) feeding the politeness
    * slot schedule ([[graft.ops.Robots.politenessSchedule]]), and an
    * exact largest-remainder fetch-budget split over the due counts
    * ([[graft.ops.Curation.allocateBudget]]). The oracle re-derives
    * every stage — the redirect targets from the moduli, the merged
    * history aggregates, the floor-division interval clamp, the
    * horizon, the per-host delay, max slot offset, and the HUGEINT
    * allocation — so a drift in ANY of the six composed ops
    * hash-diverges. */
  val q227CrawlScheduler: Q = q("q227_crawl_scheduler",
    """WITH d AS (SELECT doc_id, source,
      |    CAST(doc_id % 4 AS INT) AS m4 FROM documents),
      |f AS (SELECT doc_id, source,
      |    'http://' || source || '.org/p/' ||
      |      CAST(CASE WHEN m4 = 1 THEN doc_id + 1 ELSE doc_id END
      |        AS VARCHAR) AS final_url
      |  FROM d),
      |hist AS (SELECT final_url AS url,
      |    CAST(0 AS BIGINT) AS ts, FALSE AS ch FROM f
      |  UNION ALL SELECT final_url,
      |    CAST(3600000 * (1 + doc_id % 5) AS BIGINT),
      |    doc_id % 2 = 0 FROM f),
      |rv AS (SELECT url, count(*) AS n_fetches,
      |    CAST(sum(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
      |    max(ts) - min(ts) AS span, max(ts) AS last_fetch
      |  FROM hist GROUP BY url),
      |iv AS (SELECT url, last_fetch,
      |    least(greatest(span // greatest(n_changes, 1), 3600000),
      |      2592000000) AS interval_ms FROM rv),
      |due AS (SELECT url, regexp_extract(url, '^http://([^/]+)/', 1) AS host
      |  FROM iv WHERE last_fetch + interval_ms <= 28800000),
      |del AS (SELECT DISTINCT source || '.org' AS host,
      |    CAST((length(source) % 3 + 1) * 1000 AS BIGINT) AS delay_ms
      |  FROM d),
      |agg AS (SELECT host, CAST(count(*) AS BIGINT) AS n_due FROM due
      |  GROUP BY host),
      |sch AS (SELECT agg.host, n_due, delay_ms,
      |    (n_due - 1) * delay_ms AS max_offset_ms
      |  FROM agg JOIN del ON agg.host = del.host),
      |t AS (SELECT CAST(sum(n_due) AS HUGEINT) AS tw FROM sch),
      |b AS (SELECT host, n_due, delay_ms, max_offset_ms,
      |    CAST((9973::HUGEINT * n_due) // tw AS BIGINT) AS base,
      |    (9973::HUGEINT * n_due) % tw AS rem FROM sch, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk,
      |    CAST(9973 - sum(base) OVER () AS BIGINT) AS extra FROM b)
      |SELECT host, n_due, delay_ms, max_offset_ms,
      |  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc
      |FROM r ORDER BY host""".stripMargin) { (s, d) =>
    import graft.ops.Curation
    val m4 = col("doc_id") % 4
    def u(id: Column): Column = concat(lit("http://"), col("source"),
      lit(".org/p/"), id.cast("string"))
    val docs = Tables.documents(s, d)
    // stage 1: captured responses; m4=1 rows 301 onto their successor
    // via a ROOT-RELATIVE Location (the RFC 9110 form)
    val responses = docs.select(col("doc_id"), col("source"),
      u(col("doc_id")).as("url"),
      when(m4 === 1, 301).otherwise(200).as("status_code"),
      when(m4 === 1, concat(lit("/p/"), (col("doc_id") + 1).cast("string")))
        .otherwise(lit("")).as("location"))
    val resolved = WebText.resolveRedirects(responses, maxHops = 4)
      .select(col("url"), col("final_url"))
    // stage 2: fetch history of the ORIGINAL capture URLs, re-keyed to
    // the canonical target by the redirect map
    val hist0 = docs.select(u(col("doc_id")).as("url"), lit(0L).as("ts"),
        lit(false).as("changed"))
      .unionAll(docs.select(u(col("doc_id")).as("url"),
        (lit(3600000L) * (col("doc_id") % 5 + 1)).as("ts"),
        (col("doc_id") % 2 === 0).as("changed")))
    val hist = hist0.join(resolved, Seq("url"))
      .select(col("final_url").as("url"),
        col("ts").as("fetch_ts_ms"), col("changed"))
    // stage 3+4: revisit schedule, due-now horizon (8h)
    val due = WebText.revisitSchedule(hist)
      .filter(col("next_fetch_ms") <= 28800000L)
      .select(col("url"),
        regexp_extract(col("url"), "^http://([^/]+)/", 1).as("host"))
    // stage 5: per-host robots crawl delays
    val robots = docs.select(col("source")).distinct()
      .select(concat(col("source"), lit(".org")).as("host"),
        concat(lit("User-agent: *\nCrawl-delay: "),
          (length(col("source")) % 3 + 1).cast("string"),
          lit("\nDisallow: /tmp\n")).as("robots_txt"))
    val delays = Robots.parseCrawlDelays(robots, "graftbot")
    // stage 6: politeness slots → per-host rollup → exact budget split
    val sched = Robots.politenessSchedule(due, delays)
    val agg = sched.groupBy("host").agg(
      count(lit(1)).as("n_due"),
      max(col("delay_ms")).as("delay_ms"),
      max(col("fetch_offset_ms")).as("max_offset_ms"))
    Curation.allocateBudget(agg, "host", "n_due", budget = 9973L)
      .select("host", "n_due", "delay_ms", "max_offset_ms", "alloc")
      .orderBy("host")
  }

  /** RFC 9309 wildcard robots rules
    * ([[graft.ops.Robots.isAllowed]] over the full §2.2.3 rule
    * language): every host publishes a group disallowing star-dot-php
    * with an end anchor, allowing `pub`-prefixed php with a longer
    * rule, and disallowing the plain `/tmp` prefix; five planted path
    * cohorts exercise the `$` end anchor (a query string defeats it),
    * the `*` span, the most-octets allow-beats-shorter-disallow
    * precedence, the plain-prefix reduction, and the no-match default.
    * GROUND-TRUTH oracle: the expected verdict per cohort is spelled
    * out from the moduli. */
  val q228RobotsWildcards: Q = q("q228_robots_wildcards",
    """WITH t AS (SELECT doc_id, source, CAST(doc_id % 5 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN '/a' || CAST(doc_id AS VARCHAR) || '.php'
      |    WHEN 1 THEN '/a' || CAST(doc_id AS VARCHAR) || '.php?q=1'
      |    WHEN 2 THEN '/pub' || CAST(doc_id AS VARCHAR) || '.php'
      |    WHEN 3 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
      |    ELSE '/ok/' || CAST(doc_id AS VARCHAR) END AS path,
      |  m IN (1, 2, 4) AS allowed
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 5
    val path = when(m === 0,
        concat(lit("/a"), col("doc_id").cast("string"), lit(".php")))
      .when(m === 1,
        concat(lit("/a"), col("doc_id").cast("string"), lit(".php?q=1")))
      .when(m === 2,
        concat(lit("/pub"), col("doc_id").cast("string"), lit(".php")))
      .when(m === 3, concat(lit("/tmp/"), col("doc_id").cast("string")))
      .otherwise(concat(lit("/ok/"), col("doc_id").cast("string")))
    val urls = Tables.documents(s, d).select(col("doc_id"),
      concat(col("source"), lit(".org")).as("host"), path.as("path"))
    val robots = Tables.documents(s, d).select(col("source")).distinct()
      .select(concat(col("source"), lit(".org")).as("host"),
        lit("User-agent: *\nDisallow: /*.php$\nAllow: /pub*.php$\n" +
          "Disallow: /tmp\n").as("robots_txt"))
    Robots.isAllowed(urls, Robots.parseRobots(robots), "graftbot")
      .select("doc_id", "path", "allowed")
      .orderBy("doc_id")
  }

  /** Longest-match suffix-TABLE registered domain
    * ([[graft.ops.WebText.registeredDomainByTable]] — the
    * full-publicsuffix.org deployment path, FULL rule semantics):
    * twelve planted host shapes covering a 3-label suffix under a deep
    * subdomain (`school.act.edu.au`), a host that IS its 3-label
    * suffix, the US k12 district class, 2-label suffixes with and
    * without extra labels, the plain-TLD fallback, a single-label
    * host, and the publicsuffix wildcard/exception algebra — `*.ck`
    * (every label under `ck` is itself a suffix), `!www.ck` (the
    * exception that beats the wildcard, at depth), `*.nom.br` (a
    * wildcard whose base is already 2 labels), and a host that IS a
    * wildcard-covered suffix exactly. GROUND-TRUTH oracle (expected
    * domains spelled out); WebTextSpec additionally pins table≡regex
    * equivalence on every 2-label rule. */
  val q229PslTable: Q = q("q229_psl_table",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 12 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN 'school.act.edu.au' WHEN 1 THEN 'act.edu.au'
      |    WHEN 2 THEN 'district.k12.ca.us' WHEN 3 THEN 'shop.com.cn'
      |    WHEN 4 THEN 'co.uk' WHEN 5 THEN 'example.fr'
      |    WHEN 6 THEN 'example.org' WHEN 7 THEN 'localhost'
      |    WHEN 8 THEN 'b.foo.ck' WHEN 9 THEN 'www.ck'
      |    WHEN 10 THEN 'a.smith.nom.br' ELSE 'foo.ck' END AS domain
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val m = col("doc_id") % 12
    val url = when(m === 0, lit("http://www.deep.school.act.edu.au/x"))
      .when(m === 1, lit("http://act.edu.au/"))
      .when(m === 2, lit("https://portal.district.k12.ca.us:8080/y"))
      .when(m === 3, lit("http://a.b.shop.com.cn/z"))
      .when(m === 4, lit("http://co.uk/")) // host == its own suffix
      .when(m === 5, lit("http://deep.example.fr/p"))
      .when(m === 6, lit("http://a.b.example.org/q")) // plain-TLD rule
      .when(m === 7, lit("http://localhost/r"))
      // *.ck: the * consumes `foo`, suffix = foo.ck, domain takes one more
      .when(m === 8, lit("http://a.b.foo.ck/w"))
      // !www.ck beats *.ck even from a deeper subdomain
      .when(m === 9, lit("http://deep.www.ck/e"))
      // *.nom.br: 3-label effective suffix smith.nom.br
      .when(m === 10, lit("http://x.a.smith.nom.br/n"))
      // host IS a wildcard-covered suffix → returns itself
      .otherwise(lit("http://foo.ck/"))
    val rules = WebText.suffixTable(s)
      .unionAll(Seq("*.ck", "!www.ck", "*.nom.br").toDF("suffix"))
    WebText.registeredDomainByTable(
        Tables.documents(s, d).select(col("doc_id"), url.as("url")),
        "url", rules)
      .select("doc_id", "domain").orderBy("doc_id")
  }

  /** Percent-encoding normalization + canonical-URL dedup key
    * ([[graft.ops.WebText.normalizePercent]] →
    * [[graft.ops.WebText.canonicalUrl]]): five planted encoding
    * variants of one logical URL — tilde raw, `%7E`, `%7e`, an
    * encoded-unreserved letter (`%75ser` → `user`), and a reserved
    * `%2f` that must NOT decode but must uppercase — plus a malformed
    * `%zz` cohort that must pass through verbatim. The composed key
    * collapses the first four variants to ONE canonical URL (the
    * dedup-key argument) while the reserved and malformed cohorts stay
    * distinct. GROUND-TRUTH oracle from the moduli. */
  val q230PctNormalize: Q = q("q230_pct_normalize",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 6 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN m IN (0, 1, 2, 3)
      |    THEN 'http://h.org/~user/p'
      |    WHEN m = 4 THEN 'http://h.org/a%2Fb'
      |    ELSE 'http://h.org/%zz' END AS url_key
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 6
    val raw = when(m === 0, lit("http://h.org/~user/p"))
      .when(m === 1, lit("HTTP://h.org/%7Euser/p"))
      .when(m === 2, lit("http://h.org/%7euser/p"))
      .when(m === 3, lit("http://h.org/~%75ser/p"))
      .when(m === 4, lit("http://h.org/a%2fb"))
      .otherwise(lit("http://h.org/%zz"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        WebText.canonicalUrl(WebText.normalizePercent(raw)).as("url_key"))
      .orderBy("doc_id")
  }

  /** Page-metadata extraction ([[graft.ops.WebText.pageMetadata]]):
    * title / description / OpenGraph fields over four planted cohorts —
    * full set with entities + folded whitespace and a `descriptionx`
    * decoy meta that must NOT match, title-only, OG-only in the
    * content-first attribute order, and a bare page. GROUND-TRUTH
    * oracle: expected strings per cohort. */
  val q231PageMeta: Q = q("q231_page_meta",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN m = 0 THEN 'T & U ' || CAST(doc_id AS VARCHAR)
      |       WHEN m = 1 THEN 'Only Title' ELSE '' END AS title,
      |  CASE WHEN m = 0 THEN 'a "quoted" summary' ELSE '' END
      |    AS description,
      |  CASE WHEN m = 0 THEN 'OG ' || CAST(doc_id AS VARCHAR)
      |       WHEN m = 2 THEN 'CF og title' ELSE '' END AS og_title,
      |  CASE WHEN m = 2 THEN 'cf og desc' ELSE '' END AS og_description
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 4
    val html = when(m === 0, concat(
        lit("<html><head><title>\n  T &amp; U   "),
        col("doc_id").cast("string"),
        lit("</title><meta name=\"descriptionx\" content=\"decoy\">" +
          "<meta name=\"description\" " +
          "content=\"a &quot;quoted&quot; summary\">" +
          "<meta content=\"OG "),
        col("doc_id").cast("string"),
        lit("\" property=\"og:title\"></head><body>b</body></html>")))
      .when(m === 1, lit("<title>Only Title</title><p>x</p>"))
      .when(m === 2, lit("<meta content=\"CF og title\" " +
        "property='og:title'><meta content=\"cf og desc\" " +
        "property=og:description><p>y</p>"))
      .otherwise(lit("<html><body>plain</body></html>"))
    WebText.pageMetadata(
        Tables.documents(s, d).select(col("doc_id"), html.as("html")))
      .select("doc_id", "title", "description", "og_title",
        "og_description")
      .orderBy("doc_id")
  }

  /** Conditional-revalidation plan ([[graft.ops.Http.etag]] /
    * `lastModified` → [[graft.ops.WebText.revalidationPlan]]): three
    * response cohorts — both validators present (If-None-Match must
    * win, weak `W/` tag kept verbatim), Last-Modified only
    * (If-Modified-Since), and neither (full refetch). GROUND-TRUTH
    * oracle from the moduli. */
  val q232Revalidation: Q = q("q232_revalidation",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN m = 0 THEN 'W/"v' || CAST(doc_id AS VARCHAR) || '"'
      |       ELSE '' END AS etag,
      |  CASE WHEN m <= 1 THEN 'Tue, 01 Jul 2025 00:00:0' ||
      |    CAST(doc_id % 10 AS VARCHAR) || ' GMT' ELSE '' END
      |    AS last_modified,
      |  CASE WHEN m <= 1 THEN 'conditional' ELSE 'full' END AS fetch_mode,
      |  CASE WHEN m = 0 THEN 'if-none-match'
      |       WHEN m = 1 THEN 'if-modified-since' ELSE '' END
      |    AS precondition_header,
      |  CASE WHEN m = 0 THEN 'W/"v' || CAST(doc_id AS VARCHAR) || '"'
      |       WHEN m = 1 THEN 'Tue, 01 Jul 2025 00:00:0' ||
      |         CAST(doc_id % 10 AS VARCHAR) || ' GMT'
      |       ELSE '' END AS precondition_value
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 3
    val payload = concat(
      lit("HTTP/1.1 200 OK\r\nServer: synth\r\n"),
      when(m === 0, concat(lit("ETag: W/\"v"), col("doc_id").cast("string"),
        lit("\"\r\n"))).otherwise(lit("")),
      when(m <= 1, concat(lit("Last-Modified: Tue, 01 Jul 2025 00:00:0"),
        (col("doc_id") % 10).cast("string"), lit(" GMT\r\n")))
        .otherwise(lit("")),
      lit("Content-Type: text/html\r\n\r\n<p>body</p>"))
    val prev = Tables.documents(s, d).select(col("doc_id"),
      graft.ops.Http.etag(payload).as("etag"),
      graft.ops.Http.lastModified(payload).as("last_modified"))
    WebText.revalidationPlan(prev)
      .select("doc_id", "etag", "last_modified", "fetch_mode",
        "precondition_header", "precondition_value")
      .orderBy("doc_id")
  }

  /** Gzipped sitemap ingestion
    * ([[graft.ops.Warc.gunzipTextColumn]] →
    * [[graft.ops.WebText.sitemapEntries]] behind the q220 two-level
    * layout): the child sitemaps are shipped as `.xml.gz` payloads —
    * synthesized with the JVM gzip writer, inflated by the library's
    * RFC 1952 member walk — while the index stays plain XML, the mixed
    * fetch reality. The oracle is the SAME ground truth as q220
    * (every row reconstructed from source rows and moduli), so the
    * compression must be perfectly transparent end to end — the q188
    * proof applied to the sitemap path. */
  val q225GzipSitemap: Q = q("q225_gzip_sitemap",
    """SELECT source AS host,
      |  'http://' || source || '.org/sitemap' ||
      |    CAST(doc_id % 3 AS VARCHAR) || '.xml.gz' AS sitemap_loc,
      |  'http://' || source || '.org/p/' || CAST(doc_id AS VARCHAR) AS loc
      |FROM documents ORDER BY host, sitemap_loc, loc""".stripMargin) { (s, d) =>
    import s.implicits._
    val base = Tables.documents(s, d)
    val entry = concat(lit("<url>\n <loc> http://"), col("source"),
      lit(".org/p/"), col("doc_id").cast("string"), lit(" </loc>\n</url>"))
    val children = base
      .groupBy(col("source").as("host"),
        (col("doc_id") % 3).cast("string").as("shard"))
      .agg(concat(lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
        array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), entry.as("e")))),
          x => x.getField("e")), "\n"), lit("\n</urlset>")).as("xml"))
      .withColumn("child_loc", concat(lit("http://"), col("host"),
        lit(".org/sitemap"), col("shard"), lit(".xml.gz")))
    // ship each child as one gzip member (deterministic: fixed JVM gzip
    // header + DEFLATE, the syntheticWarcGzipChunks argument)
    val gz = children.select(col("child_loc"),
        encode(col("xml"), "UTF-8").as("b"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (k, rec) =>
        val out = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(rec); g.close()
        (k, out.toByteArray)
      }).toDF("child_loc", "gz")
    val inflated = Warc.gunzipTextColumn(s, gz, "child_loc", "gz", "xml")
      .filter(col("valid"))
    val index = children
      .groupBy(col("host").as("ix_host"))
      .agg(concat(lit("<sitemapindex>\n"),
        array_join(transform(array_sort(collect_list(struct(
          col("child_loc"),
          concat(lit("<sitemap>\n <loc> "), col("child_loc"),
            lit(" </loc>\n</sitemap>")).as("e")))),
          x => x.getField("e")), "\n"), lit("\n</sitemapindex>")).as("ixml"))
    val fanout = index.select(col("ix_host"),
        explode(WebText.sitemapIndexEntries(col("ixml"))).as("sm"))
      .select(col("ix_host").as("host"), col("sm.loc").as("sitemap_loc"))
    fanout.join(inflated,
        fanout("sitemap_loc") === inflated("child_loc"))
      .select(col("host"), col("sitemap_loc"),
        explode(WebText.sitemapEntries(col("xml"))).as("u"))
      .select(col("host"), col("sitemap_loc"), col("u.loc").as("loc"))
      .orderBy("host", "sitemap_loc", "loc")
  }

  /** Expanded public-suffix table
    * ([[graft.ops.WebText.registeredDomain]] over
    * `MultiLabelSuffixGroups`): eight planted host shapes — `com.cn`,
    * `co.kr` (with a port), `com.mx` under deep subdomains, `gov.uk`,
    * a plain ccTLD, a plain gTLD, `com.br`, and a bare three-label
    * `ac.th` — each mapped to its hand-derived eTLD+1. GROUND-TRUTH
    * oracle (expected domains spelled out), so a regression anywhere
    * in the generated alternation, the `www.` strip, or the port stop
    * diverges; the regex itself is exercised against DuckDB's RE2 by
    * the q143/q167/q175/q195 splices. */
  val q224PslDomains: Q = q("q224_psl_domains",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN 'shop.com.cn' WHEN 1 THEN 'news.co.kr'
      |    WHEN 2 THEN 'portal.com.mx' WHEN 3 THEN 'site.gov.uk'
      |    WHEN 4 THEN 'example.fr' WHEN 5 THEN 'onetld.com'
      |    WHEN 6 THEN 'example.com.br' ELSE 'x.ac.th' END AS domain
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 8
    val url = when(m === 0, lit("http://www.shop.com.cn/x"))
      .when(m === 1, lit("https://news.co.kr:8443/y?a=1"))
      .when(m === 2, lit("http://a.b.portal.com.mx/"))
      .when(m === 3, lit("http://deep.sub.site.gov.uk/z"))
      .when(m === 4, lit("http://plain.example.fr/p"))
      .when(m === 5, lit("http://www.onetld.com/q"))
      .when(m === 6, lit("http://blog.example.com.br/r"))
      .otherwise(lit("http://x.ac.th/w"))
    Tables.documents(s, d)
      .select(col("doc_id"), WebText.registeredDomain(url).as("domain"))
      .orderBy("doc_id")
  }

  val q223MetaCharset: Q = q("q223_meta_charset",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS m, text
      |  FROM documents WHERE text IS NOT NULL),
      |h AS (SELECT doc_id, m, '<html><head>' ||
      |  CASE m WHEN 0 THEN '<meta charset="iso-8859-1">'
      |    WHEN 1 THEN '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
      |    WHEN 2 THEN '<meta content="text/html; charset=utf-8" http-equiv=''Content-Type''>'
      |    WHEN 3 THEN '<meta name="description" content="discusses charset=utf-16 here">'
      |    ELSE '' END ||
      |  '</head><body><p>' || text || ' café ñ über</p></body></html>'
      |    AS html FROM t)
      |SELECT doc_id, 200 AS status_code, 'text/html' AS content_type,
      |  CASE WHEN m IN (0, 1) THEN 'iso-8859-1'
      |       WHEN m = 2 THEN 'utf-8' ELSE '' END AS charset,
      |  html AS text, TRUE AS valid
      |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 5
    val metaTag = when(m === 0, lit("<meta charset=\"iso-8859-1\">"))
      .when(m === 1, lit("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=iso-8859-1\">"))
      .when(m === 2, lit("<meta content=\"text/html; charset=utf-8\" " +
        "http-equiv='Content-Type'>"))
      .when(m === 3, lit("<meta name=\"description\" " +
        "content=\"discusses charset=utf-16 here\">"))
      .otherwise(lit(""))
    val html = concat(lit("<html><head>"), metaTag,
      lit("</head><body><p>"), col("text"),
      lit(" café ñ über</p></body></html>"))
    val bodyBytes = when(m.isin(0, 1), encode(html, "ISO-8859-1"))
      .otherwise(encode(html, "UTF-8"))
    val httpBytes = concat(
      encode(lit("HTTP/1.1 200 OK\r\nServer: synth\r\n" +
        "Content-Type: text/html\r\n\r\n"), "UTF-8"),
      bodyBytes)
    val chunks = binaryWarcChunks(Tables.documents(s, d),
      httpWarcRecordBytes(httpBytes))
    Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid"))
      .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long")
        .as("doc_id"), col("status_code"), col("content_type"),
        col("charset"), col("text"), col("valid"))
      .orderBy("doc_id")
  }

  /** Canonical-link consolidation
    * ([[graft.ops.WebText.canonicalTargets]], RFC 6596): five planted
    * cohorts — href-first absolute self-canonical on a tracking-param
    * URL (is_self must survive the [[graft.ops.WebText.canonicalUrl]]
    * normalization), relative canonical resolved against a relative
    * `<base href>`, a rel TOKEN LIST with `&amp;` decode, a decoy page
    * (`canonicalx` / `x-canonical` / rel-less `<link>` / `<a
    * rel=canonical>` — none may match), and a bare page. GROUND-TRUTH
    * oracle: expected targets spelled out per cohort. */
  val q233CanonicalLink: Q = q("q233_canonical_link",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS m,
      |  CAST(doc_id AS VARCHAR) AS i FROM documents)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN 'http://s0.org/p' || i
      |         WHEN 1 THEN 'http://s1.org/root/art' || i
      |         WHEN 2 THEN 'http://s2.org/y?a=' || i || '&b=2'
      |         WHEN 3 THEN 'http://s3.org/z' || i
      |         ELSE 'http://s4.org/q' || i END AS canonical_target,
      |  m IN (0, 1, 2) AS has_canonical,
      |  m IN (0, 3, 4) AS is_self
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 5
    val i = col("doc_id").cast("string")
    val url = when(m === 0, concat(lit("http://s0.org/p"), i,
        lit("?utm_source=x")))
      .when(m === 1, concat(lit("http://s1.org/dir/page"), i))
      .when(m === 2, concat(lit("http://s2.org/x"), i))
      .when(m === 3, concat(lit("http://s3.org/z"), i))
      .otherwise(concat(lit("http://s4.org/q"), i))
    val html = when(m === 0, concat(lit("<link href=\"http://s0.org/p"), i,
        lit("\" rel=\"canonical\"><p>t</p>")))
      .when(m === 1, concat(
        lit("<base href=\"/root/\"><link rel=canonical href='art"), i,
        lit("'>")))
      .when(m === 2, concat(
        lit("<link rel=\"nofollow canonical\" href=\"http://s2.org/y?a="),
        i, lit("&amp;b=2\">")))
      .when(m === 3,
        lit("<link rel=\"canonicalx\" href=\"http://evil.com/1\">" +
          "<link rel='x-canonical' href=\"http://evil.com/2\">" +
          "<link href=\"http://evil.com/3\">" +
          "<a rel=\"canonical\" href=\"http://evil.com/4\">t</a>"))
      .otherwise(lit("<p>plain</p>"))
    WebText.canonicalTargets(Tables.documents(s, d)
        .select(col("doc_id"), url.as("url"), html.as("html")))
      .select("doc_id", "canonical_target", "has_canonical", "is_self")
      .orderBy("doc_id")
  }

  /** hreflang alternate extraction
    * ([[graft.ops.WebText.hreflangLinks]]): every page declares three
    * language variants — `EN-US` (case-folds to `en-us`), `de` in the
    * href-first attribute order, and `x-default` — plus a
    * `rel="stylesheet"` hreflang decoy that must NOT match. One row
    * per (page, variant); GROUND-TRUTH oracle builds the identical
    * rows from a VALUES table. */
  val q234Hreflang: Q = q("q234_hreflang",
    """WITH langs(hl) AS (VALUES ('de'), ('en-us'), ('x-default'))
      |SELECT doc_id, hl AS lang,
      |  'http://h' || CAST(doc_id AS VARCHAR) || '.org/' ||
      |    CASE hl WHEN 'x-default' THEN '' ELSE hl END AS href
      |FROM documents, langs ORDER BY doc_id, hl""".stripMargin) { (s, d) =>
    val i = col("doc_id").cast("string")
    val html = concat(
      lit("<link rel=\"alternate\" hreflang=\"EN-US\" href=\"http://h"), i,
      lit(".org/en-us\">" +
        "<link hreflang=\"de\" href=\"http://h"), i,
      lit(".org/de\" rel=\"alternate\">" +
        "<link rel=\"alternate\" hreflang=\"x-default\" href=\"http://h"), i,
      lit(".org/\">" +
        "<link rel=\"stylesheet\" hreflang=\"fr\" href=\"http://h"), i,
      lit(".org/css\">"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(WebText.hreflangLinks(html)).as("x"))
      .select(col("doc_id"), col("x.lang").as("lang"),
        col("x.href").as("href"))
      .orderBy("doc_id", "lang")
  }

  /** Feed discovery ([[graft.ops.WebText.feedLinks]]): three cohorts —
    * RSS only (plus a `text/html` mobile-alternate decoy), Atom only
    * (uppercase MIME, scrambled attribute order, unquoted rel), and
    * both feeds on one page. One row per declared feed; GROUND-TRUTH
    * oracle unions the expected rows per cohort. */
  val q235FeedDiscovery: Q = q("q235_feed_discovery",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
      |  CAST(doc_id AS VARCHAR) AS i FROM documents)
      |SELECT doc_id, 'rss' AS feed_type,
      |  'http://f' || i || '.org/rss' AS href FROM t WHERE m IN (0, 2)
      |UNION ALL
      |SELECT doc_id, 'atom', 'http://f' || i || '.org/atom'
      |FROM t WHERE m IN (1, 2)
      |ORDER BY doc_id, feed_type""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 3
    val i = col("doc_id").cast("string")
    val rss = concat(
      lit("<link rel=\"alternate\" type=\"application/rss+xml\" " +
        "href=\"http://f"), i, lit(".org/rss\">" +
        "<link rel=\"alternate\" type=\"text/html\" href=\"http://m.f"), i,
      lit(".org/\">"))
    val atom = concat(
      lit("<link type=\"APPLICATION/ATOM+XML\" rel=alternate " +
        "href=\"http://f"), i, lit(".org/atom\">"))
    val html = when(m === 0, rss).when(m === 1, atom)
      .otherwise(concat(rss, atom))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(WebText.feedLinks(html)).as("x"))
      .select(col("doc_id"), col("x.feed_type").as("feed_type"),
        col("x.href").as("href"))
      .orderBy("doc_id", "feed_type")
  }

  /** Feed-entry parsing ([[graft.ops.WebText.feedEntries]]): even docs
    * ship an RSS 2.0 channel (two `<item>`s — entity-bearing title,
    * text `<link>` with padding whitespace, one item missing
    * `<pubDate>`), odd docs an Atom feed (two `<entry>`s — the first
    * carries BOTH `<published>` and `<updated>` and `updated` must
    * win, `&amp;` decode in the link href). The channel/feed titles
    * must never leak into entries. GROUND-TRUTH oracle from the
    * moduli. */
  val q236FeedEntries: Q = q("q236_feed_entries",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS m,
      |  CAST(doc_id AS VARCHAR) AS i FROM documents),
      |  k(j) AS (VALUES (0), (1))
      |SELECT doc_id,
      |  CASE WHEN m = 0 THEN 'A & B ' ELSE 'E ' END || i || '.' ||
      |    CAST(j AS VARCHAR) AS title,
      |  CASE WHEN m = 0 THEN 'http://r' ELSE 'http://a' END || i ||
      |    '.org/' || CAST(j AS VARCHAR) ||
      |    CASE WHEN m = 1 AND j = 0 THEN '?x=1&y=2' ELSE '' END AS link,
      |  CASE WHEN m = 0 AND j = 0 THEN 'Tue, 01 Jul 2025 00:00:00 GMT'
      |       WHEN m = 0 THEN ''
      |       WHEN j = 0 THEN '2025-02-02T00:00:00Z'
      |       ELSE '2025-03-03T00:00:00Z' END AS published
      |FROM t, k ORDER BY doc_id, link""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 2
    val i = col("doc_id").cast("string")
    val rss = concat(
      lit("<?xml version=\"1.0\"?><rss><channel><title>Chan</title>" +
        "<item><title>A &amp; B "), i,
      lit(".0</title><link> http://r"), i,
      lit(".org/0 </link><pubDate>Tue, 01 Jul 2025 00:00:00 GMT" +
        "</pubDate></item>" +
        "<item><title>A &amp; B "), i,
      lit(".1</title><link>http://r"), i,
      lit(".org/1</link></item></channel></rss>"))
    val atom = concat(
      lit("<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
        "<title>Feed</title>" +
        "<entry><title>  E\n "), i,
      lit(".0 </title><link rel=\"alternate\" href=\"http://a"), i,
      lit(".org/0?x=1&amp;y=2\"/>" +
        "<published>2025-01-01T00:00:00Z</published>" +
        "<updated>2025-02-02T00:00:00Z</updated></entry>" +
        "<entry><title>E "), i,
      lit(".1</title><link href='http://a"), i,
      lit(".org/1'/><published>2025-03-03T00:00:00Z</published>" +
        "</entry></feed>"))
    val xml = when(m === 0, rss).otherwise(atom)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(WebText.feedEntries(xml)).as("e"))
      .select(col("doc_id"), col("e.title").as("title"),
        col("e.link").as("link"), col("e.published").as("published"))
      .orderBy("doc_id", "link")
  }

  /** JSON-LD structured data ([[graft.ops.WebText.structuredData]]):
    * cohort 0 pages carry a full schema.org NewsArticle block
    * (headline, datePublished, nested author.name), a MALFORMED
    * ld+json block (must yield an all-empty row, never an error), and
    * a plain `<script>` decoy (must not be extracted at all); cohort 1
    * a Product block with only `@type`; cohort 2 no structured data
    * (zero rows). GROUND-TRUTH oracle unions the expected rows. */
  val q237JsonLd: Q = q("q237_jsonld",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
      |  CAST(doc_id AS VARCHAR) AS i FROM documents)
      |SELECT doc_id, CAST(0 AS BIGINT) AS block_idx,
      |  'NewsArticle' AS item_type, 'H ' || i AS headline,
      |  '2025-05-05' AS date_published, 'Ada ' || i AS author_name
      |FROM t WHERE m = 0
      |UNION ALL
      |SELECT doc_id, CAST(1 AS BIGINT), '', '', '', '' FROM t WHERE m = 0
      |UNION ALL
      |SELECT doc_id, CAST(0 AS BIGINT), 'Product', '', '', ''
      |FROM t WHERE m = 1
      |ORDER BY doc_id, block_idx""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 3
    val i = col("doc_id").cast("string")
    val news = concat(
      lit("<script type=\"application/ld+json\">" +
        "{\"@type\":\"NewsArticle\",\"headline\":\"H "), i,
      lit("\",\"datePublished\":\"2025-05-05\"," +
        "\"author\":{\"@type\":\"Person\",\"name\":\"Ada "), i,
      lit("\"}}</script>" +
        "<script type=\"application/ld+json\"> not json </script>" +
        "<script>var x = {\"@type\": \"Decoy\"};</script>"))
    val product =
      lit("<script type='application/ld+json'>{\"@type\":\"Product\"}" +
        "</script><p>t</p>")
    val html = when(m === 0, news).when(m === 1, product)
      .otherwise(lit("<p>no structured data</p>"))
    WebText.structuredData(Tables.documents(s, d)
        .select(col("doc_id"), html.as("html")),
        urlCol = "doc_id")
      .select(col("url").as("doc_id"), col("block_idx"), col("item_type"),
        col("headline"), col("date_published"), col("author_name"))
      .orderBy("doc_id", "block_idx")
  }

  /** Canonical-consolidation capstone behind the FULL byte stack:
    * WARC synthesis → member parse → HTTP split → charset decode
    * ([[graft.ops.Warc.parseWarcHttpDocs]]) →
    * [[graft.ops.WebText.canonicalTargets]] → group-by consolidation.
    * Every three consecutive doc_ids form one article cluster — the
    * canonical page (absolute self-canonical), a `?page=2` variant
    * declaring a ROOT-RELATIVE canonical, and an `/amp/` variant
    * declaring it through a `<base href>` — so all three pages
    * collapse onto one `canonical_target` key with exactly one
    * self-declaring member. The oracle re-derives the cluster rollup
    * from doc_id arithmetic alone (the WARC/HTTP layers are proven
    * transparent by q185/q188/q190/q198; the per-form resolution by
    * q233): `n_pages` counts cluster members present in the table,
    * `n_self` the m=0 member. This is the dedup-before-near-dup step
    * a 100 TB pipeline runs first: syndicated/parameterized variants
    * collapse on an O(row) scan key, never reaching the O(pairs)
    * text-similarity stages. */
  val q238CanonicalWarc: Q = q("q238_canonical_warc",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
      |  CAST(doc_id - (doc_id % 3) AS VARCHAR) AS c FROM documents
      |  WHERE text IS NOT NULL)
      |SELECT 'http://cap.org/art/' || c AS canonical_target,
      |  COUNT(*) AS n_pages,
      |  COUNT(*) FILTER (WHERE m = 0) AS n_self
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 3
    val cid = (col("doc_id") - m).cast("string")
    val url = when(m === 0, concat(lit("http://cap.org/art/"), cid))
      .when(m === 1, concat(lit("http://cap.org/art/"), cid,
        lit("?page=2")))
      .otherwise(concat(lit("http://cap.org/amp/"), cid))
    val html = when(m === 0, concat(
        lit("<html><head><link rel=\"canonical\" href=\"http://cap.org/art/"),
        cid, lit("\"></head><body><p>article</p></body></html>")))
      .when(m === 1, concat(
        lit("<html><head><link href=\"/art/"), cid,
        lit("\" rel=\"canonical\"></head><body><p>page 2</p></body></html>")))
      .otherwise(concat(
        lit("<html><head><base href=\"/art/\"><link rel=canonical href='"),
        cid, lit("'></head><body><p>amp</p></body></html>")))
    val httpBytes = concat(
      encode(lit("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n\r\n"), "UTF-8"),
      encode(html, "UTF-8"))
    val chunks = binaryWarcChunks(Tables.documents(s, d),
      httpWarcRecordBytes(httpBytes, url))
    val pages = Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid") && col("content_type") === "text/html")
      .select(col("target_uri").as("url"), col("text").as("html"))
    WebText.canonicalTargets(pages)
      .groupBy("canonical_target")
      .agg(count(lit(1)).as("n_pages"),
        count(when(col("is_self"), 1)).as("n_self"))
      .orderBy("canonical_target")
  }

  /** Discovery-channels capstone — the three URL-discovery channels a
    * crawler runs, composed end to end and merged into one frontier:
    * (1) page out-links extracted in all forms and RFC 3986-resolved
    * ([[graft.ops.WebText.resolvedLinkRows]]); (2) robots.txt
    * `Sitemap:` directives ([[graft.ops.Robots.sitemapUrls]]) → fetch
    * join → [[graft.ops.WebText.sitemapEntries]]; (3) feed
    * declarations discovered on the pages themselves
    * ([[graft.ops.WebText.feedLinks]], RELATIVE href resolved against
    * the page) → fetch join → [[graft.ops.WebText.feedEntries]].
    * Per-host article targets `/p/k` arrive via BOTH links and the
    * sitemap (`channels = 'link,sitemap'`), feed items `/f/j` via the
    * feed alone; already-crawled targets (every `k % 5 = 0` article)
    * anti-join away. The oracle re-derives the per-host distinct
    * target sets and channel labels from doc_id arithmetic alone.
    *
    * Scale shape: every channel is a scan Project (+ the bounded
    * per-host fetch joins — host-cardinality tables, AQE-broadcast);
    * the merge is ONE url-keyed aggregate over (url, channel) rows
    * with map-side combine; the anti-join's right side is the crawled
    * set. No window, no cartesian. */
  val q239Discovery: Q = q("q239_discovery_channels",
    """WITH l AS (SELECT DISTINCT source AS host,
      |    CAST(doc_id % 50 AS INT) AS k FROM documents),
      |  f AS (SELECT DISTINCT source AS host,
      |    CAST(doc_id % 20 AS INT) AS j FROM documents)
      |SELECT url, channels, n_channels FROM (
      |  SELECT 'http://' || host || '.org/p/' || CAST(k AS VARCHAR) AS url,
      |    'link,sitemap' AS channels, CAST(2 AS BIGINT) AS n_channels
      |  FROM l WHERE k % 5 <> 0
      |  UNION ALL
      |  SELECT 'http://' || host || '.org/f/' || CAST(j AS VARCHAR),
      |    'feed', CAST(1 AS BIGINT) FROM f) t
      |ORDER BY url""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d)
    val host = col("source")
    val pages = base.select(col("doc_id"),
      concat(lit("http://"), host, lit(".org/page/"),
        col("doc_id").cast("string")).as("url"),
      concat(lit("<link rel=\"alternate\" type=\"application/rss+xml\" " +
          "href=\"/feed.xml\"><p>body</p><a href=\"/p/"),
        (col("doc_id") % 50).cast("string"), lit("\">t</a>")).as("html"))
    val linkCh = WebText.resolvedLinkRows(pages, "url", "html")
      .select(col("link").as("url"), lit("link").as("channel"))
    val robots = base.select(host.as("host")).distinct()
      .select(col("host"), concat(lit("User-agent: *\nDisallow:\n" +
        "Sitemap: http://"), col("host"), lit(".org/sm.xml\n"))
        .as("robots_txt"))
    val smXml = base
      .select(host.as("sm_host"), (col("doc_id") % 50).cast("int").as("k"))
      .distinct()
      .groupBy("sm_host")
      .agg(concat(lit("<urlset>"), array_join(transform(
        array_sort(collect_list(struct(col("k"),
          concat(lit("<url><loc>http://"), col("sm_host"), lit(".org/p/"),
            col("k").cast("string"), lit("</loc></url>")).as("e")))),
        x => x.getField("e")), ""), lit("</urlset>")).as("xml"))
      .withColumn("sm_loc", concat(lit("http://"), col("sm_host"),
        lit(".org/sm.xml")))
    val smCh = Robots.sitemapUrls(robots)
      .join(smXml, col("sitemap_url") === col("sm_loc"))
      .select(explode(WebText.sitemapEntries(col("xml"))).as("u"))
      .select(col("u.loc").as("url"), lit("sitemap").as("channel"))
    val feedDecl = pages
      .select(col("url"), explode(WebText.feedLinks(col("html"))).as("fl"))
      .select(WebText.resolveUrl(col("url"), col("fl.href"))
        .as("feed_url"))
      .distinct()
    val feedXml = base
      .select(host.as("f_host"), (col("doc_id") % 20).cast("int").as("j"))
      .distinct()
      .groupBy("f_host")
      .agg(concat(lit("<rss><channel><title>c</title>"),
        array_join(transform(array_sort(collect_list(struct(col("j"),
          concat(lit("<item><title>t</title><link>http://"), col("f_host"),
            lit(".org/f/"), col("j").cast("string"),
            lit("</link></item>")).as("e")))),
          x => x.getField("e")), ""), lit("</channel></rss>")).as("xml"))
      .withColumn("feed_loc", concat(lit("http://"), col("f_host"),
        lit(".org/feed.xml")))
    val feedCh = feedDecl
      .join(feedXml, col("feed_url") === col("feed_loc"))
      .select(explode(WebText.feedEntries(col("xml"))).as("e"))
      .select(col("e.link").as("url"), lit("feed").as("channel"))
    val crawled = base
      .select(concat(lit("http://"), host, lit(".org/p/"),
        (col("doc_id") % 50).cast("string")).as("url"))
      .filter((col("doc_id") % 50) % 5 === 0)
      .distinct()
    linkCh.union(smCh).union(feedCh)
      .join(crawled, Seq("url"), "left_anti")
      .groupBy("url")
      .agg(sort_array(collect_set(col("channel"))).as("graft_ch"))
      .select(col("url"), array_join(col("graft_ch"), ",").as("channels"),
        size(col("graft_ch")).cast("long").as("n_channels"))
      .orderBy("url")
  }

  /** HTTP transfer/content coding layers ([[graft.ops.Http]] byte
    * path): WARC records synthesized with five response cohorts —
    * identity; `Content-Encoding: gzip` with a DECLARED latin-1
    * charset (the gunzip must run before the charset decode, and the
    * accents round-trip only if both layers fire in order);
    * `Transfer-Encoding: chunked` split mid-word with a chunk
    * extension; chunked WRAPPING gzip (RFC 9112 §6.1 layering —
    * de-chunk first, then gunzip); and an unsupported `br` coding
    * whose body ships as plain bytes (the raw-passthrough contract:
    * a capture the crawler already decoded round-trips unharmed).
    * The gzip bytes come from the JVM writer (the q188/q225
    * determinism argument) and the chunk framing is built in columns
    * (hex sizes from the real byte lengths). The oracle reconstructs
    * every decoded text from the source rows: a decoder that skips a
    * layer, runs them in the wrong order, or sniffs charset from
    * compressed octets hash-diverges. */
  val q240HttpCodings: Q = q("q240_http_codings",
    """SELECT doc_id, 200 AS status_code,
      |  CASE WHEN doc_id % 5 = 1 THEN 'iso-8859-1' ELSE 'utf-8' END
      |    AS charset,
      |  'Doc ' || CAST(doc_id AS VARCHAR) || ': ' || text ||
      |    CASE WHEN doc_id % 5 = 1 THEN ' café ñ' ELSE '' END AS text
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val m = col("doc_id") % 5
    val docText = concat(lit("Doc "), col("doc_id").cast("string"),
      lit(": "), col("text"),
      when(m === 1, lit(" café ñ")).otherwise(lit("")))
    val rawBody = when(m === 1, encode(docText, "ISO-8859-1"))
      .otherwise(encode(docText, "UTF-8"))
    // stage 1 (JVM writer): gzip the entity for the gzip cohorts
    val staged = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), m.cast("int").as("m"), rawBody.as("b"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, mm, b) =>
        val entity = if (mm == 1 || mm == 3) {
          val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
          val g = new java.util.zip.GZIPOutputStream(out)
          g.write(b); g.close(); out.toByteArray
        } else b
        (id, mm, entity)
      }).toDF("doc_id", "m", "entity")
    // stage 2 (columns): chunk framing from the REAL byte lengths —
    // two chunks split mid-entity, a chunk extension on the first,
    // trailer section after the zero chunk
    val half = floor(length(col("entity")) / 2).cast("int")
    val c1 = expr("substring(entity, 1, int(floor(length(entity) / 2)))")
    val c2 = expr("substring(entity, int(floor(length(entity) / 2)) + 1, " +
      "length(entity))")
    val chunked = concat(
      encode(concat(lower(hex(half)), lit(";x=1\r\n")), "ISO-8859-1"), c1,
      encode(lit("\r\n"), "ISO-8859-1"),
      encode(concat(lower(hex(length(col("entity")) - half)),
        lit("\r\n")), "ISO-8859-1"), c2,
      encode(lit("\r\n0\r\nX-Trailer: t\r\n\r\n"), "ISO-8859-1"))
    val wireBody = when(col("m").isin(2, 3), chunked)
      .otherwise(col("entity"))
    val headers = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html"),
      when(col("m") === 1, lit("; charset=iso-8859-1"))
        .otherwise(lit("; charset=utf-8")),
      lit("\r\n"),
      when(col("m").isin(1, 3), lit("Content-Encoding: gzip\r\n"))
        .otherwise(lit("")),
      when(col("m").isin(2, 3), lit("Transfer-Encoding: chunked\r\n"))
        .otherwise(lit("")),
      when(col("m") === 4, lit("Content-Encoding: br\r\n"))
        .otherwise(lit("")),
      lit("\r\n"))
    val httpBytes = concat(encode(headers, "ISO-8859-1"), wireBody)
    // binaryWarcChunks keys its grouping on doc_id and filters on a
    // `text` column; the staged frame carries a dummy one
    val chunks = binaryWarcChunks(staged.withColumn("text", lit("x")),
      httpWarcRecordBytes(httpBytes,
        concat(lit("http://enc.org/"), col("doc_id").cast("string"))))
    Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid"))
      .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1)
        .cast("long").as("doc_id"),
        col("status_code"), col("charset"), col("text"))
      .orderBy("doc_id")
  }

  /** Sentence segmentation ([[TextAnalysis.sentenceRows]]): a planted
    * prefix packs the edge semantics — a decimal (`3.14`) and a glued
    * abbreviation (`e.g.x`) that must NOT split, an ellipsis run kept
    * inside its sentence, a `??` terminator run that splits, and a
    * terminator-less tail — ahead of each document's real text. The
    * oracle splices [[TextAnalysis.SentencePattern]] verbatim and
    * re-derives trim/filter/position with DuckDB list functions, so
    * Spark and RE2 must agree on every span. */
  val q241Sentences: Q = q("q241_sentences",
    """WITH s AS (SELECT doc_id,
      |  list_filter(list_transform(regexp_extract_all(
      |    'Pi is 3.14 now... right?? See e.g.x and ' || text || ' tail',
      |    '""".stripMargin + TextAnalysis.SentencePattern +
      """'), x -> trim(x)), x -> x <> '') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |r AS (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM s)
      |SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx, l[i] AS sentence
      |FROM r ORDER BY doc_id, sent_idx""".stripMargin) { (s, d) =>
    val planted = concat(lit("Pi is 3.14 now... right?? See e.g.x and "),
      col("text"), lit(" tail"))
    TextAnalysis.sentenceRows(
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), planted.as("text")))
      .orderBy("doc_id", "sent_idx")
  }

  /** Sentence-aligned chunking ([[TextAnalysis.sentenceChunks]],
    * budget 12 whitespace tokens): the RAG-style splitter that never
    * cuts mid-sentence — chunk boundaries fall at cumulative-token
    * multiples, overflow allowed for the boundary sentence. The oracle
    * re-derives segmentation (spliced pattern), per-sentence token
    * counts, the running total, the floor-division chunk id, and the
    * ordered rebuild — any drift in window frame or division rule
    * hash-diverges. */
  val q242SentenceChunks: Q = q("q242_sentence_chunks",
    """WITH s AS (SELECT doc_id,
      |  list_filter(list_transform(regexp_extract_all(
      |    'Intro one. ' || text || '! Outro two here.',
      |    '""".stripMargin + TextAnalysis.SentencePattern +
      """'), x -> trim(x)), x -> x <> '') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |r AS (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM s),
      |x AS (SELECT doc_id, i - 1 AS sent_idx, l[i] AS sentence,
      |    len(regexp_split_to_array(l[i], '\s+')) AS nt FROM r),
      |c AS (SELECT doc_id, sent_idx, sentence, nt,
      |    coalesce(sum(nt) OVER (PARTITION BY doc_id ORDER BY sent_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // 12 AS chunk_idx
      |  FROM x)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  COUNT(*) AS n_sentences, CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  string_agg(sentence, ' ' ORDER BY sent_idx) AS text
      |FROM c GROUP BY doc_id, chunk_idx
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    val planted = concat(lit("Intro one. "), col("text"),
      lit("! Outro two here."))
    TextAnalysis.sentenceChunks(
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), planted.as("text")),
        maxTokens = 12)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Capture-quality audit — the corpus-health rollup a pipeline runs
    * before committing crawl data to curation: per
    * (content_encoding, transfer_encoding) cohort, capture counts and
    * the share carrying revalidation validators (`ETag`). Exercises
    * the column-level header extracts ([[graft.ops.Http.contentEncoding]]
    * / `transferEncoding` / `etag`) against planted header cohorts —
    * mixed case MIME tokens fold, absent headers report empty. ONE
    * hash aggregate over scan-stage regex projections (map-side
    * combine; cohort cardinality is the cross of coding values, a
    * handful). GROUND-TRUTH oracle from the moduli. */
  val q243CaptureAudit: Q = q("q243_capture_audit",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS m
      |  FROM documents),
      |g AS (SELECT doc_id, m,
      |  CASE WHEN m = 1 THEN 'gzip' WHEN m = 3 THEN 'br' ELSE '' END
      |    AS content_encoding,
      |  CASE WHEN m = 2 THEN 'chunked' ELSE '' END AS transfer_encoding,
      |  CASE WHEN m % 2 = 0 THEN 1 ELSE 0 END AS has_etag FROM t)
      |SELECT content_encoding, transfer_encoding,
      |  COUNT(*) AS n_captures,
      |  CAST(SUM(has_etag) AS BIGINT) AS n_with_etag
      |FROM g GROUP BY 1, 2
      |ORDER BY content_encoding, transfer_encoding""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 4
    val payload = concat(
      lit("HTTP/1.1 200 OK\r\n"),
      when(m === 1, lit("Content-Encoding: GZip\r\n"))
        .when(m === 3, lit("Content-Encoding: br\r\n")).otherwise(lit("")),
      when(m === 2, lit("Transfer-Encoding: Chunked\r\n")).otherwise(lit("")),
      when(m % 2 === 0, concat(lit("ETag: \"v"), col("doc_id").cast("string"),
        lit("\"\r\n"))).otherwise(lit("")),
      lit("Content-Type: text/html\r\n\r\n<p>b</p>"))
    Tables.documents(s, d)
      .select(graft.ops.Http.contentEncoding(payload).as("content_encoding"),
        graft.ops.Http.transferEncoding(payload).as("transfer_encoding"),
        when(graft.ops.Http.etag(payload) =!= "", 1L).otherwise(0L)
          .as("graft_e"))
      .groupBy("content_encoding", "transfer_encoding")
      .agg(count(lit(1)).as("n_captures"), sum(col("graft_e")).as("n_with_etag"))
      .orderBy("content_encoding", "transfer_encoding")
  }

  /** hreflang variant clustering — the multilingual-dedup grouping
    * over [[graft.ops.WebText.hreflangLinks]]: every language variant
    * of an article declares the SAME alternate set, so the cluster key
    * is the x-default target (the set's canonical member) and the
    * rollup gives one row per article with its variant count and
    * sorted language list. Per-domain budgets and dedup quotas count
    * CLUSTERS, not pages — three translations of one article are one
    * document's worth of budget, and this rollup is the key that makes
    * that true. Scan Project + explode + ONE two-level aggregate
    * (variant distinct, then cluster rollup). GROUND-TRUTH oracle from
    * the moduli. */
  val q244HreflangClusters: Q = q("q244_hreflang_clusters",
    """WITH t AS (SELECT DISTINCT CAST(doc_id // 3 AS BIGINT) AS art
      |  FROM documents)
      |SELECT 'http://h.org/a/' || CAST(art AS VARCHAR) AS cluster_key,
      |  CAST(3 AS BIGINT) AS n_variants,
      |  'de,en,x-default' AS langs
      |FROM t ORDER BY cluster_key""".stripMargin) { (s, d) =>
    // three pages per article (doc_id // 3), each declaring the same
    // alternate set: en, de, and the x-default canonical member
    val art = call_function("div",
      col("doc_id") - pmod(col("doc_id"), lit(3L)), lit(3L)).cast("string")
    val html = concat(
      lit("<link rel=\"alternate\" hreflang=\"en\" href=\"http://h.org/en/a/"),
      art, lit("\">" +
        "<link rel=\"alternate\" hreflang=\"de\" href=\"http://h.org/de/a/"),
      art, lit("\">" +
        "<link rel=\"alternate\" hreflang=\"x-default\" href=\"http://h.org/a/"),
      art, lit("\">"))
    val variants = Tables.documents(s, d)
      .select(explode(WebText.hreflangLinks(html)).as("x"))
      .select(col("x.lang").as("lang"), col("x.href").as("href"))
      .distinct()
    val clusterOf = variants.filter(col("lang") === "x-default")
      .select(col("href").as("cluster_key"))
    // every variant row joins to its cluster via the shared article id
    // embedded in the href tail (the x-default href IS the key)
    val keyed = variants
      .withColumn("cluster_key", concat(lit("http://h.org/a/"),
        regexp_extract(col("href"), "/a/([0-9]+)$", 1)))
      .join(clusterOf, Seq("cluster_key"), "left_semi")
    keyed.groupBy("cluster_key")
      .agg(count(lit(1)).as("n_variants"),
        array_join(array_sort(collect_set(col("lang"))), ",").as("langs"))
      .orderBy("cluster_key")
  }

  /** Publish-date extraction ([[graft.ops.WebText.publishDates]]): six
    * cohorts walking the trust chain — JSON-LD `datePublished` beating
    * a planted meta decoy AND a time tag; `article:published_time` in
    * the content-first attribute order (ISO timestamp reduced to its
    * date); a bare `<time datetime>`; URL `/YYYY/MM/DD/` and
    * `/YYYY/MM/` (day padded to 01); and a page with nothing. The
    * timestamp → date reduction and the source labels are all
    * GROUND-TRUTH pinned from the moduli. */
  val q245PublishDate: Q = q("q245_publish_date",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 6 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  CASE m WHEN 0 THEN '2025-05-05T10:00:00Z'
      |         WHEN 1 THEN '2024-12-31T23:00:00+01:00'
      |         WHEN 2 THEN '2023-01-02'
      |         WHEN 3 THEN '2022-11-03' WHEN 4 THEN '2022-11-01'
      |         ELSE '' END AS published_raw,
      |  CASE m WHEN 0 THEN 'jsonld' WHEN 1 THEN 'meta'
      |         WHEN 2 THEN 'time' WHEN 3 THEN 'url' WHEN 4 THEN 'url'
      |         ELSE '' END AS published_source,
      |  CASE m WHEN 0 THEN '2025-05-05' WHEN 1 THEN '2024-12-31'
      |         WHEN 2 THEN '2023-01-02' WHEN 3 THEN '2022-11-03'
      |         WHEN 4 THEN '2022-11-01' ELSE '' END AS published_date
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 6
    val i = col("doc_id").cast("string")
    val url = when(m === 3, concat(lit("http://p.org/2022/11/03/post-"), i))
      .when(m === 4, concat(lit("http://p.org/2022/11/draft-"), i))
      .otherwise(concat(lit("http://p.org/page-"), i))
    val html = when(m === 0, lit(
        "<script type=\"application/ld+json\">{\"@type\":\"NewsArticle\"," +
          "\"datePublished\":\"2025-05-05T10:00:00Z\"}</script>" +
          "<meta property=\"article:published_time\" " +
          "content=\"1999-01-01\"><time datetime=\"1998-01-01\">x</time>"))
      .when(m === 1, lit("<meta content=\"2024-12-31T23:00:00+01:00\" " +
        "property='article:published_time'><p>t</p>"))
      .when(m === 2, lit("<p>posted <time datetime=\"2023-01-02\">" +
        "Jan 2</time></p>"))
      .otherwise(lit("<p>no date markup</p>"))
    WebText.publishDates(Tables.documents(s, d)
        .select(col("doc_id"), url.as("url"), html.as("html")))
      .select("doc_id", "published_raw", "published_source",
        "published_date")
      .orderBy("doc_id")
  }

  /** Sitemap scheduling hints ([[graft.ops.WebText.sitemapEntries]]'s
    * `changefreq`/`priority` fields + `changefreqIntervalMs`): nine
    * cohorts — the seven-token sitemaps.org vocabulary (case-folded),
    * an unknown token (`sometimes` → -1, no hint), and an absent tag —
    * with `priority` present on even docs. GROUND-TRUTH oracle: every
    * interval in the ladder spelled out from the modulus. */
  val q246SitemapHints: Q = q("q246_sitemap_hints",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 9 AS INT) AS m
      |  FROM documents)
      |SELECT doc_id,
      |  'http://s.org/p/' || CAST(doc_id AS VARCHAR) AS loc,
      |  CASE m WHEN 0 THEN 'always' WHEN 1 THEN 'hourly'
      |         WHEN 2 THEN 'daily' WHEN 3 THEN 'weekly'
      |         WHEN 4 THEN 'monthly' WHEN 5 THEN 'yearly'
      |         WHEN 6 THEN 'never' WHEN 7 THEN 'sometimes'
      |         ELSE '' END AS changefreq,
      |  CASE WHEN doc_id % 2 = 0
      |    THEN '0.' || CAST(doc_id % 10 AS VARCHAR) ELSE '' END
      |    AS priority,
      |  CAST(CASE m WHEN 0 THEN 0 WHEN 1 THEN 3600000
      |         WHEN 2 THEN 86400000 WHEN 3 THEN 604800000
      |         WHEN 4 THEN 2592000000 WHEN 5 THEN 31536000000
      |         WHEN 6 THEN 34560000000 ELSE -1 END AS BIGINT)
      |    AS interval_ms
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 9
    val i = col("doc_id").cast("string")
    val cfTok = when(m === 0, lit("ALWAYS")).when(m === 1, lit("hourly"))
      .when(m === 2, lit("Daily")).when(m === 3, lit("weekly"))
      .when(m === 4, lit("monthly")).when(m === 5, lit("yearly"))
      .when(m === 6, lit("never")).otherwise(lit("sometimes"))
    val xml = concat(lit("<urlset><url><loc> http://s.org/p/"), i,
      lit(" </loc>"),
      when(m =!= 8, concat(lit("<changefreq> "), cfTok,
        lit(" </changefreq>"))).otherwise(lit("")),
      when(col("doc_id") % 2 === 0, concat(lit("<priority>0."),
        (col("doc_id") % 10).cast("string"), lit("</priority>")))
        .otherwise(lit("")),
      lit("</url></urlset>"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(WebText.sitemapEntries(xml)).as("u"))
      .select(col("doc_id"), col("u.loc").as("loc"),
        col("u.changefreq").as("changefreq"),
        col("u.priority").as("priority"),
        WebText.changefreqIntervalMs(col("u.changefreq")).as("interval_ms"))
      .orderBy("doc_id")
  }

  /** Error-rate back-off ([[graft.ops.Robots.backoffSchedule]]): four
    * host buckets engineered onto each source with error shares
    * ~1/2, ~1/4, ~1/10, ~1/16 — one per ladder step — where the error
    * classes mix 503/500/429 and a planted 404 cohort must NOT count
    * (client errors are the crawler's fault, not host distress). The
    * oracle re-derives counts, the exact floor-micros share, and the
    * ladder from the same rows, so boundary behavior (≥ at exactly
    * 500000/250000/100000 micros when division is even) is pinned
    * cross-engine. */
  val q247Backoff: Q = q("q247_backoff",
    """WITH h AS (SELECT
      |  source || '-' || CAST(doc_id % 4 AS VARCHAR) AS host,
      |  CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN CASE WHEN (doc_id // 4) % 2 = 0 THEN 1 ELSE 0 END
      |    WHEN 1 THEN CASE WHEN (doc_id // 4) % 4 = 0 THEN 1 ELSE 0 END
      |    WHEN 2 THEN CASE WHEN (doc_id // 4) % 10 = 0 THEN 1 ELSE 0 END
      |    ELSE CASE WHEN (doc_id // 4) % 16 = 0 THEN 1 ELSE 0 END
      |  END AS e FROM documents)
      |SELECT host, COUNT(*) AS n_fetches,
      |  CAST(SUM(e) AS BIGINT) AS n_errors,
      |  CAST((SUM(e) * 1000000) // COUNT(*) AS BIGINT) AS error_micros,
      |  CAST(CASE
      |    WHEN (SUM(e) * 1000000) // COUNT(*) >= 500000 THEN 8
      |    WHEN (SUM(e) * 1000000) // COUNT(*) >= 250000 THEN 4
      |    WHEN (SUM(e) * 1000000) // COUNT(*) >= 100000 THEN 2
      |    ELSE 1 END AS BIGINT) AS backoff_multiplier,
      |  CAST(CASE
      |    WHEN (SUM(e) * 1000000) // COUNT(*) >= 500000 THEN 8
      |    WHEN (SUM(e) * 1000000) // COUNT(*) >= 250000 THEN 4
      |    WHEN (SUM(e) * 1000000) // COUNT(*) >= 100000 THEN 2
      |    ELSE 1 END * 1000 AS BIGINT) AS delay_ms
      |FROM h GROUP BY host ORDER BY host""".stripMargin) { (s, d) =>
    val b = col("doc_id") % 4
    val j = call_function("div", col("doc_id") - b, lit(4L))
    val isErr = when(b === 0, pmod(j, lit(2L)) === 0)
      .when(b === 1, pmod(j, lit(4L)) === 0)
      .when(b === 2, pmod(j, lit(10L)) === 0)
      .otherwise(pmod(j, lit(16L)) === 0)
    // error statuses cycle 503/500/429; non-errors cycle 200/301/404 —
    // the 404 cohort must not count toward distress
    val status = when(isErr,
        when(pmod(j, lit(3L)) === 0, 503)
          .when(pmod(j, lit(3L)) === 1, 500).otherwise(429))
      .otherwise(when(pmod(j, lit(3L)) === 0, 200)
        .when(pmod(j, lit(3L)) === 1, 301).otherwise(404))
    val history = Tables.documents(s, d)
      .select(concat(col("source"), lit("-"), b.cast("string")).as("host"),
        status.as("status_code"))
    Robots.backoffSchedule(history).orderBy("host")
  }

  /** Disclaimed-link exclusion in the host graph
    * ([[graft.ops.WebText.resolvedLinkRows]]' `nofollow` flag →
    * [[graft.ops.WebText.hostLinkEdges]] default filter): every page
    * carries five links — a plain one and a `rel="noopener external"`
    * one (both COUNTED: non-disclaiming rel values must not trip the
    * filter), plus `nofollow`, `ugc`, and `sponsored` ones (all
    * DROPPED — the author disclaims them, so reputation must not
    * count the edges; comment spam and paid placements would buy
    * PageRank otherwise). GROUND-TRUTH oracle: exactly the two
    * counted edge families per source host, nothing from the
    * disclaimed targets. */
  val q248NofollowEdges: Q = q("q248_nofollow_edges",
    """WITH t AS (SELECT source, CAST(doc_id % 3 AS INT) AS m
      |  FROM documents)
      |SELECT src_domain, dst_domain,
      |  CAST(COUNT(*) AS BIGINT) AS n_links FROM (
      |  SELECT source || '.org' AS src_domain,
      |    'plain' || CAST(m AS VARCHAR) || '.net' AS dst_domain FROM t
      |  UNION ALL SELECT source || '.org', 'ok.net' FROM t) e
      |GROUP BY src_domain, dst_domain
      |ORDER BY src_domain, dst_domain""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 3
    val html = concat(
      lit("<a href=\"http://plain"), m.cast("string"),
      lit(".net/x\">p</a>" +
        "<a rel=\"nofollow\" href=\"http://nf.net/x\">n</a>" +
        "<a rel=\"noopener external\" href=\"http://ok.net/x\">o</a>" +
        "<a href=\"http://ugc.net/x\" rel=\"ugc\">u</a>" +
        "<a rel=sponsored href=\"http://sp.net/x\">s</a>"))
    WebText.hostLinkEdges(Tables.documents(s, d)
        .select(concat(lit("http://"), col("source"), lit(".org/p/"),
          col("doc_id").cast("string")).as("url"), html.as("html")),
        "url", "html")
      .orderBy("src_domain", "dst_domain")
  }

  /** Character-reference decoding across every text-bearing extractor
    * ([[graft.functions.HtmlUnescapeOps]] threaded through
    * `visibleText`, `pageMetadata`, `anchorTexts`, `feedEntries`):
    * planted numeric (decimal, hex, astral, C1-remap), named (Latin-1
    * + punctuation), nbsp-family, double-escaped (`&amp;#8212;` stays
    * one level), and INVALID (`&bad;`, `&#xZZ;`) references per doc.
    * GROUND-TRUTH oracle: DuckDB re-derives every expected string from
    * `chr()` code points — a missed form, a double decode, a wrong
    * Windows-1252 remap, or an nbsp that fails to fold into the
    * whitespace collapse all hash-diverge. Scan-stage regex + native
    * char-scan projections only — no shuffle before the final sort. */
  val q249CharRefs: Q = q("q249_char_refs",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 500)
      |SELECT doc_id,
      |  'caf' || chr(233) || ' ' || chr(8212) || ' ' || chr(128512) ||
      |    ' A&B &bad; &#xZZ; ' || chr(8217) || ' &#8212; q' ||
      |    CAST(doc_id AS VARCHAR) AS vis,
      |  'T' || chr(8217) || 's ' || chr(171) || 'N' || chr(187) AS title,
      |  'http://x.org/a?u=1&v=2' AS href,
      |  'L' || chr(233) || 'o ' || chr(8230) AS anchor,
      |  'F' || chr(233) || 'e ' || chr(8230) AS feed_title
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val body = concat(
      lit("<p>caf&eacute; &#8212; &#x1F600; A&amp;B&nbsp;&bad; &#xZZ; " +
        "&#146; &amp;#8212; q"),
      col("doc_id").cast("string"),
      lit("</p><script>var x='&mdash;';</script><!-- &hellip; -->"))
    val page = lit("<head><title>T&#8217;s &laquo;N&raquo;</title></head>" +
      "<body><a href=\"http://x.org/a?u=1&amp;v=2\">L&eacute;o&nbsp;" +
      "&#8230;</a></body>")
    val xml = lit("<rss><channel><title>c</title><item>" +
      "<title>F&#xE9;e &hellip;</title><link>http://f.org/e</link>" +
      "</item></channel></rss>")
    val base = Tables.documents(s, d).filter(col("doc_id") < 500)
      .select(col("doc_id"), body.as("graft_body"), page.as("html"),
        xml.as("graft_xml"))
    WebText.pageMetadata(base)
      .select(col("doc_id"),
        WebText.visibleText(col("graft_body")).as("vis"),
        col("title"),
        get(WebText.anchorTexts(col("html")), lit(0)).getField("href")
          .as("href"),
        get(WebText.anchorTexts(col("html")), lit(0)).getField("anchor")
          .as("anchor"),
        get(WebText.feedEntries(col("graft_xml")), lit(0)).getField("title")
          .as("feed_title"))
      .orderBy("doc_id")
  }

  /** Value oracle for the PQ asymmetric-distance scorer
    * ([[graft.ops.Similarity.pqEncode]] →
    * [[graft.ops.Similarity.pqAdcTopK]] with a FIXED literal model —
    * the q226 trick applied to the last rows-only ANN machine).
    * Vectors are the EXACT integer-eighths construction
    * `v[j] = ((vec_id·31 + j·17) mod 97) / 8` (raw float embeddings
    * put dozens of code-identical vectors in last-ulp near-ties at the
    * top-k cut, where engine-side summation order decides the order —
    * exact dyadic rationals make every distance bit-identical in both
    * engines, so ties break on vec_id deterministically): codebooks
    * from the construction at vec_id 0–3 sliced into 4 subspaces of
    * 16 dims, every corpus vector encodes to its per-subspace argmin
    * code (ties to the lower cid), the construction at vec_id 5 is
    * the query, ADC top-10 by the m-lookup table sum. The oracle
    * re-derives codebooks, both argmin stages, the query distance
    * table, the lookup-sum, and the (dist, vec_id) rank — a drifted
    * slice offset, tie-break, or table indexing hash-diverges. */
  val q250PqAdc: Q = q("q250_pq_adc",
    """WITH e AS (SELECT vec_id, list_transform(range(1, 65),
      |    j -> CAST((vec_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM embeddings),
      |cb AS (SELECT vec_id AS c, v FROM e WHERE vec_id < 4),
      |sub AS (SELECT unnest(range(0, 4)) AS s),
      |cd AS (SELECT e.vec_id, sub.s, cb.c,
      |    list_sum(list_transform(range(1, 17),
      |      j -> (e.v[sub.s * 16 + j] - cb.v[sub.s * 16 + j]) *
      |           (e.v[sub.s * 16 + j] - cb.v[sub.s * 16 + j]))) AS dist
      |  FROM e CROSS JOIN cb CROSS JOIN sub),
      |codes AS (SELECT vec_id, s, c FROM (SELECT *, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY dist, c) AS rn FROM cd)
      |  WHERE rn = 1),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 5),
      |qd AS (SELECT sub.s, cb.c,
      |    list_sum(list_transform(range(1, 17),
      |      j -> (q.qv[sub.s * 16 + j] - cb.v[sub.s * 16 + j]) *
      |           (q.qv[sub.s * 16 + j] - cb.v[sub.s * 16 + j]))) AS qdist
      |  FROM q CROSS JOIN cb CROSS JOIN sub),
      |adc AS (SELECT codes.vec_id, sum(qd.qdist) AS dist
      |  FROM codes JOIN qd ON codes.s = qd.s AND codes.c = qd.c
      |  GROUP BY codes.vec_id)
      |SELECT vec_id, round(dist, 4) AS adc_dist,
      |  CAST(row_number() OVER (ORDER BY dist, vec_id) AS BIGINT) AS rnk
      |FROM adc ORDER BY dist, vec_id LIMIT 10""".stripMargin) { (s, d) =>
    import graft.ops.Similarity
    def vec(id: Long): Array[Double] =
      Array.tabulate(64)(j0 => ((id * 31 + (j0 + 1) * 17) % 97).toDouble / 8.0)
    val model = Similarity.PqModel(16,
      Array.tabulate(4)(sub =>
        Array.tabulate(4)(c => vec(c.toLong).slice(sub * 16, sub * 16 + 16))))
    val corpus = Tables.embeddings(s, d).select(col("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => ((col("vec_id") * 31 + j * 17) % 97).cast("double") / lit(8.0))
        .as("embedding"))
    Similarity.pqAdcTopK(Similarity.pqEncode(corpus, model), model,
        vec(5L), 10)
      .select(col("vec_id"), round(col("adc_dist"), 4).as("adc_dist"),
        col("rnk"))
      .orderBy("rnk")
  }

  /** Bitext alignment capstone ([[graft.ops.TextAnalysis.bitextAlign]]
    * — hreflang-style translation clusters × sentence segmentation ×
    * exact-micros length alignment): per doc, an `en` text of three
    * sentences and a `de` text of three sentences whose last is a
    * 2-char fragment, in one cluster. The midpoint nearest-match pairs
    * the first two de sentences with their en counterparts and the
    * fragment's best candidate fails the ≥0.5 length-ratio gate — the
    * classic Gale-Church prior dropping an implausible pair. The
    * oracle re-derives EVERYTHING: the spliced [[TextAnalysis
    * .SentencePattern]] segmentation, per-sentence lengths, running
    * character offsets, the `(2·before+len)·1e6 // (2·total)` exact
    * midpoint, the (|Δmid|, dst_idx) argmin, and the micros ratio
    * gate — any drift in window frame, floor division, or tie-break
    * hash-diverges. */
  val q251Bitext: Q = q("q251_bitext",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 300),
      |docs AS (
      |  SELECT doc_id, 'c' || CAST(doc_id AS VARCHAR) AS cluster_key,
      |    'en' AS lang,
      |    'Aa ' || CAST(doc_id AS VARCHAR) ||
      |      ' bb. Cc dd ee ff gg. Hh ii jj kk.' AS text FROM t
      |  UNION ALL
      |  SELECT doc_id, 'c' || CAST(doc_id AS VARCHAR), 'de',
      |    'Xx ' || CAST(doc_id AS VARCHAR) ||
      |      ' yy. Zz ww vv uu tt ss. U.' FROM t),
      |s AS (SELECT cluster_key, lang,
      |  list_filter(list_transform(regexp_extract_all(text,
      |    '""".stripMargin + TextAnalysis.SentencePattern +
      """'), x -> trim(x)), x -> x <> '') AS l FROM docs),
      |r AS (SELECT cluster_key, lang, l,
      |    unnest(range(1, len(l) + 1)) AS i FROM s),
      |x AS (SELECT cluster_key, lang, CAST(i - 1 AS BIGINT) AS idx,
      |    l[i] AS sentence, CAST(length(l[i]) AS BIGINT) AS ln FROM r),
      |c AS (SELECT *, coalesce(sum(ln) OVER (PARTITION BY cluster_key,
      |      lang ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1
      |      PRECEDING), 0) AS bef,
      |    sum(ln) OVER (PARTITION BY cluster_key, lang) AS tot FROM x),
      |m AS (SELECT cluster_key, lang, idx, sentence, ln,
      |    CAST(((2 * bef + ln) * 1000000) // (2 * tot) AS BIGINT) AS mid
      |  FROM c),
      |p AS (SELECT a.cluster_key, a.lang AS src_lang, b.lang AS dst_lang,
      |    a.idx AS src_idx, b.idx AS dst_idx,
      |    a.sentence AS src_sentence, b.sentence AS dst_sentence,
      |    abs(a.mid - b.mid) AS mid_delta_micros, a.ln AS al, b.ln AS bl
      |  FROM m a JOIN m b USING (cluster_key) WHERE a.lang < b.lang),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_key,
      |    src_lang, dst_lang, src_idx
      |    ORDER BY mid_delta_micros, dst_idx) AS rn FROM p)
      |SELECT cluster_key, src_lang, dst_lang, src_idx, dst_idx,
      |  src_sentence, dst_sentence, mid_delta_micros,
      |  (least(al, bl) * 1000000) // greatest(al, bl) AS len_ratio_micros
      |FROM rk WHERE rn = 1
      |  AND (least(al, bl) * 1000000) // greatest(al, bl) >= 500000
      |ORDER BY cluster_key, src_idx""".stripMargin) { (s, d) =>
    val id = col("doc_id").cast("string")
    val base = Tables.documents(s, d).filter(col("doc_id") < 300)
    val en = base.select(concat(lit("c"), id).as("cluster_key"),
      lit("en").as("lang"),
      concat(lit("Aa "), id, lit(" bb. Cc dd ee ff gg. Hh ii jj kk."))
        .as("text"))
    val de = base.select(concat(lit("c"), id).as("cluster_key"),
      lit("de").as("lang"),
      concat(lit("Xx "), id, lit(" yy. Zz ww vv uu tt ss. U.")).as("text"))
    TextAnalysis.bitextAlign(en.unionAll(de))
      .orderBy("cluster_key", "src_idx")
  }

  /** Value oracle for the full IVF-PQ RESIDUAL search chain
    * ([[graft.ops.Similarity.pqIndex]] →
    * [[graft.ops.Similarity.annIvfPq]] with FIXED literal centers and
    * codebooks — q250's trick extended from the ADC scorer to the
    * whole faiss-shaped search): over the exact integer-eighths
    * construction (all arithmetic up to the final cosine is exact, and
    * the cosine's dyadic dot/norm inputs are bit-identical in both
    * engines before the round), corpus vectors assign to their top-1
    * of 4 cells (construction ids 100–103), encode the cell RESIDUAL
    * against 2×4 literal sub-codebooks (construction ids 200–203
    * sliced), queries (ids < 3) probe their 2 nearest cells, and
    * candidates decode (reconstruction + center) for exact-cosine
    * top-5. The oracle re-derives the assignment argmin, the residual,
    * both code argmins, the reconstruction, the probe ranks, the
    * cosine, and the (cos desc, c_id) rank. */
  val q252IvfPqSearch: Q = q("q252_ivfpq_search",
    """WITH ids AS (SELECT vec_id FROM embeddings),
      |e AS (SELECT vec_id, list_transform(range(1, 65),
      |    j -> CAST((vec_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM ids),
      |ctr AS (SELECT unnest(range(0, 4)) AS cell),
      |ctrv AS (SELECT cell, list_transform(range(1, 65),
      |    j -> CAST(((100 + cell) * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS cv
      |  FROM ctr),
      |ad AS (SELECT e.vec_id, ctrv.cell,
      |    list_sum(list_transform(range(1, 65),
      |      j -> (e.v[j] - ctrv.cv[j]) * (e.v[j] - ctrv.cv[j]))) AS dist
      |  FROM e CROSS JOIN ctrv),
      |asg AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER
      |    (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM ad)
      |  WHERE rn = 1),
      |res AS (SELECT e.vec_id, asg.cell,
      |    list_transform(range(1, 65), j -> e.v[j] - ctrv.cv[j]) AS r
      |  FROM e JOIN asg USING (vec_id) JOIN ctrv USING (cell)),
      |cb AS (SELECT s.s, c.c, list_transform(range(1, 33),
      |    j -> CAST(((200 + c.c) * 31 + (s.s * 32 + j) * 17) % 97
      |      AS DOUBLE) / 8.0) AS bv
      |  FROM (SELECT unnest(range(0, 2)) AS s) s
      |  CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c),
      |cdist AS (SELECT res.vec_id, cb.s, cb.c,
      |    list_sum(list_transform(range(1, 33),
      |      j -> (res.r[cb.s * 32 + j] - cb.bv[j]) *
      |           (res.r[cb.s * 32 + j] - cb.bv[j]))) AS dist
      |  FROM res CROSS JOIN cb),
      |codes AS (SELECT vec_id, s, c FROM (SELECT *, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY dist, c) AS rn FROM cdist)
      |  WHERE rn = 1),
      |recon AS (SELECT res.vec_id, res.cell,
      |    list_transform(range(1, 65), j -> ctrv.cv[j] +
      |      CAST(((200 + CASE WHEN j <= 32 THEN c0.c ELSE c1.c END) * 31 +
      |        j * 17) % 97 AS DOUBLE) / 8.0) AS ce
      |  FROM res JOIN ctrv USING (cell)
      |  JOIN codes c0 ON c0.vec_id = res.vec_id AND c0.s = 0
      |  JOIN codes c1 ON c1.vec_id = res.vec_id AND c1.s = 1),
      |qp AS (SELECT vec_id AS q_id, cell FROM (SELECT ad.vec_id, ad.cell,
      |    row_number() OVER (PARTITION BY ad.vec_id
      |      ORDER BY ad.dist, ad.cell) AS rn
      |  FROM ad WHERE ad.vec_id < 3) WHERE rn <= 2),
      |sims AS (SELECT qp.q_id, recon.vec_id AS c_id,
      |    round(list_dot_product(qe.v, recon.ce) /
      |      (sqrt(list_dot_product(qe.v, qe.v)) *
      |       sqrt(list_dot_product(recon.ce, recon.ce))), 4) AS cos_sim
      |  FROM qp JOIN recon ON recon.cell = qp.cell
      |  JOIN e qe ON qe.vec_id = qp.q_id
      |  WHERE qp.q_id <> recon.vec_id)
      |SELECT q_id, rnk, c_id, cos_sim FROM (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk FROM sims)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.ops.Similarity
    def vec(id: Long): Array[Double] =
      Array.tabulate(64)(j0 => ((id * 31 + (j0 + 1) * 17) % 97).toDouble / 8.0)
    val centers = Array.tabulate(4)(c => vec(100L + c))
    val model = Similarity.PqModel(32,
      Array.tabulate(2)(sub =>
        Array.tabulate(4)(c => vec(200L + c).slice(sub * 32, sub * 32 + 32))))
    val corpus = Tables.embeddings(s, d).select(col("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => ((col("vec_id") * 31 + j * 17) % 97).cast("double") / lit(8.0))
        .as("embedding"))
    val index = Similarity.pqIndex(corpus, centers, model).localCheckpoint()
    Similarity.annIvfPq(corpus.filter(col("vec_id") < 3), index, centers,
        model, k = 5, nprobe = 2)
      .orderBy("q_id", "rnk")
  }

  /** WET export round-trip ([[graft.ops.Warc.wetRecords]] →
    * [[graft.ops.Warc.parseWarcText]]): the curated corpus written
    * back out in the CommonCrawl conversion-record format, packed 8
    * records per chunk in doc order, then re-parsed by the library's
    * OWN WARC cursor — the format contract as an identity. The oracle
    * re-derives every parsed field from the construction (uri from
    * doc_id, Content-Length as UTF-8 octets of the source text, body
    * = the text verbatim, sequential rec_idx), so a header drift,
    * an octet/char-length mixup, or a CRLF framing slip breaks the
    * cursor walk and hash-diverges. */
  val q253WetExport: Q = q("q253_wet_export",
    """WITH t AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL)
      |SELECT CAST(doc_id // 8 AS BIGINT) AS chunk_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
      |    - 1 AS BIGINT) AS rec_idx,
      |  'conversion' AS warc_type,
      |  'http://w.org/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'text/plain' AS content_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
      |  text AS body, TRUE AS valid
      |FROM t ORDER BY chunk_id, rec_idx""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(lit("http://w.org/"), col("doc_id").cast("string")).as("url"),
        col("text"))
    val chunks = Warc.wetRecords(docs)
      .select(call_function("div",
          col("doc_id") - pmod(col("doc_id"), lit(8L)), lit(8L))
          .as("chunk_id"),
        col("doc_id"), col("wet_record"))
      .groupBy("chunk_id")
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), col("wet_record")))),
        x => x.getField("wet_record")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
    Warc.parseWarcText(s, chunks).toDF()
      .select("chunk_id", "rec_idx", "warc_type", "target_uri",
        "content_type", "content_length", "body", "valid")
      .orderBy("chunk_id", "rec_idx")
  }

  /** Byte-order-mark charset sniffing
    * ([[graft.ops.Http.splitResponseBytes]], the WHATWG precedence:
    * BOM > header declaration > meta prescan): four byte-level cohorts
    * behind the full WARC stack — a UTF-8 BOM under a WRONG latin-1
    * header (the BOM must win or the planted accents mojibake), a
    * UTF-16BE body whose only evidence is its BOM (a meta prescan over
    * UTF-16 octets reads interleaved NULs, never a token), a UTF-16LE
    * BOM over a decoy meta declaring latin-1, and a BOM-less control
    * that still honors its header. In every BOM cohort the BOM bytes
    * are CONSUMED — a leaked U+FEFF at the text head would lengthen
    * the reconstruction and hash-diverge. GROUND-TRUTH oracle: the
    * expected text is the source construction verbatim and the
    * charset token per cohort is spelled out. */
  val q254BomDecode: Q = q("q254_bom_decode",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS m, text
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, 200 AS status_code, 'text/html' AS content_type,
      |  CASE m WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16be'
      |    WHEN 2 THEN 'utf-16le' ELSE 'iso-8859-1' END AS charset,
      |  CASE WHEN m = 2 THEN '<meta charset="iso-8859-1">' ELSE '' END ||
      |    '<p>' || text || ' café ñ über</p>' AS text,
      |  TRUE AS valid
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 4
    val html = concat(lit("<p>"), col("text"), lit(" café ñ über</p>"))
    val bomUtf8 = lit(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    val bomBe = lit(Array(0xFE.toByte, 0xFF.toByte))
    val bomLe = lit(Array(0xFF.toByte, 0xFE.toByte))
    val bodyBytes =
      // m=0: UTF-8 BOM + UTF-8 bytes under a LYING latin-1 header
      when(m === 0, concat(bomUtf8, encode(html, "UTF-8")))
        // m=1: UTF-16BE with only its BOM as evidence
        .when(m === 1, concat(bomBe, encode(html, "UTF-16BE")))
        // m=2: UTF-16LE BOM beats a decoy meta (prepended INSIDE the
        // utf-16 payload, so the prescan could never read it anyway —
        // the decoy is the header-less + meta-bearing shape)
        .when(m === 2, concat(bomLe, encode(concat(
          lit("<meta charset=\"iso-8859-1\">"), html), "UTF-16LE")))
        // m=3: BOM-less control — the latin-1 header is honored
        .otherwise(encode(html, "ISO-8859-1"))
    val hdr = when(m === 0 || m === 3,
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
          "charset=iso-8859-1\r\n\r\n"))
      .otherwise(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"))
    val httpBytes = concat(encode(hdr, "UTF-8"), bodyBytes)
    val chunks = binaryWarcChunks(Tables.documents(s, d),
      httpWarcRecordBytes(httpBytes))
    Warc.parseWarcHttpDocs(s, chunks).toDF()
      .filter(col("valid"))
      .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1).cast("long")
        .as("doc_id"), col("status_code"), col("content_type"),
        col("charset"), col("text"), col("valid"))
      .orderBy("doc_id")
  }

  /** Value oracle for the pure-ADC IVF-PQ searcher
    * ([[graft.ops.Similarity.annIvfPqAdc]] — the faiss
    * precomputed-tables recipe: per (query, probed cell) the table
    * entry (s, c) is `||slice_s(q − center(cell)) − cb_s,c||²`, so a
    * candidate's score is m lookups by its codes): the q252
    * construction driven through the ADC path. All table entries and
    * lookup sums are exact dyadic rationals, so the ascending
    * (dist, c_id) rank is bit-deterministic cross-engine. With q250
    * (flat ADC) and q252 (decode-then-cosine) this closes the last
    * rows-only ANN scorer behind a value oracle. */
  val q255IvfPqAdc: Q = q("q255_ivfpq_adc",
    """WITH ids AS (SELECT vec_id FROM embeddings),
      |e AS (SELECT vec_id, list_transform(range(1, 65),
      |    j -> CAST((vec_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM ids),
      |ctrv AS (SELECT cell, list_transform(range(1, 65),
      |    j -> CAST(((100 + cell) * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS cv
      |  FROM (SELECT unnest(range(0, 4)) AS cell)),
      |ad AS (SELECT e.vec_id, ctrv.cell,
      |    list_sum(list_transform(range(1, 65),
      |      j -> (e.v[j] - ctrv.cv[j]) * (e.v[j] - ctrv.cv[j]))) AS dist
      |  FROM e CROSS JOIN ctrv),
      |asg AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER
      |    (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM ad)
      |  WHERE rn = 1),
      |res AS (SELECT e.vec_id, asg.cell,
      |    list_transform(range(1, 65), j -> e.v[j] - ctrv.cv[j]) AS r
      |  FROM e JOIN asg USING (vec_id) JOIN ctrv USING (cell)),
      |cb AS (SELECT s.s, c.c, list_transform(range(1, 33),
      |    j -> CAST(((200 + c.c) * 31 + (s.s * 32 + j) * 17) % 97
      |      AS DOUBLE) / 8.0) AS bv
      |  FROM (SELECT unnest(range(0, 2)) AS s) s
      |  CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c),
      |cdist AS (SELECT res.vec_id, cb.s, cb.c,
      |    list_sum(list_transform(range(1, 33),
      |      j -> (res.r[cb.s * 32 + j] - cb.bv[j]) *
      |           (res.r[cb.s * 32 + j] - cb.bv[j]))) AS dist
      |  FROM res CROSS JOIN cb),
      |codes AS (SELECT vec_id, s, c FROM (SELECT *, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY dist, c) AS rn FROM cdist)
      |  WHERE rn = 1),
      |qp AS (SELECT vec_id AS q_id, cell FROM (SELECT ad.vec_id, ad.cell,
      |    row_number() OVER (PARTITION BY ad.vec_id
      |      ORDER BY ad.dist, ad.cell) AS rn
      |  FROM ad WHERE ad.vec_id < 3) WHERE rn <= 2),
      |qt AS (SELECT qp.q_id, qp.cell, cb.s, cb.c,
      |    list_sum(list_transform(range(1, 33),
      |      j -> ((qe.v[cb.s * 32 + j] - ctrv.cv[cb.s * 32 + j]) - cb.bv[j])
      |         * ((qe.v[cb.s * 32 + j] - ctrv.cv[cb.s * 32 + j]) - cb.bv[j])))
      |      AS entry
      |  FROM qp JOIN ctrv USING (cell)
      |  JOIN e qe ON qe.vec_id = qp.q_id CROSS JOIN cb),
      |cand AS (SELECT qp.q_id, asg.vec_id AS c_id, qp.cell
      |  FROM qp JOIN asg ON asg.cell = qp.cell
      |  WHERE qp.q_id <> asg.vec_id),
      |adc AS (SELECT cand.q_id, cand.c_id, sum(qt.entry) AS dist
      |  FROM cand JOIN codes ON codes.vec_id = cand.c_id
      |  JOIN qt ON qt.q_id = cand.q_id AND qt.cell = cand.cell
      |         AND qt.s = codes.s AND qt.c = codes.c
      |  GROUP BY cand.q_id, cand.c_id)
      |SELECT q_id, rnk, c_id, round(dist, 4) AS adc_dist FROM (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY dist, c_id) AS BIGINT) AS rnk FROM adc)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.ops.Similarity
    def vec(id: Long): Array[Double] =
      Array.tabulate(64)(j0 => ((id * 31 + (j0 + 1) * 17) % 97).toDouble / 8.0)
    val centers = Array.tabulate(4)(c => vec(100L + c))
    val model = Similarity.PqModel(32,
      Array.tabulate(2)(sub =>
        Array.tabulate(4)(c => vec(200L + c).slice(sub * 32, sub * 32 + 32))))
    val corpus = Tables.embeddings(s, d).select(col("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => ((col("vec_id") * 31 + j * 17) % 97).cast("double") / lit(8.0))
        .as("embedding"))
    val index = Similarity.pqIndex(corpus, centers, model).localCheckpoint()
    Similarity.annIvfPqAdc(corpus.filter(col("vec_id") < 3), index, centers,
        model, k = 5, nprobe = 2)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("adc_dist"), 4).as("adc_dist"))
      .orderBy("q_id", "rnk")
  }

  /** Bitext HARVEST capstone — the full multilingual-pair chain from
    * raw pages: each article ships an `en` and a `de` page whose
    * `<link rel=alternate hreflang>` sets declare each other plus the
    * x-default canonical member ([[graft.ops.WebText.hreflangLinks]]);
    * a page self-identifies its language by the alternate row whose
    * href IS its own URL, clusters on the x-default target (the q244
    * key), and the clustered `(cluster, lang, text)` docs flow into
    * [[graft.ops.TextAnalysis.bitextAlign]]. The oracle re-derives the
    * cluster key and language from the construction and then the
    * entire q251 alignment chain — segmentation, exact midpoints,
    * nearest-match, the ratio gate dropping the planted fragment. */
  val q256BitextHarvest: Q = q("q256_bitext_harvest",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 300),
      |docs AS (
      |  SELECT doc_id, 'http://h.org/a/' || CAST(doc_id AS VARCHAR)
      |      AS cluster_key, 'en' AS lang,
      |    'Aa ' || CAST(doc_id AS VARCHAR) ||
      |      ' bb. Cc dd ee ff gg. Hh ii jj kk.' AS text FROM t
      |  UNION ALL
      |  SELECT doc_id, 'http://h.org/a/' || CAST(doc_id AS VARCHAR), 'de',
      |    'Xx ' || CAST(doc_id AS VARCHAR) ||
      |      ' yy. Zz ww vv uu tt ss. U.' FROM t),
      |s AS (SELECT cluster_key, lang,
      |  list_filter(list_transform(regexp_extract_all(text,
      |    '""".stripMargin + TextAnalysis.SentencePattern +
      """'), x -> trim(x)), x -> x <> '') AS l FROM docs),
      |r AS (SELECT cluster_key, lang, l,
      |    unnest(range(1, len(l) + 1)) AS i FROM s),
      |x AS (SELECT cluster_key, lang, CAST(i - 1 AS BIGINT) AS idx,
      |    l[i] AS sentence, CAST(length(l[i]) AS BIGINT) AS ln FROM r),
      |c AS (SELECT *, coalesce(sum(ln) OVER (PARTITION BY cluster_key,
      |      lang ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1
      |      PRECEDING), 0) AS bef,
      |    sum(ln) OVER (PARTITION BY cluster_key, lang) AS tot FROM x),
      |m AS (SELECT cluster_key, lang, idx, sentence, ln,
      |    CAST(((2 * bef + ln) * 1000000) // (2 * tot) AS BIGINT) AS mid
      |  FROM c),
      |p AS (SELECT a.cluster_key, a.lang AS src_lang, b.lang AS dst_lang,
      |    a.idx AS src_idx, b.idx AS dst_idx,
      |    a.sentence AS src_sentence, b.sentence AS dst_sentence,
      |    abs(a.mid - b.mid) AS mid_delta_micros, a.ln AS al, b.ln AS bl
      |  FROM m a JOIN m b USING (cluster_key) WHERE a.lang < b.lang),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_key,
      |    src_lang, dst_lang, src_idx
      |    ORDER BY mid_delta_micros, dst_idx) AS rn FROM p)
      |SELECT cluster_key, src_lang, dst_lang, src_idx, dst_idx,
      |  src_sentence, dst_sentence, mid_delta_micros,
      |  (least(al, bl) * 1000000) // greatest(al, bl) AS len_ratio_micros
      |FROM rk WHERE rn = 1
      |  AND (least(al, bl) * 1000000) // greatest(al, bl) >= 500000
      |ORDER BY cluster_key, src_idx""".stripMargin) { (s, d) =>
    val id = col("doc_id").cast("string")
    val alternates = concat(
      lit("<link rel=\"alternate\" hreflang=\"en\" href=\"http://h.org/en/a/"),
      id, lit("\"><link rel=\"alternate\" hreflang=\"de\" " +
        "href=\"http://h.org/de/a/"), id,
      lit("\"><link rel=\"alternate\" hreflang=\"x-default\" " +
        "href=\"http://h.org/a/"), id, lit("\">"))
    val base = Tables.documents(s, d).filter(col("doc_id") < 300)
    def page(lang: String, text: Column) = base.select(
      concat(lit(s"http://h.org/$lang/a/"), id).as("url"),
      alternates.as("html"), text.as("text"))
    val pages = page("en",
        concat(lit("Aa "), id, lit(" bb. Cc dd ee ff gg. Hh ii jj kk.")))
      .unionAll(page("de",
        concat(lit("Xx "), id, lit(" yy. Zz ww vv uu tt ss. U."))))
    // a page self-identifies: the alternate row whose href IS its url
    val variants = pages.select(col("url"), col("text"),
      explode(WebText.hreflangLinks(col("html"))).as("x"))
    // (x-default is a role, not a language — excluded from self rows
    // like BitextHarvestLink.clusterMembers)
    val self = variants.filter(col("x.href") === col("url") &&
        col("x.lang") =!= "x-default")
      .select(col("url"), col("text"), col("x.lang").as("lang"))
    // cluster key = the x-default member (the q244 rule)
    val clusterOf = variants.filter(col("x.lang") === "x-default")
      .select(col("url"), col("x.href").as("cluster_key")).distinct()
    TextAnalysis.bitextAlign(
        self.join(clusterOf, Seq("url"))
          .select(col("cluster_key"), col("lang"), col("text")))
      .orderBy("cluster_key", "src_idx")
  }

  /** WAT export round-trip ([[graft.ops.Warc.watRecords]] →
    * [[graft.ops.Warc.parseWarcText]] → `from_json`): CommonCrawl's
    * metadata artifact — per-page JSON carrying title/description
    * (entity-decoded), the RAW out-link hrefs in document order, and
    * the response Content-Type, in the Envelope/Payload-Metadata
    * nesting — packed 8 records per chunk, re-parsed by the library's
    * OWN WARC cursor, and every payload field re-derived through the
    * shared [[graft.ops.Warc.WatPayloadSchema]] reader. The oracle
    * reconstructs each field from the page construction (title with a
    * non-ASCII char AND an `&amp;` entity, an absolute href with an
    * in-query `&amp;`, a relative href kept raw), so a JSON nesting
    * drift, an entity-decode slip on either side of the raw-href rule,
    * or an octet/char Content-Length mixup (asserted as `length_ok`
    * against the re-encoded body) hash-diverges. */
  /** Embedding-margin bitext mining
    * ([[graft.ops.TextAnalysis.bitextMineByMargin]] — the CCMatrix
    * ratio margin `2·cos/(avgₖ(src)+avgₖ(dst))` over cluster-keyed
    * cross-language sentence pairs): planted en/de clusters where each
    * aligned sentence's true translation carries the IDENTICAL
    * exact-dyadic embedding (cos exactly 1) and the de side — the SRC
    * side under the `src_lang < dst_lang` rule — adds an unaligned
    * decoy sentence, so the kNN normalizers are nontrivial and the
    * ≥1 gate has a real candidate to judge.
    * GROUND-TRUTH oracle: DuckDB re-derives every cosine, both k=2
    * neighborhood averages, the margin, the per-src argmax, and the
    * ≥1 gate from the same integer-eighths construction — dot
    * products and norms² are exact dyadic rationals (the q250
    * discipline), so the ranking can never drift between engines. */
  val q258MarginBitext: Q = q("q258_margin_bitext",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 200),
      |en AS (SELECT doc_id, i, list_transform(range(1, 9),
      |    j -> CAST((doc_id * 31 + i * 13 + j * 17) % 97 AS DOUBLE) / 8.0)
      |    AS v
      |  FROM t CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
      |de AS (SELECT doc_id, i, CASE WHEN i < 3 THEN
      |    list_transform(range(1, 9),
      |      j -> CAST((doc_id * 31 + i * 13 + j * 17) % 97 AS DOUBLE) / 8.0)
      |  ELSE list_transform(range(1, 9),
      |      j -> CAST((doc_id * 29 + 5 + j * 23) % 97 AS DOUBLE) / 8.0)
      |  END AS v
      |  FROM t CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
      |p AS (SELECT de.doc_id, de.i AS src_idx, en.i AS dst_idx,
      |    list_sum(list_transform(range(1, 9), j -> de.v[j] * en.v[j])) /
      |      (sqrt(list_sum(list_transform(range(1, 9),
      |         j -> de.v[j] * de.v[j]))) *
      |       sqrt(list_sum(list_transform(range(1, 9),
      |         j -> en.v[j] * en.v[j])))) AS cos
      |  FROM de JOIN en USING (doc_id)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id, src_idx
      |      ORDER BY cos DESC, dst_idx) AS rs,
      |    row_number() OVER (PARTITION BY doc_id, dst_idx
      |      ORDER BY cos DESC, src_idx) AS rd FROM p),
      |ks AS (SELECT doc_id, src_idx, avg(cos) AS ks FROM r
      |  WHERE rs <= 2 GROUP BY 1, 2),
      |kd AS (SELECT doc_id, dst_idx, avg(cos) AS kd FROM r
      |  WHERE rd <= 2 GROUP BY 1, 2),
      |m AS (SELECT r.doc_id, r.src_idx, r.dst_idx, r.cos,
      |    2 * r.cos / (ks.ks + kd.kd) AS margin
      |  FROM r JOIN ks USING (doc_id, src_idx)
      |  JOIN kd USING (doc_id, dst_idx)
      |  WHERE ks.ks + kd.kd > 0),
      |best AS (SELECT *, row_number() OVER (PARTITION BY doc_id, src_idx
      |    ORDER BY margin DESC, dst_idx) AS rb FROM m)
      |SELECT 'http://m.org/' || CAST(doc_id AS VARCHAR) AS cluster_key,
      |  'de' AS src_lang, 'en' AS dst_lang,
      |  CAST(src_idx AS BIGINT) AS src_idx,
      |  CAST(dst_idx AS BIGINT) AS dst_idx,
      |  'S ' || CAST(doc_id AS VARCHAR) || ' de ' || CAST(src_idx AS VARCHAR)
      |    AS src_sentence,
      |  'S ' || CAST(doc_id AS VARCHAR) || ' en ' || CAST(dst_idx AS VARCHAR)
      |    AS dst_sentence,
      |  round(cos, 4) AS cos_sim, round(margin, 4) AS margin
      |FROM best WHERE rb = 1 AND margin >= 1.0
      |ORDER BY cluster_key, src_idx""".stripMargin) { (s, d) =>
    val id = col("doc_id").cast("string")
    def aligned(i: Column) = transform(sequence(lit(1), lit(8)),
      j => ((col("doc_id") * 31 + i * 13 + j * 17) % 97).cast("double")
        / lit(8.0))
    val decoy = transform(sequence(lit(1), lit(8)),
      j => ((col("doc_id") * 29 + lit(5) + j * 23) % 97).cast("double")
        / lit(8.0))
    def side(lang: String, n: Int) = Tables.documents(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), explode(sequence(lit(0L), lit(n - 1L))).as("i"))
      .select(
        concat(lit("http://m.org/"), id).as("cluster_key"),
        lit(lang).as("lang"), col("i").as("idx"),
        concat(lit("S "), id, lit(s" $lang "), col("i").cast("string"))
          .as("sentence"),
        when(col("i") < 3, aligned(col("i"))).otherwise(decoy)
          .as("embedding"))
    TextAnalysis.bitextMineByMargin(
        side("en", 3).unionByName(side("de", 4)), k = 2)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .withColumn("margin", round(col("margin"), 4))
      .orderBy("cluster_key", "src_idx")
  }

  /** Hint-blended frontier ranking
    * ([[graft.runtime.FrontierLink.frontierFromCounts]] — the q195
    * frontier with sitemap changefreq (q246), publish-date recency
    * (q245) and domain pass-rate (q201) folded into the per-host order
    * as the exact integer-micros score
    * `(4·inlink + 2·fresh + recency + 3·reputation) / 10`).
    * GROUND-TRUTH oracle: every signal is planted by modulus — capped
    * in-link counts (one 20-link row exercises the `least(·,16)` cap),
    * sparse hints (doc_id%3=0 rows carry NONE and must score neutral;
    * doc_id%10=0 rows carry TWO sitemap rows and the freshest must
    * win WITHOUT fanning the frontier out), sparse dates keyed on a
    * modulus COPRIME to the host modulus (so dated and undated URLs
    * coexist within one host — an undated URL scoring max-recency
    * instead of neutral flips a rank; ages past 100 days clamp to
    * zero), a reputation ladder whose top rung exceeds 1e6 and must
    * clamp, and TEN hosts absent from the reputation table that must
    * score neutral, not zero — so DuckDB re-derives the full blend,
    * the per-host rank, the top-3 cut, and the politeness slots. */
  val q259HintedFrontier: Q = q("q259_hinted_frontier",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 240),
      |l AS (SELECT doc_id,
      |    'h' || CAST(doc_id % 40 AS VARCHAR) || '.org' AS host,
      |    'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.org/p/' ||
      |      CAST(doc_id AS VARCHAR) AS url,
      |    CASE WHEN doc_id % 37 = 0 THEN 20
      |         ELSE 1 + doc_id % 5 END AS inlinks FROM t),
      |f AS (SELECT * FROM l WHERE doc_id % 11 <> 0),
      |s AS (SELECT *,
      |    least(inlinks, 16) * 62500 AS inl,
      |    CASE WHEN doc_id % 3 = 0 THEN 500000
      |      WHEN doc_id % 10 = 0 THEN 1000000 ELSE
      |      CASE doc_id % 7 WHEN 0 THEN 1000000 WHEN 1 THEN 900000
      |        WHEN 2 THEN 750000 WHEN 3 THEN 500000 WHEN 4 THEN 250000
      |        WHEN 5 THEN 100000 ELSE 0 END END AS fresh,
      |    CASE WHEN doc_id % 7 >= 4 THEN 500000
      |      ELSE greatest(0, 1000000 - (doc_id % 150) * 10000) END AS rec,
      |    CASE WHEN doc_id % 40 < 30
      |      THEN least((doc_id % 40) % 6 * 250000, 1000000)
      |      ELSE 500000 END AS rep
      |  FROM f),
      |sc AS (SELECT host, url, CAST(inlinks AS BIGINT) AS inlinks,
      |    (inl * 4 + fresh * 2 + rec + rep * 3) // 10 AS score FROM s),
      |r AS (SELECT *, row_number() OVER (PARTITION BY host
      |    ORDER BY score DESC, inlinks DESC, url) AS rn FROM sc)
      |SELECT host AS domain, url, inlinks, CAST(rn AS BIGINT) AS rank,
      |  CAST(1000 AS BIGINT) AS delay_ms,
      |  CAST((rn - 1) * 1000 AS BIGINT) AS not_before_ms
      |FROM r WHERE rn <= 3 ORDER BY domain, rank""".stripMargin) { (s, d) =>
    import graft.runtime.FrontierLink
    val base = Tables.documents(s, d).filter(col("doc_id") < 240)
    val m40 = (col("doc_id") % 40).cast("string")
    val url = concat(lit("http://h"), m40, lit(".org/p/"),
      col("doc_id").cast("string"))
    val nLinks = when(col("doc_id") % 37 === 0, lit(20L))
      .otherwise(lit(1L) + col("doc_id") % 5)
    val links = base
      .select(url.as("link"), explode(sequence(lit(1L), nLinks)).as("graft_i"))
      .select("link")
    val crawled = base.filter(col("doc_id") % 11 === 0).select(url.as("url"))
    val hints = base.filter(col("doc_id") % 3 =!= 0).select(url.as("url"),
      element_at(typedLit(Seq("always", "hourly", "daily", "weekly",
          "monthly", "yearly", "never")),
        (col("doc_id") % 7).cast("int") + 1).as("changefreq"))
      // a second sitemap lists some URLs again — the freshest hint
      // must win and the frontier must NOT fan out to two rows
      .unionByName(base
        .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 10 === 0)
        .select(url.as("url"), lit("always").as("changefreq")))
    // date modulus 7 is COPRIME to the host modulus 40: every host
    // holds both dated and undated URLs (the null-recency trap)
    val dates = base.filter(col("doc_id") % 7 < 4).select(url.as("url"),
      (lit(1755300000000L) - (col("doc_id") % 150) * 86400000L)
        .as("published_ms"))
    // hosts h30..h39 are ABSENT from the reputation table on purpose:
    // unmeasured must score neutral, never zero
    val rep = Tables.documents(s, d).filter(col("doc_id") < 30).select(
      concat(lit("h"), col("doc_id").cast("string"), lit(".org")).as("host"),
      ((col("doc_id") % 6) * 250000L).as("pass_rate_micros"))
    FrontierLink.frontierPlan(links, crawled, None, "graftbot", 3, None,
        1000L, Some(hints), Some(dates), Some(rep), 1755300000000L)
      .orderBy("domain", "rank")
  }

  val q257WatExport: Q = q("q257_wat_export",
    """WITH t AS (SELECT doc_id FROM documents)
      |SELECT CAST(doc_id // 8 AS BIGINT) AS chunk_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
      |    - 1 AS BIGINT) AS rec_idx,
      |  'metadata' AS warc_type,
      |  'http://w.org/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'application/json' AS content_type,
      |  'http://w.org/' || CAST(doc_id AS VARCHAR) AS env_uri,
      |  'Tï ' || CAST(doc_id AS VARCHAR) || ' & co' AS title,
      |  'D ' || CAST(doc_id AS VARCHAR) AS description,
      |  'text/html' AS page_content_type,
      |  'http://peer' || CAST(doc_id % 5 AS VARCHAR) ||
      |    '.net/x?a=1&b=2,/rel/' || CAST(doc_id AS VARCHAR) AS links,
      |  TRUE AS length_ok
      |FROM t ORDER BY chunk_id, rec_idx""".stripMargin) { (s, d) =>
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><head><title>Tï "), id, lit(" &amp; co</title>"),
      lit("<meta name=\"description\" content=\"D "), id,
      lit("\"></head><body><a href=\"http://peer"),
      pmod(col("doc_id"), lit(5L)).cast("string"),
      lit(".net/x?a=1&amp;b=2\">l1</a> <a href=\"/rel/"), id,
      lit("\">l2</a></body></html>"))
    val pages = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("http://w.org/"), id).as("url"), html.as("html"))
    val chunks = Warc.watRecords(pages)
      .select(call_function("div",
          col("doc_id") - pmod(col("doc_id"), lit(8L)), lit(8L))
          .as("chunk_id"),
        col("doc_id"), col("wat_record"))
      .groupBy("chunk_id")
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), col("wat_record")))),
        x => x.getField("wat_record")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
    val parsed = Warc.parseWarcText(s, chunks).toDF()
      .withColumn("pj", from_json(col("body"), Warc.WatPayloadSchema))
    val env = col("pj").getField("Envelope")
    val respMeta = env.getField("Payload-Metadata")
      .getField("HTTP-Response-Metadata")
    val head = respMeta.getField("HTML-Metadata").getField("Head")
    parsed.select(
      col("chunk_id"), col("rec_idx"), col("warc_type"), col("target_uri"),
      col("content_type"),
      env.getField("WARC-Header-Metadata").getField("WARC-Target-URI")
        .as("env_uri"),
      head.getField("Title").as("title"),
      head.getField("Description").as("description"),
      respMeta.getField("Headers").getField("Content-Type")
        .as("page_content_type"),
      array_join(transform(
        respMeta.getField("HTML-Metadata").getField("Links"),
        l => l.getField("url")), ",").as("links"),
      (col("content_length") ===
        length(encode(col("body"), "UTF-8"))).as("length_ok"))
      .orderBy("chunk_id", "rec_idx")
  }

  /** CDXJ index export ([[graft.ops.Warc.cdxjLines]] over
    * [[graft.ops.Warc.parseWarcIndex]]): the third segment artifact —
    * `"<SURT urlkey> <timestamp14> {json}"` lines whose locators buy
    * random access into the segment. Messy planted URIs (uppercase
    * scheme/host, `www.` label, explicit `:80`, query params out of
    * order) exercise the full [[graft.ops.WebText.surtKey]] transform;
    * the query re-parses its OWN lines (token split + JSON reads) and
    * the oracle reconstructs everything from the construction: the
    * urlkey spelled out directly (reversed labels, dropped www/port,
    * sorted query), and length/offset as the q191 running-sum
    * record-string reconstruction — one header byte miscounted and a
    * locator drifts. */
  val q260CdxjExport: Q = q("q260_cdxj_export",
    """WITH src AS (SELECT doc_id, text FROM documents
      |  WHERE text IS NOT NULL),
      |u AS (SELECT doc_id, text,
      |  'HTTP://WWW.Ex' || CAST(doc_id % 5 AS VARCHAR) || '.ORG:80/P/' ||
      |    CAST(doc_id AS VARCHAR) || '?b=2&a=' ||
      |    CAST(doc_id % 3 AS VARCHAR) AS uri FROM src),
      |rec AS (SELECT doc_id, doc_id // 8 AS chunk_id, uri,
      |  'WARC/1.0' || e'\r\n' || 'WARC-Type: response' || e'\r\n' ||
      |  'WARC-Target-URI: ' || uri || e'\r\n' ||
      |  CASE WHEN doc_id % 8 = 3
      |    THEN 'WARC-Truncated: length' || e'\r\n' ELSE '' END ||
      |  'Content-Type: text/plain' || e'\r\n' ||
      |  'Content-Length: ' || CAST(strlen(text) AS VARCHAR) ||
      |    e'\r\n\r\n' || text || e'\r\n\r\n' AS r,
      |  md5(text) AS digest FROM u),
      |loc AS (SELECT chunk_id, doc_id, uri, digest, strlen(r) AS rb,
      |  row_number() OVER (PARTITION BY chunk_id ORDER BY doc_id) - 1
      |    AS rec_idx,
      |  sum(strlen(r)) OVER (PARTITION BY chunk_id ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) - strlen(r) AS off FROM rec)
      |SELECT 'org,ex' || CAST(doc_id % 5 AS VARCHAR) || ')/p/' ||
      |    CAST(doc_id AS VARCHAR) || '?a=' || CAST(doc_id % 3 AS VARCHAR)
      |    || '&b=2' AS urlkey,
      |  '20260101000000' AS ts, uri AS url, digest,
      |  CAST(rb AS VARCHAR) AS length, CAST(off AS VARCHAR) AS offset,
      |  'seg-' || CAST(chunk_id AS VARCHAR) || '.warc' AS filename,
      |  CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(rec_idx AS BIGINT) AS rec_idx
      |FROM loc ORDER BY urlkey""".stripMargin) { (s, d) =>
    val uri = concat(lit("HTTP://WWW.Ex"), (col("doc_id") % 5).cast("string"),
      lit(".ORG:80/P/"), col("doc_id").cast("string"),
      lit("?b=2&a="), (col("doc_id") % 3).cast("string"))
    val chunks = Warc.syntheticWarcChunks(
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select("doc_id", "text"), uri = uri)
    val lines = Warc.cdxjLines(Warc.parseWarcIndex(s, chunks),
      filename = concat(lit("seg-"), col("chunk_id").cast("string"),
        lit(".warc")))
    val json = regexp_extract(col("cdxj_line"), "^(\\S+) (\\S+) (.*)$", 3)
    lines.select(
      regexp_extract(col("cdxj_line"), "^(\\S+) (\\S+) (.*)$", 1)
        .as("urlkey"),
      regexp_extract(col("cdxj_line"), "^(\\S+) (\\S+) (.*)$", 2).as("ts"),
      get_json_object(json, "$.url").as("url"),
      get_json_object(json, "$.digest").as("digest"),
      get_json_object(json, "$.length").as("length"),
      get_json_object(json, "$.offset").as("offset"),
      get_json_object(json, "$.filename").as("filename"),
      col("chunk_id"), col("rec_idx"))
      .orderBy("urlkey")
  }

  /** X-Robots-Tag header parsing
    * ([[graft.ops.WebText.headerRobotsSignals]] over
    * [[graft.ops.Http.xRobotsTags]]): the HTTP-layer robots channel —
    * repeated headers, case-folded directives, agent-scoped rules
    * (`graftbot:` applies, `otherbot:` must be ignored), and the
    * colon ambiguity (`unavailable_after: <date>` is a DIRECTIVE, not
    * an agent scope — a scope-first parser silently drops it).
    * GROUND-TRUTH oracle: expected directive strings per planted
    * modulus, spelled out. */
  val q261XRobots: Q = q("q261_x_robots",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS m
      |  FROM documents)
      |SELECT 'http://x.org/' || CAST(doc_id AS VARCHAR) AS url,
      |  CASE m WHEN 0 THEN 'noarchive,nofollow,noindex'
      |         WHEN 1 THEN 'noindex'
      |         WHEN 2 THEN 'unavailable_after: 25 jun 2026 15:00:00 pst'
      |         ELSE '' END AS directives,
      |  m IN (0, 1) AS noindex,
      |  m = 0 AS nofollow
      |FROM t ORDER BY url""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 4
    val hdrs = when(m === 0, lit("X-Robots-Tag: noindex\r\n" +
        "X-Robots-Tag: NOFOLLOW, noarchive\r\n"))
      .when(m === 1, lit("X-Robots-Tag: graftbot: noindex\r\n" +
        "X-Robots-Tag: otherbot: noarchive\r\n"))
      .when(m === 2,
        lit("X-Robots-Tag: unavailable_after: 25 Jun 2026   " +
          "15:00:00 PST\r\n"))
      .otherwise(lit(""))
    val docs = Tables.documents(s, d).select(
      concat(lit("http://x.org/"), col("doc_id").cast("string")).as("url"),
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"), hdrs,
        lit("\r\n<html>ok</html>")).as("payload"))
    WebText.headerRobotsSignals(docs, "url", "payload", "graftbot")
      .orderBy("url")
  }

  /** WARC revisit-record dedup ([[graft.ops.Warc.revisitDedup]] →
    * [[graft.ops.Warc.parseWarcText]]): planted duplicate payloads
    * (50 digest groups) collapse to one full `response` record per
    * digest plus ~200-byte `revisit` stubs naming the first capture —
    * the archive-format dedup. The records round-trip through the
    * library's own cursor (a stub's `Content-Length: 0` framing slip
    * would desync every following record in its chunk), first captures
    * as FULL `application/http; msgtype=response` blocks (the r15
    * fidelity upgrade — the oracle reconstructs the whole HTTP block
    * string, so a status-line or header byte drift moves the envelope
    * Content-Length and desyncs), and the oracle re-derives
    * first-capture choice (min uri per digest), refers-to targets,
    * digests, types, lengths and bodies from the construction. The
    * HTTP-layer decode is q267's oracle. */
  val q262RevisitDedup: Q = q("q262_revisit_dedup",
    """WITH src AS (SELECT doc_id FROM documents),
      |t AS (SELECT doc_id, 'http://r.org/' || CAST(doc_id AS VARCHAR)
      |    AS uri,
      |  'payload ' || CAST(doc_id % 50 AS VARCHAR) AS body FROM src),
      |g AS (SELECT *, row_number() OVER (PARTITION BY body ORDER BY uri)
      |    AS rn, min(uri) OVER (PARTITION BY body) AS first FROM t),
      |h AS (SELECT *,
      |  'HTTP/1.1 200 OK' || e'\r\n' ||
      |  'Content-Type: text/html; charset=utf-8' || e'\r\n' ||
      |  'Content-Length: ' || CAST(strlen(body) AS VARCHAR) ||
      |    e'\r\n\r\n' || body AS http FROM g)
      |SELECT doc_id, uri AS target_uri, rn > 1 AS is_revisit,
      |  CASE WHEN rn > 1 THEN first ELSE '' END AS refers_to,
      |  md5(body) AS digest,
      |  CASE WHEN rn > 1 THEN 'revisit' ELSE 'response' END AS warc_type,
      |  CAST(CASE WHEN rn > 1 THEN 0 ELSE strlen(http) END AS BIGINT)
      |    AS content_length,
      |  CASE WHEN rn > 1 THEN '' ELSE http END AS body
      |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("http://r.org/"), col("doc_id").cast("string")).as("url"),
      concat(lit("payload "), (col("doc_id") % 50).cast("string")).as("text"))
    val deduped = Warc.revisitDedup(docs)
    val chunks = deduped
      .select(call_function("div",
          col("doc_id") - pmod(col("doc_id"), lit(8L)), lit(8L))
          .as("chunk_id"),
        col("doc_id"), col("warc_record"))
      .groupBy("chunk_id")
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), col("warc_record")))),
        x => x.getField("warc_record")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
    Warc.parseWarcText(s, chunks).toDF()
      .select(col("target_uri"), col("warc_type"), col("content_length"),
        col("body"))
      .join(deduped.select(col("url").as("target_uri"), col("doc_id"),
        col("is_revisit"), col("refers_to"), col("digest")), Seq("target_uri"))
      .select("doc_id", "target_uri", "is_revisit", "refers_to", "digest",
        "warc_type", "content_length", "body")
      .orderBy("doc_id")
  }

  /** Index-driven random access ([[graft.ops.Warc.fetchByLocator]] —
    * the CDX reader half): build the index over synthesized chunks,
    * keep only every ninth document's locator (the "fetch N documents
    * out of the archive" shape), slice each record out of its chunk
    * by offset/length and re-parse exactly it. The oracle re-derives
    * every fetched field from the construction — if a locator were
    * off by one byte the slice would fail the cursor and the row
    * would flip invalid/hash-diverge. */
  val q263FetchByLocator: Q = q("q263_fetch_by_locator",
    """WITH src AS (SELECT doc_id, text FROM documents
      |  WHERE text IS NOT NULL),
      |loc AS (SELECT doc_id // 8 AS chunk_id, doc_id, text,
      |  row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id) - 1
      |    AS rec_idx FROM src)
      |SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(rec_idx AS BIGINT) AS rec_idx,
      |  'response' AS warc_type,
      |  'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'text/plain' AS content_type,
      |  CAST(strlen(text) AS BIGINT) AS content_length,
      |  text AS body, TRUE AS valid
      |FROM loc WHERE doc_id % 9 = 0
      |ORDER BY chunk_id, rec_idx""".stripMargin) { (s, d) =>
    val chunks = Warc.syntheticWarcChunks(
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select("doc_id", "text")).localCheckpoint()
    val wanted = Warc.parseWarcIndex(s, chunks)
      .filter(regexp_extract(col("target_uri"), "/([0-9]+)$", 1)
        .cast("long") % 9 === 0)
    Warc.fetchByLocator(s, chunks, wanted).toDF()
      .orderBy("chunk_id", "rec_idx")
  }

  /** Hard-negative mining ([[graft.ops.Similarity.hardNegatives]] over
    * [[graft.ops.Similarity.cosineTopK]] candidates): exact dyadic
    * embeddings with labels planted by modulus — the oracle mirrors
    * BOTH stages (the top-8 candidate cut, then the cross-label
    * re-rank to 3), so a cross-label item ranked 9th overall correctly
    * never surfaces. Cosines round to 4 decimals BEFORE ranking (the
    * q40 discipline) with c_id tie-breaks, so ranks can never drift
    * between engines. */
  val q264HardNegatives: Q = q("q264_hard_negatives",
    """WITH e AS (SELECT vec_id, list_transform(range(1, 17),
      |    j -> CAST((vec_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM embeddings),
      |sims AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |    'l' || CAST(q.vec_id % 4 AS VARCHAR) AS anchor_label,
      |    'l' || CAST(c.vec_id % 4 AS VARCHAR) AS neg_label,
      |    round(list_sum(list_transform(range(1, 17),
      |        j -> q.v[j] * c.v[j])) /
      |      (sqrt(list_sum(list_transform(range(1, 17),
      |         j -> q.v[j] * q.v[j]))) *
      |       sqrt(list_sum(list_transform(range(1, 17),
      |         j -> c.v[j] * c.v[j])))), 4) AS cos_sim
      |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 6),
      |cand AS (SELECT * FROM (SELECT *, row_number() OVER
      |    (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
      |  FROM sims) WHERE rnk <= 8),
      |neg AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id) AS neg_rank
      |  FROM cand WHERE neg_label <> anchor_label)
      |SELECT q_id, anchor_label, CAST(neg_rank AS BIGINT) AS neg_rank,
      |  c_id, neg_label, cos_sim
      |FROM neg WHERE neg_rank <= 3 ORDER BY q_id, neg_rank""".stripMargin) {
    (s, d) =>
    import graft.ops.Similarity
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      transform(sequence(lit(1), lit(16)),
        j => ((col("vec_id") * 31 + j * 17) % 97).cast("double") / lit(8.0))
        .as("embedding"),
      concat(lit("l"), (col("vec_id") % 4).cast("string")).as("label"))
    Similarity.hardNegatives(
        Similarity.cosineTopK(e.filter(col("vec_id") < 6), e, 8),
        e.select(col("vec_id"), col("label")), 3)
      .orderBy("q_id", "neg_rank")
  }

  /** Triplet assembly ([[graft.ops.Similarity.trainingTriplets]] —
    * each anchor's best same-label candidate joined beside its q264
    * hard negatives): the `(anchor, positive, negative)` unit a
    * contrastive loss consumes, mirrored stage-for-stage in the
    * oracle (top-8 pool → positive argmax → cross-label re-rank to 2,
    * anchors without an in-pool positive emit nothing). */
  val q265TrainingTriplets: Q = q("q265_training_triplets",
    """WITH e AS (SELECT vec_id, list_transform(range(1, 17),
      |    j -> CAST((vec_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM embeddings),
      |sims AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |    'l' || CAST(q.vec_id % 4 AS VARCHAR) AS anchor_label,
      |    'l' || CAST(c.vec_id % 4 AS VARCHAR) AS c_label,
      |    round(list_sum(list_transform(range(1, 17),
      |        j -> q.v[j] * c.v[j])) /
      |      (sqrt(list_sum(list_transform(range(1, 17),
      |         j -> q.v[j] * q.v[j]))) *
      |       sqrt(list_sum(list_transform(range(1, 17),
      |         j -> c.v[j] * c.v[j])))), 4) AS cos_sim
      |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 6),
      |cand AS (SELECT * FROM (SELECT *, row_number() OVER
      |    (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
      |  FROM sims) WHERE rnk <= 8),
      |pos AS (SELECT q_id, anchor_label, c_id AS pos_id,
      |    cos_sim AS pos_cos FROM (SELECT *, row_number() OVER
      |    (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS pr
      |  FROM cand WHERE c_label = anchor_label) WHERE pr = 1),
      |neg AS (SELECT q_id, c_id AS neg_id, cos_sim AS neg_cos,
      |    row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, c_id) AS neg_rank
      |  FROM cand WHERE c_label <> anchor_label)
      |SELECT pos.q_id, pos.anchor_label, pos.pos_id, pos.pos_cos,
      |  CAST(neg.neg_rank AS BIGINT) AS neg_rank, neg.neg_id, neg.neg_cos
      |FROM pos JOIN neg ON neg.q_id = pos.q_id AND neg.neg_rank <= 2
      |ORDER BY pos.q_id, neg_rank""".stripMargin) { (s, d) =>
    import graft.ops.Similarity
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      transform(sequence(lit(1), lit(16)),
        j => ((col("vec_id") * 31 + j * 17) % 97).cast("double") / lit(8.0))
        .as("embedding"),
      concat(lit("l"), (col("vec_id") % 4).cast("string")).as("label"))
    Similarity.trainingTriplets(
        Similarity.cosineTopK(e.filter(col("vec_id") < 6), e, 8),
        e.select(col("vec_id"), col("label")), kNeg = 2)
      .orderBy("q_id", "neg_rank")
  }

  /** Combined robots verdict ([[graft.ops.WebText.robotsGate]] — meta
    * tag AND X-Robots-Tag header, most-restrictive-wins, in ONE
    * projection): five planted cohorts crossing the channels (meta
    * only, header only, split across both, neither, header `none`
    * implying both restrictions). GROUND-TRUTH oracle per modulus. */
  val q266RobotsGate: Q = q("q266_robots_gate",
    """WITH t AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS m
      |  FROM documents)
      |SELECT 'http://g.org/' || CAST(doc_id AS VARCHAR) AS url,
      |  CASE m WHEN 0 THEN 'noindex' WHEN 2 THEN 'nofollow'
      |    ELSE '' END AS meta_directives,
      |  CASE m WHEN 1 THEN 'nofollow' WHEN 2 THEN 'noindex'
      |    WHEN 4 THEN 'none' ELSE '' END AS header_directives,
      |  m IN (0, 2, 4) AS noindex,
      |  m IN (1, 2, 4) AS nofollow
      |FROM t ORDER BY url""".stripMargin) { (s, d) =>
    val m = col("doc_id") % 5
    val metaTag = when(m === 0,
        lit("<meta name=\"robots\" content=\"noindex\">"))
      .when(m === 2, lit("<meta name=\"robots\" content=\"nofollow\">"))
      .otherwise(lit(""))
    val hdr = when(m === 1, lit("X-Robots-Tag: nofollow\r\n"))
      .when(m === 2, lit("X-Robots-Tag: noindex\r\n"))
      .when(m === 4, lit("X-Robots-Tag: none\r\n"))
      .otherwise(lit(""))
    val docs = Tables.documents(s, d).select(
      concat(lit("http://g.org/"), col("doc_id").cast("string")).as("url"),
      concat(lit("<html><head>"), metaTag,
        lit("</head><body>x</body></html>")).as("html"),
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"), hdr,
        lit("\r\n<html>x</html>")).as("payload"))
    WebText.robotsGate(docs).orderBy("url")
  }

  /** Full-fidelity WARC response records
    * ([[graft.ops.Warc.revisitDedup]] first captures →
    * [[graft.ops.Warc.parseWarcHttpDocs]]): the writer now emits
    * complete `application/http; msgtype=response` blocks — status
    * line (reason phrase included), Content-Type with the declared
    * utf-8 charset, octet-exact Content-Length at BOTH layers — so a
    * written archive round-trips through the real-CommonCrawl reader
    * path. Statuses and media types vary by planted moduli (exercising
    * four reason phrases), bodies carry a non-ASCII é (an octet/char
    * mixup at either layer desyncs the cursor or truncates the
    * decode), and the oracle reconstructs status/type/charset/decoded
    * body directly from the construction. */
  val q267HttpResponseRecords: Q = q("q267_http_response_records",
    """WITH t AS (SELECT doc_id,
      |  'http://f.org/' || CAST(doc_id AS VARCHAR) AS uri,
      |  'Body é ' || CAST(doc_id AS VARCHAR) || ' fin.' AS body,
      |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 200 WHEN 1 THEN 404
      |    WHEN 2 THEN 301 ELSE 503 END AS status,
      |  CASE WHEN doc_id % 2 = 0 THEN 'text/html' ELSE 'text/plain' END
      |    AS mt
      |  FROM documents)
      |SELECT uri AS target_uri, CAST(status AS INT) AS status_code,
      |  mt AS content_type, 'utf-8' AS charset, body AS text,
      |  TRUE AS valid
      |FROM t ORDER BY target_uri""".stripMargin) { (s, d) =>
    val m4 = col("doc_id") % 4
    val status = when(m4 === 0, 200).when(m4 === 1, 404)
      .when(m4 === 2, 301).otherwise(503)
    val media = when(col("doc_id") % 2 === 0, "text/html")
      .otherwise("text/plain")
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("http://f.org/"), col("doc_id").cast("string")).as("url"),
      concat(lit("Body é "), col("doc_id").cast("string"), lit(" fin."))
        .as("text"))
    val recs = Warc.revisitDedup(docs, status = status, mediaType = media)
    val chunks = recs
      .select((col("doc_id") / 8).cast("long").as("chunk_id"),
        col("doc_id"), col("warc_record"))
      .groupBy("chunk_id")
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), col("warc_record")))),
        x => x.getField("warc_record")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
    Warc.parseWarcHttpDocs(s, chunks).toDF()
      .select("target_uri", "status_code", "content_type", "charset",
        "text", "valid")
      .orderBy("target_uri")
  }

  /** Revisit RESOLUTION round-trip ([[graft.ops.Warc.resolveRevisits]]
    * over [[graft.ops.Warc.revisitDedup]]'s archive + its own index):
    * `resolve(dedup(corpus)) == corpus` — every stub dereferences
    * through the index to its first capture's HTTP-decoded payload,
    * digest-verified. Five of fifty digest groups have their FIRST
    * CAPTURE dropped from the archive (a deleted/compacted segment):
    * their stubs must surface `valid = false` with empty text, never a
    * silent payload. The oracle re-derives every row — dedup rank,
    * refers-to, the resolved text, and the dropped-cohort failures —
    * from the construction alone. */
  val q268ResolveRevisits: Q = q("q268_resolve_revisits",
    """WITH src AS (SELECT doc_id FROM documents),
      |t AS (SELECT doc_id, 'http://r.org/' || CAST(doc_id AS VARCHAR)
      |    AS uri,
      |  'payload ' || CAST(doc_id % 50 AS VARCHAR) AS body,
      |  CAST(doc_id % 50 AS INT) % 10 = 7 AS dropped FROM src),
      |g AS (SELECT *, row_number() OVER (PARTITION BY body ORDER BY uri)
      |    AS rn, min(uri) OVER (PARTITION BY body) AS first FROM t)
      |SELECT doc_id, uri AS target_uri, rn > 1 AS is_revisit,
      |  CASE WHEN rn > 1 THEN first ELSE '' END AS refers_to,
      |  CASE WHEN rn > 1 AND dropped THEN '' ELSE body END AS text,
      |  NOT (rn > 1 AND dropped) AS valid
      |FROM g WHERE NOT (rn = 1 AND dropped)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("http://r.org/"), col("doc_id").cast("string")).as("url"),
      concat(lit("payload "), (col("doc_id") % 50).cast("string")).as("text"))
    val deduped = Warc.revisitDedup(docs)
    val dropped = (col("doc_id") % 50) % 10 === 7
    // the dropped cohort loses its RESPONSE record (the stubs stay)
    val kept = deduped.filter(col("is_revisit") || !dropped)
      .localCheckpoint()
    val chunks = kept
      .select((col("doc_id") / 8).cast("long").as("chunk_id"),
        col("doc_id"), col("warc_record"))
      .groupBy("chunk_id")
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("doc_id"), col("warc_record")))),
        x => x.getField("warc_record")), "").as("chunk"))
      .select(col("chunk_id"), encode(col("chunk"), "UTF-8").as("payload"))
      .localCheckpoint()
    val idx = Warc.parseWarcIndex(s, chunks)
    Warc.resolveRevisits(s, chunks, idx)
      .join(kept.select(col("url").as("target_uri"), col("doc_id")),
        Seq("target_uri"))
      .select("doc_id", "target_uri", "is_revisit", "refers_to", "text",
        "valid")
      .orderBy("doc_id")
  }

  /** Corpus-wide margin bitext mining
    * ([[graft.ops.TextAnalysis.bitextMineGlobalMd5]] — the CCMatrix
    * no-cluster-evidence regime: cross-language candidate generation +
    * the q258 ratio-margin scorer over candidate neighborhoods). The
    * md5-bucket contract variant (the q210 annLshMd5 trick) makes the
    * candidate set itself value-pinned: DuckDB re-derives every bucket
    * from its own md5 builtin, the candidate equi-join quadratically,
    * and then every cosine / k=2 neighborhood average / margin /
    * per-src argmax from the exact-dyadic construction (aligned de
    * sentences carry the identical embedding of their en twin; every
    * third doc adds an unaligned decoy). The sign-LSH throughput path
    * ([[graft.ops.TextAnalysis.bitextMineGlobal]]) is recall-floored
    * in TextAnalysisSpec against the buckets=1 exact reference. */
  val q269GlobalBitext: Q = q("q269_global_bitext",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 150),
      |en AS (SELECT doc_id, doc_id * 2 AS id,
      |    'S en ' || CAST(doc_id AS VARCHAR) AS sent,
      |    list_transform(range(1, 9),
      |      j -> CAST((doc_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM t),
      |de AS (
      |  SELECT doc_id, doc_id * 2 + 1 AS id,
      |    'S de ' || CAST(doc_id AS VARCHAR) AS sent,
      |    list_transform(range(1, 9),
      |      j -> CAST((doc_id * 31 + j * 17) % 97 AS DOUBLE) / 8.0) AS v
      |  FROM t
      |  UNION ALL
      |  SELECT doc_id, doc_id * 2 + 100001,
      |    'D de ' || CAST(doc_id AS VARCHAR),
      |    list_transform(range(1, 9),
      |      j -> CAST((doc_id * 29 + 5 + j * 23) % 97 AS DOUBLE) / 8.0)
      |  FROM t WHERE doc_id % 3 = 0),
      |ts AS (SELECT unnest(range(0, 4)) AS tt),
      |sb AS (SELECT de.id AS src_id,
      |    CAST(('0x' || substr(md5(CAST(de.id AS VARCHAR) || ':' || tt),
      |      1, 15)) AS BIGINT) % 32 + tt * 1000000 AS bucket
      |  FROM de, ts),
      |db AS (SELECT en.id AS dst_id,
      |    CAST(('0x' || substr(md5(CAST(en.id AS VARCHAR) || ':' || tt),
      |      1, 15)) AS BIGINT) % 32 + tt * 1000000 AS bucket
      |  FROM en, ts),
      |cand AS (SELECT DISTINCT src_id, dst_id FROM sb JOIN db
      |  USING (bucket)),
      |p AS (SELECT cand.src_id, cand.dst_id, de.sent AS src_sentence,
      |    en.sent AS dst_sentence,
      |    list_sum(list_transform(range(1, 9), j -> de.v[j] * en.v[j])) /
      |      (sqrt(list_sum(list_transform(range(1, 9),
      |         j -> de.v[j] * de.v[j]))) *
      |       sqrt(list_sum(list_transform(range(1, 9),
      |         j -> en.v[j] * en.v[j])))) AS cos
      |  FROM cand JOIN de ON de.id = cand.src_id
      |  JOIN en ON en.id = cand.dst_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |      ORDER BY cos DESC, dst_id) AS rs,
      |    row_number() OVER (PARTITION BY dst_id
      |      ORDER BY cos DESC, src_id) AS rd FROM p),
      |ks AS (SELECT src_id, avg(cos) AS ks FROM r WHERE rs <= 2
      |  GROUP BY 1),
      |kd AS (SELECT dst_id, avg(cos) AS kd FROM r WHERE rd <= 2
      |  GROUP BY 1),
      |m AS (SELECT r.src_id, r.dst_id, r.src_sentence, r.dst_sentence,
      |    r.cos, 2 * r.cos / (ks.ks + kd.kd) AS margin
      |  FROM r JOIN ks USING (src_id) JOIN kd USING (dst_id)
      |  WHERE ks.ks + kd.kd > 0),
      |best AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |    ORDER BY margin DESC, dst_id) AS rb FROM m)
      |SELECT 'de' AS src_lang, 'en' AS dst_lang,
      |  CAST(src_id AS BIGINT) AS src_id, CAST(dst_id AS BIGINT) AS dst_id,
      |  src_sentence, dst_sentence, round(cos, 4) AS cos_sim,
      |  round(margin, 4) AS margin
      |FROM best WHERE rb = 1 AND margin >= 1.0
      |ORDER BY src_id""".stripMargin) { (s, d) =>
    import graft.ops.TextAnalysis
    val base = Tables.documents(s, d).filter(col("doc_id") < 150)
    val envec = transform(sequence(lit(1), lit(8)),
      j => ((col("doc_id") * 31 + j * 17) % 97).cast("double") / lit(8.0))
    val devec = transform(sequence(lit(1), lit(8)),
      j => ((col("doc_id") * 29 + 5 + j * 23) % 97).cast("double") / lit(8.0))
    val en = base.select((col("doc_id") * 2).as("sent_id"),
      lit("en").as("lang"),
      concat(lit("S en "), col("doc_id").cast("string")).as("sentence"),
      envec.as("embedding"))
    val de = base.select((col("doc_id") * 2 + 1).as("sent_id"),
      lit("de").as("lang"),
      concat(lit("S de "), col("doc_id").cast("string")).as("sentence"),
      envec.as("embedding"))
    val decoy = base.filter(col("doc_id") % 3 === 0).select(
      (col("doc_id") * 2 + 100001).as("sent_id"), lit("de").as("lang"),
      concat(lit("D de "), col("doc_id").cast("string")).as("sentence"),
      devec.as("embedding"))
    TextAnalysis.bitextMineGlobalMd5(en.unionByName(de).unionByName(decoy),
        "de", "en", buckets = 32, tables = 4, k = 2)
      .select(col("src_lang"), col("dst_lang"), col("src_id"),
        col("dst_id"), col("src_sentence"), col("dst_sentence"),
        round(col("cos_sim"), 4).as("cos_sim"),
        round(col("margin"), 4).as("margin"))
      .orderBy("src_id")
  }

  /** Retry-After in the frontier scheduler
    * ([[graft.ops.Robots.retryAfterDemands]] →
    * [[graft.runtime.FrontierLink.frontierFromCounts]]'s `retry`
    * input): an explicit 429/503 `Retry-After` demand OVERRIDES the
    * error-ladder heuristic for its host — spacing becomes
    * `max(crawl-delay base, demand)` with no ladder multiplier, and
    * the host's first slot waits the demand out. GROUND-TRUTH oracle
    * by planted moduli: demanding hosts (one where the crawl-delay
    * base exceeds the demand and must win the max; one carrying BOTH a
    * demand and ladder-triggering history, where the demand must
    * silence the 8× multiplier; two demands per host where the max
    * wins), an HTTP-date form that maps to NO demand (clock-relative),
    * a 200 response whose Retry-After must be ignored (not an
    * overload status), and ladder-only hosts keeping base × 8. */
  val q270RetryAfter: Q = q("q270_retry_after",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 160),
      |l AS (SELECT doc_id, CAST(doc_id % 20 AS INT) AS hid,
      |  'h' || CAST(doc_id % 20 AS VARCHAR) || '.org' AS host,
      |  'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.org/p/' ||
      |    CAST(doc_id AS VARCHAR) AS url,
      |  1 + doc_id % 3 AS inlinks FROM t),
      |f AS (SELECT * FROM l WHERE doc_id % 11 <> 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY host
      |    ORDER BY inlinks DESC, url) AS rn FROM f),
      |sch AS (SELECT *,
      |  CASE WHEN hid % 2 = 0 THEN 2000 ELSE 1000 END AS base,
      |  CASE WHEN hid % 4 = 1 THEN 8 ELSE 1 END AS mult,
      |  CASE WHEN hid % 5 = 0 THEN
      |    (CASE WHEN hid = 0 THEN 1 ELSE hid END) * 1000 END AS demand
      |  FROM r WHERE rn <= 3),
      |dl AS (SELECT *, CASE WHEN demand IS NOT NULL
      |    THEN greatest(base, demand) ELSE base * mult END AS delay
      |  FROM sch)
      |SELECT host AS domain, url, CAST(inlinks AS BIGINT) AS inlinks,
      |  CAST(rn AS BIGINT) AS rank, CAST(delay AS BIGINT) AS delay_ms,
      |  CAST(coalesce(demand, 0) + (rn - 1) * delay AS BIGINT)
      |    AS not_before_ms
      |FROM dl ORDER BY domain, rank""".stripMargin) { (s, d) =>
    import graft.ops.Robots
    import graft.runtime.FrontierLink
    val base = Tables.documents(s, d).filter(col("doc_id") < 160)
    val hid = col("doc_id") % 20
    val url = concat(lit("http://h"), hid.cast("string"), lit(".org/p/"),
      col("doc_id").cast("string"))
    val links = base
      .select(url.as("link"),
        explode(sequence(lit(1L), lit(1L) + col("doc_id") % 3))
          .as("graft_i"))
      .select("link")
    val crawled = base.filter(col("doc_id") % 11 === 0).select(url.as("url"))
    // 20 rows, reused by five side frames below — materialized so each
    // reuse doesn't re-scan + re-distinct the documents table
    val hosts = base.select(hid.as("hid")).distinct().localCheckpoint()
    def hostOf(c: Column): Column =
      concat(lit("h"), c.cast("string"), lit(".org"))
    // even hosts ask for 2s spacing (no Disallow rules — admission is
    // not this query's subject, q195/q259 cover it)
    val robots = hosts.filter(col("hid") % 2 === 0)
      .select(hostOf(col("hid")).as("host"),
        lit("User-agent: *\nCrawl-delay: 2\n").as("robots_txt"))
    // hid%4=1 hosts are 50% 5xx -> ladder multiplier 8
    val hist = hosts.filter(col("hid") % 4 === 1)
      .select(hostOf(col("hid")).as("host"),
        explode(array(lit(503), lit(500), lit(200), lit(200)))
          .as("status_code"))
    // raw RESPONSES, extracted by retryAfterDemands: two overload
    // demands per demanding host (max wins), an HTTP-date form (no
    // demand — needs the caller's clock), a 200 decoy (ignored)
    val demandSec = when(col("hid") === 0, lit(1L))
      .otherwise(col("hid").cast("long"))
    val rh = hosts.filter(col("hid") % 5 === 0)
    val responses = rh.select(
        concat(lit("http://h"), col("hid").cast("string"), lit(".org/a"))
          .as("url"),
        concat(lit("HTTP/1.1 429 Too Many Requests\r\nRetry-After: "),
          demandSec.cast("string"), lit("\r\n\r\nslow down")).as("payload"))
      .unionByName(rh.select(
        concat(lit("http://h"), col("hid").cast("string"), lit(".org/b"))
          .as("url"),
        lit("HTTP/1.1 503 Service Unavailable\r\nRetry-After: 1\r\n\r\nx")
          .as("payload")))
      .unionByName(hosts.filter(col("hid") % 5 === 1).select(
        concat(lit("http://h"), col("hid").cast("string"), lit(".org/c"))
          .as("url"),
        lit("HTTP/1.1 503 Service Unavailable\r\nRetry-After: " +
          "Fri, 01 Jan 2027 00:00:00 GMT\r\n\r\nx").as("payload")))
      .unionByName(hosts.filter(col("hid") % 5 === 2).select(
        concat(lit("http://h"), col("hid").cast("string"), lit(".org/d"))
          .as("url"),
        lit("HTTP/1.1 200 OK\r\nRetry-After: 99\r\n\r\nok").as("payload")))
    val retry = Robots.retryAfterDemands(responses)
    FrontierLink.frontierPlan(links, crawled, Some(robots), "graftbot", 3,
        Some(hist), 1000L, None, None, None, 0L, Some(retry))
      .orderBy("domain", "rank")
  }

  /** Archive segment packing ([[graft.ops.Warc.packSegments]] — the
    * writer half of the segment contract: record COLUMNS become
    * target-sized segments with byte locators, per shard in caller
    * order, records never split, segments target-sized not
    * hard-capped). The oracle reconstructs every value with
    * running-sum windows over the q191-style record-string
    * reconstruction: octet lengths, the per-shard cumulative sum, the
    * floor-division segment assignment, the `shard·2²⁰ + seg` id, the
    * within-segment index and the offset rebase — one miscounted
    * header byte or an off-by-one in any window drifts a locator and
    * hash-diverges. The gzip layout + fetch round-trips are
    * WarcSpec-gated (compressed spans are not SQL-derivable, the q191
    * split). */
  val q271PackSegments: Q = q("q271_pack_segments",
    """WITH src AS (SELECT doc_id, text FROM documents
      |  WHERE text IS NOT NULL),
      |t AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard,
      |  'WARC/1.0' || e'\r\n' || 'WARC-Type: conversion' || e'\r\n' ||
      |  'WARC-Target-URI: http://p.org/' || CAST(doc_id AS VARCHAR) ||
      |    e'\r\n' ||
      |  'WARC-Date: 2026-01-01T00:00:00Z' || e'\r\n' ||
      |  'Content-Type: text/plain' || e'\r\n' ||
      |  'Content-Length: ' || CAST(strlen(text) AS VARCHAR) ||
      |    e'\r\n\r\n' || text || e'\r\n\r\n' AS r FROM src),
      |c AS (SELECT doc_id, shard, strlen(r) AS rb,
      |  CAST(coalesce(sum(strlen(r)) OVER (PARTITION BY shard
      |    ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS bef
      |  FROM t),
      |s AS (SELECT *, bef // 2000 AS seg FROM c),
      |o AS (SELECT *,
      |  CAST(CAST(shard AS BIGINT) * 1048576 + seg AS BIGINT)
      |    AS segment_id,
      |  row_number() OVER (PARTITION BY shard, seg ORDER BY doc_id) - 1
      |    AS rec_idx,
      |  bef - min(bef) OVER (PARTITION BY shard, seg) AS rec_offset
      |  FROM s)
      |SELECT doc_id, CAST(rb AS BIGINT) AS rec_bytes, segment_id,
      |  CAST(rec_idx AS BIGINT) AS rec_idx,
      |  CAST(rec_offset AS BIGINT) AS rec_offset
      |FROM o ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("shard"),
        concat(lit("http://p.org/"), col("doc_id").cast("string"))
          .as("url"),
        col("text"))
    Warc.packSegments(
        Warc.wetRecords(docs).withColumnRenamed("wet_record", "warc_record"),
        shardCol = "shard", ordCol = "doc_id",
        targetSegmentBytes = 2000L)
      .select(col("doc_id"), col("rec_bytes"), col("segment_id"),
        col("rec_idx"), col("rec_offset"))
      .orderBy("doc_id")
  }

  /** Terminal CDX sort ([[graft.ops.Warc.cdxClusterIndex]] — the
    * binary-search layout [[graft.ops.Warc.cdxjLines]] defers: global
    * (urlkey, line) order cut into fixed-size blocks, the
    * pywb/CommonCrawl cluster.idx convention). The oracle re-derives
    * rank/block/block_pos as one `row_number` window over the
    * construction — the engine side computes the SAME total order via
    * a range-shuffle + two-phase zipWithIndex rank (never a
    * single-partition corpus window), so this is exactly the
    * distributed-vs-declarative parity the q131 shard family pins.
    * Skewed reversed-domain keys (7 hosts over the corpus) make the
    * range sort's balance real. */
  val q272CdxCluster: Q = q("q272_cdx_cluster",
    """WITH t AS (SELECT doc_id FROM documents),
      |l AS (SELECT doc_id, 'com,ex' || CAST(doc_id % 7 AS VARCHAR) ||
      |    ')/p/' || CAST(doc_id AS VARCHAR) AS urlkey FROM t),
      |x AS (SELECT doc_id, urlkey, urlkey || ' 20260101000000 {"u":' ||
      |    CAST(doc_id AS VARCHAR) || '}' AS cdxj_line FROM l),
      |r AS (SELECT *, CAST(row_number() OVER (ORDER BY urlkey, cdxj_line)
      |    AS BIGINT) AS rank FROM x)
      |SELECT doc_id, urlkey, rank,
      |  CAST((rank - 1) // 16 AS BIGINT) AS block,
      |  CAST((rank - 1) % 16 AS BIGINT) AS block_pos
      |FROM r ORDER BY rank""".stripMargin) { (s, d) =>
    val urlkey = concat(lit("com,ex"), (col("doc_id") % 7).cast("string"),
      lit(")/p/"), col("doc_id").cast("string"))
    val lines = Tables.documents(s, d).select(col("doc_id"),
      urlkey.as("urlkey"),
      concat(urlkey, lit(" 20260101000000 {\"u\":"),
        col("doc_id").cast("string"), lit("}")).as("cdxj_line"))
    Warc.cdxClusterIndex(s, lines, linesPerBlock = 16L)
      .select("doc_id", "urlkey", "rank", "block", "block_pos")
      .orderBy("rank")
  }

  /** The maintained host-health aggregate driving the frontier's
    * ladder ([[graft.ops.Robots.healthCounts]] →
    * [[graft.ops.Robots.backoffFromCounts]] →
    * [[graft.runtime.FrontierLink.frontierFromCounts]]'s `health`
    * input — the 100 TB path where the back-off input is the
    * incremental [[graft.runtime.HostHealthLink]] table, never the
    * raw fetch log). GROUND-TRUTH oracle by planted moduli: 7 hosts
    * with EXACT error shares hid/10 (doc_id < 280 = 4 full 70-cycles,
    * so every (mod 7, mod 10) residue pair appears exactly 4 times —
    * shares 0 … 0.6 hit every ladder rung including the ≥ 100000 and
    * ≥ 500000 boundaries exactly), the oracle re-deriving counts,
    * floor-micros shares, multipliers, ranks and politeness slots
    * from the same rows. The health frame carries the table's
    * operability columns (`last_status`, `last_batch`) to pin that
    * [[graft.ops.Robots.backoffFromCounts]] is a projection extra
    * columns ride through. */
  val q275HealthFrontier: Q = q("q275_health_frontier",
    """WITH t AS (SELECT doc_id FROM documents WHERE doc_id < 280),
      |l AS (SELECT doc_id, CAST(doc_id % 7 AS INT) AS hid,
      |  'h' || CAST(doc_id % 7 AS VARCHAR) || '.org' AS host,
      |  'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.org/p/' ||
      |    CAST(doc_id AS VARCHAR) AS url,
      |  1 + doc_id % 3 AS inlinks FROM t),
      |hh AS (SELECT hid, COUNT(*) AS n,
      |  SUM(CASE WHEN doc_id % 10 < hid THEN 1 ELSE 0 END) AS e
      |  FROM l GROUP BY hid),
      |m AS (SELECT hid, CASE
      |  WHEN (e * 1000000) // n >= 500000 THEN 8
      |  WHEN (e * 1000000) // n >= 250000 THEN 4
      |  WHEN (e * 1000000) // n >= 100000 THEN 2
      |  ELSE 1 END AS mult FROM hh),
      |f AS (SELECT * FROM l WHERE doc_id % 11 <> 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY host
      |    ORDER BY inlinks DESC, url) AS rn FROM f),
      |s AS (SELECT r.*, m.mult FROM r JOIN m ON r.hid = m.hid
      |  WHERE rn <= 3)
      |SELECT host AS domain, url, CAST(inlinks AS BIGINT) AS inlinks,
      |  CAST(rn AS BIGINT) AS rank,
      |  CAST(1000 * mult AS BIGINT) AS delay_ms,
      |  CAST((rn - 1) * 1000 * mult AS BIGINT) AS not_before_ms
      |FROM s ORDER BY domain, rank""".stripMargin) { (s, d) =>
    import graft.ops.Robots
    import graft.runtime.FrontierLink
    val base = Tables.documents(s, d).filter(col("doc_id") < 280)
    val hid = col("doc_id") % 7
    val url = concat(lit("http://h"), hid.cast("string"), lit(".org/p/"),
      col("doc_id").cast("string"))
    val links = base
      .select(url.as("link"),
        explode(sequence(lit(1L), lit(1L) + col("doc_id") % 3))
          .as("graft_i"))
      .select("link")
    val crawled = base.filter(col("doc_id") % 11 === 0).select(url.as("url"))
    // the raw outcomes EXIST (one row per fetch) — but the frontier
    // consumes only their maintained aggregate, as a HostHealthLink
    // table would be: healthCounts is the link's per-batch merge shape
    val history = base.select(
      concat(lit("h"), hid.cast("string"), lit(".org")).as("host"),
      when(pmod(col("doc_id"), lit(10L)) < hid, 503).otherwise(200)
        .as("status_code"))
    val health = Robots.healthCounts(history)
      .withColumn("last_status", lit(200))
      .withColumn("last_batch", lit(0L))
    FrontierLink.frontierPlan(links, crawled, None, "graftbot", 3,
        None, 1000L, None, None, None, 0L, None, Some(health))
      .orderBy("domain", "rank")
  }

  val all: Seq[Q] = Seq(
    q30ExactDedup, q31HashDedup, q32JaccardNeardup, q33MinhashLsh, q34Simhash,
    q36SimhashNeardup,
    q35Fingerprint, q40CosineTopk, q41AnnLsh, q42EmbeddingStats, q43CosineNeardup,
    q44AnnIvf, q63LshCosineNeardup,
    q50TokenCounts, q51LangStats, q52DocQuality, q53LangId, q54BinaryMeta,
    q55HashFns, q56BuiltinHash, q57HeavyHitters, q58IncrementalDedup, q60Curation,
    q62GroupMinhash, q64HashSplit, q65QualityGates, q66Repetition,
    q67SeqPack, q68EmbedQuant, q69UnigramLogprob, q70PrepareCorpus,
    q71QuantTopk,
    q72DedupClusters, q73ChunkDedup, q74Decontaminate, q75PiiRedact,
    q76TemperatureMix, q77DomainCap, q78ClusterSurvivors,
    q79SemanticClusters, q80BigramLogprob, q81TextSearch, q82DupSpans,
    q83TfidfTopk, q84SpanClean, q85CorpusMix, q86IncrementalNeardup,
    q87CentroidOutliers, q88Bm25Topk, q89EditDistance, q90KnnGraph, q102CdcChunks, q103WpeMerges,
    q108WpeEncode,
    q109PplBuckets, q110DsirWeights, q111EncodeIds, q113KmeansAssign,
    q114MmrSelect, q115GumbelSample, q116RrfFusion, q117PcaProject,
    q118PqEncode, q119PqAdcTopk, q120PqReconError, q121IvfpqSearch,
    q122IvfpqAdc, q123JaccardStopshingles, q124CollapsedClusters,
    q125SemanticCollapsed, q126WavMeta, q127Mp4Meta, q128NormalizedDedup,
    q129MixedMedia, q130PageRank, q131ExportShards, q132PmiCollocations,
    q133MgHeavyHitters, q134EventPagerank, q136SemanticDecon, q137SourceKl,
    q138BestSurvivors, q139Containment, q140NfcDedup, q141Winnowing,
    q142Hits, q143UrlCanon, q144HtmlStrip, q145MediaGates, q146LogregScore,
    q147LogregTrain, q148GopherRules, q149LabelProp, q150CardLuhn,
    q151EntityMatch, q152StratifiedSample, q153MixedScript, q155HllUnion,
    q156CurationV2, q158RankNormalize, q159CompressionQuality,
    q160PiiStats, q161CorpusFingerprint, q162CollapseRuns, q163SimhashMd5,
    q164ImagePhash, q165GroupMinhashMd5, q166SimhashPairsMd5,
    q167HostLinkGraph, q168EncodingSignals, q169BoilerplateLines,
    q170DupLines, q171TopNgramChars, q172DupNgramCoverage,
    q173KeyConcentration, q174SlidingChunks, q175AnchorTexts,
    q176ZipfFit, q177LexicalDiversity, q178CrossSourceDup, q179CorpusDiff,
    q180HeapsFit, q181LengthDrift, q182DupRateBySource, q183NgramNovelty,
    q184SourceContainment, q185WarcIngest, q186SimhashPairsCapped,
    q187ImagePairOracle, q188WarcGzip, q189WarcCorpus, q190HttpSplit,
    q191WarcIndex, q192RobotsRules, q193RobotsGate, q194ScrubSpans,
    q195CrawlFrontier, q196Sitemap, q197ThresholdSweep, q198CharsetDecode,
    q199WetExtract, q200MimeSniff, q201DomainReputation, q202BigramBackoff,
    q203CrawlDelay, q204MixturePlan, q205Calibration, q206TokenShards,
    q207Revisit, q208AllocBudget, q209CrawlBudget, q210AnnLshOracle,
    q211ContentBlocks, q212MainContent, q213LangIdTrigram,
    q214JwNonAscii, q215WetMainContent, q216LangBudget,
    q217MetaRobots, q218Blocklist, q219Redirects, q220SitemapIndex,
    q221RobotsSitemaps, q222ResolveLinks, q223MetaCharset, q224PslDomains,
    q225GzipSitemap, q226IvfProbeRank, q227CrawlScheduler,
    q228RobotsWildcards, q229PslTable, q230PctNormalize,
    q231PageMeta, q232Revalidation, q233CanonicalLink, q234Hreflang,
    q235FeedDiscovery, q236FeedEntries, q237JsonLd, q238CanonicalWarc,
    q239Discovery, q240HttpCodings, q241Sentences, q242SentenceChunks,
    q243CaptureAudit, q244HreflangClusters, q245PublishDate,
    q246SitemapHints, q247Backoff, q248NofollowEdges, q249CharRefs,
    q250PqAdc, q251Bitext, q252IvfPqSearch, q253WetExport, q254BomDecode,
    q255IvfPqAdc, q256BitextHarvest, q257WatExport, q258MarginBitext,
    q259HintedFrontier, q260CdxjExport, q261XRobots, q262RevisitDedup,
    q263FetchByLocator, q264HardNegatives, q265TrainingTriplets,
    q266RobotsGate, q267HttpResponseRecords, q268ResolveRevisits,
    q269GlobalBitext, q270RetryAfter, q271PackSegments, q272CdxCluster,
    q275HealthFrontier)
}
