package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear text classifier over hashing-trick features — the fastText /
  * CCNet-shaped quality classifier every LLM data pipeline runs between
  * heuristic gates and expensive near-dup (SURVEY.md §2.3 curation):
  * score every document with `sigmoid(w · φ(text) + b)` where `φ` is a
  * hashed bag-of-words, keep documents above a threshold (or feed the
  * score into [[Curation.temperatureResample]]).
  *
  * Design for 100 TB:
  *  - **Inference is shuffle-free.** The weight vector is small by
  *    construction (`dim` ≤ tens of thousands of doubles), so scoring is
  *    a per-row higher-order expression: `aggregate(transform(tokens,
  *    t -> w[h(t)]), …)` with the weights as ONE plan literal — the same
  *    literal-lookup-table shape as [[Similarity.pqAdcTopK]]'s distance
  *    table. No join, no shuffle; the scorer lives inside the scan's
  *    whole-stage codegen.
  *  - **Training is a bounded driver loop** (the [[Similarity.kmeansFit]]
  *    shape): each batch-gradient round reduces to ≤ `dim` partial sums
  *    via one map-side-combined aggregation; only the dim-sized gradient
  *    reaches the driver. The feature frame is computed once and
  *    persisted — round cost is the aggregation, not re-tokenization.
  *  - **Engine-reproducible features.** The feature hash is the repo's
  *    md5-prefix idiom (`conv(substr(md5(tok),1,6),16,10) % dim` — same
  *    bytes in any engine), NOT a JVM hashCode, so train/score can run on
  *    different engines against the same model.
  */
object Classifier {

  /** Hashed feature id of one token: md5-prefix → [0, dim). Deterministic
    * across engines/partitionings (the [[Curation.hashSplit]] idiom).
    * r17: the 24-bit prefix is the native [[graft.functions.Md5Prefix24]]
    * kernel — value-identical to `conv(substring(md5(tok),1,6),16,10)`
    * (what the oracle derives) with no hex render/parse round-trip. */
  def featureId(tok: Column, dim: Int): Column =
    graft.functions.Md5Functions.md5Prefix24(tok) % dim

  /** Per-document feature ids (with multiplicity — bag of words).
    * r17: fused native kernel ([[graft.functions.HashedFeatureIds]]) —
    * the `transform(split, t -> featureId(t))` HOF ran the md5-hex
    * round-trip interpreted per token (§1.2 per-task work). */
  def hashedFeatures(text: Column, dim: Int): Column =
    graft.functions.ClassifierFunctions.hashedFeatureIds(split(text, " "), dim)

  /** Deterministic pseudo-weights in integer micros, derived from the
    * feature id by a Knuth multiplicative mix: w_micro(f) =
    * (f·2654435761) mod 1000001 − 500000 ∈ [−500000, 500500]. Used by
    * the oracle-checked scorer query (a TRAINED model's weights are
    * floats and engine-ordered sums — integer micros over a closed-form
    * table is the bit-exact cross-engine surface). */
  def pseudoWeightMicros(fid: Column): Column =
    (fid * 2654435761L) % 1000001L - 500000L

  /** Order-free linear score in integer micros under the pseudo-weight
    * table: Σ_tokens w_micro(h(tok)). Pure per-row expression — no
    * shuffle, stays in codegen. r17: ONE fused native pass
    * ([[graft.functions.PseudoScoreMicros]]) — the previous
    * `aggregate(transform(...))` fold evaluated both lambdas interpreted
    * per token, with an md5-hex render+parse inside (§1.2 per-task
    * work); the Long fold applies the identical ops in the identical
    * order, so values are bit-equal. */
  def pseudoScoreMicros(text: Column, dim: Int): Column =
    graft.functions.ClassifierFunctions.pseudoScoreMicros(split(text, " "), dim)

  /** Trained model: `weights(dim)` + bias. */
  final case class LinearModel(weights: Array[Double], bias: Double) {
    require(weights != null && weights.nonEmpty, "empty weight vector")
    def dim: Int = weights.length
  }

  /** Score documents with a trained model, shuffle-free: the weight
    * vector becomes one `array<double>` plan literal and each row does
    * `element_at` lookups inside `aggregate(...)`. Adds `score` (the
    * sigmoid probability). */
  def scoreWith(docs: DataFrame, model: LinearModel,
                textCol: String = "text"): DataFrame = {
    // r17: fused native fold ([[graft.functions.HashedLinearScore]]) —
    // same one-plan-constant shape as the element_at(array-literal)
    // aggregate it replaces, same left-to-right Double adds (so the
    // float result is identical, not merely close), no interpreted
    // per-token lambda, no dim-element literal expression tree.
    val z = graft.functions.ClassifierFunctions.hashedLinearScore(
      split(col(textCol), " "), model.weights, model.bias)
    docs.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Batch-gradient logistic regression on hashed features. `labelCol`
    * must be 0/1. Each round: p = σ(Xw + b) via a broadcast-joined weight
    * table, gradient g = Xᵀ(p − y)/n via ONE partial-aggregated groupBy
    * on feature id (≤ dim groups), collected to the driver (dim doubles
    * — the bounded trainer collect), then w ← w − lr·(g + l2·w). The
    * tokenized feature frame is built once and persisted across rounds.
    * Float sums are engine-ordered, so training is validated by loss
    * descent + holdout accuracy in ClassifierSpec, not a value oracle. */
  def trainLogRegHashed(spark: SparkSession, docs: DataFrame,
                        labelCol: String, dim: Int = 4096,
                        rounds: Int = 20, lr: Double = 0.5,
                        l2: Double = 1e-4,
                        textCol: String = "text"): LinearModel = {
    require(dim > 0 && dim <= (1 << 20), s"dim out of range: $dim")
    require(rounds > 0 && rounds <= 1000, s"rounds out of range: $rounds")
    // (doc key, fid, x) bag-of-words counts — computed once, reused per
    // round. `did` is CONTENT-KEYED (md5 of label ‖ text — the hashSplit
    // idiom), NOT monotonically_increasing_id: a persisted block evicted
    // and recomputed under a different upstream partition layout would
    // renumber positional ids between the perDoc aggregation and the
    // gradient join, silently misaligning residuals — a pure content key
    // cannot drift. Determinism contract: exact-duplicate (label, text)
    // rows collapse into ONE training example (dedup-before-train, the
    // standard curation order). The bias is feature id `dim` (x = 1 per
    // doc), so the bias gradient rides the SAME per-round aggregation
    // instead of its own driver action (one Spark job per round, not two).
    val feats = Spread.cpu(docs)
      .select(col(labelCol).cast("double").as("y"), col(textCol).as("graft_t"))
      .dropDuplicates("y", "graft_t")
      .select(col("y"),
        md5(concat_ws(" ", col("y"), col("graft_t"))).as("did"),
        explode(concat(hashedFeatures(col("graft_t"), dim),
          array(lit(dim.toLong)))).as("fid"))
      .groupBy("did", "y", "fid").agg(count(lit(1)).cast("double").as("x"))
      .persist()
    val n = feats.filter(col("fid") === dim).count().toDouble
    require(n > 0, "no documents to train on")

    var w = new Array[Double](dim + 1) // index dim = bias
    var r = 0
    while (r < rounds) {
      val wLit = array(w.toSeq.map(lit(_)): _*)
      // z per doc (bias included via fid=dim), residual (p − y), then the
      // gradient join-back — ≤ dim+1 rows reach the driver per round.
      val perDoc = feats.groupBy("did", "y")
        .agg(sum(col("x") * element_at(wLit, col("fid").cast("int") + 1)).as("z"))
        .select(col("did"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("resid"))
      val grad = feats.join(perDoc, "did")
        .groupBy("fid").agg(sum(col("x") * col("resid")).as("g"))
        .collect()
      val nw = w.clone()
      var i = 0
      while (i < dim) { nw(i) -= lr * l2 * w(i); i += 1 } // no L2 on bias
      grad.foreach { row =>
        val f = row.getLong(0).toInt
        nw(f) -= lr * row.getDouble(1) / n
      }
      w = nw
      r += 1
    }
    feats.unpersist()
    LinearModel(w.take(dim), w(dim))
  }

  /** Training log-loss of a model on a labeled frame (driver scalar). */
  def logLoss(docs: DataFrame, model: LinearModel, labelCol: String,
              textCol: String = "text"): Double = {
    val scored = scoreWith(docs, model, textCol)
      .select(col(labelCol).cast("double").as("y"),
        greatest(least(col("score"), lit(1 - 1e-12)), lit(1e-12)).as("p"))
    scored.agg(avg(-(col("y") * log(col("p"))
        + (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))))
      .head().getDouble(0)
  }

  /** Classifier-threshold calibration sweep — the precision/recall
    * operating curve a pipeline reads before picking its keep-threshold
    * (every quality gate is a threshold on SOME score; sweeping on the
    * corpus itself, not a held-out guess, is how the keep-rate/quality
    * trade is actually chosen). One row per DISTINCT score value `t`,
    * with the confusion counts of the rule `score ≥ t`: `tp`/`fp`/`fn`
    * and exact floor-micros precision/recall ([[Micros.ratio]] — Longs,
    * order-free, oracle-identical).
    *
    * Scale shape: the corpus collapses in ONE map-side-combined
    * (score → pos/neg counts) aggregate; the cumulative windows run
    * over the DISTINCT-SCORE table only — audit-sized by construction
    * (the [[Profile.keyConcentration]] bounded-cardinality contract; a
    * continuous score should be bucketed by the caller first, which is
    * what every published curve does anyway). */
  def thresholdSweep(docs: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame = {
    val agg = docs.groupBy(col(scoreCol).as("threshold"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val desc = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    agg
      .withColumn("tp", sum("pos").over(desc))
      .withColumn("fp", sum("neg").over(desc))
      .withColumn("fn", sum("pos").over(all) - col("tp"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        Micros.ratio(col("tp"), col("tp") + col("fp"))
          .as("precision_micros"),
        Micros.ratio(col("tp"), col("tp") + col("fn")).as("recall_micros"))
  }

  /** Reliability diagram / calibration table for a probability-scored
    * corpus — the audit that decides whether a quality classifier's
    * scores can be READ as probabilities (and so thresholded on
    * expected precision) or only as a ranking: scores bucketed into
    * `bins` equal-width bins over [0,1], each bin reporting its doc
    * count, positive count, mean predicted score, observed positive
    * rate, and the |gap| between them (the per-bin term of Expected
    * Calibration Error; ECE itself is `Σ n·gap / Σ n`, one trivial
    * rollup the caller or oracle does on this output). Determinism
    * discipline: the score enters as `floor(score·1e6)` per row — Long
    * sums are order-free where double sums are not — and every ratio is
    * the library-wide exact integral micros idiom.
    *
    * Scale shape: ONE map-side-combined groupBy on the bin id (≤ `bins`
    * groups); no window, no join — the cheapest possible full-corpus
    * audit. Out-of-range scores clamp into the edge bins rather than
    * silently vanishing from the diagram. */
  def calibrationBins(docs: DataFrame, scoreCol: String = "score",
                      labelCol: String = "label", bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    // clamp ONCE and feed both the bin id and the micros sum — an
    // out-of-range score landing in an edge bin with an out-of-range
    // mean would poison the gap it was clamped to avoid
    val sc = least(greatest(col(scoreCol), lit(0.0)), lit(1.0))
    val bin = least(floor(sc * bins).cast("long"), lit(bins - 1L))
    val scoreMicros = floor(sc * 1000000L).cast("long")
    docs.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(scoreMicros).as("graft_sm"))
      .select(col("bin"), col("n"), col("n_pos"),
        // graft_sm ≥ 0 (scores clamp to [0,1]) so the floor divide is
        // the plain nonneg integral divide
        call_function("div",
          col("graft_sm") - pmod(col("graft_sm"), col("n")), col("n"))
          .as("mean_score_micros"),
        Micros.ratio(col("n_pos"), col("n")).as("frac_pos_micros"))
      .withColumn("gap_micros",
        abs(col("mean_score_micros") - col("frac_pos_micros")))
  }
}
