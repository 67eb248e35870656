package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Static helpers for the fused hashed-feature classifier kernels — the
  * native form of [[graft.ops.Classifier]]'s per-row scoring HOFs.
  *
  * The classifier family previously scored each document with
  * `aggregate(transform(split(text, " "), t -> featureId(t)), …)`: the
  * lambda bodies run INTERPRETED per token, and `featureId` renders a
  * 32-char md5 hex string, substrings it, and string-parses base 16 for
  * every token (the [[Md5ShingleOps]] lesson). These kernels feed token
  * bytes straight into a thread-local digest and fold the sum in one
  * primitive loop. Values are bit-identical: the 24-bit prefix is
  * `conv(substring(md5(tok),1,6),16,10)` exactly, the Knuth-mix weight
  * and the Long/Double sums apply the same operations in the same
  * left-to-right token order as the `aggregate` fold. A null token makes
  * the whole result null — exactly what the built-in chain does
  * (md5(NULL) nulls the fold) — so the swap is observation-equivalent,
  * not just equivalent on split() output. */
object ClassifierOps {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(tok),1,6),16,10) % dim` without the hex
    * round-trip: first 3 digest bytes big-endian, mod dim. */
  @inline private def fid(d: MessageDigest, tok: Array[Byte], dim: Int): Long = {
    d.reset()
    val dig = d.digest(tok)
    (((dig(0) & 0xffL) << 16) | ((dig(1) & 0xffL) << 8) | (dig(2) & 0xffL)) % dim
  }

  /** Σ_tokens pseudoWeightMicros(featureId(tok)) — one fused pass; null
    * on a null element (aggregate-fold parity). */
  def pseudoScoreMicros(tokens: ArrayData, dim: Int): java.lang.Long = {
    val m = tokens.numElements()
    val d = md.get()
    var z = 0L
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) return null
      val f = fid(d, tokens.getUTF8String(i).getBytes, dim)
      z += (f * 2654435761L) % 1000001L - 500000L
      i += 1
    }
    z
  }

  /** Per-token hashed feature ids (bag of words, multiplicity kept) —
    * the native form of `transform(tokens, t -> featureId(t, dim))`.
    * A null token yields a null element (transform parity). */
  def featureIds(tokens: ArrayData, dim: Int): ArrayData = {
    val m = tokens.numElements()
    val d = md.get()
    var hasNull = false
    var i = 0
    while (i < m && !hasNull) { hasNull = tokens.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](m)
      i = 0
      while (i < m) {
        out(i) = fid(d, tokens.getUTF8String(i).getBytes, dim)
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](m)
      i = 0
      while (i < m) {
        out(i) =
          if (tokens.isNullAt(i)) null
          else java.lang.Long.valueOf(fid(d, tokens.getUTF8String(i).getBytes, dim))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** bias + Σ_tokens weights(featureId(tok)) in token order — the native
    * form of the trained-model `aggregate(…, lit(bias), acc + w[f+1])`
    * fold (Double adds left-to-right, so the float result is identical,
    * not merely close). Null on a null element. */
  def linearScore(tokens: ArrayData, weights: Array[Double],
                  bias: java.lang.Double): java.lang.Double = {
    val m = tokens.numElements()
    val d = md.get()
    var z = bias.doubleValue()
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) return null
      z += weights(fid(d, tokens.getUTF8String(i).getBytes, weights.length).toInt)
      i += 1
    }
    z
  }
}

/** Fused pseudo-weight linear score in integer micros — see
  * [[ClassifierOps.pseudoScoreMicros]]. */
case class PseudoScoreMicros(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0 && dim <= (1 << 24), s"dim out of range: $dim")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = s"pseudo_score_micros_$dim"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ClassifierOps.pseudoScoreMicros(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftScore")
      s"""
         |java.lang.Long $r = graft.functions.ClassifierOps.pseudoScoreMicros($c, $dim);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PseudoScoreMicros =
    copy(child = newChild)
}

/** Fused hashed feature ids (multiplicity kept) — see
  * [[ClassifierOps.featureIds]]. */
case class HashedFeatureIds(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0 && dim <= (1 << 24), s"dim out of range: $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = s"hashed_feature_ids_$dim"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ClassifierOps.featureIds(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ClassifierOps.featureIds($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedFeatureIds =
    copy(child = newChild)
}

/** Fused trained-model linear score (`bias + Σ w[h(tok)]`) — the weight
  * vector rides along as a plan-referenced double[] (the same one-literal
  * shape as the `element_at(array(...))` form it replaces, without the
  * per-token interpreted fold). See [[ClassifierOps.linearScore]]. */
case class HashedLinearScore(child: Expression, weights: Array[Double],
                             bias: Double) extends UnaryExpression {
  require(weights != null && weights.nonEmpty, "empty weight vector")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"hashed_linear_score_${weights.length}"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ClassifierOps.linearScore(input.asInstanceOf[ArrayData], weights, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("graftWeights", weights, "double[]")
    val bRef = ctx.addReferenceObj("graftBias", java.lang.Double.valueOf(bias),
      "java.lang.Double")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftScore")
      s"""
         |java.lang.Double $r = graft.functions.ClassifierOps.linearScore($c, $wRef, $bRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object ClassifierFunctions {
  /** Column API: fused pseudo-weight score in integer micros. */
  def pseudoScoreMicros(tokens: Column, dim: Int): Column =
    GraftSqlBridge.column(PseudoScoreMicros(GraftSqlBridge.expression(tokens), dim))

  /** Column API: fused hashed feature ids (multiplicity kept). */
  def hashedFeatureIds(tokens: Column, dim: Int): Column =
    GraftSqlBridge.column(HashedFeatureIds(GraftSqlBridge.expression(tokens), dim))

  /** Column API: fused trained-model linear score. */
  def hashedLinearScore(tokens: Column, weights: Array[Double], bias: Double): Column =
    GraftSqlBridge.column(HashedLinearScore(GraftSqlBridge.expression(tokens),
      weights, bias))
}
