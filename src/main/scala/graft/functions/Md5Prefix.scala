package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static digest helper for [[Md5Prefix60]] — a plain JVM method so the
  * generated code calls straight into the digest with no expression-tree
  * interpretation. The `MessageDigest` is thread-local (MD5 instances are
  * stateful; allocation per row would dominate the hash itself). */
object Md5Ops {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(utf8 bytes) as a non-negative long —
    * bit-identical to `CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS
    * BIGINT)`: the 15 leading nibbles are the big-endian value of digest
    * bytes 0..7 shifted right one nibble. */
  def prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** First 6 hex nibbles of md5(utf8 bytes) as a non-negative long —
    * bit-identical to `CAST(CONV(SUBSTRING(MD5(x), 1, 6), 16, 10) AS
    * BIGINT)`: the 6 leading nibbles are the big-endian value of digest
    * bytes 0..2. The md5-bucket rule of `Curation.hashSplit` /
    * `Dedup.cdcChunks` / `Classifier.featureId`, minus the 32-char hex
    * render + base-16 string parse per row. */
  def prefix24(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(0) & 0xffL) << 16) | ((dig(1) & 0xffL) << 8) | (dig(2) & 0xffL)
  }
}

/** Native 60-bit md5-prefix hash: the engine-portable hash kernel of the
  * md5-contract dedup family ([[graft.ops.Dedup.simHashMd5]] /
  * `groupMinHashMd5`). Value-identical to the built-in chain
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long` — which per row
  * renders a 32-char hex string, substrings it, and string-parses base
  * 16 — but computed digest→long directly, so the per-row cost is the
  * MD5 itself. Stays inside the surrounding WholeStageCodegen span
  * (static call, no ScalaUDF fallback); DuckDB oracles keep deriving the
  * same value from their own md5/conv builtins, so the cross-engine
  * contract is unchanged. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"
  // hash of a literal is a literal — ConstantFolding evaluates it once

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.prefix60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/** Native 24-bit md5-prefix bucket: value-identical to
  * `conv(substring(md5(x), 1, 6), 16, 10) :: long` (the engine-portable
  * md5-bucket rule of [[graft.ops.Dedup.cdcChunks]] /
  * [[graft.ops.Classifier.featureId]]) but digest→long directly — no
  * 32-char hex render, no substring, no base-16 string parse per row.
  * Same codegen discipline as [[Md5Prefix60]]. */
case class Md5Prefix24(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix24"

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.prefix24(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.prefix24($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix24 =
    copy(child = newChild)
}

object Md5Functions {
  /** Column API: 60-bit md5-prefix hash of a string column. */
  def md5Prefix60(s: Column): Column =
    GraftSqlBridge.column(Md5Prefix60(GraftSqlBridge.expression(s)))

  /** Column API: 24-bit md5-prefix bucket of a string column. */
  def md5Prefix24(s: Column): Column =
    GraftSqlBridge.column(Md5Prefix24(GraftSqlBridge.expression(s)))
}
