package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd `UnaryExpression` —
  * canonical composition (é as one codepoint, not e + combining acute)
  * in front of exact dedup and content addressing. Two crawls of the
  * same page routinely differ ONLY in composed-vs-decomposed encoding,
  * which byte-level hashing treats as distinct content; normalizing
  * first makes the blake2b key canonical. The regex chain of
  * `Dedup.normalizeForDedup` deliberately does not touch this (it
  * canonicalizes case/punct/whitespace) — the two compose.
  *
  * Same design as [[Blake2bHash]]: analysis-time type check, inline
  * null handling, foldable over literals, and the JDK
  * `java.text.Normalizer` call (stateless, thread-safe) stays inside
  * the surrounding WholeStageCodegen span. NFC is the cheap no-loss
  * form (NFKC also folds compatibility glyphs but is lossy — ① → 1 —
  * so the dedup default is NFC; the DuckDB oracle side has the exact
  * counterpart `nfc_normalize`). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
