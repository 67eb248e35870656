package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[ScriptGateLang]] — the fused form of the language
  * script gates in [[graft.ops.TextAnalysis.langIdTrigram]].
  *
  * The expression-chain form evaluated, per document, one `rlike` scan
  * per script plus (for the share test) one full `regexp_replace` REWRITE
  * of the text per script — up to 18 regex passes per row, and the gate
  * chain is referenced by two output columns (verdict + score), so the
  * optimizer could pay it twice. This kernel computes every script's
  * codepoint count in ONE pass over the string and applies the identical
  * decision rule:
  *
  *   gate fires for the FIRST script (gate priority order) with ≥1
  *   in-range codepoint AND floor(count·10⁶ / max(numChars, 1)) ≥
  *   minShareMicros
  *
  * `length(regexp_replace(text, "[lo-hi]", ""))` subtracts exactly the
  * in-range CODEPOINT count (all ranges are BMP; Spark `length` counts
  * codepoints), so the single-pass tally is value-identical, and the
  * share test is [[graft.ops.Micros]].ratio's floor-division semantics
  * (exact for these magnitudes). Returns the gate language or null.
  */
object ScriptGateOps {
  /** (lang, lo, hi) codepoint ranges, GATE PRIORITY ORDER (kana before
    * CJK ideographs — Japanese text contains both). The one definition:
    * `TextAnalysis.scriptGateRanges` and the oracle mirrors derive from
    * here. */
  val ranges: Seq[(String, Int, Int)] = Seq(
    ("ja", 0x3040, 0x30ff), // hiragana + katakana
    ("ko", 0xac00, 0xd7af), // hangul syllables
    ("zh", 0x4e00, 0x9fff), // CJK unified ideographs
    ("ru", 0x0400, 0x04ff), // cyrillic
    ("el", 0x0370, 0x03ff), // greek
    ("ar", 0x0600, 0x06ff), // arabic
    ("he", 0x0590, 0x05ff), // hebrew
    ("hi", 0x0900, 0x097f), // devanagari
    ("th", 0x0e00, 0x0e7f)) // thai

  private val los = ranges.map(_._2).toArray
  private val his = ranges.map(_._3).toArray
  private val langs = ranges.map(r => UTF8String.fromString(r._1)).toArray
  private val nRanges = los.length

  /** The gate language of `s`, or null when no gate fires.
    * `minShareMicros` is the minimum in-script share,
    * floor(count·10⁶/max(chars,1)). */
  def gateLang(s: UTF8String, minShareMicros: Long): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Int](nRanges)
    var chars = 0
    var i = 0
    while (i < n) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      var cp = 0
      if (w == 1) cp = bytes(i) & 0x7f
      else {
        cp = bytes(i) & (0x7f >> w)
        var j = 1
        while (j < w) { cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1 }
      }
      var r = 0
      while (r < nRanges) {
        if (cp >= los(r) && cp <= his(r)) counts(r) += 1
        r += 1
      }
      chars += 1
      i += w
    }
    val denom = if (chars > 0) chars.toLong else 1L
    var r = 0
    while (r < nRanges) {
      if (counts(r) > 0 && counts(r).toLong * 1000000L / denom >= minShareMicros)
        return langs(r)
      r += 1
    }
    null
  }
}

/** Script-gate verdict of a text column: the first gate language (range
  * priority order) whose codepoint share clears `minShareMicros`, else
  * null — one codepoint pass, codegen'd (see [[ScriptGateOps]]). */
case class ScriptGateLang(child: Expression, minShareMicros: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "script_gate_lang"

  override protected def nullSafeEval(input: Any): Any =
    ScriptGateOps.gateLang(input.asInstanceOf[UTF8String], minShareMicros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ScriptGateOps.gateLang($c, ${minShareMicros}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ScriptGateLang =
    copy(child = newChild)
}

object ScriptGateFunctions {
  /** Column API: gate language or null (one codepoint pass). */
  def scriptGateLang(text: Column, minShareMicros: Long): Column =
    GraftSqlBridge.column(ScriptGateLang(GraftSqlBridge.expression(text), minShareMicros))
}
