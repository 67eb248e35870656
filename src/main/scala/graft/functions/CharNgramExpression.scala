package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[CharTrigrams]] — a plain JVM method so the
  * generated code calls straight into one primitive byte pass. */
object CharNgramOps {

  /** All overlapping 3-CODEPOINT substrings of `s`, in order (empty for
    * under-3-char strings). One pass finds every codepoint's byte
    * offset; each trigram is then a zero-parse byte slice — O(bytes)
    * total, vs the O(len²) of per-position `substr` calls (each of
    * which must re-scan from the string head to find its start
    * boundary). Codepoint (not byte) windows keep the output identical
    * to DuckDB's `substr(s, i, 3)` on multi-byte text — the q213
    * cross-engine contract. */
  def trigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val chars = s.numChars()
    if (chars < 3) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](chars + 1)
    var i = 0
    var c = 0
    while (i < n) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets(c) = n
    val out = new Array[Any](chars - 2)
    var k = 0
    while (k < chars - 2) {
      out(k) = UTF8String.fromBytes(bytes, offsets(k), offsets(k + 3) - offsets(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd character-trigram extraction — the model-feature
  * kernel of [[graft.ops.TextAnalysis.langIdTrigram]]. A
  * `transform(sequence(...), i -> substr(s, i, 3))` higher-order form
  * computes the same array but evaluates INTERPRETED per element, and as
  * a generator child it re-runs catastrophically (measured 26 s for the
  * explode stage at sf0.1 vs 0.3 s over a materialized array); this is
  * the same HOF-loses-to-native-primitive result the repo measured for
  * [[BigramTopCount]]. One byte pass, stays inside the surrounding
  * WholeStageCodegen span. */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramOps.trigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramOps.trigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharNgramFunctions {
  /** Column API: all overlapping 3-codepoint substrings of a string. */
  def charTrigrams(s: Column): Column =
    GraftSqlBridge.column(CharTrigrams(GraftSqlBridge.expression(s)))
}
