package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[TrigramLangBest]] — the fused scoring stage of
  * [[graft.ops.TextAnalysis.langIdTrigram]].
  *
  * The expression-chain form exploded every character trigram of every
  * document (one row per occurrence), broadcast-joined the profile
  * table, ran a (doc, lang) weight-sum aggregate, a doc-keyed argmax
  * aggregate, and joined the winner back onto the per-row features —
  * two shuffles and a join for what is per-document work over a
  * COMPILE-TIME-CONSTANT model. This kernel walks the normalized
  * string's codepoint trigrams once, accumulates each profile
  * language's weight sum (an occurrence counts every time, exactly like
  * the join), and returns the argmax as `struct(w, lang)` under the
  * identical ordering `max(struct(w, lang))` used before — weight
  * first, then the lexicographically larger language on ties (binary
  * UTF8 comparison; the codes are ASCII). Null when no trigram hits the
  * profile. The model is [[graft.ops.TextAnalysis.trigramProfileRows]]
  * — the ONE definition the DuckDB oracle mirrors embeds as SQL
  * literals, so cross-engine parity is untouched. */
object TrigramLangOps {
  private lazy val langs: Array[UTF8String] =
    graft.ops.TextAnalysis.trigramProfileRows.map(_._1).distinct.sorted
      .map(UTF8String.fromString).toArray

  /** trigram -> packed (langIdx << 32 | weight) hits. */
  private lazy val table: java.util.HashMap[UTF8String, Array[Long]] = {
    val idx = langs.zipWithIndex.map { case (l, i) => l.toString -> i }.toMap
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    graft.ops.TextAnalysis.trigramProfileRows.foreach { case (lang, tri, w) =>
      val key = UTF8String.fromString(tri)
      val packed = (idx(lang).toLong << 32) | w
      val prev = m.get(key)
      if (prev == null) m.put(key, Array(packed))
      else m.put(key, prev :+ packed)
    }
    m
  }

  /** Best (w, lang) over the profile weight sums of `s`'s codepoint
    * trigrams, or null when nothing hits. */
  def best(s: UTF8String): InternalRow = {
    val t = table // force init before the hot loop
    val bytes = s.getBytes
    val n = bytes.length
    val chars = s.numChars()
    if (chars < 3) return null
    val offsets = new Array[Int](chars + 1)
    var i = 0
    var c = 0
    while (i < n) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets(c) = n
    val sums = new Array[Long](langs.length)
    var k = 0
    while (k < chars - 2) {
      val hit = t.get(UTF8String.fromBytes(bytes, offsets(k),
        offsets(k + 3) - offsets(k)))
      if (hit != null) {
        var j = 0
        while (j < hit.length) {
          sums((hit(j) >>> 32).toInt) += hit(j) & 0xffffffffL
          j += 1
        }
      }
      k += 1
    }
    var bi = -1
    var bw = 0L
    var l = 0
    while (l < langs.length) {
      // weight first; ties -> lexicographically LARGER language (langs
      // is sorted ascending, so >= picks the later index)
      if (sums(l) > 0 && (bi < 0 || sums(l) > bw ||
          (sums(l) == bw && langs(l).compareTo(langs(bi)) > 0))) {
        bi = l; bw = sums(l)
      }
      l += 1
    }
    if (bi < 0) null
    else new GenericInternalRow(Array[Any](bw, langs(bi)))
  }
}

/** Per-row trigram-profile language argmax: `struct(w, lang)` under the
  * `max(struct(w, lang))` ordering, null when no profile trigram occurs
  * (see [[TrigramLangOps]]). */
case class TrigramLangBest(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("lang", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "trigram_lang_best"

  override protected def nullSafeEval(input: Any): Any =
    TrigramLangOps.best(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TrigramLangOps.best($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TrigramLangBest =
    copy(child = newChild)
}

object TrigramLangFunctions {
  /** Column API: best (w, lang) trigram-profile struct, null on no hits. */
  def trigramLangBest(s: Column): Column =
    GraftSqlBridge.column(TrigramLangBest(GraftSqlBridge.expression(s)))
}
