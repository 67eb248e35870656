package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[TopNgramStats]] — the per-row native form of the
  * Gopher top-n-gram pipeline (`explode grams → groupBy (doc, gram)
  * count → per-doc argmax`): a per-DOCUMENT statistic never needed the
  * corpus-wide explode + two shuffles (the [[ShingleHash.dupCoverageStats]]
  * / q172 precedent, §1.2 step 1: the cheapest execution is zero
  * shuffles).
  *
  * Counting keys on the 64-bit FNV-1a + splitmix64 gram hash (the
  * [[ShingleHash]] family — exact modulo within-document collisions,
  * ~g²/2⁶⁵); the REPORTED gram string is built only for argmax
  * candidates and tie-broken by UTF8String binary order — identical to
  * Spark's `min(struct(-c, gram))` string ordering. Gram text matches
  * `concat_ws(" ", …)` exactly (nulls skipped), so values equal the
  * exploded form's on any input, not only on split() output. */
object TopNgramOps {

  /** (most frequent n-gram, its count) of a token array; null when fewer
    * than n tokens. Ties → binary-smallest gram string. */
  def topNgram(tokens: ArrayData, n: Int): InternalRow = {
    val m = tokens.numElements()
    if (m < n) return null
    val g = m - n + 1
    // per-token FNV-1a base hashes (null → empty-string hash)
    val base = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      if (!tokens.isNullAt(i)) {
        val b = tokens.getUTF8String(i).getBytes
        var j = 0
        while (j < b.length) { h ^= (b(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      }
      base(i) = h
      i += 1
    }
    // gram hashes via the shared splitmix64 fold
    val gh = new Array[Long](g)
    i = 0
    while (i < g) {
      var acc = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { acc = graft.ops.Dedup.mix64(acc ^ base(i + j)); j += 1 }
      gh(i) = acc
      i += 1
    }
    // open addressing: gram hash -> (count, first gram index)
    var cap = 8
    while (cap < g * 2) cap <<= 1
    val table = new Array[Long](cap)
    val cnt = new Array[Int](cap)
    val firstIdx = new Array[Int](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var maxCount = 0
    i = 0
    while (i < g) {
      val v = gh(i)
      var slot = graft.ops.Dedup.mix64(v).toInt & mask
      while (used(slot) && table(slot) != v) slot = (slot + 1) & mask
      if (!used(slot)) { used(slot) = true; table(slot) = v; firstIdx(slot) = i }
      cnt(slot) += 1
      if (cnt(slot) > maxCount) maxCount = cnt(slot)
      i += 1
    }
    // build strings only for argmax candidates; keep the binary-smallest
    val sep = UTF8String.fromString(" ")
    var best: UTF8String = null
    var slot = 0
    while (slot < cap) {
      if (used(slot) && cnt(slot) == maxCount) {
        val gi = firstIdx(slot)
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) =
            if (tokens.isNullAt(gi + j)) null else tokens.getUTF8String(gi + j)
          j += 1
        }
        val gram = UTF8String.concatWs(sep, parts: _*)
        if (best == null || gram.compareTo(best) < 0) best = gram
      }
      slot += 1
    }
    new GenericInternalRow(Array[Any](best, maxCount.toLong))
  }
}

/** Per-row top word-n-gram statistic `struct(gram, c)` — see
  * [[TopNgramOps.topNgram]]; null for under-`n` docs (the caller's
  * size filter mirrors the exploded form's absent-doc semantics). */
case class TopNgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"top n-gram needs n >= 2, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = true),
    StructField("c", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = s"top_ngram_stats_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TopNgramOps.topNgram(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftTop")
      s"""
         |InternalRow $r = graft.functions.TopNgramOps.topNgram($c, $n);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopNgramStats =
    copy(child = newChild)
}

object TopNgramFunctions {
  /** Column API: per-row top n-gram `struct(gram, c)`. */
  def topNgramStats(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(TopNgramStats(GraftSqlBridge.expression(tokens), n))
}
