package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[WinnowingFps]] — the per-row native form of the
  * MOSS winnowing selection ([[graft.ops.Dedup.winnowingFingerprints]]).
  *
  * Winnowing is a per-DOCUMENT selection: min-md5-hex gram of every
  * w-window, ties → rightmost position, selected set dedup'd. The
  * previous pipeline materialized every gram string via the interpreted
  * `transform(sequence, i -> concat_ws(slice))` chain, md5-hex'd and
  * padded each into a 41-char `enc` string, exploded one row per gram,
  * ran a doc-keyed window `min(enc)` (one exchange), and `distinct`'d
  * (a second exchange). All of it is per-doc work (§1.2 step 1): this
  * kernel feeds token bytes straight into a thread-local digest (the
  * [[Md5ShingleOps]] discipline), takes each window's min by unsigned
  * digest-byte comparison — IDENTICAL to the hex-string ordering, since
  * lowercase hex is order-isomorphic to unsigned bytes — with the
  * rightmost-tie rule from ascending scan order, marks selected
  * positions in a bitset (the dedup), and emits `struct(pos, fp)` rows
  * in position order. Zero shuffles, zero per-gram rows, zero enc
  * strings; the fp hex strings are rendered once per SELECTED gram
  * (~2/(w+1) of positions) instead of per gram per window. */
object WinnowingOps {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')
  private val HEX = "0123456789abcdef".toCharArray

  private def hex32(dig: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((dig(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(dig(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte comparison of two 16-byte digests — the md5-hex
    * string order. */
  @inline private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Selected winnowing fingerprints `struct(pos, fp)` of a token array,
    * position order; empty when no full window exists (docs with fewer
    * than n+w-1 tokens). */
  def fingerprints(tokens: ArrayData, n: Int, w: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n + w - 1) return new GenericArrayData(Array.empty[Any])
    val g = m - n + 1
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      toks(i) =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val d = md.get()
    val digs = new Array[Array[Byte]](g)
    i = 0
    while (i < g) {
      d.reset()
      d.update(toks(i))
      var j = 1
      while (j < n) { d.update(SPACE); d.update(toks(i + j)); j += 1 }
      digs(i) = d.digest()
      i += 1
    }
    // min of every w-window, ties → rightmost (ascending scan with <=)
    val selected = new Array[Boolean](g)
    var p = 0
    while (p <= g - w) {
      var best = p
      var q = p + 1
      while (q < p + w) {
        if (cmp(digs(q), digs(best)) <= 0) best = q
        q += 1
      }
      selected(best) = true
      p += 1
    }
    var k = 0
    i = 0
    while (i < g) { if (selected(i)) k += 1; i += 1 }
    val out = new Array[Any](k)
    var o = 0
    i = 0
    while (i < g) {
      if (selected(i)) {
        out(o) = new GenericInternalRow(Array[Any](i.toLong, hex32(digs(i))))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-row winnowing fingerprint selection `array<struct<pos, fp>>` —
  * see [[WinnowingOps.fingerprints]]. */
case class WinnowingFps(child: Expression, n: Int, w: Int) extends UnaryExpression {
  require(n >= 1 && w >= 1, s"n and w must be >= 1, got n=$n w=$w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = s"winnowing_fps_${n}_$w"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowingOps.fingerprints(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowingOps.fingerprints($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFps =
    copy(child = newChild)
}

object WinnowingFunctions {
  /** Column API: selected winnowing fingerprints `array<struct<pos, fp>>`. */
  def winnowingFps(tokens: Column, n: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowingFps(GraftSqlBridge.expression(tokens), n, w))
}
