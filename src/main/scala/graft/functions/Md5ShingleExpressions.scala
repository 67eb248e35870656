package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helpers for the fused md5-shingle expressions — plain JVM
  * methods so generated code calls straight into one primitive loop.
  *
  * The md5-contract dedup family ([[graft.ops.Dedup.simHashMd5]],
  * `ngramPositionHashes`) previously built each word n-gram STRING via
  * `transform(sequence(...), i -> concat_ws(" ", slice(wd, i+1, n)))` —
  * a higher-order form that evaluates INTERPRETED per element with a
  * fresh array slice + string concat per gram (the CharTrigrams /
  * BigramTopCount lesson: HOF lambdas lose to native primitive loops) —
  * and then hashed each materialized gram with [[Md5Prefix60]]. These
  * kernels fuse both steps: the digest is fed the token bytes and
  * separator directly (`update(tok_i) · update(' ') · …`), so no gram
  * string, no slice, and no per-element interpretation exist at all.
  * The hash VALUE is bit-identical to `md5_prefix60(concat_ws(" ",
  * slice(wd, i+1, n)))` on any null-free token array (`split` output —
  * every call site), so the DuckDB oracles keep re-deriving the same
  * 60-bit values from their own md5 builtins; a null element hashes
  * like the empty string (positional alignment, the [[ShingleHash]]
  * convention), where concat_ws would have dropped it.
  */
object Md5ShingleOps {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')

  /** Full 16-byte md5 of the gram at token offset `i` (n tokens joined
    * by single spaces), fed to the digest without building the gram. */
  @inline private def gramDigest(d: MessageDigest,
                                 toks: Array[Array[Byte]],
                                 i: Int, n: Int): Array[Byte] = {
    d.reset()
    d.update(toks(i))
    var j = 1
    while (j < n) { d.update(SPACE); d.update(toks(i + j)); j += 1 }
    d.digest()
  }

  /** First 15 hex nibbles of the digest as a non-negative long —
    * bit-identical to [[Md5Ops.prefix60]]. */
  @inline private def prefix60(dig: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def tokenBytes(tokens: ArrayData): Array[Array[Byte]] = {
    val m = tokens.numElements()
    val out = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      i += 1
    }
    out
  }

  /** 60-bit md5-prefix hash of the n-gram starting at EVERY position,
    * document order, duplicates kept — the positional form
    * (`ngramPositionHashes` consumes index = token offset). */
  def posPrefix60(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val toks = tokenBytes(tokens)
    val d = md.get()
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) { out(i) = prefix60(gramDigest(d, toks, i, n)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct (first-occurrence order) 60-bit md5-prefix hashes of a
    * token array's n-grams. Dedup keys on the FULL 128-bit digest, so
    * the result equals `array_distinct(gram strings) → md5` exactly
    * unless two distinct short grams collide on all of md5 — not a
    * within-2⁶⁴-odds argument but an actual md5 collision, absent for
    * natural text. (Dedup by the 60-bit prefix alone would merge grams
    * whose PREFIXES collide — 2⁻⁶⁰ odds — where the string form keeps
    * both votes; the full digest removes even that gap.) */
  def distinctPrefix60(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val toks = tokenBytes(tokens)
    val d = md.get()
    val grams = m - n + 1
    // open addressing on the digest's two halves; `used` flags instead
    // of a value sentinel so a genuinely-zero half needs no special case
    var cap = 8
    while (cap < grams * 2) cap <<= 1
    val hi = new Array[Long](cap)
    val lo = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    val out = new Array[Long](grams)
    var k = 0
    var i = 0
    while (i <= m - n) {
      val dig = gramDigest(d, toks, i, n)
      var h = 0L; var l = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      while (b < 16) { l = (l << 8) | (dig(b) & 0xffL); b += 1 }
      var slot = graft.ops.Dedup.mix64(h ^ l).toInt & mask
      while (used(slot) && !(hi(slot) == h && lo(slot) == l))
        slot = (slot + 1) & mask
      if (!used(slot)) {
        used(slot) = true; hi(slot) = h; lo(slot) = l
        out(k) = h >>> 4 // prefix60 of the digest's first 8 bytes
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }
}

/** See [[Md5ShingleOps]]. */
object Md5MinHashOps {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')

  /** Per-row k-entry MinHash signature under the md5 lattice: entry i is
    * `min` over every n-gram (position order, repeats kept — min over a
    * multiset equals min over its set) of the 60-bit prefix of
    * `md5(i ‖ "|" ‖ gram)`. Bit-identical to the exploded
    * `md5_prefix60(concat_ws("|", i, gram))` columns it replaces; the
    * digest is fed the index prefix and token bytes directly, so no
    * gram string or per-element interpretation exists (the
    * [[Md5ShingleOps]] discipline). Empty for under-`n` arrays. */
  def minHashK(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val toks = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      toks(t) =
        if (tokens.isNullAt(t)) Array.emptyByteArray
        else tokens.getUTF8String(t).getBytes
      t += 1
    }
    val prefixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) { prefixes(i) = (i.toString + "|").getBytes("UTF-8"); i += 1 }
    val d = md.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var g = 0
    while (g <= m - n) {
      i = 0
      while (i < k) {
        d.reset()
        d.update(prefixes(i))
        d.update(toks(g))
        var j = 1
        while (j < n) { d.update(SPACE); d.update(toks(g + j)); j += 1 }
        val dig = d.digest()
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
        v = v >>> 4
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Per-row md5-lattice MinHash signature (k minima) — the fused native
  * form of the k exploded `md5_prefix60(i ‖ "|" ‖ gram)` min-columns
  * (see [[Md5MinHashOps.minHashK]]). */
case class Md5MinHashK(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(k >= 1 && k <= 256, s"k out of range: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"md5_minhash_${k}_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHashOps.minHashK(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5MinHashOps.minHashK($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashK =
    copy(child = newChild)
}

/** Distinct 60-bit md5-prefix n-gram hashes of a token array — the fused
  * native form of `explode(array_distinct(transform(...))) →
  * md5_prefix60(gram)` (see [[Md5ShingleOps]]). */
case class Md5ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"md5_shingle_hashes_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleOps.distinctPrefix60(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ShingleOps.distinctPrefix60($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
    copy(child = newChild)
}

/** Positional (non-distinct, document-order) 60-bit md5-prefix n-gram
  * hashes — the fused native form of `posexplode(transform(...)) →
  * md5_prefix60(gram)` (see [[Md5ShingleOps]]). */
case class Md5ShinglePosHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"md5_shingle_pos_hashes_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleOps.posPrefix60(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ShingleOps.posPrefix60($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5ShinglePosHashes =
    copy(child = newChild)
}

object Md5ShingleFunctions {
  /** Column API: distinct 60-bit md5-prefix n-gram hashes. */
  def md5ShingleHashes(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(Md5ShingleHashes(GraftSqlBridge.expression(tokens), n))

  /** Column API: positional 60-bit md5-prefix n-gram hashes. */
  def md5ShinglePosHashes(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(Md5ShinglePosHashes(GraftSqlBridge.expression(tokens), n))

  /** Column API: per-row md5-lattice MinHash signature (k minima). */
  def md5MinHashK(tokens: Column, n: Int, k: Int): Column =
    GraftSqlBridge.column(Md5MinHashK(GraftSqlBridge.expression(tokens), n, k))
}
