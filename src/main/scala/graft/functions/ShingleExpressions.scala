package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.GraftSqlBridge

/** Static helper for [[ShingleHashes]] — kept as plain JVM methods so the
  * generated code calls straight into primitive loops. */
object ShingleHash {

  /** Per-token FNV-1a base hashes, one UTF8String byte pass each — the
    * shared first stage of every loop below (one definition so the token
    * hash can never drift between the distinct/positional/bigram forms).
    * A null element (reachable through the SQL-registered functions with
    * an arbitrary array<string> argument) hashes like the empty string
    * instead of throwing, preserving positional alignment. */
  private def baseHashes(tokens: ArrayData): Array[Long] = {
    val m = tokens.numElements()
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
    base
  }

  /** The single definition of a gram's hash — fold the n token hashes
    * starting at `i` through splitmix64 ([[hashesOf]], [[posHashesOf]],
    * and the top-count scans must never drift apart on hash identity). */
  @inline private def gramHash(base: Array[Long], i: Int, n: Int): Long = {
    var acc = 0x9e3779b97f4a7c15L
    var j = 0
    while (j < n) { acc = graft.ops.Dedup.mix64(acc ^ base(i + j)); j += 1 }
    acc
  }

  /** Longest equal run of a SORTED long array (0 for empty) — the shared
    * count scan behind [[topBigramCountOf]] / [[topTokenCountOf]]. */
  private def longestRun(h: Array[Long]): Long = {
    if (h.length == 0) return 0L
    var best = 1L
    var run = 1L
    var i = 1
    while (i < h.length) {
      if (h(i) == h(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best
  }

  /** 64-bit hash of the word n-gram starting at each position, distinct,
    * first-occurrence order. A shingle's hash folds the FNV-1a hashes of
    * its n tokens through splitmix64 with a position-independent seed, so
    * equal shingle strings always collide and distinct ones don't w.h.p.
    * (the same 2⁻⁶⁴ argument as the xxhash64 inverted-index join keys). */
  def hashesOf(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val base = baseHashes(tokens)
    val grams = m - n + 1
    val out = new Array[Long](grams)
    // first-occurrence dedup via a primitive open-addressing table — a
    // java.util.HashSet<java.lang.Long> here boxed one Long plus one node
    // PER GRAM on the hottest near-dup loop in the library. Zero slots
    // hold the table's empty sentinel, so 0L hashes are tracked aside
    // (gramHash emits 0L with probability 2^-64 — the slot must still be
    // correct, not assumed away).
    var cap = 8
    while (cap < grams * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var seenZero = false
    var k = 0
    var i = 0
    while (i <= m - n) {
      val acc = gramHash(base, i, n)
      if (acc == 0L) {
        if (!seenZero) { seenZero = true; out(k) = 0L; k += 1 }
      } else {
        var slot = (graft.ops.Dedup.mix64(acc).toInt & mask)
        while (table(slot) != 0L && table(slot) != acc)
          slot = (slot + 1) & mask
        if (table(slot) == 0L) { table(slot) = acc; out(k) = acc; k += 1 }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** Positional variant of [[hashesOf]]: the hash of the n-gram starting
    * at EVERY position, in document order, duplicates kept — index i of
    * the result is the gram at token offset i, which is exactly what
    * duplicate-span detection needs (dedup would erase the positions). */
  def posHashesOf(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val base = baseHashes(tokens)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) { out(i) = gramHash(base, i, n); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Count of the most frequent word bigram of a token array (0 when
    * fewer than 2 tokens), by 64-bit hashed bigram identity. One fused
    * primitive pass — per-token FNV-1a, splitmix64 pair fold, primitive
    * sort, longest equal-run — so the Gopher repetition score needs NO
    * shuffle and no per-bigram row materialization at all. */
  def topBigramCountOf(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    if (m < 2) return 0L
    val base = baseHashes(tokens)
    val h = new Array[Long](m - 1)
    var i = 0
    while (i < m - 1) { h(i) = gramHash(base, i, 2); i += 1 }
    java.util.Arrays.sort(h)
    longestRun(h)
  }

  /** Duplicate n-gram coverage stats of a token array, one fused pass:
    * `[covered_chars, total_chars]` where a token position is covered
    * iff some occurrence of a DUPLICATED n-gram (same 64-bit gram hash
    * appearing ≥ 2 times in this array) spans it, and chars are
    * codepoint counts (Spark `length` semantics; null token → 0).
    * The per-row native form of the Gopher duplicate-n-gram-coverage
    * pipeline (grams explode → count ≥ 2 → position-union → char sum):
    * same union-over-positions semantics — overlapping duplicate grams
    * count each token once — with zero shuffle and zero per-gram rows.
    * Exact modulo within-document 64-bit gram-hash collisions
    * (~n²/2⁶⁵, the [[topBigramCountOf]] argument). */
  def dupCoverageStats(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    var tot = 0L
    val tokChars = new Array[Int](m)
    var i = 0
    while (i < m) {
      val c = if (tokens.isNullAt(i)) 0 else tokens.getUTF8String(i).numChars()
      tokChars(i) = c
      tot += c
      i += 1
    }
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array(0L, tot))
    val base = baseHashes(tokens)
    val grams = m - n + 1
    val covered = new Array[Boolean](m)
    // open addressing gram-hash -> first gram index; a repeat marks both
    // occurrences' spans (idempotent — the union-over-positions rule)
    var cap = 8
    while (cap < grams * 2) cap <<= 1
    val table = new Array[Long](cap)
    val firstIdx = new Array[Int](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var g = 0
    while (g < grams) {
      val v = gramHash(base, g, n)
      var slot = graft.ops.Dedup.mix64(v).toInt & mask
      while (used(slot) && table(slot) != v) slot = (slot + 1) & mask
      if (!used(slot)) { used(slot) = true; table(slot) = v; firstIdx(slot) = g }
      else {
        var j = g
        while (j < g + n) { covered(j) = true; j += 1 }
        j = firstIdx(slot)
        val end = j + n
        while (j < end) { covered(j) = true; j += 1 }
      }
      g += 1
    }
    var cov = 0L
    i = 0
    while (i < m) { if (covered(i)) cov += tokChars(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(Array(cov, tot))
  }

  /** Count of the most frequent TOKEN of a token array (0 when empty) —
    * the unigram twin of [[topBigramCountOf]]: hash, primitive sort,
    * longest equal run. Replaces the nested
    * `array_max(transform(array_distinct, w => size(filter(…))))` HOF
    * form, which is O(distinct·n) per row with interpreted lambdas. */
  def topTokenCountOf(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    if (m == 0) return 0L
    val h = baseHashes(tokens)
    java.util.Arrays.sort(h)
    longestRun(h)
  }
}

/** Most-frequent-bigram count (long) of a token array — the per-row
  * native form of "explode bigrams → count → max": zero shuffle, zero
  * per-bigram rows, codegen'd straight into the scan stage. Bigram
  * identity is hashed (same FNV-1a + splitmix64 family as
  * [[ShingleHashes]]); counts are exact modulo within-document 64-bit
  * collisions (~n²/2⁶⁵). */
case class BigramTopCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bigram_top_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.topBigramCountOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.topBigramCountOf($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramTopCount =
    copy(child = newChild)
}

/** Most-frequent-token count (long) of a token array — unigram twin of
  * [[BigramTopCount]] (same hashed-identity argument); powers the
  * Gopher top-word-dominance gate with one fused primitive pass in the
  * scan stage instead of a quadratic interpreted HOF chain. */
case class TokenTopCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_top_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.topTokenCountOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.topTokenCountOf($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenTopCount =
    copy(child = newChild)
}

/** Distinct hashed word n-gram shingles of a token array — the native
  * form of `array_distinct(zip_with-join-concat_ws(...))` that the
  * near-dup operators previously composed from built-ins: that chain
  * allocates every shingle as a UTF8String and dedups with string
  * comparisons; this expression is one fused primitive loop (per-token
  * FNV-1a, splitmix64 fold per shingle, long-hash dedup) with zero string
  * construction. Downstream consumers (inverted-index join, MinHash
  * bands, SimHash) only ever need a stable shingle identity, never the
  * shingle text, so the 64-bit hash IS the shingle (SURVEY.md §2.3).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"shingle_hashes_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashesOf(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.hashesOf($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Positional (non-distinct, document-order) hashed n-grams: element i is
  * the 64-bit hash of the gram at token offset i. Same hash family and
  * fused-primitive-loop shape as [[ShingleHashes]]; kept separate because
  * the set-shaped consumers (Jaccard, MinHash) must NOT pay for position
  * bookkeeping and the span-shaped consumer must not lose it. */
case class ShinglePosHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"shingle_pos_hashes_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.posHashesOf(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.posHashesOf($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglePosHashes =
    copy(child = newChild)
}

/** Duplicate n-gram coverage stats `[covered_chars, total_chars]` of a
  * token array — see [[ShingleHash.dupCoverageStats]]. */
case class DupNgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"dup n-gram coverage needs n >= 2, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"dup_ngram_stats_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.dupCoverageStats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.dupCoverageStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupNgramStats =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Column API: duplicate n-gram coverage stats [covered, total] chars. */
  def dupNgramStats(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(DupNgramStats(GraftSqlBridge.expression(tokens), n))

  /** Column API: positional 64-bit n-gram hashes of a token array. */
  def shinglePosHashes(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(ShinglePosHashes(GraftSqlBridge.expression(tokens), n))

  /** Column API: distinct 64-bit shingle hashes of a token array. */
  def shingleHashes(tokens: Column, n: Int = 3): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(tokens), n))

  /** Column API: count of the most frequent bigram of a token array. */
  def bigramTopCount(tokens: Column): Column =
    GraftSqlBridge.column(BigramTopCount(GraftSqlBridge.expression(tokens)))

  def tokenTopCount(tokens: Column): Column =
    GraftSqlBridge.column(TokenTopCount(GraftSqlBridge.expression(tokens)))
}
