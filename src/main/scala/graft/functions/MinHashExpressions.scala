package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftSqlBridge

/** Static helpers for [[MinHashBandKeys]] / [[SimHash64]] — plain JVM
  * methods so the generated code calls straight into primitive loops. */
object MinHashOps {

  /** Non-null elements of an `array<long>` compacted to a primitive
    * array — the shared null policy of both sketches below: a NULL slot
    * (reachable through the SQL-registered functions with an arbitrary
    * array<bigint>) is ABSENT from the hash set, not silently read as 0L
    * (ArrayData.getLong on a null slot returns garbage-zero, which would
    * plant a phantom shingle in every such document's sketch). */
  private def nonNull(hashed: ArrayData): Array[Long] = {
    val m = hashed.numElements()
    var n = 0
    var i = 0
    while (i < m) { if (!hashed.isNullAt(i)) n += 1; i += 1 }
    if (n == m) hashed.toLongArray()
    else {
      val out = new Array[Long](n)
      var k = 0; i = 0
      while (i < m) {
        if (!hashed.isNullAt(i)) { out(k) = hashed.getLong(i); k += 1 }
        i += 1
      }
      out
    }
  }

  /** LSH band keys of a pre-hashed shingle set: `minHashes` seeded
    * splitmix64 minima folded into one 64-bit key per band. Bit-identical
    * to `Dedup.bandKeys` (the band index is mixed into the key so buckets
    * never cross bands); parameters are compile-time-validated by the
    * expression below. Null elements are absent ([[nonNull]]); an
    * all-null array behaves like an empty one. */
  def bandKeysOf(hashed: ArrayData, minHashes: Int, bands: Int): ArrayData = {
    val hs = nonNull(hashed)
    val m = hs.length
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val rowsPerBand = minHashes / bands
    val mins = new Array[Long](minHashes)
    var i = 0
    while (i < minHashes) {
      var mn = Long.MaxValue
      val seed = i.toLong * 0x9e3779b97f4a7c15L
      var j = 0
      while (j < m) {
        val h = graft.ops.Dedup.mix64(hs(j) ^ seed)
        if (h < mn) mn = h
        j += 1
      }
      mins(i) = mn
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = graft.ops.Dedup.mix64(acc ^ mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash over pre-hashed shingles — bit-identical to
    * `Dedup.simHash64` (majority vote per bit; empty input → 0L). Null
    * elements are absent ([[nonNull]]), never phantom-0L votes. */
  def simHashOf(hashed: ArrayData): Long = {
    val hs = nonNull(hashed)
    val m = hs.length
    val acc = new Array[Int](64)
    var j = 0
    while (j < m) {
      val h = hs(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash-LSH band keys of an `array<long>` shingle-hash column — native
  * form of the interpreted band-key UDF that was the hottest remaining
  * loop on the q33/q60 near-dup path (128 splitmix64 permutations per
  * document). One fused primitive loop over the `ArrayData` buffer, inside
  * the whole-stage span; identical hash family, so band buckets (and every
  * downstream candidate pair) are unchanged. */
case class MinHashBandKeys(child: Expression, minHashes: Int, bands: Int)
    extends UnaryExpression {
  require(minHashes >= 1 && bands >= 1 && minHashes % bands == 0,
    s"minHashes must be a positive multiple of bands, got $minHashes/$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"minhash_band_keys_${minHashes}x$bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.bandKeysOf(input.asInstanceOf[ArrayData], minHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashOps.bandKeysOf($c, $minHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<long>` shingle-hash column — native form of
  * the per-document SimHash UDF (q34/q36/q60 path). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.simHashOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps.simHashOf($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object MinHashFunctions {
  /** Column API: LSH band keys for a shingle-hash array. */
  def minHashBandKeys(hashes: Column, minHashes: Int, bands: Int): Column =
    GraftSqlBridge.column(MinHashBandKeys(
      GraftSqlBridge.expression(hashes), minHashes, bands))

  /** Column API: 64-bit SimHash of a shingle-hash array. */
  def simHash64(hashes: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(hashes)))
}
