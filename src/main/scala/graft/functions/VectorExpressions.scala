package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.GraftSqlBridge

/** Native dot product of two `array<double>` columns — the hot inner loop
  * of the similarity operators (SURVEY.md §2.3).
  *
  * The composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * semantically identical but pays per-element expression-tree dispatch
  * plus an intermediate products array; this expression is one fused
  * primitive loop over the two `ArrayData` buffers, codegen'd into the
  * surrounding WholeStageCodegen span. Accumulation order is left-to-right,
  * matching both the higher-order form and DuckDB's `list_dot_product`, so
  * results are bit-identical and oracle-stable.
  *
  * Null semantics: null if either array is null or lengths differ
  * (the higher-order form yields null via zip_with padding + null sum);
  * array ELEMENTS must be non-null (embedding vectors — enforced upstream
  * by the `array<double>` cast of a parquet float array).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  /** Nullable even when both children are non-null: a length mismatch
    * yields null. Without this override, non-nullable inputs make
    * Catalyst emit `ev.isNull` as a literal and the generated
    * `isNull = true` assignment fails janino compilation — silently
    * dropping every projection containing vec_dot to interpreter mode. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0d
      var i = 0
      val n = x.numElements()
      while (i < n) {
        // null element → null result, matching the zip_with/aggregate
        // HOF semantics this expression claims parity with (reading the
        // slot would silently yield 0.0); the bitmap test is ~free on
        // the all-non-null hot path
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // emit the per-element null test only when the TYPES say elements
      // can be null — provably non-null arrays keep the pure fused
      // multiply-add loop
      def cn(e: Expression) = e.dataType match {
        case ArrayType(_, containsNull) => containsNull
        case _                          => true
      }
      val nullCheck =
        if (cn(left) || cn(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static helper for [[LshSignatures]] — the sign-LSH inner loops as plain
  * JVM methods so generated code calls straight into primitive arithmetic. */
object SignLsh {

  /** Deterministic random-hyperplane component: plane (t, p) dimension i,
    * mapped to (-1, 1) via splitmix64 — adequate for sign-LSH. */
  def planeCoef(table: Int, plane: Int, i: Int): Double = {
    val h = graft.ops.Dedup.mix64((table.toLong << 40) ^ (plane.toLong << 20) ^ i.toLong)
    h.toDouble / Long.MaxValue.toDouble
  }

  /** Hyperplane coefficients are pure functions of (tables, planes, dim):
    * memoize the flat row-major matrix per shape so the scan's inner loop
    * is a fused multiply-add over a double[], not tables·planes·dim mix64
    * mixes + divisions PER ROW (~3-5× the dot-product cost recomputed
    * row after row). One small array per distinct shape per executor.
    * Bounded: legitimate use has one embedding dim, so a corpus with
    * heterogeneous/corrupt vector lengths must not grow a matrix per
    * distinct length forever — at [[MaxCachedShapes]] shapes ONE
    * arbitrary entry is evicted per insert (a rare, cheap recompute for
    * the evicted shape only, not a leak and not a full-cache rebuild). */
  private[graft] val EmptySigs =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)
  private val MaxCachedShapes = 8
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  private def coefs(planes: Int, tables: Int, dim: Int): Array[Double] = {
    val hit = coefCache.get((planes, tables, dim))
    if (hit != null) return hit
    if (coefCache.size >= MaxCachedShapes) {
      // evict ONE arbitrary entry, not clear(): with 9+ interleaved shapes
      // a full clear would rebuild every hot shape's matrix near-per-row
      val it = coefCache.keys()
      if (it.hasMoreElements) coefCache.remove(it.nextElement())
    }
    coefCache.computeIfAbsent((planes, tables, dim), { _ =>
      val flat = new Array[Double](tables * planes * dim)
      var t = 0; var k = 0
      while (t < tables) {
        var p = 0
        while (p < planes) {
          var i = 0
          while (i < dim) { flat(k) = planeCoef(t, p, i); i += 1; k += 1 }
          p += 1
        }
        t += 1
      }
      flat
    })
  }

  /** Per-table `planes`-bit sign signatures of `v`, keyed (table<<32|sig).
    * A dim-0 or NaN-poisoned vector gets NO buckets (empty array — the
    * NearestCells dirty-input convention): its dot products would all be
    * 0/NaN, so every such row would share ONE bucket key in EVERY table
    * and pair quadratically before the cosine confirm finally discarded
    * it; an empty signature drops it at the explode instead. */
  def signaturesOf(v: ArrayData, planes: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    if (dim == 0) return SignLsh.EmptySigs
    var chk = 0
    while (chk < dim) {
      val x = v.getDouble(chk)
      if (x != x) return SignLsh.EmptySigs
      chk += 1
    }
    val cf = coefs(planes, tables, dim)
    val out = new Array[Long](tables)
    var t = 0
    var off = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        var s = 0d
        var i = 0
        while (i < dim) { s += v.getDouble(i) * cf(off + i); i += 1 }
        if (s >= 0) sig |= (1L << p)
        off += dim
        p += 1
      }
      out(t) = (t.toLong << 32) | sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Sign-LSH bucket keys of an `array<double>` embedding — native form of
  * the per-row signature UDF: no Seq[Double] boxing round-trip, stays in
  * the whole-stage span. Same (table, plane, dim) hash family as the
  * original, so bucket assignments are identical. */
case class LshSignatures(child: Expression, planes: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes >= 1 && planes <= 32 && tables >= 1, "1<=planes<=32, tables>=1")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = s"lsh_sig_${tables}x$planes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SignLsh.signaturesOf(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLsh.signaturesOf($c, $planes, $tables)")

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

/** Static helper for [[NearestCells]] — the IVF coarse-quantizer
  * assignment loop as a plain JVM method so generated code calls straight
  * into primitive arithmetic. */
object IvfCells {

  /** Indices of the `nprobe` nearest centroids to `v` (squared-L2),
    * ordered nearest-first, ties broken by lower index — bit-identical to
    * a stable sort over (index, distance). `flat` is row-major
    * nlist × `dim`, with `dim` the CENTROID dimension passed explicitly:
    * a vector of any other length (truncated/dirty row) gets NO cells.
    * The old divides-the-matrix check missed dirty dims that happen to
    * divide nlist·dim (a 1-dim vector against 2×2 centroids scored four
    * garbage "centroids" and got a wrong-but-plausible cell id). */
  def nearestCells(v: ArrayData, flat: Array[Double], dim: Int,
                   nprobe: Int): ArrayData = {
    if (dim == 0 || v.numElements() != dim)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyIntArray)
    val nlist = flat.length / dim
    val d = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0d
      var j = 0
      val off = c * dim
      while (j < dim) { val t = v.getDouble(j) - flat(off + j); s += t * t; j += 1 }
      d(c) = s
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nlist)
    var r = 0
    while (r < k) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < nlist) {
        // NaN distances (dirty embedding) rank as +∞ with a first-unused
        // fallback — the raw `d(i) < bestD` comparison is always false
        // under NaN, leaving best = -1 and crashing the job; the UDF this
        // replaced degraded gracefully via total-order sort
        val dv = if (java.lang.Double.isNaN(d(i))) Double.PositiveInfinity else d(i)
        if (!used(i) && (dv < bestD || best == -1)) { bestD = dv; best = i }
        i += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** IVF cell assignment of an `array<double>` embedding against a fixed
  * centroid set — native form of the per-row `cellsOf` UDF (the last
  * interpreted loop on the ANN path): no Seq[Double] boxing round-trip,
  * stays in the whole-stage span. The centroids ride along as a plan
  * reference object (nlist × dim doubles — control-plane sized), so no
  * broadcast variable is needed. */
case class NearestCells(child: Expression, centers: Seq[Double], dim: Int,
                        nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nprobe >= 1, "nprobe >= 1")
  require(dim >= 1 && centers.size % dim == 0,
    s"centers (${centers.size} values) must be row-major nlist x dim=$dim")

  private lazy val flat: Array[Double] = centers.toArray

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def prettyName: String = s"ivf_cells_$nprobe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    IvfCells.nearestCells(input.asInstanceOf[ArrayData], flat, dim, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("ivfCenters", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfCells.nearestCells($c, $centersRef, $dim, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API for [[LshSignatures]]. */
  def lshSignatures(v: Column, planes: Int, tables: Int): Column =
    GraftSqlBridge.column(LshSignatures(GraftSqlBridge.expression(v), planes, tables))

  /** Column API for [[NearestCells]]; `centers` is row-major nlist × dim
    * (the centroid dim rides along so dirty input rows of ANY other
    * length get no cells, not a misaligned score). */
  def nearestCells(v: Column, centers: Array[Array[Double]], nprobe: Int): Column = {
    require(centers.nonEmpty && centers.head.nonEmpty,
      "nearestCells needs a non-empty centroid matrix")
    // a ragged matrix whose flattened length happens to divide
    // centers.head.length would silently misalign every centroid — the
    // exact wrong-but-plausible scoring this expression exists to refuse
    require(centers.forall(_.length == centers.head.length),
      s"nearestCells centroid matrix must be rectangular; got row lengths " +
        centers.map(_.length).distinct.mkString("/"))
    GraftSqlBridge.column(NearestCells(GraftSqlBridge.expression(v),
      centers.flatten.toSeq, centers.head.length, nprobe))
  }
}
