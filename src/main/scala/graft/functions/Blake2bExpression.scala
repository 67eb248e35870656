package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's content-address hashes
  * (`/root/reference/src/catenae/utils.py:42-57`): blake2b-256/512 hex of
  * UTF-8 text as a codegen'd `UnaryExpression`.
  *
  * Versus the Scala-UDF form: no encoder round-trip, inline null handling,
  * and the call stays inside the surrounding WholeStageCodegen span — the
  * per-row cost is the digest itself. The digest is a static call into
  * [[Blake2b]] (stateless, thread-safe). */
case class Blake2bHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 256 || bits == 512, s"unsupported digest size $bits")

  // SQL-registered: reject non-string input at analysis time so
  // blake2b_256(42) is an AnalysisException, not a runtime
  // ClassCastException / codegen failure. (ExpectsInputTypes is
  // private[sql] in Spark 4, so the check is implemented directly.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = s"blake2b_$bits"
  // digest of a literal is a literal — lets ConstantFolding evaluate
  // blake2b_256('…') once at plan time instead of per row
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Blake2b.toHex(Blake2b.hash(input.asInstanceOf[UTF8String].getBytes, bits / 8)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.Blake2b.hexOfBytes($c.getBytes(), ${bits / 8}))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bHash =
    copy(child = newChild)
}

/** SparkSessionExtensions hook — registers the native hash functions for
  * SQL use: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((new FunctionIdentifier("blake2b_256"),
      new ExpressionInfo(classOf[Blake2bHash].getName, "blake2b_256"),
      (exprs: Seq[Expression]) => Blake2bHash(exprs.head, 256)))
    e.injectFunction((new FunctionIdentifier("blake2b_512"),
      new ExpressionInfo(classOf[Blake2bHash].getName, "blake2b_512"),
      (exprs: Seq[Expression]) => Blake2bHash(exprs.head, 512)))
    e.injectFunction((new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head, intArg(exprs, 1, 3))))
    e.injectFunction((new FunctionIdentifier("shingle_pos_hashes"),
      new ExpressionInfo(classOf[ShinglePosHashes].getName, "shingle_pos_hashes"),
      (exprs: Seq[Expression]) => ShinglePosHashes(exprs.head, intArg(exprs, 1, 3))))
    e.injectFunction((new FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (exprs: Seq[Expression]) => MinHashBandKeys(exprs.head,
        intArg(exprs, 1, 128), intArg(exprs, 2, 32))))
    e.injectFunction((new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((new FunctionIdentifier("bigram_top_count"),
      new ExpressionInfo(classOf[BigramTopCount].getName, "bigram_top_count"),
      (exprs: Seq[Expression]) => BigramTopCount(exprs.head)))
    e.injectFunction((new FunctionIdentifier("token_top_count"),
      new ExpressionInfo(classOf[TokenTopCount].getName, "token_top_count"),
      (exprs: Seq[Expression]) => TokenTopCount(exprs.head)))
  }

  /** Literal-int argument for SQL builders (e.g. shingle_hashes(arr, 3)),
    * with a default when the argument is omitted. */
  private def intArg(exprs: Seq[Expression], i: Int, dflt: Int): Int =
    if (exprs.length <= i) dflt
    else exprs(i) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an INT literal, got $other")
    }
}
