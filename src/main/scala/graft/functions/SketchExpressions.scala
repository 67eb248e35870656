package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimate of a string column under a pre-built count-min
  * sketch — the native probe for [[graft.ops.TextAnalysis.heavyHitters]]'
  * candidate filter. The sketch rides along as a codegen reference object
  * (the same mechanism Spark uses for its runtime bloom filter), so the
  * probe is a direct virtual call per row instead of a ScalaUDF
  * encoder/decoder round-trip — this sits on the full exploded token
  * stream, the hottest row count in the engine at corpus scale.
  *
  * The token is hashed via `String`, matching what the UDF form passed,
  * so estimates are bit-identical to `sketch.estimateCount(t)`.
  */
case class CountMinEstimate(sketch: CountMinSketch, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.catalogString}")
  }

  // probe on the raw UTF-8 bytes: estimateCount(String) just re-encodes
  // to the identical byte path, so the toString round-trip was two
  // allocations per row on the hottest exploded-token stream for nothing
  override protected def nullSafeEval(input: Any): Any =
    sketch.estimateCount(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): CountMinEstimate =
    copy(child = newChild)
}

object SketchFunctions {
  /** Column API: estimated count of a string value under `sketch`. */
  def countMinEstimate(sketch: CountMinSketch, value: Column): Column =
    GraftSqlBridge.column(CountMinEstimate(sketch, GraftSqlBridge.expression(value)))
}
