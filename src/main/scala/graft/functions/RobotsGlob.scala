package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 §2.2.3 robots path-pattern matching — the rule language
  * real robots.txt files are written in: a pattern matches ANCHORED at
  * the path start, `*` matches any (possibly empty) character
  * sequence, and a TRAILING `$` requires the match to consume the
  * whole path (a `$` anywhere else is a literal). A pattern without
  * wildcards reduces exactly to the prefix test this generalizes —
  * every plain-prefix robots fixture keeps its verdicts.
  *
  * Native expression rather than `rlike`: the pattern is DATA (a rule
  *-table column, not a literal), which knocks RLike out of its
  * compiled-pattern path; and regex-escaping rule text inside the plan
  * would re-introduce the exact metacharacter-injection surface robots
  * patterns don't have (only `*` and `$` are special). The kernel is
  * the classic two-pointer glob with single-star backtracking —
  * O(|path|·stars) worst case, linear for the typical one-star rule —
  * and a static call from codegen (the [[JaroWinkler]] shape). */
object RobotsGlob {

  /** Does `pattern` match `path` under robots semantics? */
  def matches(path: String, pattern: String): Boolean = {
    val endAnchor = pattern.nonEmpty &&
      pattern.charAt(pattern.length - 1) == '$'
    val p = if (endAnchor) pattern.substring(0, pattern.length - 1)
            else pattern
    val pl = p.length
    val sl = path.length
    if (!endAnchor && pl == 0) return true // empty pattern: matches all
    var pi = 0; var si = 0
    var starP = -1; var starS = -1
    while (si < sl) {
      if (pi == pl) {
        if (!endAnchor) return true // prefix semantics: pattern consumed
        if (starP < 0) return false // $-anchored and path has leftovers
        pi = starP + 1; starS += 1; si = starS
      } else if (p.charAt(pi) == '*') {
        starP = pi; starS = si; pi += 1
      } else if (p.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starP >= 0) {
        pi = starP + 1; starS += 1; si = starS
      } else return false
    }
    // path exhausted: any remaining pattern chars must all be '*'
    while (pi < pl && p.charAt(pi) == '*') pi += 1
    pi == pl
  }

  /** UTF8String entry point for codegen. */
  def matches(path: UTF8String, pattern: UTF8String): Boolean =
    matches(path.toString, pattern.toString)

  /** Column builder: `robots_glob(path, pattern)` → boolean. */
  def robotsGlob(path: Column, pattern: Column): Column =
    GraftSqlBridge.column(RobotsGlobMatch(
      GraftSqlBridge.expression(path), GraftSqlBridge.expression(pattern)))
}

/** Codegen'd binary expression for [[RobotsGlob.matches]]. */
case class RobotsGlobMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_glob"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RobotsGlob.matches(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.RobotsGlob.matches($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): RobotsGlobMatch =
    copy(left = newLeft, right = newRight)
}
