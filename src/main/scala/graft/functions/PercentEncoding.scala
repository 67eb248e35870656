package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2 percent-encoding normalization — the URL-equivalence
  * step `WebText.canonicalUrl`'s regex chain cannot express: two URIs
  * that differ only in the CASE of percent-encoding hex digits, or in
  * whether an UNRESERVED character is encoded at all, identify the same
  * resource (`%7Euser` ≡ `%7euser` ≡ `~user`), and a dedup key that
  * misses this re-admits every such duplicate. Rules applied, §6.2.2.1
  * and §6.2.2.2 exactly:
  *  - a `%XX` triplet whose octet is UNRESERVED (ALPHA / DIGIT / `-` /
  *    `.` / `_` / `~`) decodes to the character;
  *  - any other retained triplet uppercases its hex digits
  *    (`%3a` → `%3A`);
  *  - a `%` NOT followed by two hex digits is malformed input and
  *    passes through verbatim (never throws — crawl URLs are dirty).
  * Reserved characters are NEVER decoded (decoding `%2F` to `/` would
  * change which resource the path names — §2.2).
  *
  * Native expression (the [[UrlResolve]] shape): one static call inside
  * the surrounding WholeStageCodegen span; a character scan, no regex. */
object PercentEncoding {

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Normalize every percent triplet in `s` (see object doc). */
  def normalize(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s // fast path: nothing encoded
    val out = new java.lang.StringBuilder(s.length)
    out.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) out.append(v.toChar)
        else {
          out.append('%')
          out.append(java.lang.Character.toUpperCase(s.charAt(i + 1)))
          out.append(java.lang.Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** UTF8String entry point for codegen. */
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(normalize(s.toString))

  /** Column builder: `pct_normalize(url)`. */
  def pctNormalize(u: Column): Column =
    GraftSqlBridge.column(PctNormalizeExpr(GraftSqlBridge.expression(u)))
}

/** Codegen'd unary expression for [[PercentEncoding.normalize]]. */
case class PctNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override protected def nullSafeEval(s: Any): Any =
    PercentEncoding.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.PercentEncoding.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): PctNormalizeExpr =
    copy(child = newChild)
}
