package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[AttrValueExpr]] — HTML open-tag attribute
  * extraction as ONE left-to-right char scan (the [[VisibleTextOps]]
  * kernel discipline). The regex formulation of "the rel attribute's
  * value, with other attributes' quoted values swallowed whole" needs
  * an attribute-consuming loop of alternations whose backtracking
  * space explodes on every tag that does NOT carry the attribute —
  * which on real pages is most `<a>` tags; the scanner is O(tag) with
  * no backtracking at all.
  *
  * Grammar (mirrors the prior regex semantics, WebTextSpec-pinned):
  *  - the span must open `<` + an ASCII tag name;
  *  - attributes are separated by whitespace, OR follow a quoted
  *    value directly (`rel="canonical"href="/x"` — the WHATWG
  *    tokenizer accepts the glued form and real pages carry it);
  *    names are any run outside `{whitespace, '=', '>'}`; values are
  *    double-/single-quoted (anything to the closing quote) or
  *    unquoted (up to whitespace / quote / `>`);
  *  - `name=` inside ANOTHER attribute's quoted value can never be
  *    read as an attribute — the value was consumed as one unit;
  *  - the FIRST attribute whose name case-insensitively equals `name`
  *    wins; a valueless occurrence ('' would be ambiguous with
  *    absence) and a valueless attribute whose name carries `/`
  *    (a stray self-closing slash) both yield '';
  *  - the matched attribute's UNQUOTED value drops ONLY a trailing
  *    `/` that sits immediately before `>` (`<link rel=canonical/>` →
  *    `canonical` — that slash is tag syntax); interior slashes are
  *    value (`href=docs/intro.html`, `type=application/rss+xml`);
  *  - an unterminated quote poisons the rest of the tag → ''. */
object AttrValueOps {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'
  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def nameEq(s: String, from: Int, until: Int, name: String): Boolean = {
    if (until - from != name.length) return false
    var i = 0
    while (i < name.length) {
      val a = s.charAt(from + i)
      val af = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
      if (af != name.charAt(i)) return false
      i += 1
    }
    true
  }

  def attrValue(tag: UTF8String, name: UTF8String): UTF8String =
    UTF8String.fromString(extract(tag.toString, name.toString))

  private[graft] def extract(s: String, name: String): String = {
    val n = s.length
    if (n < 2 || s.charAt(0) != '<' || !isAlpha(s.charAt(1))) return ""
    var i = 2
    while (i < n && isAlpha(s.charAt(i))) i += 1
    // a closing quote is itself a valid separator before the next
    // attribute (rel="canonical"href="/x") — tracked across passes
    var prevQuoted = false
    while (true) {
      // whitespace (or the previous attribute's closing quote)
      // before each attribute
      var hadWs = false
      while (i < n && isWs(s.charAt(i))) { i += 1; hadWs = true }
      if (i >= n || s.charAt(i) == '>') return ""
      if (!hadWs && !prevQuoted) return ""
      prevQuoted = false
      // attribute name
      val ns = i
      while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' &&
        s.charAt(i) != '>') i += 1
      if (i == ns) return "" // bare '=' with no name: malformed, stop
      val ne = i
      // peek past whitespace for '='
      var j = i
      while (j < n && isWs(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == '=') {
        j += 1
        while (j < n && isWs(s.charAt(j))) j += 1
        var vs = 0; var ve = 0; var quoted = false
        if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
          val qc = s.charAt(j)
          vs = j + 1
          var k = vs
          while (k < n && s.charAt(k) != qc) k += 1
          if (k >= n) return "" // unterminated quote poisons the tag
          ve = k; i = k + 1; quoted = true; prevQuoted = true
        } else {
          vs = j
          var k = j
          while (k < n && !isWs(s.charAt(k)) && s.charAt(k) != '"' &&
            s.charAt(k) != '\'' && s.charAt(k) != '>') k += 1
          ve = k; i = k
        }
        if (nameEq(s, ns, ne, name)) {
          var e = ve
          if (!quoted && e > vs && s.charAt(e - 1) == '/' &&
            e < n && s.charAt(e) == '>') {
            // ONLY the self-closing slash (value-final '/' glued to
            // '>') is tag syntax; interior slashes are value
            e -= 1
          }
          return if (e > vs) s.substring(vs, e) else ""
        }
      } else {
        // valueless attribute: a '/' in its name is the self-closing
        // slash glued to (or standing for) an attribute — malformed
        // position, stop like the regex did
        var k = ns
        while (k < ne) {
          if (s.charAt(k) == '/') return ""
          k += 1
        }
        if (nameEq(s, ns, ne, name)) return "" // valueless target attr
        // i already sits at ne; the next loop pass requires whitespace
      }
    }
    "" // unreachable
  }
}

/** Native attribute-value extraction over an HTML open-tag span —
  * `attr_value(tag, 'rel')` — one char scan, no regex backtracking
  * ([[AttrValueOps]] for the grammar). The attribute name is a
  * compile-time constant (it names a code path, not data). */
case class AttrValueExpr(child: Expression, attrName: String)
    extends UnaryExpression {
  require(attrName.nonEmpty && attrName.forall(c =>
    (c >= 'a' && c <= 'z') || c == '-'),
    s"attr_value: attribute name must be lowercase ASCII letters/dashes, got '$attrName'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "attr_value"

  private lazy val nameUtf8 = UTF8String.fromString(attrName)

  override protected def nullSafeEval(input: Any): Any =
    AttrValueOps.attrValue(input.asInstanceOf[UTF8String], nameUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.AttrValueOps.attrValue($c, org.apache.spark.unsafe.types.UTF8String.fromString("$attrName"))""")

  override protected def withNewChildInternal(newChild: Expression): AttrValueExpr =
    copy(child = newChild)
}

object AttrValueFunctions {
  /** Column API: the value of `name` in an open-tag span ('' when
    * absent or malformed). */
  def attrValue(tag: Column, name: String): Column =
    GraftSqlBridge.column(AttrValueExpr(GraftSqlBridge.expression(tag), name))
}
