package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[VisibleTextExpr]] — the single-call form of the
  * `WebText.visibleText` chain. Strip passes 1–4 replicate their
  * regexes EXACTLY (the oracles splice those regexes into DuckDB, so
  * they must be bit-identical on every input — `VisibleTextParitySpec`
  * fuzzes the equality against `WebText.visibleTextRegex` and the
  * q144/q211/q215 oracles re-check on every verify run; the entity
  * stage is the shared [[HtmlUnescapeOps]] decoder, mirrored in DuckDB
  * by per-planted-form replaces since a fixed replace chain cannot
  * express numeric references):
  *
  *  1. `(?is)<script[^>]*>.*?</script>` → `' '` — leftmost scan, open
  *     prefix is the literal `<script` followed by any non-`>` run and
  *     a `>` (so `<scriptfoo bar>` opens, exactly as the regex reads),
  *     closer is the literal 9-char `</script>` case-insensitively;
  *     an UNTERMINATED open does not match — its text stays, as with
  *     the regex;
  *  2. same for `<style>`;
  *  3. `(?s)<!--.*?-->` → `' '` (nearest terminator, unterminated
  *     comments stay);
  *  4. `<[^>]*>` → `' '` (any `<`…first-`>` span; a `<` with no `>`
  *     ahead stays literal);
  *  5. FULL character-reference decode ([[HtmlUnescapeOps]] — numeric
  *     `&#8217;`/`&#xE9;` with the Windows-1252 C1 remap, plus the
  *     named table), in the visible-text mapping where `&nbsp;`-family
  *     references become a plain space; a single pass whose output is
  *     never re-scanned, so `&amp;lt;` yields `&lt;`;
  *  6. `\s+` → `' '` + trim (Java `\s` is the ASCII class).
  *
  * Passes 1–3 run SEQUENTIALLY like the regex chain — fusing them
  * changes results when spans interleave (`<style>a<script>b</style>`:
  * the script pass runs over the whole document first). Each pass is a
  * tight char scan — no java.util.regex machinery, no backtracking —
  * which is the entire point: two of these chains run per BLOCK in the
  * jusText pipeline (q211/q212/q215, the library's most expensive
  * family), and the regex form pays eight NFA executions per call. */
object VisibleTextOps {

  def visibleText(s: UTF8String): UTF8String =
    UTF8String.fromString(clean(s.toString))

  private[functions] def clean(html: String): String = {
    var t = stripTagged(html, "script")
    t = stripTagged(t, "style")
    t = stripComments(t)
    t = stripTags(t)
    t = decodeEntities(t)
    collapseWs(t)
  }

  /** ASCII-only case-insensitive region compare — Java `(?i)` without
    * `(?u)` folds ASCII only, and the needles here are ASCII. */
  private def regionCi(s: String, at: Int, needle: String): Boolean = {
    if (at + needle.length > s.length) return false
    var i = 0
    while (i < needle.length) {
      val a = s.charAt(at + i); val b = needle.charAt(i)
      val af = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
      if (af != b) return false
      i += 1
    }
    true
  }

  private def indexOfCi(s: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val limit = s.length - needle.length
    while (i <= limit) {
      if (regionCi(s, i, needle)) return i
      i += 1
    }
    -1
  }

  private def stripTagged(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name + ">"
    val n = s.length
    if (indexOfCi(s, open, 0) < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && regionCi(s, i, open)) {
        var g = i + open.length
        while (g < n && s.charAt(g) != '>') g += 1
        val ci = if (g < n) indexOfCi(s, close, g + 1) else -1
        if (ci >= 0) { sb.append(' '); i = ci + close.length }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def stripComments(s: String): String = {
    val n = s.length
    var first = s.indexOf("<!--")
    if (first < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<' && i + 3 < n && s.charAt(i + 1) == '!' &&
          s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
        val e = s.indexOf("-->", i + 4)
        if (e >= 0) { sb.append(' '); i = e + 3 }
        else { sb.append('<'); i += 1 }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def stripTags(s: String): String = {
    val n = s.length
    if (s.indexOf('<') < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var noGtAhead = false // once a '<' finds no '>', none later will either
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && !noGtAhead) {
        val g = s.indexOf('>', i + 1)
        if (g >= 0) { sb.append(' '); i = g + 1 }
        else { noGtAhead = true; sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // entity stage: the FULL character-reference decoder shared with
  // html_unescape (numeric &#8217;/&#xE9; + the named table), in the
  // visible-text mapping where a decoded no-break space becomes a
  // plain space so the ASCII whitespace collapse below folds it. One
  // left-to-right scan — "&amp;lt;" yields "&lt;" because the output
  // is never re-scanned.
  private def decodeEntities(s: String): String =
    HtmlUnescapeOps.unescape(s, nbspAsSpace = true)

  /** Java-regex `\s` is the ASCII class [ \t\n\x0B\f\r]. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def collapseWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length() > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

/** Native codegen'd visible-text extraction — one expression call in
  * place of the 8-regex `WebText.visibleText` chain, same output on
  * every input (fuzz-pinned by `VisibleTextParitySpec`; oracle-pinned
  * by every query whose DuckDB SQL splices the regex chain). Stays
  * inside the surrounding WholeStageCodegen span via a static call,
  * like every native kernel in this package. */
case class VisibleTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "visible_text"

  override protected def nullSafeEval(input: Any): Any =
    VisibleTextOps.visibleText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VisibleTextOps.visibleText($c)")

  override protected def withNewChildInternal(newChild: Expression): VisibleTextExpr =
    copy(child = newChild)
}

object VisibleTextFunctions {
  /** Column API: the visible text of an HTML payload (the
    * `WebText.visibleText` contract as one native call). */
  def visibleText(html: Column): Column =
    GraftSqlBridge.column(VisibleTextExpr(GraftSqlBridge.expression(html)))
}
