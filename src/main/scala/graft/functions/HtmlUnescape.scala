package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[HtmlUnescapeExpr]] — full HTML character-reference
  * decoding in ONE left-to-right char scan (the [[VisibleTextOps]]
  * kernel discipline: no java.util.regex machinery, stays inside
  * whole-stage codegen via a static call). Real crawl text is full of
  * `&#8217;`/`&#xE9;`/`&eacute;`-class references the predefined-five
  * decode leaves verbatim — polluting tokens, dedup keys, quality
  * stats, and sentence boundaries downstream.
  *
  * Decoding rules (WHATWG-shaped, fail-open):
  *  - `&#D;` (1–7 decimal digits) and `&#xH;`/`&#XH;` (1–6 hex digits)
  *    decode to the code point; code points 0x80–0x9F remap through
  *    the Windows-1252 table first (the WHATWG numeric-reference rule —
  *    pages that write `&#146;` mean `’`); 0, surrogates, and
  *    > U+10FFFF are invalid → the reference stays VERBATIM (fail
  *    open — never guess);
  *  - named references from a fixed public table: the five predefined
  *    (`amp lt gt quot apos`, plus their all-caps forms), the HTML4
  *    Latin-1 set (`nbsp`…`yuml`, U+00A0–U+00FF), and the common
  *    punctuation/symbol set (`ndash mdash lsquo rsquo ldquo rdquo
  *    hellip bull dagger euro trade permil laquo raquo minus ne le ge
  *    asymp larr rarr OElig oelig Scaron scaron Yuml fnof circ tilde
  *    ensp emsp thinsp zwnj zwj lrm rlm sbquo bdquo Dagger lsaquo
  *    rsaquo oline frasl infin` …). Names are case-SENSITIVE
  *    (`&Eacute;` ≠ `&eacute;` — both present); unknown names stay
  *    verbatim;
  *  - a reference must END IN `;` — `&lt` bare or `&x=1` in a query
  *    string never decodes (the attribute-value-safe strictness: URL
  *    parameters that happen to spell an entity name survive);
  *  - single pass, never re-scanned: `&amp;lt;` → `&lt;` (the
  *    no-double-decode rule the sequential chain had by ordering).
  *
  * `nbspAsSpace` maps a decoded U+00A0 (from `&nbsp;`, `&#160;`, or
  * `&#xA0;`) to a PLAIN SPACE — the visible-text pipeline's mapping,
  * where no-break spaces must feed the ASCII whitespace collapse;
  * spec-correct callers (the SQL `html_unescape`) keep U+00A0. */
object HtmlUnescapeOps {

  /** Windows-1252 remap for numeric references 0x80–0x9F (WHATWG
    * "Numeric character reference end state" table); identity where
    * the spec leaves the C1 code point in place. */
  private val C1: Array[Int] = {
    val a = Array.tabulate(32)(i => 0x80 + i)
    val m = Map(0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192,
      0x84 -> 0x201E, 0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021,
      0x88 -> 0x02C6, 0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039,
      0x8C -> 0x0152, 0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019,
      0x93 -> 0x201C, 0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013,
      0x97 -> 0x2014, 0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161,
      0x9B -> 0x203A, 0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    m.foreach { case (k, v) => a(k - 0x80) = v }
    a
  }

  /** HTML4 Latin-1 names in code-point order U+00A0–U+00FF. */
  private val Latin1Names: Array[String] = Array(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
    "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
    "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
    "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
    "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
    "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")

  private val Named: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    def put(n: String, cp: Int): Unit = { m.put(n, cp); () }
    // predefined (HTML + XML), both canonical and all-caps spellings
    Seq("amp" -> '&', "AMP" -> '&', "lt" -> '<', "LT" -> '<',
      "gt" -> '>', "GT" -> '>', "quot" -> '"', "QUOT" -> '"',
      "apos" -> '\'').foreach { case (n, c) => put(n, c.toInt) }
    Latin1Names.zipWithIndex.foreach { case (n, i) => put(n, 0xA0 + i) }
    // common punctuation / symbols (HTML4 "special" + selected symbols)
    Seq("OElig" -> 0x0152, "oelig" -> 0x0153, "Scaron" -> 0x0160,
      "scaron" -> 0x0161, "Yuml" -> 0x0178, "fnof" -> 0x0192,
      "circ" -> 0x02C6, "tilde" -> 0x02DC, "ensp" -> 0x2002,
      "emsp" -> 0x2003, "thinsp" -> 0x2009, "zwnj" -> 0x200C,
      "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F,
      "ndash" -> 0x2013, "mdash" -> 0x2014, "lsquo" -> 0x2018,
      "rsquo" -> 0x2019, "sbquo" -> 0x201A, "ldquo" -> 0x201C,
      "rdquo" -> 0x201D, "bdquo" -> 0x201E, "dagger" -> 0x2020,
      "Dagger" -> 0x2021, "bull" -> 0x2022, "hellip" -> 0x2026,
      "permil" -> 0x2030, "prime" -> 0x2032, "Prime" -> 0x2033,
      "lsaquo" -> 0x2039, "rsaquo" -> 0x203A, "oline" -> 0x203E,
      "frasl" -> 0x2044, "euro" -> 0x20AC, "trade" -> 0x2122,
      "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192,
      "darr" -> 0x2193, "harr" -> 0x2194, "minus" -> 0x2212,
      "infin" -> 0x221E, "ne" -> 0x2260, "le" -> 0x2264,
      "ge" -> 0x2265, "asymp" -> 0x2248, "equiv" -> 0x2261,
      "middot" -> 0x00B7).foreach { case (n, cp) => put(n, cp) }
    m
  }

  /** Longest name in [[Named]] — bounds the name scan per `&`. */
  private val MaxNameLen: Int = {
    var n = 0
    Named.keySet.forEach(k => n = math.max(n, k.length))
    n
  }

  def htmlUnescape(s: UTF8String): UTF8String =
    UTF8String.fromString(unescape(s.toString, nbspAsSpace = false))

  def htmlUnescapeWs(s: UTF8String): UTF8String =
    UTF8String.fromString(unescape(s.toString, nbspAsSpace = true))

  private def appendCp(sb: java.lang.StringBuilder, cp0: Int,
                       nbspAsSpace: Boolean): Unit = {
    val cp = if (cp0 >= 0x80 && cp0 <= 0x9F) C1(cp0 - 0x80) else cp0
    if (nbspAsSpace && cp == 0xA0) { sb.append(' '); () }
    else { sb.appendCodePoint(cp); () }
  }

  /** True for a code point a numeric reference may produce (fail open
    * otherwise — the reference text stays verbatim). */
  private def validCp(cp: Int): Boolean =
    cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)

  private[graft] def unescape(s: String, nbspAsSpace: Boolean): String = {
    val n = s.length
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else if (i + 2 < n && s.charAt(i + 1) == '#') {
        val hex = {
          val x = s.charAt(i + 2); x == 'x' || x == 'X'
        }
        val d0 = if (hex) i + 3 else i + 2
        var j = d0
        var cp = 0L
        if (hex) {
          while (j < n && j - d0 < 7 && isHex(s.charAt(j))) {
            cp = cp * 16 + hexVal(s.charAt(j)); j += 1
          }
        } else {
          while (j < n && j - d0 < 8 && s.charAt(j) >= '0' &&
              s.charAt(j) <= '9') {
            cp = cp * 10 + (s.charAt(j) - '0'); j += 1
          }
        }
        // the digit loop is capped (7 hex / 8 dec digits — cp can't
        // overflow a Long), so a longer digit run leaves j on a digit,
        // not ';' → verbatim, like any other invalid reference
        val terminated = j > d0 && j < n && s.charAt(j) == ';'
        if (terminated && cp <= 0x10FFFFL && validCp(cp.toInt)) {
          appendCp(sb, cp.toInt, nbspAsSpace); i = j + 1
        } else { sb.append(c); i += 1 }
      } else {
        // named: letters/digits up to the table's longest name, then ';'
        var j = i + 1
        val cap = math.min(n, i + 1 + MaxNameLen)
        while (j < cap && isAlnum(s.charAt(j))) j += 1
        val cp =
          if (j > i + 1 && j < n && s.charAt(j) == ';')
            Named.get(s.substring(i + 1, j))
          else null
        if (cp != null) { appendCp(sb, cp.intValue(), nbspAsSpace); i = j + 1 }
        else { sb.append(c); i += 1 }
      }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  private def isAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
}

/** Native codegen'd HTML character-reference decode — numeric
  * (`&#8217;`, `&#xE9;`) and common named references in one char scan
  * ([[HtmlUnescapeOps]] for the exact rules). `nbspAsSpace` selects the
  * visible-text mapping of U+00A0 to a plain space. */
case class HtmlUnescapeExpr(child: Expression, nbspAsSpace: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "html_unescape"

  private def kernel: String = if (nbspAsSpace) "htmlUnescapeWs" else "htmlUnescape"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (nbspAsSpace) HtmlUnescapeOps.htmlUnescapeWs(s)
    else HtmlUnescapeOps.htmlUnescape(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUnescapeOps.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescapeExpr =
    copy(child = newChild)
}

object HtmlUnescapeFunctions {
  /** Column API: spec-shaped decode (`&nbsp;` → U+00A0). */
  def htmlUnescape(text: Column): Column =
    GraftSqlBridge.column(HtmlUnescapeExpr(GraftSqlBridge.expression(text)))

  /** Column API: the visible-text mapping (`&nbsp;` → ' '). */
  def htmlUnescapeWs(text: Column): Column =
    GraftSqlBridge.column(
      HtmlUnescapeExpr(GraftSqlBridge.expression(text), nbspAsSpace = true))
}
