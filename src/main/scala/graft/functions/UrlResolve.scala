package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 relative-reference resolution as a native kernel — the
  * engine of `WebText.resolveUrl`. A pure-column regexp/CASE chain was
  * the first implementation; its unrolled dot-segment removal generated
  * code past Janino's 64 KB method limit, knocking every stage that
  * touched it out of whole-stage codegen into interpreted regex
  * evaluation (the CharTrigrams lesson, at the janino layer instead of
  * the generator child). The kernel is one static call from codegen —
  * tiny generated footprint, stays inside the surrounding
  * WholeStageCodegen span like [[Blake2b]]/[[JaroWinkler]] — and runs
  * the REAL §5.2.4 remove_dot_segments loop, so arbitrarily deep
  * `../../` chains resolve exactly (the unrolled form resolved past
  * depth 8 only partially).
  *
  * Semantics (spec-pinned against all 34 RFC 3986 §5.4 examples, and
  * value-pinned by the q222/q219/q227 ground-truth oracles):
  *  - `ref` is trimmed; a ref with a scheme passes through unchanged;
  *  - a base WITHOUT a `scheme://` authority cannot anchor any
  *    non-absolute ref → `""` (the caller's filter sentinel);
  *  - empty ref → base minus fragment; `#f` → base minus fragment + f;
  *  - `//authority…` takes the base scheme; `?q` replaces the base
  *    query on the base path (`/` when the base path is empty);
  *  - `/rooted` and relative paths merge per §5.3 and run
  *    remove_dot_segments; over-root `..` segments are ignored. */
object UrlResolve {

  /** `^[A-Za-z][A-Za-z0-9+.-]*:` — does the reference carry a scheme? */
  private def schemeColon(s: String): Int = {
    if (s.isEmpty) return -1
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return i
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) return -1
      i += 1
    }
    -1
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over the PATH part; a
    * `?query#fragment` suffix passes through untouched. */
  private def removeDotSegments(p: String): String = {
    val qh = {
      val q = p.indexOf('?'); val h = p.indexOf('#')
      if (q < 0) h else if (h < 0) q else math.min(q, h)
    }
    val (path, suffix) =
      if (qh < 0) (p, "") else (p.substring(0, qh), p.substring(qh))
    if (!path.contains("/.") && !path.startsWith("./") &&
        !path.startsWith("../") && path != "." && path != "..")
      return path + suffix // dotless fast path (the common case)
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    def pop(): Unit = {
      val i = out.lastIndexOf("/")
      out.setLength(if (i < 0) 0 else i)
    }
    while (!in.isEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); pop() }
      else if (in == "/..") { in = "/"; pop() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val i = in.indexOf('/', start)
        if (i < 0) { out.append(in); in = "" }
        else { out.append(in, 0, i); in = in.substring(i) }
      }
    }
    out.append(suffix)
    out.toString
  }

  /** The full §5 resolution (see object scaladoc for the contract). */
  def resolve(base: String, ref0: String): String = {
    val r = ref0.trim
    if (schemeColon(r) >= 0) return r // absolute: as-is
    // base authority: scheme "://" host-up-to(/?#)
    val sc = schemeColon(base)
    if (sc < 0 || base.length < sc + 3 ||
        base.charAt(sc + 1) != '/' || base.charAt(sc + 2) != '/')
      return "" // non-hierarchical base: unresolvable sentinel
    var i = sc + 3
    while (i < base.length && { val c = base.charAt(i)
        c != '/' && c != '?' && c != '#' }) i += 1
    val auth = base.substring(0, i) // scheme://host[:port]
    var j = i
    while (j < base.length && { val c = base.charAt(j)
        c != '?' && c != '#' }) j += 1
    val basePath = base.substring(i, j)
    val hash = base.indexOf('#')
    val baseNoFrag = if (hash < 0) base else base.substring(0, hash)
    if (r.isEmpty) baseNoFrag
    else if (r.charAt(0) == '#') baseNoFrag + r
    else if (r.startsWith("//")) base.substring(0, sc + 1) + r
    else if (r.charAt(0) == '?')
      auth + (if (basePath.isEmpty) "/" else basePath) + r
    else if (r.charAt(0) == '/') auth + removeDotSegments(r)
    else {
      val cut = basePath.lastIndexOf('/')
      val dir = if (cut < 0) "/" else basePath.substring(0, cut + 1)
      auth + removeDotSegments(dir + r)
    }
  }

  /** UTF8String entry point for codegen. */
  def resolve(base: UTF8String, ref: UTF8String): UTF8String =
    UTF8String.fromString(resolve(base.toString, ref.toString))

  /** Column builder: `url_resolve(base, ref)` → resolved absolute URL,
    * `''` when unresolvable. */
  def resolveUrl(base: Column, ref: Column): Column =
    GraftSqlBridge.column(ResolveUrlExpr(
      GraftSqlBridge.expression(base), GraftSqlBridge.expression(ref)))
}

/** Codegen'd binary expression for [[UrlResolve.resolve]]. */
case class ResolveUrlExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "url_resolve"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    UrlResolve.resolve(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.UrlResolve.resolve($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ResolveUrlExpr =
    copy(left = newLeft, right = newRight)
}
