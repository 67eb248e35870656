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

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Blake2b.toHex(Blake2b.hash(input.asInstanceOf[UTF8String].getBytes, bits / 8)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.Blake2b.hexOfBytes($c.getBytes(), ${bits / 8}))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bHash =
    copy(child = newChild)
}

/** SHA3-512 hex digest (reference `utils.py:54-57`) as an EVAL-ONLY
  * expression (CodegenFallback): the per-row cost is the JCE digest
  * itself, so a generated call body buys nothing — but expression form
  * (vs the former Scala UDF) still drops the encoder round-trip, gets
  * analysis-time type checking, and lets BOTH SQL surfaces
  * ([[GraftExtensions]] and `GraftFunctions.register`) offer the same
  * name, which the UDF form could not (extensions inject expression
  * builders only — sha3_512 used to exist in one surface and not the
  * other, the exact drift the shared [[SqlArgs]] design exists to
  * prevent). */
case class Sha3_512Hash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "sha3_512"

  override protected def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("SHA3-512")
    UTF8String.fromString(Blake2b.toHex(
      md.digest(input.asInstanceOf[UTF8String].getBytes)))
  }

  override protected def withNewChildInternal(newChild: Expression): Sha3_512Hash =
    copy(child = newChild)
}

/** SparkSessionExtensions hook — registers the native hash functions for
  * SQL use: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. Shares
  * [[SqlArgs]] with `GraftFunctions.register`, so the two SQL surfaces
  * accept exactly the same calls (same arity errors, same literal
  * parsing). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import SqlArgs.{arity, intArg}

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_])(
        builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    inject("blake2b_256", classOf[Blake2bHash])(exprs =>
      Blake2bHash(arity(exprs, 1, 1, "blake2b_256").head, 256))
    inject("blake2b_512", classOf[Blake2bHash])(exprs =>
      Blake2bHash(arity(exprs, 1, 1, "blake2b_512").head, 512))
    inject("vec_dot", classOf[DotProduct])(exprs => { arity(exprs, 2, 2, "vec_dot")
      DotProduct(exprs.head, exprs(1)) })
    inject("shingle_hashes", classOf[ShingleHashes])(exprs => {
      arity(exprs, 1, 2, "shingle_hashes")
      ShingleHashes(exprs.head, intArg(exprs, 1, 3, "shingle_hashes")) })
    inject("shingle_pos_hashes", classOf[ShinglePosHashes])(exprs => {
      arity(exprs, 1, 2, "shingle_pos_hashes")
      ShinglePosHashes(exprs.head, intArg(exprs, 1, 3, "shingle_pos_hashes")) })
    inject("minhash_band_keys", classOf[MinHashBandKeys])(exprs => {
      arity(exprs, 1, 3, "minhash_band_keys")
      MinHashBandKeys(exprs.head,
        intArg(exprs, 1, 128, "minhash_band_keys"),
        intArg(exprs, 2, 32, "minhash_band_keys")) })
    inject("simhash64", classOf[SimHash64])(exprs =>
      SimHash64(arity(exprs, 1, 1, "simhash64").head))
    inject("bigram_top_count", classOf[BigramTopCount])(exprs =>
      BigramTopCount(arity(exprs, 1, 1, "bigram_top_count").head))
    inject("token_top_count", classOf[TokenTopCount])(exprs =>
      TokenTopCount(arity(exprs, 1, 1, "token_top_count").head))
    inject("nfc_normalize", classOf[NfcNormalize])(exprs =>
      NfcNormalize(arity(exprs, 1, 1, "nfc_normalize").head))
    inject("jaro_winkler", classOf[JaroWinklerSim])(exprs => {
      arity(exprs, 2, 2, "jaro_winkler")
      JaroWinklerSim(exprs.head, exprs(1)) })
    inject("sha3_512", classOf[Sha3_512Hash])(exprs =>
      Sha3_512Hash(arity(exprs, 1, 1, "sha3_512").head))
    inject("url_resolve", classOf[ResolveUrlExpr])(exprs => {
      arity(exprs, 2, 2, "url_resolve")
      ResolveUrlExpr(exprs.head, exprs(1)) })
    inject("robots_glob", classOf[RobotsGlobMatch])(exprs => {
      arity(exprs, 2, 2, "robots_glob")
      RobotsGlobMatch(exprs.head, exprs(1)) })
    inject("pct_normalize", classOf[PctNormalizeExpr])(exprs =>
      PctNormalizeExpr(arity(exprs, 1, 1, "pct_normalize").head))
    inject("visible_text", classOf[VisibleTextExpr])(exprs =>
      VisibleTextExpr(arity(exprs, 1, 1, "visible_text").head))
    inject("html_unescape", classOf[HtmlUnescapeExpr])(exprs =>
      HtmlUnescapeExpr(arity(exprs, 1, 1, "html_unescape").head))
    inject("attr_value", classOf[AttrValueExpr])(exprs => {
      arity(exprs, 2, 2, "attr_value")
      AttrValueExpr(exprs.head, SqlArgs.strArg(exprs, 1, "attr_value")) })
    inject("md5_shingle_hashes", classOf[Md5ShingleHashes])(exprs => {
      arity(exprs, 1, 2, "md5_shingle_hashes")
      Md5ShingleHashes(exprs.head, intArg(exprs, 1, 3, "md5_shingle_hashes")) })
    inject("md5_shingle_pos_hashes", classOf[Md5ShinglePosHashes])(exprs => {
      arity(exprs, 1, 2, "md5_shingle_pos_hashes")
      Md5ShinglePosHashes(exprs.head,
        intArg(exprs, 1, 3, "md5_shingle_pos_hashes")) })
    inject("dup_ngram_stats", classOf[DupNgramStats])(exprs => {
      arity(exprs, 1, 2, "dup_ngram_stats")
      DupNgramStats(exprs.head, intArg(exprs, 1, 5, "dup_ngram_stats")) })
    inject("script_gate_lang", classOf[ScriptGateLang])(exprs => {
      arity(exprs, 1, 1, "script_gate_lang")
      ScriptGateLang(exprs.head,
        graft.ops.TextAnalysis.ScriptGateMinShareMicros) })
    inject("md5_minhash", classOf[Md5MinHashK])(exprs => {
      arity(exprs, 1, 3, "md5_minhash")
      Md5MinHashK(exprs.head, intArg(exprs, 1, 3, "md5_minhash"),
        intArg(exprs, 2, 16, "md5_minhash")) })
    inject("trigram_lang_best", classOf[TrigramLangBest])(exprs =>
      TrigramLangBest(arity(exprs, 1, 1, "trigram_lang_best").head))
  }
}
