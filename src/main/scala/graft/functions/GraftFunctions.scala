package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function parity surface for the reference's `utils.py`:
  *
  *  - blake2b_256 / blake2b_512 / sha3_512 hex digests of UTF-8 text
  *    (reference `src/catenae/utils.py:42-57`),
  *  - uid = blake2b_256(uuid4)[:12] (reference `utils.py:60-61`),
  *  - epoch-second / epoch-milli timestamps (reference `utils.py:11-16`),
  *  - JSON serde (reference `utils.py:19-39`) → Spark built-ins
  *    `to_json` / `from_json` / `get_json_object` (no port needed).
  *
  * SHA3-512 uses the JDK 17 built-in MessageDigest provider; BLAKE2b is the
  * from-spec impl in [[Blake2b]]. Both are plain Scala UDFs — they sit outside
  * whole-stage codegen, so queries should compute them once per row and not
  * in a hot inner loop; for the dedup path the hash is computed in a single
  * projection before the shuffle, which is the dominant-cost-correct shape.
  */
object GraftFunctions {

  private def sha3_512Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA3-512")
    Blake2b.toHex(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  private val sha3_512Udf = udf((s: String) => if (s == null) null else sha3_512Hex(s))

  private def ncol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  /** blake2b-256 hex digest (the reference's canonical content address) —
    * native codegen'd expression, see [[Blake2bHash]]. */
  def blake2b_256(c: Column): Column = ncol(Blake2bHash(expression(c), 256))
  def blake2b_512(c: Column): Column = ncol(Blake2bHash(expression(c), 512))
  def sha3_512(c: Column): Column   = sha3_512Udf(c)

  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)

  /** Random 12-hex-char node/instance uid (reference `utils.py:60-61`).
    * Driver-side helper (non-deterministic; not for use inside queries). */
  def getUid(): String =
    Blake2b.hex256(java.util.UUID.randomUUID().toString).substring(0, 12)

  /** Deterministic per-row uid column: blake2b_256 of the given key, first
    * 12 hex chars — the distributed analog of the reference uid. */
  def uidFor(c: Column): Column = substring(blake2b_256(c.cast("string")), 1, 12)

  /** Epoch seconds / millis (reference `utils.py:11-16`). */
  def timestampSec(): Column = unix_timestamp(current_timestamp())
  def timestampMs(): Column  = unix_millis(current_timestamp())

  /** Register SQL-callable names so `spark.sql` queries can use them too
    * (blake2b as the native codegen'd expression; for cluster deployments
    * prefer `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "blake2b_256",
      exprs => Blake2bHash(exprs.head, 256))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "blake2b_512",
      exprs => Blake2bHash(exprs.head, 512))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "vec_dot",
      exprs => DotProduct(exprs.head, exprs(1)))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "bigram_top_count",
      exprs => BigramTopCount(exprs.head))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "token_top_count",
      exprs => TokenTopCount(exprs.head))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "shingle_hashes",
      exprs => ShingleHashes(exprs.head,
        exprs.lift(1) match {
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
          case None => 3
          case Some(other) => throw new IllegalArgumentException(
            s"shingle_hashes: n must be an INT literal, got $other")
        }))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "shingle_pos_hashes",
      exprs => ShinglePosHashes(exprs.head,
        exprs.lift(1) match {
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
          case None => 3
          case Some(other) => throw new IllegalArgumentException(
            s"shingle_pos_hashes: n must be an INT literal, got $other")
        }))
    def intLit(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
               i: Int, dflt: Int, fn: String): Int =
      if (exprs.length <= i) dflt
      else exprs(i) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"$fn: argument ${i + 1} must be an INT literal, got $other")
      }
    // parse the optional (minHashes, bands) literals — silently pinning
    // (128, 32) would return different LSH buckets than the user asked for
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "minhash_band_keys",
      exprs => MinHashBandKeys(exprs.head,
        intLit(exprs, 1, 128, "minhash_band_keys"),
        intLit(exprs, 2, 32, "minhash_band_keys")))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "simhash64",
      exprs => SimHash64(exprs.head))
    spark.udf.register("sha3_512", (s: String) => if (s == null) null else sha3_512Hex(s))
  }
}
