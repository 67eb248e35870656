package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins/aggregations (SURVEY.md §7.3; AQE's skew-join
  * handles moderate skew at runtime — these helpers are the explicit path
  * for known-pathological keys, e.g. a null-heavy or celebrity key at
  * 100 TB).
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a `small` side:
    * the big side gets a deterministic per-row salt in [0, salts); the
    * small side is replicated `salts` times; the join key becomes
    * (key, salt) — splitting each hot key's rows across `salts` tasks.
    * Result equals `big.join(small, keys)` exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (salted partial) aggregation for a skewed group key:
    * phase 1 aggregates (key, salt) partitions, phase 2 merges per key.
    * `partial` and `merge` must be an associative pair (e.g. sum/sum). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Seq[(String, Column)], merge: Seq[(String, Column)]): DataFrame = {
    val p1 = df.withColumn("_salt",
        pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    p1.groupBy(col(key))
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
