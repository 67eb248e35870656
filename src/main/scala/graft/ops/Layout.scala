package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping. Sorting a table by a space-filling
  * curve over two filter columns keeps each output file's min/max
  * bounding box SMALL in both dimensions, so a scan with predicates on
  * either column prunes most files from footer stats alone — the layout
  * story behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from
  * public bit-interleaving arithmetic (Morton 1966).
  *
  * The encoding is pure integer shift/mask expressions (whole-stage
  * codegen, engine-mirrorable in SQL); the layout step is
  * `repartitionByRange` + `sortWithinPartitions` on the z-value — one
  * range shuffle, the same cost as a plain global sort.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit word (Morton interleave half): the standard mask-doubling
    * sequence; each step is a shift + OR + AND on a non-negative long,
    * so the arithmetic is exact and portable to any engine with 64-bit
    * bit ops. */
  private[ops] def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit non-negative coordinates: x on
    * even bits, y on odd bits. Callers with wider domains bucket into
    * 16 bits first (e.g. `pmod(key, 65536)` or a rank quantile). */
  def zvalue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` on the Z-curve over two integer columns: range-shuffle
    * into `numPartitions` z-ranges, sort within each — every output
    * partition (→ file at write time) covers a compact square-ish region
    * of (x, y) space instead of a full-width stripe, so min/max footer
    * stats prune scans filtering on EITHER column. LayoutSpec quantifies
    * the effect vs a linear sort. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
               numPartitions: Int): DataFrame = {
    val z = zvalue2(col(xCol).bitwiseAND(lit(0xFFFFL)),
      col(yCol).bitwiseAND(lit(0xFFFFL)))
    df.withColumn("graft_z", z)
      .repartitionByRange(numPartitions, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
  }
}
