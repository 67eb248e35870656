package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: encoding correctness (pinned Morton codes) and the
  * data-skipping property it exists for — after zorderBy, per-partition
  * min/max bounding boxes are compact in BOTH dimensions, so a filter on
  * the second column prunes most partitions where a linear sort prunes
  * none. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue2: pinned Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 65535L)).toDF("x", "y")
    val got = df.select(Layout.zvalue2(col("x"), col("y"))).as[Long].collect().toSeq
    // z(3,5): spread(3)=0b101=5, spread(5)=0b10001=17 → 5 | 17<<1 = 39
    assert(got === Seq(0L, 1L, 2L, 3L, 39L, 4294967295L))
  }

  test("zvalue2 roundtrip: deinterleaving recovers both coordinates") {
    def compact(z: Long): Long = { // inverse of spread16 (standard sequence)
      var x = z & 0x55555555L
      x = (x | (x >> 1)) & 0x33333333L
      x = (x | (x >> 2)) & 0x0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFFL
      x
    }
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    zs.foreach { case (x, y, z) =>
      assert(compact(z) === x, s"x from z($x,$y)=$z")
      assert(compact(z >> 1) === y, s"y from z($x,$y)=$z")
    }
  }

  test("zvalue2 is monotone in each coordinate along the curve diagonal") {
    // interleaving preserves per-coordinate order when the other is fixed
    val xs = (0L until 64L).toDF("x")
    val z = xs.select(Layout.zvalue2(col("x"), lit(7L))).as[Long].collect()
    assert(z.toSeq === z.sorted.toSeq)
  }

  test("zorderBy partitions prune a y-filter that a linear sort cannot") {
    // 64×64 grid; 16 partitions. Z-order tiles the grid → a y∈[8,15]
    // band (any x) touches only tiles whose y-range includes it (~4 of
    // 16); sorting linearly by x gives full-height stripes — every
    // partition overlaps every y band.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def overlapping(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymin") <= 15 && col("ymax") >= 8)
        .count()
    val zed = overlapping(Layout.zorderBy(grid, "x", "y", numPartitions = 16))
    val linear = overlapping(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    assert(linear >= 14, s"linear stripes should all overlap, got $linear")
    assert(zed <= 6, s"z-order should prune to ~4 tiles, got $zed")
    assert(zed * 2 < linear)
  }
}
