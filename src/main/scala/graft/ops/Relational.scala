package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators that Spark lacks as single built-ins
  * (SURVEY.md §2.2): as-of join, gaps-and-islands sessionization, top-k
  * per group. Each is a plain DataFrame→DataFrame combinator — Catalyst
  * optimizes through them, and each costs exactly one shuffle on its
  * partition key.
  */
object Relational {

  /** As-of join (pandas `merge_asof` parity): for each left row, the
    * nearest right row with the same key — the latest with
    * `rightTs` ≤ `leftTs` (`direction = "backward"`, default) or the
    * earliest with `rightTs` ≥ `leftTs` (`"forward"`), optionally within
    * `tolerance` time units. Implemented Spark-first as union +
    * directional fill window — one shuffle on `key`, linear in
    * |left|+|right|, no per-row lookup join (the pattern a native engine
    * implements as a sorted merge; SURVEY.md §2.2 joins row).
    *
    * `rightCols` are the right-side columns carried into the result
    * (null when no right row qualifies). Both inputs need `key`;
    * timestamps must be numeric/orderable (use `unix_millis`). Right
    * rows at the same timestamp as a left row DO match (≤ / ≥).
    * Deterministic when (key, rightTs) is unique on the right —
    * duplicate right timestamps leave the winner unspecified (as does
    * pandas). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // a NULL of the matching struct type (the struct itself null, not a
    // struct of nulls — `last(ignoreNulls)` must skip these rows)
    val rFields = rightCols.map(right.schema(_)) :+
      right.schema(rightTs).copy(name = "_rts")
    val nullR = lit(null).cast(org.apache.spark.sql.types.StructType(rFields))
    def nullStruct(src: DataFrame, cols: Seq[String]): Column =
      lit(null).cast(org.apache.spark.sql.types.StructType(cols.map(src.schema(_))))
    val l = left.select(
      key.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_tag") :+
        struct(left.columns.toIndexedSeq.map(col): _*).as("_l") :+
        nullR.as("_r"): _*)
    val r = right.select(
      key.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_tag") :+
        nullStruct(left, left.columns.toIndexedSeq).as("_l") :+
        struct(rightCols.map(col) :+ col(rightTs).as("_rts"): _*).as("_r"): _*)
    // right rows sort before left rows at equal ts (tag 0 < 1) → ≤/≥ match;
    // forward scans the timeline in reverse, so "last preceding" becomes
    // "nearest following"
    val ord = if (direction == "backward") col("_ts").asc else col("_ts").desc
    val w = Window.partitionBy(key.map(col): _*).orderBy(ord, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withinTol = tolerance match {
      case None      => lit(true)
      case Some(tol) => abs(col("_ts") - col("_rff._rts")) <= tol
    }
    l.unionByName(r)
      .withColumn("_rff", last(col("_r"), ignoreNulls = true).over(w))
      .withColumn("_rff", when(withinTol, col("_rff"))) // else typed null
      .filter(col("_tag") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_rff.$c").as(c)): _*)
  }

  /** Gaps-and-islands sessionization: assigns `session_id` (1-based per
    * partition) splitting on gaps > `gapMs` in `tsMsCol`. One shuffle on
    * the partition cols; two window passes. */
  def sessionize(df: DataFrame, partitionCols: Seq[String], tsMsCol: String,
                 gapMs: Long, tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val order = (tsMsCol +: tieBreak).map(col)
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_new_session",
        when(col(tsMsCol) - lag(col(tsMsCol), 1).over(w) > gapMs ||
          lag(col(tsMsCol), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum("_new_session").over(wRun))
      .drop("_new_session")
  }

  /** Top-k rows per group by `order`, with a `rn` rank column (1-based).
    * Deterministic given a total `order`. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Interval join as an EQUI-join — the scale path for `point ∈
    * [lo, hi]` joins with no shared equi-key (IP-to-range lookups,
    * time-window enrichment), which Spark otherwise plans as a
    * broadcast nested loop: O(|points|·|intervals|) compares and a
    * broadcast ceiling on the interval side.
    *
    * Bucketize instead: each interval explodes to the `bucketWidth`-
    * sized buckets it covers, each point maps to its one bucket, and
    * the join becomes a hash equi-join on the bucket id followed by the
    * exact `[lo, hi]` (inclusive) filter. A (point, interval) pair can
    * only meet in the point's single bucket, so the output needs no
    * dedup. Cost: the interval side inflates by ~(span/bucketWidth)+1
    * rows — size `bucketWidth` near the TYPICAL span so most intervals
    * explode to 1-2 buckets while each bucket stays selective; a
    * degenerate corpus-spanning interval inflates linearly (cap or
    * split such outliers upstream, the LSH hot-key argument).
    *
    * All three columns must be long-castable (dates → `unix_date`,
    * timestamps → `unix_millis` first). Bucket id is floor(x/W) —
    * monotonic in x, so an in-range point's bucket always lies inside
    * its interval's exploded bucket run, negatives included. Column
    * names must be disjoint across the two inputs. */
  def bucketedIntervalJoin(points: DataFrame, intervals: DataFrame,
                           ptCol: String, loCol: String, hiCol: String,
                           bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("graft_bucket", explode(sequence(
        floor(col(loCol).cast("long") / bucketWidth).cast("long"),
        floor(col(hiCol).cast("long") / bucketWidth).cast("long"))))
    val pts = points.withColumn("graft_bucket",
      floor(col(ptCol).cast("long") / bucketWidth).cast("long"))
    pts.join(iv, Seq("graft_bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("graft_bucket")
  }

  /** Per-key union length of (possibly overlapping) integer intervals
    * `[loCol, hiCol)` — "how much wall-clock was covered", the classic
    * sweep-line aggregation (uptime, listening time, span coverage)
    * that a naive `sum(hi - lo)` double-counts. ONE window pass: sort
    * each key's intervals by (lo, hi), take the running max of `hi`
    * over the preceding rows, and count only `hi − max(lo, prev_max)`
    * clamped at 0 — overlap contributes nothing, duplicates contribute
    * nothing, order ties cannot change the sum (a tied row sees the
    * other's `hi` in its prefix max or contributes its excess — either
    * way the total is identical). All integer arithmetic: order-free,
    * engine-exact. One shuffle (the window partitioning); at 100 TB
    * this is the same per-key sort any sessionization pays. */
  def intervalUnionLength(df: DataFrame, keyCols: Seq[String],
                          loCol: String, hiCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(loCol), col(hiCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMax = max(col(hiCol)).over(w)
    val contrib = greatest(lit(0L),
      col(hiCol) - greatest(col(loCol), coalesce(prevMax, col(loCol))))
    df.withColumn("graft_contrib", contrib)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum("graft_contrib").as("covered"))
  }

  /** Corpus-wide running sum WITHOUT the single-partition window — the
    * scale-correct form of `sum(v) OVER (ORDER BY k)`: a naive
    * un-partitioned window funnels 100 TB through ONE task (Spark even
    * warns `No Partition Defined for Window`); this is the classic
    * two-phase distributed prefix sum instead. Phase 1 splits the order
    * key's range into `buckets` quantile bands (one `approxQuantile`
    * scan — the boundaries need not be good, only order-contiguous: the
    * prefix sum at any row is invariant to WHERE the cuts fall, and a
    * `<` comparison keeps ties inside one band). Phase 2 runs the
    * running sum per band (ONE shuffle, `buckets`-way parallel) and
    * adds each band's exclusive offset — a `buckets`-row table cumsum'd
    * on its own and broadcast back. Long-exact, order-free.
    *
    * Requirements stated where they bite: `orderCol` must be numeric
    * (band assignment compares as double — exact below 2^53) and
    * UNIQUE for per-row determinism (with duplicate keys the intra-tie
    * prefix is engine-unspecified in ANY engine; the value at each tie
    * group's last row is still exact). `valueCol` must be integral
    * (double sums would be order-dependent). A constant-key corpus
    * degenerates to one band — the single-task window this exists to
    * avoid — which matches the semantics: a total order with no
    * distinguishing key HAS no parallel prefix. */
  def globalRunningSum(df: DataFrame, orderCol: String, valueCol: String,
                       outCol: String = "running_sum",
                       buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // band id = #boundaries strictly below the key: equal keys can
    // never straddle a cut
    val band = if (bounds.isEmpty) lit(0)
      else size(filter(
        array(bounds.toSeq.map(lit(_)): _*),
        b => b < col(orderCol).cast("double")))
    val wLoc = Window.partitionBy("graft_band").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = df.withColumn("graft_band", band)
      .withColumn("graft_loc", sum(col(valueCol)).over(wLoc))
    // Band totals come from an UNORDERED sum-over-band window on the
    // same banded lineage — NOT from a df-rooted groupBy (whose partial
    // aggregate would sit below a DIFFERENT exchange, re-scan the
    // source, and recompute band assignment that a non-deterministic
    // source could disagree on), and NOT by reading one row's running
    // sum (not identifiable under duplicate order keys / negative
    // values). The companion max(orderCol) column exists ONLY to pin
    // the projection: without it, column pruning drops orderCol from
    // this branch's scan, the exchange children stop being canonically
    // equal, and AQE cannot resolve the second read as a
    // ReusedExchange — i.e. it is what makes the corpus shuffle
    // materialize ONCE (pinned by an executed-plan spec; if a future
    // optimizer breaks the equivalence the spec fails, not the
    // semantics). The distinct collapses map-side to one row per band
    // per task; the totals' own cumsum runs single-partition on
    // <= buckets rows — the one place that is correct at any scale.
    val wTot = Window.partitionBy("graft_band")
    val wOff = Window.orderBy("graft_band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .withColumn("graft_tot", sum(col(valueCol)).over(wTot))
      .withColumn("graft_last", max(col(orderCol)).over(wTot))
      .select("graft_band", "graft_tot", "graft_last").distinct()
      .drop("graft_last")
      .withColumn("graft_off",
        coalesce(sum("graft_tot").over(wOff), lit(0L)))
      .select("graft_band", "graft_off")
    local.join(broadcast(offsets), Seq("graft_band"))
      .withColumn(outCol, col("graft_loc") + col("graft_off"))
      .drop("graft_band", "graft_loc", "graft_off")
  }
}
