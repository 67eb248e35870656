package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Input-parallelism guard for CPU-bound per-row stages (shingling,
  * per-shingle hashing, regex batteries, vector math).
  *
  * Spark sizes scan parallelism by input BYTES (`maxPartitionBytes`
  * splits, row-group granularity), which is the right default for
  * IO-bound plans but strands compute-bound stages: a small single-row-
  * group parquet file scans as ONE partition, so everything upstream of
  * the first shuffle — tokenize, shingle, hash — runs on one core no
  * matter how many the executor has. On a cluster table (many files /
  * row groups) scan parallelism already ≥ cores and this helper is a
  * no-op; locally (and for any genuinely tiny input feeding heavy
  * compute) it round-robins the narrow projected input across
  * `defaultParallelism` so the CPU stage uses the machine.
  *
  * Call it on the SMALLEST projection that feeds the heavy expressions
  * (after caller filters/selects, before the explode/hash), so the
  * exchange carries minimal bytes and scan-level pushdown of upstream
  * predicates is unaffected. The explicit partition count keeps AQE from
  * coalescing the exchange back to one partition (AQE only coalesces
  * ENSURE_REQUIREMENTS shuffles, not user `repartition(n)`).
  */
private[graft] object Spread {

  /** True iff the logical plan is scan-stage-only: leaves plus narrow
    * per-row operators. Only such plans can be parallelism-starved by
    * input layout (anything containing a shuffle-introducing operator —
    * join, aggregate, window, sort, repartition — already runs at
    * `spark.sql.shuffle.partitions`), and only for such plans is
    * `df.rdd.getNumPartitions` guaranteed job-free: under AQE, `.rdd`
    * on a plan with exchanges MATERIALIZES the upstream query stages at
    * DataFrame-construction time (real Spark jobs whose results are
    * then thrown away) — the probe itself must never pay that. */
  private def narrowScanOnly(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case n @ (_: Project | _: Filter | _: Generate | _: SubqueryAlias |
              _: Union | _: LocalLimit) =>
      // These introduce no exchange; their children decide. Anything
      // not allow-listed (joins, aggregates, distinct, windows, sorts,
      // repartitions, unknown nodes) => not scan-stage.
      n.children.forall(narrowScanOnly)
    case _ => false
  }

  /** Round-robin `df` to `defaultParallelism` partitions iff it is a
    * narrow scan-stage plan whose current layout yields fewer;
    * streaming frames and post-shuffle plans pass through untouched. */
  def cpu(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    if (!narrowScanOnly(df.queryExecution.optimizedPlan)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
