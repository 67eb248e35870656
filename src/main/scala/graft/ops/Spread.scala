package graft.ops

import org.apache.spark.sql.DataFrame

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
  /** Round-robin `df` to `defaultParallelism` partitions iff its current
    * plan yields fewer; streaming frames pass through untouched. */
  def cpu(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
