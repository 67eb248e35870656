package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Spread

/** Guard semantics of the CPU-stage parallelism helper (docs/SCALE.md):
  * it must fire only when the input plan yields fewer partitions than
  * the machine, and never touch streaming frames. */
class SpreadSpec extends SparkSpec {

  test("spreads a single-partition input to defaultParallelism") {
    val df = Tables.documents(spark, SparkSpec.sf0001) // one small file
    val before = df.rdd.getNumPartitions
    val target = spark.sparkContext.defaultParallelism
    assume(before < target, s"fixture already parallel ($before >= $target)")
    val spread = Spread.cpu(df)
    assert(spread.rdd.getNumPartitions === target)
    assert(spread.queryExecution.executedPlan.toString
      .contains("REPARTITION_BY_NUM"))
  }

  test("no-op when the input already has enough partitions") {
    val target = spark.sparkContext.defaultParallelism
    val df = Tables.documents(spark, SparkSpec.sf0001).repartition(target + 4)
    val spread = Spread.cpu(df)
    // same frame back: no second exchange stacked on top
    assert(spread eq df)
  }

  test("streaming frames pass through untouched") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[String](spark)
    val sdf = ms.toDF()
    assert(Spread.cpu(sdf) eq sdf)
  }

  test("caller filters stay below the spread exchange (scan pushdown)") {
    val df = Tables.documents(spark, SparkSpec.sf0001)
      .filter(col("doc_id") < 100)
    val p = Spread.cpu(df).select(md5(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    // the filter (and its pushed scan predicate) sits under the exchange
    val exIdx = p.indexOf("REPARTITION_BY_NUM")
    val scanIdx = p.indexOf("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]")
    assert(exIdx >= 0 && scanIdx > exIdx, p.take(1500))
  }
}
