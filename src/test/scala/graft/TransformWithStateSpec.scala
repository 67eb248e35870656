package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

/** Spark 4's newest arbitrary-state API (`transformWithState` with a
  * `StatefulProcessor` + RocksDB state store) — the modern replacement for
  * mapGroupsWithState, covering the reference's per-consumer progress
  * state (O5) with typed, composable state variables. */
/** Running per-key total via a ValueState variable (top-level: the
  * processor is serialized to tasks and must not capture the suite). */
class RunningTotalProcessor extends StatefulProcessor[String, (String, Int), (String, Int)] {
  @transient private var total: ValueState[Int] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Int]("total",
      org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
                               timerValues: TimerValues): Iterator[(String, Int)] = {
    val next = (if (total.exists()) total.get() else 0) + rows.map(_._2).sum
    total.update(next)
    Iterator((key, next))
  }
}

class TransformWithStateSpec extends SparkSpec {

  test("transformWithState: ValueState persists across microbatches (RocksDB store)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, Int)]
      val out = mem.toDS().groupByKey(_._1)
        .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
        .toDF("key", "total")
      val q = out.writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update).start()
      try {
        mem.addData(("a", 2), ("b", 5))
        q.processAllAvailable()
        mem.addData(("a", 3))
        q.processAllAvailable()
      } finally q.stop()
      val a = s.sql("SELECT max(total) FROM tws WHERE key = 'a'").collect()(0).getInt(0)
      val b = s.sql("SELECT max(total) FROM tws WHERE key = 'b'").collect()(0).getInt(0)
      assert(a === 5 && b === 5)
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
