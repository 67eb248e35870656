package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator surface (SURVEY.md §2.2 streaming rows):
  * watermarks + late data, tumbling/sliding/session windows, stateful
  * dedup-within-watermark, and custom state via mapGroupsWithState.
  * Validated on MemoryStream with one continuous query per test
  * (`processAllAvailable` between feeds keeps watermark state alive).
  * Batch analogs are oracle-checked in the registered queries. */
class StreamingOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window aggregation with watermark; late rows dropped") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "key", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("key"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(6), "a", 4.0))
      q.processAllAvailable()
      mem.addData((ts(40), "a", 8.0)) // watermark → 10:30, closes both windows
      q.processAllAvailable()
      mem.addData((ts(2), "a", 100.0)) // late beyond watermark → dropped
      q.processAllAvailable()
      mem.addData((ts(55), "a", 16.0)) // watermark → 10:45, closes 10:40
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql("SELECT CAST(window.start AS STRING) ws, n, sv FROM tumbling")
      .collect().map(r => (r.getString(0).substring(11, 16), r.getLong(1), r.getDouble(2)))
    assert(rows.contains(("10:00", 2L, 3.0)), rows.mkString(","))
    assert(rows.contains(("10:05", 1L, 4.0)))
    assert(rows.contains(("10:40", 1L, 8.0)))
    assert(!rows.exists(_._3 == 100.0), "late row must be dropped")
  }

  test("sliding window: an event lands in every overlapping window") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(7), 1.0))
      q.processAllAvailable()
      mem.addData((ts(59), 9.0)) // advance watermark, close earlier windows
      q.processAllAvailable()
    } finally q.stop()
    val starts = s.sql("SELECT CAST(window.start AS STRING) FROM sliding ORDER BY 1")
      .collect().map(_.getString(0).substring(11, 16))
    assert(starts.contains("10:00") && starts.contains("10:05"), starts.mkString(","))
  }

  test("session window: events within gap merge; a gap starts a new session") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // u: 10:00,10:03,10:06 → one session (gaps < 5m); 10:30 → a second
      mem.addData((ts(0), "u"), (ts(3), "u"), (ts(6), "u"), (ts(30), "u"))
      q.processAllAvailable()
      mem.addData((ts(59), "w")) // advance watermark to emit closed sessions
      q.processAllAvailable()
    } finally q.stop()
    val u = s.sql("SELECT n FROM sessions WHERE user = 'u' ORDER BY n").collect()
      .map(_.getLong(0)).toSeq
    assert(u === Seq(1L, 3L))
  }

  test("dropDuplicatesWithinWatermark removes dups inside the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val dedup = mem.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(0), "x"), (ts(1), "x"), (ts(2), "y"))
      q.processAllAvailable()
      mem.addData((ts(3), "x")) // still within watermark → dup, dropped
      q.processAllAvailable()
    } finally q.stop()
    val ids = s.sql("SELECT id FROM dedup").collect().map(_.getString(0)).toSeq
    assert(ids.sorted === Seq("x", "y"))
  }

  test("mapGroupsWithState: custom running state per key survives batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(String, Int)]
    val counts = mem.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Int)], state: GroupState[Int]) =>
          val next = state.getOption.getOrElse(0) + it.map(_._2).sum
          state.update(next)
          (key, next)
      }.toDF("key", "total")
    val q = counts.writeStream.format("memory").queryName("state1")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("a", 1), ("a", 2), ("b", 5))
      q.processAllAvailable()
      mem.addData(("a", 4))
      q.processAllAvailable()
    } finally q.stop()
    val last = s.sql("SELECT max(total) FROM state1 WHERE key='a'").collect()(0).getInt(0)
    assert(last === 7) // 1+2 from batch 1, +4 in batch 2 — state persisted
  }

  test("pqIndex builds incrementally from a stream: stateless projection, " +
      "codes identical to the batch path") {
    // the SCALE.md lifecycle claim — train once, index CONTINUOUSLY:
    // cell+codes assignment is a stateless projection, so it must run
    // unchanged as a streaming transform, and each micro-batch's rows
    // must encode exactly as the batch op would
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val centers = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val model = graft.ops.Similarity.PqModel(dsub = 1, codebooks = Array(
      Array(Array(0.0), Array(1.0)), Array(Array(0.0), Array(1.0))))
    val mem = MemoryStream[(Long, Seq[Double])]
    val indexed = graft.ops.Similarity.pqIndex(
      mem.toDF().toDF("vec_id", "embedding"), centers, model)
    val q = indexed.writeStream.format("memory").queryName("pq_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((0L, Seq(0.1, 0.2)), (1L, Seq(0.9, 0.8)))
      q.processAllAvailable()
      mem.addData((2L, Seq(0.1, 0.9)), (3L, Seq(0.5))) // batch 2 + dirty row
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT vec_id, cell, codes FROM pq_stream ORDER BY vec_id")
      .collect()
    val batch = graft.ops.Similarity.pqIndex(
      Seq((0L, Seq(0.1, 0.2)), (1L, Seq(0.9, 0.8)), (2L, Seq(0.1, 0.9)),
        (3L, Seq(0.5))).toDF("vec_id", "embedding"), centers, model)
      .orderBy("vec_id").collect()
    assert(got.length === 4)
    got.zip(batch).foreach { case (g, b) =>
      assert(g.getLong(0) === b.getLong(0))
      assert(g.get(1) === b.get(1), s"cell drift for vec ${g.getLong(0)}")
      assert(g.getSeq[Any](2) === b.getSeq[Any](2),
        s"codes drift for vec ${g.getLong(0)}")
    }
    assert(got(3).isNullAt(2), "dirty row refused (null codes, null cell)")
  }
}
