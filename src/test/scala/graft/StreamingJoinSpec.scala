package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.runtime.{RouterLink, StreamRegistry}

/** Stream-stream joins with watermarks, flatMapGroupsWithState, and
  * per-message multi-stream routing (reference O4 explicit-target send). */
class StreamingJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream inner join with watermarks and time-range condition") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "user").withWatermark("c_ts", "20 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "20 minutes")
    // purchase attributed to a click within the previous 15 minutes
    val joined = c.join(b,
      col("user") === col("b_user") &&
        col("b_ts") >= col("c_ts") &&
        col("b_ts") <= col("c_ts") + expr("INTERVAL 15 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(0), 1L), (ts(2), 2L))
      buys.addData((ts(10), 1L), (ts(40), 2L)) // u1 within 15m; u2 too late
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT user FROM ssjoin").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("stream-stream LEFT OUTER join emits null-padded row after watermark closes") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "user").withWatermark("c_ts", "5 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "5 minutes")
    val joined = c.join(b,
      col("user") === col("b_user") &&
        col("b_ts") >= col("c_ts") &&
        col("b_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssleft")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(0), 1L), (ts(0), 2L))
      buys.addData((ts(5), 1L))        // u1 matched; u2 pending
      q.processAllAvailable()
      // advance both watermarks far past u2's join window so the state
      // store can finalize the unmatched row as (u2, null)
      clicks.addData((ts(50), 9L))
      buys.addData((ts(50), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT user, b_user FROM ssleft WHERE user IN (1, 2)")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got === Set((1L, 1L), (2L, -1L)))
  }

  test("stream-static join: streaming facts enriched against a broadcast dimension") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val mem = MemoryStream[(Timestamp, Long)]
    val joined = mem.toDF().toDF("ts", "user")
      .join(broadcast(dim), Seq("user"), "left")
    val q = joined.writeStream.format("memory").queryName("ssdim")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(0), 1L), (ts(1), 3L))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT user, tier FROM ssdim").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "none" else r.getString(1))).toSet
    assert(got === Set((1L, "gold"), (3L, "none")))
  }

  test("flatMapGroupsWithState: zero-or-more outputs per group and batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(String, Int)]
    // emit a row only when a key's running total crosses a multiple of 10
    val alerts = mem.toDS().groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Int)], state: GroupState[Int]) =>
          val before = state.getOption.getOrElse(0)
          val after = before + it.map(_._2).sum
          state.update(after)
          if (after / 10 > before / 10) Iterator((key, after)) else Iterator.empty
      }.toDF("key", "total")
    val q = alerts.writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("a", 4), ("a", 3)) // 7: no alert
      q.processAllAvailable()
      mem.addData(("a", 5))           // 12: alert
      q.processAllAvailable()
      mem.addData(("a", 2))           // 14: no alert
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT total FROM alerts").collect().map(_.getInt(0)).toSeq
    assert(got === Seq(12))
  }

  test("RouterLink fans messages out to per-message target streams (O4)") {
    val s = spark
    import s.implicits._
    val reg = new StreamRegistry(spark, Files.createTempDirectory("graft-route").toString)
    object Router extends RouterLink {
      val inputs = Seq("inbox")
      def route(df: DataFrame): DataFrame =
        df.withColumn("_stream",
          when(col("value").startsWith("err"), lit("errors")).otherwise(lit("oks")))
    }
    reg.write(Seq("ok 1", "err 1", "ok 2").toDF("value"), "inbox")
    Router.start(spark, reg).awaitTermination()
    assert(reg.read("errors").collect().map(_.getString(0)).toSeq === Seq("err 1"))
    assert(reg.read("oks").collect().map(_.getString(0)).sorted.toSeq === Seq("ok 1", "ok 2"))
  }

  test("RouterLink refuses null and path-escaping route targets") {
    val s = spark
    import s.implicits._
    val reg = new StreamRegistry(spark,
      Files.createTempDirectory("graft-route-bad").toString)
    object BadRouter extends RouterLink {
      val inputs = Seq("bad_inbox")
      // _stream comes straight from row data — the untrusted-name shape
      def route(df: DataFrame): DataFrame = df
    }
    reg.write(Seq(("a", "ok"), ("b", null.asInstanceOf[String]))
      .toDF("value", "_stream"), "bad_inbox")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      BadRouter.start(spark, reg).awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("invalid route target"))), e.toString)
    // nothing was routed anywhere, and no junk "null" stream was created
    assert(!reg.exists("null") && !reg.exists("ok"))
  }
}
