package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up (not timed): touch every table once so per-query numbers
    // measure the operator, not first-read page-cache/JIT warmup.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Force with a real sink (noop write materializes every column +
    // expression, unlike count() which lets Catalyst prune the plan).
    // Dev filter: SPARK_GRAFT_ONLY=q34_simhash,q38_quantiles benches a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query records -1.0 (sentinel), never its partial elapsed
      // time — a broken query must not silently deflate the total.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED $name: $e")
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum // failures (-1) excluded
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // The driver keeps only a bounded tail of stdout, which truncated
    // half the per-query numbers in past rounds — persist the full JSON
    // to a file too so regression analysis always has every query.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), json + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write bench_last.json: $e")
    }
    spark.stop()
  }
}
