package graft
/** Dev tool: print the query catalog (name, oracle status) as markdown. */
object Catalog {
  def main(args: Array[String]): Unit = {
    val oracles = SparkEntry.oracleSql.keySet
    println("| query | correctness check |")
    println("|---|---|")
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      val o = if (oracles(n)) "DuckDB oracle (rows+schema+values)" else "rows-only + ScalaTest"
      println(s"| $n | $o |")
    }
  }
}
