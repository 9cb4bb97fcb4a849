package graft

/** Plan-audit tool: prints the executed (post-AQE) plan skeleton of the
  * named SparkEntry queries — joins, exchanges, scans with
  * PushedFilters/ReadSchema — for the "would this survive 100 TB?"
  * review loop. Usage: runMain graft.Explain [sfDir] [query ...]
  * (no query names = all). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-explain")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val q = SparkEntry.queries(n)(spark, d)
      q.collect() // materialize so AQE finalizes the plan
      println(s"===== $n")
      println(q.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("FileScan") || l.contains("WindowGroupLimit"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
