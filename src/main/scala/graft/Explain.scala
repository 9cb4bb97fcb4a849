package graft

/** Plan-audit tool: prints the executed (post-AQE) plan skeleton of the
  * named SparkEntry queries — joins, exchanges, scans with
  * PushedFilters/ReadSchema — for the "would this survive 100 TB?"
  * review loop. Usage: runMain graft.Explain [sfDir] [query ...]
  * (no query names = all). */
object Explain {

  /** Audit-only plan variants not reachable through SparkEntry
    * defaults: forced strategy branches whose 100-TB shape must be
    * reviewable even when the chooser (correctly) avoids them at the
    * audited SF. */
  val audits: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "ngram_jaccard_prefix_forced" -> ((s, d) =>
      operators.TextOps.ngramJaccardWith(s, d, 0.5, operators.TextOps.PrefixFiltered)),
    "ngram_jaccard_direct_forced" -> ((s, d) =>
      operators.TextOps.ngramJaccardWith(s, d, 0.5, operators.TextOps.DirectInverted)),
    "embedding_neardup_banded_forced" -> ((s, d) =>
      operators.Similarity.embeddingNearDup(s, d, threshold = 0.4, maxCell = 1)),
    "containment_prefix_forced" -> ((s, d) =>
      operators.TextOps.prefixContainment(operators.TextOps.shingleSets(s, d), 0.8)))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-explain")
    val full = args.contains("-full")
    // -formatted: the `.explain("formatted")` rendering (numbered
    // operator list + per-operator details incl. PushedFilters/
    // ReadSchema), captured AFTER execution so AQE's final plan is the
    // one described — the shape the plans/r17 before/after files pin
    val formatted = args.contains("-formatted")
    val rest = args.filterNot(a => a == "-full" || a == "-formatted")
    val d = rest.headOption.getOrElse("/root/testdata/sf0.1")
    // "-full with no names" must mean ALL queries, not an empty list
    val names = if (rest.length > 1) rest.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val q = SparkEntry.queries.get(n).orElse(audits.get(n)).get(spark, d)
      if (n == "ngram_jaccard")
        println(s"-- chooser pick at $d: ${operators.TextOps.chosenStrategy(spark, d)}")
      q.collect() // materialize so AQE finalizes the plan
      println(s"===== $n")
      if (formatted)
        println(q.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      else {
        val plan = q.queryExecution.executedPlan.toString
        if (full) println(plan)
        else println(plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("FileScan") || l.contains("WindowGroupLimit") ||
            l.contains("Reused") || l.contains("== "))
          .mkString("\n"))
      }
    }
    spark.stop()
  }
}
