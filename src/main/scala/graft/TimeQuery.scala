package graft

/** Single-query timing harness for iteration: times one named
  * SparkEntry query (warmup + N timed passes, min reported) without
  * paying for the whole bench suite.
  *
  * Usage: sbt "runMain graft.TimeQuery <queryName> [sfDir] [passes]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQuery <query> [sfDir] [passes]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession("graft-timequery")
    val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val rows = q(spark, sfDir).count() // warmup
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timequery] $name rows=$rows min=${times.min}%.3f passes=${times.map(t => f"$t%.3f").mkString(",")} sf=$sfDir")
    spark.stop()
  }
}
