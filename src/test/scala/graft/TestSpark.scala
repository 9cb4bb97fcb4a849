package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark sessions are
  * expensive; suites share it and must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession("graft-test", master = "local[4]", shufflePartitions = 4)
}
