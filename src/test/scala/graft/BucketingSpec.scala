package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Bucketed co-located joins: same key, same bucket count → the join
  * plans with no shuffle exchange at all. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed ⋈ bucketed on the bucket key plans without any Exchange") {
    Sinks.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_custkey", 8)
    Sinks.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the demo is about bucket
      // co-location, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // same result as the plain (shuffling) join
      val expected = Tables.orders(spark, sf).join(
        Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(joined.count() == expected.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("lang-partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graftpart").toString
    Sinks.parquet(Tables.documents(spark, sf), s"$dir/docs", partitionBy = Seq("lang"))
    val read = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
    // execute THIS plan (count() would build a separate queryExecution
    // whose metrics the assertions below couldn't see)
    val n = read.collect().length.toLong
    // correct content: exactly the en docs survive
    assert(n == Tables.documents(spark, sf).filter(col("lang") === "en").count())
    // and the predicate prunes at the FILE level, not post-scan: the
    // scan's partition filter carries lang=en, so at 100 TB only the
    // en directory is listed/read
    val scan = read.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected lang partition filter in scan:\n$scan")
    // files actually touched after pruning: the en partition only
    // (inputFiles is pre-pruning; the scan's numFiles metric is not)
    val numFiles = read.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metrics("numFiles").value
    }.sum
    val totalLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(numFiles >= 1 && numFiles < totalLangs,
      s"expected pruned scan (< $totalLangs partition files), read $numFiles")
  }
}
