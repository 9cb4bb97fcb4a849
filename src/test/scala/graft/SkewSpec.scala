package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}

/** Hot-cell / hot-band skew mitigation (VERDICT r6 #5): the bucketed
  * joins at the heart of minhash_lsh and knn_graph key by LSH band /
  * IVF cell, and a degenerate corpus (mass-duplicated boilerplate, an
  * embedding-collapsed cluster) concentrates one key. The mitigation
  * on the primary path is AQE's skew-join split — these tests build
  * exactly that degenerate corpus, lower the AQE thresholds to make
  * the tiny test corpus legible to the detector (at 100 TB the DEFAULT
  * thresholds fire; the knobs here only scale the scenario down), and
  * pin that the planner actually splits the hot partition
  * (`skew=true` on the join) instead of serializing one task.
  * events_by_type_salted pins the EXPLICIT two-phase salting
  * alternative for aggregations. PLANS.md records the skewed-plan
  * skeleton. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Run `f` with AQE skew thresholds scaled down to test size (and
    * broadcast off, so the bucketed joins stay shuffle joins as they
    * are at scale); restore previous values after. */
  private def withSkewConfs[T](f: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize THIS frame's adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("minhash_lsh: one dominant LSH band is split by AQE skew join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftskewdocs").toString
    // 192 mass-duplicated docs -> identical signatures -> ONE hot band
    // bucket; 64 distinct docs populate the background
    val hot = (0L until 192L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta", "en", s"src${i % 4}", 36L))
    val rest = (200L until 264L).map(i =>
      (i, s"unique text number $i with words w${i} x${i * 7} y${i * 13}", "en",
        s"src${i % 4}", 40L))
    (hot ++ rest).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    withSkewConfs {
      val pairs = TextOps.minhashLsh(spark, dir, threshold = 0.9)
      val plan = finalPlan(pairs)
      assert(plan.contains("skew=true"),
        s"hot band bucket was not skew-split:\n$plan")
      // and the answer is still right: all hot-doc pairs verify at J=1
      assert(pairs.filter(col("jaccard") === 1.0).count() == 192L * 191L / 2)
    }
  }

  test("knn_graph: one dominant trained-IVF cell is split by AQE skew join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftskewemb").toString
    // 160 near-identical vectors collapse into one trained cell; 40
    // spread vectors fill other cells. Labels are irrelevant to the
    // round-7 trained quantizer (and that is the point).
    def unit(i: Long): Array[Float] = {
      val a = Array.fill(16)(0.0f)
      a((i % 16).toInt) = 1.0f
      a
    }
    val hot = (0L until 160L).map { i =>
      val a = Array.fill(16)(1.0f); a(0) = 1.0f + (i % 3) * 1e-3f
      (i, a, i % 5)
    }
    val rest = (160L until 200L).map(i => (i, unit(i), i % 5))
    (hot ++ rest).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    withSkewConfs {
      val g = Similarity.knnGraph(spark, dir, k = 3, nprobe = 2)
      val plan = finalPlan(g)
      assert(plan.contains("skew=true"),
        s"hot IVF cell was not skew-split:\n$plan")
      // correctness through the skew split: every vector still gets
      // exactly k = 3 ranked edges
      val rows = g.collect()
      assert(rows.length == 200 * 3)
      assert(rows.map(_.getAs[Int]("rank")).forall(r => r >= 1 && r <= 3))
    }
  }

  test("semdedup: the hot-cell pair quadratic is split by AQE skew join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftskewsem").toString
    // same degenerate shape as the knn_graph scenario: 160 collapsed
    // vectors -> one hot trained cell whose a<b pair join concentrates
    def unit(i: Long): Array[Float] = {
      val a = Array.fill(16)(0.0f); a((i % 16).toInt) = 1.0f; a
    }
    val hot = (0L until 160L).map { i =>
      val a = Array.fill(16)(1.0f); a(0) = 1.0f + (i % 3) * 1e-3f
      (i, a, i % 5)
    }
    val rest = (160L until 200L).map(i => (i, unit(i), i % 5))
    (hot ++ rest).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    withSkewConfs {
      val v = Similarity.semDedup(spark, dir, threshold = 0.9)
      val plan = finalPlan(v)
      assert(plan.contains("skew=true"),
        s"hot semdedup cell was not skew-split:\n$plan")
      val rows = v.collect()
      assert(rows.length == 200) // total verdict relation survives the split
      // every hot vector except each cell's minimum drops to a SMALLER
      // hot mate (within-cell cosines ~1 >= 0.9); the quantizer may cut
      // the collapsed cluster into several cells (one per crafted
      // variant at most nlists), so bound by cell count, don't pin it
      val hotRows = rows.filter(_.getLong(0) < 160L)
      val drops = hotRows.filter(_.getString(2) == "drop")
      assert(drops.length >= 160 - 15, s"only ${drops.length} hot drops")
      drops.foreach { r =>
        assert(r.getLong(3) < r.getLong(0) && r.getLong(3) < 160L)
      }
      assert(hotRows.find(_.getLong(0) == 0L).get.getString(2) == "keep")
    }
  }
}
