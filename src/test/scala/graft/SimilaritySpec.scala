package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity-search semantics: scalar cosine correctness, brute-force
  * top-k sanity, and IVF recall against the exact baseline. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("scalar cosine matches hand-computed values") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),
      (Array(1.0f, 2.0f), Array(2.0f, 1.0f), 0.8)).toDF("a", "b", "expect")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("expect")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k: k rows per query, ranks ordered by score") {
    val rows = Similarity.annCosineTopK(spark, sf, k = 5, nQueries = 4).collect()
    assert(rows.length == 20)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getAs[Double]("score") >= b.getAs[Double]("score"); case _ => true
      })
      assert(g.forall(_.getAs[Long]("neighbor_id") != g.head.getAs[Long]("query_id")))
    }
  }

  test("IVF with nprobe=2 recalls a meaningful share of the exact top-5") {
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = keys(Similarity.annCosineTopK(spark, sf))
    val ivf = keys(Similarity.annIvfTopK(spark, sf))
    assert(ivf.size == exact.size)
    val recall = (ivf & exact).size.toDouble / exact.size
    // 2 of 10 cells probed; random labels would recall ~20 % — the index
    // must do better than chance, exactness is not expected
    assert(recall >= 0.3, s"IVF recall $recall")
  }

  test("embedding near-dup finds crafted duplicates within a cell") {
    import spark.implicits._
    val base = Array.tabulate(8)(i => 0.1f * (i + 1))
    val nearDup = base.clone(); nearDup(3) = nearDup(3) + 0.001f
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val dir = java.nio.file.Files.createTempDirectory("graftemb").toString
    Seq((0L, base, 1), (1L, nearDup, 1), (2L, far, 1), (3L, base, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = Similarity.embeddingNearDup(spark, dir, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0~1 near-identical in cell 1; 3 is identical to 0 but in another
    // cell — the IVF restriction (documented recall trade) skips it
    assert(pairs == Set((0L, 1L)))
  }

  test("hyperplane LSH: identical vectors share a bucket and are found") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => 0.01f * ((i % 13) - 6))
    val near = base.clone(); near(5) = near(5) + 0.0005f
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 0.3f else -0.3f)
    val dir = java.nio.file.Files.createTempDirectory("graftlsh").toString
    Seq((0L, base, 1), (1L, near, 1), (2L, far, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = Similarity.embeddingLshNearDup(spark, dir, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
    // deterministic across runs
    val again = Similarity.embeddingLshNearDup(spark, dir, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pairs)
  }

  test("IVF scores equal exact scores for neighbors both return") {
    val exact = Similarity.annCosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("score")).toMap
    val ivf = Similarity.annIvfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("score")).toMap
    val shared = exact.keySet & ivf.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(exact(k) == ivf(k))) // same exact arithmetic
  }
}
