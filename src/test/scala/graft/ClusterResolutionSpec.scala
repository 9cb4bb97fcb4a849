package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** Connected-component resolution under adversarial graph shapes: the
  * distributed branches (min-label propagation and the Kiveris
  * large-star/small-star escalation) must agree with driver union-find
  * on graphs whose diameter is far beyond the star/clique components
  * LSH normally produces — a path graph is the worst case (diameter =
  * |V|−1, where min-label propagation needs diameter-many rounds). */
class ClusterResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Path 0–1–2–…–(n−1): one component, diameter n−1. */
  private def pathPairs(n: Int): DataFrame = {
    val se = spark; import se.implicits._
    (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
  }

  private def resolved(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("min-label propagation matches union-find on a diameter-32 path") {
    val pairs = pathPairs(33)
    val viaProp = resolved(TextOps.propagateLabels(pairs, maxRounds = 64))
    val viaUf = resolved(TextOps.driverUnionFind(spark, pairs))
    assert(viaProp == viaUf)
    assert(viaProp.values.toSet == Set(0L))
    assert(viaProp.keySet == (0L until 33L).toSet)
  }

  test("large-star/small-star resolves the diameter-32 path to its min") {
    val out = resolved(TextOps.largeStarSmallStar(pathPairs(33)))
    // non-center nodes all point at the component minimum; the center
    // itself is filled by the caller's left-join-coalesce contract
    assert(out == (1L until 33L).map(_ -> 0L).toMap)
  }

  test("propagateLabels escalates to the star variant past its round cap") {
    // cap 2 on a diameter-32 path cannot converge by propagation, so
    // the result must come from the escalation — and still be exact
    val out = resolved(TextOps.propagateLabels(pathPairs(33), maxRounds = 2))
    assert(out.forall(_._2 == 0L))
    assert(out.keySet.subsetOf((0L until 33L).toSet))
    assert((1L until 33L).forall(out.contains))
  }

  test("all three branches agree on a multi-component graph") {
    val se = spark; import se.implicits._
    // component A: path 0..5; component B: star around 10; C: pair
    val pairs = (Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      Seq((10L, 11L), (10L, 12L), (10L, 13L)) ++ Seq((20L, 21L)))
      .toDF("doc_a", "doc_b")
    val expect = ((0L to 5L).map(_ -> 0L) ++ (10L to 13L).map(_ -> 10L) ++
      Seq(20L -> 20L, 21L -> 20L)).toMap
    def filled(m: Map[Long, Long]): Map[Long, Long] =
      expect.keys.map(k => k -> m.getOrElse(k, k)).toMap // caller contract
    assert(filled(resolved(TextOps.driverUnionFind(spark, pairs))) == expect)
    assert(filled(resolved(TextOps.propagateLabels(pairs, maxRounds = 64))) == expect)
    assert(filled(resolved(TextOps.largeStarSmallStar(pairs))) == expect)
  }

  test("neardup_clusters forced-distributed equals the driver branch") {
    val viaDriver = TextOps.neardupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDistributed = TextOps.neardupClusters(spark, sf, maxDriverPairs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDriver == viaDistributed)
  }
}
