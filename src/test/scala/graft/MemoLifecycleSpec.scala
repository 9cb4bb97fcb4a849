package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lifecycle contract of [[SessionMemo]] (VERDICT r7 #2 / ADVICE r7):
  * bounded persisted entries under parameter churn, unpersist on
  * eviction, clearSession drains everything for the session, failed
  * builds retry. */
class MemoLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDf(i: Int): DataFrame = {
    val df = spark.range(i + 1L, i + 10L).toDF("x")
    df.persist()
    df.count()
    df
  }

  test("LRU bound: churning parameterizations evicts and unpersists beyond the cap") {
    val memo = new SessionMemo[(SparkSession, Int), DataFrame]("spec_lru", maxEntries = 3)
    val dfs = (0 until 8).map(i => memo.getOrBuild((spark, i))(freshDf(i)))
    assert(memo.size == 3)
    // the 5 oldest are evicted AND unpersisted; the 3 newest stay cached
    assert(dfs.take(5).forall(_.storageLevel == StorageLevel.NONE))
    assert(dfs.drop(5).forall(_.storageLevel != StorageLevel.NONE))
    // a cached key returns the SAME frame without rebuilding
    assert(memo.getOrBuild((spark, 7))(fail("must not rebuild")) eq dfs(7))
    Graft.clearSession(spark)
    assert(memo.size == 0)
    assert(dfs.forall(_.storageLevel == StorageLevel.NONE))
  }

  test("touch order is LRU, not insertion: re-reading an old key protects it") {
    val memo = new SessionMemo[(SparkSession, String), DataFrame]("spec_touch", maxEntries = 2)
    val a = memo.getOrBuild((spark, "a"))(freshDf(100))
    val b = memo.getOrBuild((spark, "b"))(freshDf(200))
    assert(memo.getOrBuild((spark, "a"))(fail("cached")) eq a) // touch a
    memo.getOrBuild((spark, "c"))(freshDf(300))               // evicts b, not a
    assert(a.storageLevel != StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
    Graft.clearSession(spark)
  }

  test("tuple values: every member DataFrame unpersists on eviction") {
    val memo = new SessionMemo[(SparkSession, Int), (DataFrame, DataFrame)](
      "spec_tuple", maxEntries = 1)
    val (a1, a2) = memo.getOrBuild((spark, 1))((freshDf(1), freshDf(2)))
    memo.getOrBuild((spark, 2))((freshDf(3), freshDf(4)))
    assert(a1.storageLevel == StorageLevel.NONE)
    assert(a2.storageLevel == StorageLevel.NONE)
    Graft.clearSession(spark)
  }

  test("a failed build is not cached: the next caller retries") {
    val memo = new SessionMemo[(SparkSession, Int), DataFrame]("spec_fail")
    var attempts = 0
    intercept[RuntimeException] {
      memo.getOrBuild((spark, 1)) { attempts += 1; throw new RuntimeException("boom") }
    }
    val df = memo.getOrBuild((spark, 1)) { attempts += 1; freshDf(5) }
    assert(attempts == 2 && df.count() == 9)
    Graft.clearSession(spark)
  }

  test("clearSession only touches the target session's entries") {
    val memo = new SessionMemo[(SparkSession, Int), DataFrame]("spec_scope")
    val other = spark.newSession()
    val mine = memo.getOrBuild((spark, 1))(freshDf(10))
    val theirs = memo.getOrBuild((other, 1))(freshDf(20))
    Graft.clearSession(other)
    assert(memo.size == 1)
    assert(mine.storageLevel != StorageLevel.NONE)
    assert(theirs.storageLevel == StorageLevel.NONE)
    Graft.clearSession(spark)
    assert(memo.size == 0)
  }

  test("engine memo integration: operator rebuilds cleanly after clearSession") {
    val sf = "/root/testdata/sf0.001"
    val before = graft.operators.TextOps.simhash(spark, sf).collect().toSet
    Graft.clearSession(spark)
    // the memoized relation was dropped and unpersisted; a fresh call
    // rebuilds deterministically to the same result
    val after = graft.operators.TextOps.simhash(spark, sf).collect().toSet
    assert(after == before && before.nonEmpty)
  }
}
