package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profiling

/** Pre-shuffle diagnostics: the per-column census must agree with
  * independently computed counts, and the key-skew report's exact
  * nearest-rank percentiles are checked against a hand-computed
  * distribution (including the pathological one-hot-key shape the
  * report exists to expose). */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("profileTable: census columns agree with direct aggregates") {
    val ev = graft.sources.Tables.events(spark, sf)
    val n = ev.count()
    val got = Profiling.profileTable(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    got.foreach { case (c, (nNull, nNonnull, nDistinct)) =>
      assert(nNull + nNonnull == n, s"census of $c must partition the rows")
      assert(nDistinct <= nNonnull, s"distinct of $c bounded by non-null")
    }
    assert(got("user_id")._3 == ev.select("user_id").distinct().count())
    assert(got("event_type")._3 == ev.select("event_type").distinct().count())
  }

  test("keySkewReport: hand-computed percentiles on a crafted skew") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftskew").toString
    // per-user counts: four singletons + one 10-row hot key
    val rows = (Seq.tabulate(4)(u => (u.toLong + 1, 1)) :+ (99L, 10))
      .flatMap { case (u, c) => Seq.fill(c)(u) }
      .zipWithIndex.map { case (u, i) =>
        (i.toLong, new java.sql.Timestamp(1000L * i), u, "view", 0.0, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Profiling.keySkewReport(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    // n_keys=5 n_rows=14; cum at cnt=1 is 4 keys: 4·2 ≥ 5 → p50=1;
    // 4·10 < 5·9 → p90=10; p99=10; top1 = 10e6 // 14
    assert(got == ((5L, 14L, 1L, 1L, 10L, 10L, 10L, 714285L)))
  }

  test("keySkewReport: uniform key ⇒ degenerate one-value distribution") {
    val r = Profiling.keySkewReport(spark, sf, key = "event_id")
      .collect().head
    // event_id is unique per row: every percentile is 1 and the top
    // key's share is 10⁶/n rounded down
    assert(r.getLong(0) == r.getLong(1)) // n_keys == n_rows
    assert((2 to 6).forall(i => r.getLong(i) == 1L))
    assert(r.getLong(7) == 1000000L / r.getLong(1))
  }
}
