package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{ColumnFunctions, Udx}
import graft.operators.{EventAnalytics, Multimodal, SqlSurface}

/** SQL-text surface, UDx aggregators, and multimodal plumbing. */
class SurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("SQL-text hot items == DataFrame hot items, row for row") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("window_end"), r.getAs[Long]("user_id"),
        r.getAs[Long]("cnt"), r.getAs[Int]("rn"))).toSet
    assert(key(SqlSurface.hotUsersTopNSql(spark, sf)) ==
      key(EventAnalytics.hotUsersTopN(spark, sf)))
  }

  test("registered views make every table SQL-reachable") {
    SqlSurface.registerViews(spark, sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").collect().head.getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
      .collect().head.getLong(0) > 0)
  }

  test("UDx aggregators registered in SQL match their builtin twins") {
    import spark.implicits._
    Udx.register(spark)
    Seq((1L, 2.5), (1L, 3.5), (2L, 1.0), (1L, 2.5))
      .toDF("k", "v").createOrReplaceTempView("udx_t")
    val got = spark.sql(
      "SELECT k, decimal_avg(v) AS a, exact_distinct(CAST(v*10 AS BIGINT)) AS d FROM udx_t GROUP BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set((1L, 8.5 / 3, 2L), (2L, 1.0, 1L)))
  }

  test("typed Set-buffer distinct equals builtin countDistinct on real data") {
    val udaf = EventAnalytics.uniqueVisitorsUdaf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val builtin = EventAnalytics.uniqueVisitors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(udaf == builtin && udaf.nonEmpty)
  }

  test("JVM md5Lower64Mod is bit-identical to the Column-expression hash") {
    import spark.implicits._
    val samples = Seq("abc", "spark graft", "ünïcode ☃", "")
    val fromCols = samples.toDF("s")
      .select(org.apache.spark.sql.functions.pmod(
        ColumnFunctions.md5Lower64(col("s")),
        lit(ColumnFunctions.HashPrime).cast("decimal(20,0)")).cast("long"))
      .collect().map(_.getLong(0))
    val fromJvm = samples.map(s => Multimodal.md5Lower64Mod(s.getBytes("UTF-8")))
    assert(fromCols.toSeq == fromJvm)
  }

  test("hamming64 native expression: eval, codegen path, SQL registration") {
    import spark.implicits._
    val df = Seq((0L, 0L), (-1L, 0L), (5L, 3L), (Long.MaxValue, 0L)).toDF("a", "b")
    val got = df.select(graft.plans.GraftFunctions.hamming64(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 64, 2, 63))
    // registered by GraftExtensions → callable from SQL text
    df.createOrReplaceTempView("hx")
    val sqlGot = spark.sql("SELECT hamming64(a, b) FROM hx")
      .collect().map(_.getInt(0)).toSeq
    assert(sqlGot == got)
    // type check rejects non-BIGINT args
    intercept[Exception] {
      spark.sql("SELECT hamming64('x', 1)").collect()
    }
    // arity check: wrong argument count is a proper AnalysisException,
    // not an IndexOutOfBounds during analysis (ADVICE r2)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hamming64(a) FROM hx").collect()
    }
    assert(e1.getMessage.contains("hamming64"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hamming64(a, b, a) FROM hx").collect()
    }
    assert(e3.getMessage.contains("hamming64"))
  }

  test("frame sampler emits n deterministic rows per payload") {
    val frames = Multimodal.sampleFrames(spark, sf, nFrames = 3)
    val counts = frames.groupBy("doc_id").count().collect().map(_.getLong(1)).toSet
    assert(counts == Set(3L))
    val a = frames.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Multimodal.sampleFrames(spark, sf, nFrames = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
