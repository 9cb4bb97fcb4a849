package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingJobs

/** The streaming surface under the RocksDB state store provider
  * (VERDICT r8 #4) — at 100 TB the heap-backed default provider is the
  * state-size ceiling after update-mode eviction; RocksDB moves state
  * off-heap. These tests re-run the two state-heaviest contracts —
  * bounded-state update-mode Top-N and the chained-stateful semdedup
  * parity + recovery — with the provider switched per-query (the conf
  * is captured at stream start, so a shared session can host both
  * providers), proving the engine's stateful plans are
  * provider-agnostic. */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Runs `body` with streaming state stored in RocksDB, restoring the
    * session default after; cancels (not fails) if the provider class
    * is absent from the distribution. */
  private def underRocksDb[A](body: => A): A = {
    try Class.forName(GraftSession.RocksDbProvider)
    catch { case _: ClassNotFoundException =>
      cancel("RocksDB state store provider not on the classpath")
    }
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, GraftSession.RocksDbProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  test("update-mode Top-N: state stays bounded across window turnover under RocksDB") {
    underRocksDb {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Long)]
      val df = input.toDF().toDF("itemId", "secs")
        .withColumn("ts", timestamp_seconds(col("secs")))
      val counts = StreamingJobs.windowedCounts(
        df, "10 seconds", None, Seq(col("itemId")), wmDelay = "0 seconds")
      val table = scala.collection.concurrent.TrieMap[(Long, Long), Long]()
      val q = StreamingJobs.topNUpdate(counts) { (batch, _) =>
        batch.select(col("window_end").cast("long"), col("itemId"), col("cnt"))
          .collect().foreach(r => table((r.getLong(0), r.getLong(1))) = r.getLong(2))
      }
      val (nWindows, keys) = (20, 4)
      var maxState = 0L
      var provider = ""
      val all = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      try {
        (0 until nWindows).foreach { wi =>
          val base = wi * 10L
          val rows = (0 until keys).flatMap(k =>
            Seq.tabulate(k + 1 + (wi % 3))(j => (k.toLong, base + (j % 4))))
          all ++= rows
          input.addData(rows)
          q.processAllAvailable()
          Option(q.lastProgress).foreach { p =>
            p.stateOperators.foreach { so =>
              maxState = math.max(maxState, so.numRowsTotal)
            }
          }
        }
        provider = q.lastProgress.stateOperators.headOption
          .map(_.customMetrics.toString).getOrElse("")
      } finally q.stop()
      // eviction holds under RocksDB exactly as under the HDFS provider
      assert(maxState > 0 && maxState <= 4L * keys,
        s"state not bounded under RocksDB: max $maxState rows")
      // RocksDB-only metrics prove the provider actually switched
      assert(provider.contains("rocksdb"),
        s"query did not run on RocksDB: $provider")
      // folded serving table equals the batch counts
      val batchDf = all.toSeq.toDF("itemId", "secs")
        .withColumn("ts", timestamp_seconds(col("secs")))
      val batch = StreamingJobs.windowedCounts(
          batchDf, "10 seconds", None, Seq(col("itemId"))).collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_end").getTime / 1000,
          r.getAs[Long]("itemId")) -> r.getAs[Long]("cnt")).toMap
      assert(table.toMap == batch && batch.nonEmpty)
    }
  }

  test("streamingSemDedup: parity and checkpoint recovery under RocksDB") {
    underRocksDb {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val a = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
      val b = Array.tabulate(8)(i => if (i >= 4) 1.0f else 0.0f)
      val corpus = Seq((10L, a), (11L, a.clone()), (20L, b))
        .toDF("vec_id", "embedding")
      val nearA = a.clone(); nearA(0) = nearA(0) + 0.01f
      val novel = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
      val base = java.nio.file.Files.createTempDirectory("graftrocks").toString
      val (ckpt, out) = (s"$base/ckpt", s"$base/out")
      val input = MemoryStream[(Long, Long, Array[Float])]
      def plan = StreamingJobs.streamingSemDedup(
        input.toDF().toDF("vec_id", "secs", "embedding")
          .withColumn("ts", timestamp_seconds(col("secs"))),
        corpus, threshold = 0.9)
      def start() =
        plan.writeStream.format("parquet").option("path", out)
          .outputMode("append").option("checkpointLocation", ckpt).start()
      val q1 = start()
      try {
        input.addData(Seq((100L, 10L, nearA)))
        q1.processAllAvailable()
      } finally q1.stop()
      // restart: both chained stateful operators recover from RocksDB
      // snapshots/changelogs instead of the HDFS provider's delta files
      val q2 = start()
      try {
        input.addData(Seq((101L, 11L, novel)))
        q2.processAllAvailable()
        input.addData(Seq((-1L, 600L, novel)))
        q2.processAllAvailable()
        val got = spark.read.parquet(out).collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
        assert((got - (-1L)) ==
          Map(100L -> (("drop", 10L)), 101L -> (("keep", -1L))),
          s"RocksDB-recovered verdicts diverged: $got")
      } finally q2.stop()
    }
  }
}
