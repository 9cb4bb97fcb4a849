package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingJobs
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

  test("event_rollup: snapshot face converges to the batch rollup on real events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val state = new java.util.concurrent.ConcurrentHashMap[
      (Option[String], Option[Long], Long), (Long, Long)]()
    val q = StreamingJobs.snapshotUpdate(
      streamedEvents(input), EventAnalytics.eventRollupFrom) { result =>
      result.collect().foreach { r =>
        state.put(
          (Option(r.getAs[String]("event_type")),
            Option(r.getAs[java.lang.Long]("hour")).map(_.longValue()),
            r.getAs[Long]("gid")),
          (r.getAs[Long]("cnt"), r.getAs[Long]("users")))
      }
    }
    try {
      eventChunks(3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batch = EventAnalytics.eventRollup(spark, sf).collect().map { r =>
      (Option(r.getAs[String]("event_type")),
        Option(r.getAs[java.lang.Long]("hour")).map(_.longValue()),
        r.getAs[Long]("gid")) -> (r.getAs[Long]("cnt"), r.getAs[Long]("users"))
    }.toMap
    import scala.jdk.CollectionConverters._
    assert(state.asScala.toMap == batch && batch.nonEmpty)
  }

  test("event_cube and event_pivot: snapshot faces converge to the batch answers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val cubeState = new java.util.concurrent.ConcurrentHashMap[
      (Option[String], Option[Long], Long), Long]()
    val pivotState = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val stream = streamedEvents(input)
    val qCube = StreamingJobs.snapshotUpdate(stream, EventAnalytics.eventCubeFrom) { res =>
      res.collect().foreach { r =>
        cubeState.put((Option(r.getAs[String]("event_type")),
          Option(r.getAs[java.lang.Long]("hour")).map(_.longValue()),
          r.getAs[Long]("gid")), r.getAs[Long]("cnt"))
      }
    }
    val qPivot = StreamingJobs.snapshotUpdate(stream, EventAnalytics.eventPivotFrom(_)) { res =>
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
    assert(cubeState.asScala.toMap == batchCube && batchCube.nonEmpty)
    assert(pivotState.asScala.toMap == batchPivot && batchPivot.nonEmpty)
  }

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
}
