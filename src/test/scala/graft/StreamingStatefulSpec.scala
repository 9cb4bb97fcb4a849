package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Machines, StatefulStreams, StateMachineRunner, StreamingJobs}
import graft.streaming.Machines._

/** Streaming parity for the remaining machines (blacklist, tx-match)
  * plus the salted-aggregation and deterministic-uuid helpers. */
class StreamingStatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val US = 1000000L

  private def runMachineStream[O](
      evs: Seq[(Long, Long, Boolean)],
      splitUs: Long)(build: org.apache.spark.sql.Dataset[(Long, Long, Boolean, java.sql.Timestamp)] => org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Boolean)]
    val withTs = input.toDF().toDF("k", "ts_us", "flag")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
    val ds = withTs.select("k", "ts_us", "flag", "ts")
      .as[(Long, Long, Boolean, java.sql.Timestamp)]
    val name = s"ms_${System.nanoTime()}"
    val q = build(ds).writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      val (b1, b2) = evs.partition(_._2 < splitUs)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("streaming funnel machine == batch funnel counts on real events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val kinds = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"),
        graft.functions.ColumnFunctions.epochSeconds(col("ts")).as("ts_s"),
        col("event_type"))
      .collect()
      .flatMap(r => kinds.get(r.getAs[String]("event_type"))
        .map(k => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_s"), k)))
      .toSeq
    val split = evs.map(_._2).sorted.apply(evs.length / 2)
    val m = new FunnelMachine
    val input = MemoryStream[(Long, Long, Int)]
    val withTs = input.toDF().toDF("k", "ts_s", "kind")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "0 seconds")
      .select("k", "ts_s", "kind", "ts")
      .as[(Long, Long, Int, java.sql.Timestamp)]
    // machine event time carries SECONDS here: the batch funnel compares
    // truncated epoch seconds, and parity needs the same granularity
    val out = StatefulStreams.runStreaming(withTs.groupByKey(_._1), m)(
      r => Staged(r._2, r._3))((k, o) => (k, o.stage))
    val name = s"funnel_${System.nanoTime()}"
    val q = out.toDF("k", "stage").writeStream
      .outputMode("append").format("memory").queryName(name).start()
    val streaming = try {
      val (b1, b2) = evs.partition(_._2 < split)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      spark.table(name).collect()
        .groupBy(_.getInt(1)).view.mapValues(_.length.toLong).toMap
    } finally q.stop()
    val batch = graft.operators.EventAnalytics.funnel(spark, sf).collect()
      .map(r => r.getAs[Long]("stage").toInt -> r.getAs[Long]("n")).toMap
    assert(streaming == batch, s"streaming=$streaming batch=$batch")
    // and the batch secondary-sort runner agrees too
    val runner = evs.groupBy(_._1).values.flatMap { es =>
      StateMachineRunner.runSorted(m,
        es.sortBy(_._2).map(e => Staged(e._2, e._3)).iterator)
    }.toSeq.groupBy(_.stage).view.mapValues(_.length.toLong).toMap
    assert(runner == batch)
  }

  test("streaming blacklist machine == batch machine (warn once, suppress, reset)") {
    import spark.implicits._
    val m = new BlacklistMachine(2, 10L * US) // "day" = 10s for the test
    // offset away from epoch 0: Spark's initial watermark is 0 and a
    // row AT the watermark is dropped as late
    val evs = for (k <- 0L until 3L; i <- 0 until 12)
      yield (k, ((i.toLong + 100) * US) + k * 100, true)
    val streaming = runMachineStream(evs, 106L * US) { ds =>
      StatefulStreams.runStreaming(ds.groupByKey(_._1), m)(
        r => Flagged(r._2, r._2, r._3))((k, o) => (k, o.outcome, o.tsUs)).toDF("k", "outcome", "ts_us")
    }.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = evs.groupBy(_._1).flatMap { case (k, es) =>
      StateMachineRunner.runSorted(m, es.sortBy(_._2).map(e => Flagged(e._2, e._2, e._3)).iterator)
        .map(o => (k, o.outcome, o.tsUs))
    }.toSet
    assert(streaming == batch && streaming.exists(_._2 == "warn"))
  }

  test("streaming tx-match machine == batch machine incl. watermark-fired timeouts") {
    import spark.implicits._
    val m = new TxMatchMachine(5L * US, 3L * US)
    // key 1 matched; key 2 pay never gets a receipt (timer fires via
    // sentinels); key 3 receipt then late pay (both unmatched)
    val evs = Seq(
      (1L, 1L * US, true), (1L, 4L * US, false),
      (2L, 2L * US, true),
      (3L, 1L * US, false), (3L, 30L * US, true),
      (9L, 100L * US, true), (9L, 200L * US, false)) // sentinels advance wm
    val streaming = runMachineStream(evs, 20L * US) { ds =>
      StatefulStreams.runStreaming(ds.groupByKey(_._1), m)(
        r => SideEvent(r._2, r._3))((k, o) => (k, o.outcome, o.t1Us, o.t2Us))
        .toDF("k", "outcome", "t1", "t2")
    }.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 < 9L).toSet // sentinel key: its own final timeout has no
                               // later watermark to fire it in streaming
    val batch = evs.groupBy(_._1).flatMap { case (k, es) =>
      StateMachineRunner.runSorted(m,
          es.sortBy(e => (e._2, e._3)).map(e => SideEvent(e._2, e._3)).iterator)
        .map(o => (k, o.outcome, o.t1Us, o.t2Us))
    }.filter(_._1 < 9L).toSet
    assert(streaming == batch)
    assert(streaming.contains((1L, "matched", 1L * US, 4L * US)))
    assert(streaming.contains((2L, "unmatched_pay", 2L * US, 7L * US)))
  }

  test("salted two-phase count equals the direct groupBy count") {
    import spark.implicits._
    val rows = Seq.tabulate(5000)(i => (if (i % 10 == 0) "hot" else s"k${i % 37}", i.toLong))
    val df = rows.toDF("k", "v")
    val salted = StreamingJobs.saltedCount(df, Seq("k"), col("v"), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = df.groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("deterministicUuid is uuid-shaped and replayable") {
    import spark.implicits._
    val ids = Seq("a", "b", "a").toDF("s")
      .select(graft.functions.ColumnFunctions.deterministicUuid(col("s")))
      .collect().map(_.getString(0))
    assert(ids(0) == ids(2) && ids(0) != ids(1))
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }
}
