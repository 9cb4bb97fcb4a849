package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Machines, StatefulStreams, StreamingJobs, StateMachineRunner}
import graft.streaming.Machines._
import graft.sources.{Sinks, StreamSources}

/** Streaming execution mode: the same logical plans and the same state
  * machines, run incrementally over MemoryStream/rate sources, must
  * reproduce the (oracle-checked) batch results. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming windowed counts (complete mode) == batch windowed counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq.tabulate(300)(i => ((i * 137 % 7200).toLong, (i % 5).toLong))
    val input = MemoryStream[(Long, Long)]
    val streamDf = input.toDF().toDF("secs", "k")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val agg = StreamingJobs.windowedCounts(streamDf, "1 hour", None, Seq(col("k")))
    val q = Sinks.memory(agg, "wc_complete", "complete")
    try {
      input.addData(rows.take(150))
      q.processAllAvailable()
      input.addData(rows.drop(150))
      q.processAllAvailable()
      val streaming = spark.table("wc_complete")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSet
      val batchDf = rows.toDF("secs", "k").withColumn("ts", timestamp_seconds(col("secs")))
      val batch = StreamingJobs.windowedCounts(batchDf, "1 hour", None, Seq(col("k")))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSet
      assert(streaming == batch)
    } finally q.stop()
  }

  test("streaming login-fail machine == batch machine (no timers involved)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val US = 1000000L
    // per-user event streams: alternating fails/successes with bursts
    val evs = for (u <- 0L until 4L; i <- 0 until 30) yield
      (u, (i * 3 + u).toLong * US, (i % 4 != 1) || u == 2)
    val m = new LoginFailMachine(2, 5 * US)
    val input = MemoryStream[(Long, Long, Boolean)]
    val withTs = input.toDF().toDF("k", "ts_us", "flag")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
    val grouped = withTs.select("k", "ts_us", "flag", "ts")
      .as[(Long, Long, Boolean, java.sql.Timestamp)]
      .groupByKey(_._1)
    val out = StatefulStreams.runStreaming(grouped, m)(
      r => Flagged(r._2, r._2, r._3))((k, o) => (k, o._1, o._2))
    val q = Sinks.memory(out.toDF("k", "first_us", "last_us"), "login_stream")
    try {
      // split by TIME, not by key: with a 0 s watermark, a batch-2 event
      // older than batch-1's max event time would be dropped as late
      val (b1, b2) = evs.partition(_._2 < 45L * US)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streaming = spark.table("login_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = evs.groupBy(_._1).flatMap { case (k, es) =>
        StateMachineRunner.runSorted(m, es.sortBy(_._2).map(e => Flagged(e._2, e._2, e._3)).iterator)
          .map(o => (k, o._1, o._2))
      }.toSet
      assert(streaming == batch)
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("streaming order-timeout machine fires event-time timers via watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val US = 1000000L
    val m = new OrderTimeoutMachine(10 * US)
    // key 1: create paid in time; key 2: create that must TIME OUT via
    // watermark advance (not end-of-input); sentinels push the watermark
    val batch1 = Seq((1L, 5L * US, true), (1L, 8L * US, false), (2L, 6L * US, true))
    val sentinel1 = Seq((3L, 100L * US, false)) // lone pay far ahead → advances wm
    val sentinel2 = Seq((4L, 200L * US, false))
    val all = batch1 ++ sentinel1 ++ sentinel2
    val input = MemoryStream[(Long, Long, Boolean)]
    val withTs = input.toDF().toDF("k", "ts_us", "flag")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
    val grouped = withTs.select("k", "ts_us", "flag", "ts")
      .as[(Long, Long, Boolean, java.sql.Timestamp)]
      .groupByKey(_._1)
    val out = StatefulStreams.runStreaming(grouped, m)(
      r => Flagged(r._2, r._2, r._3))((k, o) =>
      (k, o.createUs, o.resultUs, o.status))
    val q = Sinks.memory(out.toDF("k", "create_us", "result_us", "status"), "order_stream")
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(sentinel1); q.processAllAvailable()
      input.addData(sentinel2); q.processAllAvailable()
      val streaming = spark.table("order_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      // batch reference over the same events (machine flushes at +inf)
      val batch = all.groupBy(_._1).flatMap { case (k, es) =>
        StateMachineRunner.runSorted(m, es.sortBy(_._2).map(e => Flagged(e._2, e._2, e._3)).iterator)
          .map(o => (k, o.createUs, o.resultUs, o.status))
      }.toSet
      assert(streaming.contains((1L, 5L * US, 8L * US, "paid")))
      assert(streaming.contains((2L, 6L * US, 16L * US, "timeout"))) // fired by watermark
      assert(streaming == batch)
    } finally q.stop()
  }

  test("deterministic rate generator emits the configured batch, reproducibly") {
    def firstBatch(): Seq[(String, String, String)] = {
      val df = StreamSources.marketEvents(spark, rowsPerBatch = 50, seed = 9)
      val name = s"mk_${System.nanoTime()}"
      val q = df.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    }
    val a = firstBatch()
    val b = firstBatch()
    assert(a.size >= 50)
    assert(a == b) // portable-hash derivation: replayable, not Random
    assert(a.map(_._2).toSet.subsetOf(Set("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")))
  }

  test("side-output splitter: tagged union fans out without losing rows") {
    import spark.implicits._
    val m = new BlacklistMachine(2, 86400L)
    val clicks = (1L to 7L).map(t => Flagged(t, t, flag = true))
    val tagged = StateMachineRunner.runSorted(m, clicks.iterator).toList
      .map(o => (o.outcome, o.tsUs)).toDF("outcome", "ts_us")
    val split = Sinks.splitByTag(tagged, "outcome", Seq("pass", "warn"))
    assert(split("pass").count() == 2)
    assert(split("warn").count() == 1)
    val total = split.values.map(_.count()).sum
    assert(total == tagged.count())
  }

  test("streaming session windows (append mode) == batch session windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 3 users, bursts separated by > / < the 10-minute gap; delivered in
    // event-time order (the 0-second watermark drops anything behind it)
    val evs = (for (u <- 0L until 3L; i <- 0 until 20) yield
      (u, (i * 137 + u * 7 + (if (i % 5 == 0) 900 else 0) * (i / 5)).toLong))
      .sortBy(_._2)
    val input = MemoryStream[(Long, Long)]
    val streamDf = input.toDF().toDF("user_id", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n_events"))
    val q = Sinks.memory(streamDf, "sess_append", "append")
    try {
      input.addData(evs.take(30))
      q.processAllAvailable()
      input.addData(evs.drop(30))
      q.processAllAvailable()
      // sentinel far in the future closes every open session
      input.addData(Seq((-1L, 10000000L)))
      q.processAllAvailable()
      val streaming = spark.table("sess_append").filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
        .toSet
      val batch = evs.toDF("user_id", "secs")
        .withColumn("ts", timestamp_seconds(col("secs")))
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("s"),
          col("session_window.end").as("e"), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
        .toSet
      assert(streaming == batch)
      assert(batch.exists(_._4 > 1), "crafted bursts must merge into multi-event sessions")
    } finally q.stop()
  }

  test("streaming router delivers each tag to its own sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val received = new java.util.concurrent.ConcurrentHashMap[String, java.util.List[Long]]()
    def writer(tag: String): org.apache.spark.sql.DataFrame => Unit = { df =>
      val l = received.computeIfAbsent(tag, _ => new java.util.concurrent.CopyOnWriteArrayList[Long]())
      df.collect().foreach(r => l.add(r.getLong(1)))
    }
    val q = Sinks.routeByTag(input.toDF().toDF("tag", "v"), "tag",
      Map("a" -> writer("a"), "b" -> writer("b"))).start()
    try {
      input.addData(Seq(("a", 1L), ("b", 2L), ("a", 3L)))
      q.processAllAvailable()
      assert(received.get("a").size() == 2 && received.get("b").size() == 1)
    } finally q.stop()
  }
}
