package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Machines, StateMachineRunner, StreamingJobs}
import graft.streaming.Machines._
import graft.sources.Sinks

/** Late-data semantics (SURVEY §2.9 / reference
  * NetworkFlowTopNPage_经典演示迟到数据 + NetwordFlowTset.txt scenario):
  * update-mode re-fire inside the watermark (allowed lateness), drop
  * beyond it, and the late-tag side output. */
class LateDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("late tagger: trailing the per-key max by more than the delay is late") {
    val m = new LateTagMachine(10)
    // arrival order (seq) with event times jumping back
    val evs = Seq(
      Flagged(100, 1, flag = true),  // ontime (first)
      Flagged(105, 2, flag = true),  // ontime
      Flagged(96, 3, flag = true),   // 9 behind max 105 → within delay
      Flagged(94, 4, flag = true),   // 11 behind → late
      Flagged(200, 5, flag = true),  // ontime, max now 200
      Flagged(150, 6, flag = true))  // 50 behind → late
    val out = StateMachineRunner.runSorted(m, evs.iterator).toList
    assert(out.map(_.outcome) == List("ontime", "ontime", "ontime", "late", "ontime", "late"))
  }

  test("update-mode windowed agg re-fires for late-but-allowed data, drops beyond watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("secs", "url")
      .withColumn("ts", timestamp_seconds(col("secs")))
    // 10s tumbling windows, 30s allowed lateness via watermark delay —
    // the reference's allowedLateness(1 min) maps to watermark tuning +
    // update mode (SURVEY §2.9)
    val agg = StreamingJobs.windowedCounts(df, "10 seconds", None, Seq(col("url")), "30 seconds")
    val q = Sinks.memory(agg, "late_refire", "update")
    try {
      input.addData(Seq((0L, "a"), (5L, "a"), (9L, "b")))
      q.processAllAvailable()
      input.addData(Seq((3L, "a"))) // late, within the 30s allowance → re-fire
      q.processAllAvailable()
      val emitted = spark.table("late_refire")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2)))
      // window [0,10) for url a was emitted first with 2, then re-fired with 3
      assert(emitted.count { case (we, u, _) => we == 10 && u == "a" } == 2)
      assert(emitted.filter { case (we, u, _) => we == 10 && u == "a" }.map(_._3).sorted.toSeq == Seq(2L, 3L))
      // push the watermark far ahead, then send data 40s+ behind it: dropped
      input.addData(Seq((100L, "c")))
      q.processAllAvailable()
      input.addData(Seq((4L, "a"))) // watermark is 100-30=70 → 4 << 70: dropped
      q.processAllAvailable()
      val after = spark.table("late_refire")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2)))
      assert(after.filter { case (we, u, _) => we == 10 && u == "a" }.map(_._3).max == 3L)
    } finally q.stop()
  }

  test("late-update Top-N: foreachBatch overwrite reproduces MapState re-ranking") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the reference's TopNHotPage keeps a MapState so a late re-fire
    // OVERWRITES the url's count and re-ranks (NetworkFlowTopNPage…
    // scala:99-176); here: complete-mode counts + per-batch rank +
    // last-write-wins sink keyed by window
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("secs", "url")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val counts = StreamingJobs.windowedCounts(df, "10 seconds", None, Seq(col("url")), "30 seconds")
    val latest = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(String, Long)]]()
    val q = counts.writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingJobs.topNPerWindow(batch, 2, "url").collect()
          .groupBy(_.getAs[java.sql.Timestamp]("window_end").getTime / 1000)
          .foreach { case (we, rows) =>
            latest.put(we, rows.sortBy(_.getAs[Int]("rn"))
              .map(r => (r.getAs[String]("url"), r.getAs[Long]("cnt"))).toSeq)
          }
      }.start()
    try {
      input.addData(Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c")))
      q.processAllAvailable()
      assert(latest.get(10L).map(_._1) == Seq("a", "b")) // a=2, b=2, c=1
      input.addData(Seq((6L, "c"), (7L, "c"))) // late-window updates: c -> 3
      q.processAllAvailable()
      assert(latest.get(10L) == Seq(("c", 3L), ("a", 2L))) // re-ranked, overwritten
    } finally q.stop()
  }

  test("simulated-arrival replay: late path is non-vacuous and equals the window-fn form") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // physical order is time-sorted → legitimately zero late rows
    assert(operators.Stateful.lateEvents(spark, sf).count() == 0)
    // hash-permuted replay must surface real late rows…
    val sim = operators.Stateful.lateEvents(spark, sf, simulateArrival = true)
    val got = sim.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got.nonEmpty)
    // …and the machine output must equal the declarative window-function
    // form of the same semantics (running max over arrival order)
    val arr = graft.functions.ColumnFunctions.hash64(col("event_id"), operators.Stateful.ArrivalSeed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(arr, col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        graft.functions.ColumnFunctions.epochMicros(col("ts")).as("ts_us"),
        max(graft.functions.ColumnFunctions.epochMicros(col("ts"))).over(w).as("prev_max"))
      .filter(col("prev_max").isNotNull && col("ts_us") < col("prev_max") - lit(60L * 1000000L))
      .select(col("user_id"), col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == ref)
  }

  test("late side output: tagged flow splits into main and late sinks") {
    import spark.implicits._
    val m = new LateTagMachine(10)
    val evs = Seq(Flagged(100, 1, true), Flagged(80, 2, true), Flagged(120, 3, true))
    val tagged = StateMachineRunner.runSorted(m, evs.iterator).toList
      .map(o => (o.outcome, o.tsUs)).toDF("outcome", "ts_us")
    val split = Sinks.splitByTag(tagged, "outcome", Seq("ontime", "late"))
    assert(split("ontime").collect().map(_.getLong(1)).toSet == Set(100L, 120L))
    assert(split("late").collect().map(_.getLong(1)).toSet == Set(80L))
  }
}
