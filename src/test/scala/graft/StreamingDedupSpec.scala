package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingJobs
import graft.sources.Sinks

/** Streaming exact dedup: first arrival of each content survives,
  * later copies drop across micro-batches, watermark expires the
  * state and lets a long-expired duplicate through (the documented
  * horizon semantics, not a bug). */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("first arrival wins across batches; expired state re-admits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("doc_id", "secs", "text")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val q = Sinks.memory(
      StreamingJobs.streamingDedup(df, "30 seconds").select("doc_id", "text"),
      "stream_dedup", "append")
    try {
      input.addData(Seq((1L, 10L, "alpha"), (2L, 11L, "beta")))
      q.processAllAvailable()
      input.addData(Seq((4L, 13L, "alpha"), (5L, 14L, "gamma"))) // dup in later batch
      q.processAllAvailable()
      val got = spark.table("stream_dedup").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // the batch-1 arrival of "alpha" survives; the batch-2 copy drops
      // (within a SINGLE batch the survivor among simultaneous copies is
      // partition-order-arbitrary — cross-batch firsts are deterministic)
      assert(got == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
      // advance the watermark past the horizon: state for "alpha" expires,
      // a fresh copy is re-admitted (bounded state is the 100 TB trade)
      input.addData(Seq((6L, 100L, "advance")))
      q.processAllAvailable()
      input.addData(Seq((7L, 101L, "alpha")))
      q.processAllAvailable()
      val after = spark.table("stream_dedup").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(after.contains((7L, "alpha")))
    } finally q.stop()
  }
}
