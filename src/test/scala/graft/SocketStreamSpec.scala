package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.CsvSources
import graft.streaming.StreamingJobs
import java.io.PrintWriter
import java.net.ServerSocket
import java.util.concurrent.LinkedBlockingQueue

/** End-to-end socket streaming (SURVEY §2.1 row 3, VERDICT r3 missing
  * #1): a live TCP server feeds apache-log lines to a running
  * Structured Streaming query — socket source → shared apache parse →
  * sliding-window url counts → per-window TopN — with a second wave of
  * lines written WHILE the query runs, and each phase's ranking checked
  * against the batch pipeline over the lines sent so far. */
class SocketStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic apache.log-format lines (ip uid - ts zone method url):
  // Zipf-ish url popularity so the TopN is non-trivial and phase 2
  // reshuffles the phase-1 ranking
  private def line(i: Int, urlOf: Int => Int): String = {
    val ts = f"17/05/2015:10:${(i / 60) % 60}%02d:${i % 60}%02d"
    s"10.0.${i % 7}.${i % 251} u${i % 97} - $ts +0000 GET /page${urlOf(i)}"
  }
  private val phase1 = (0 until 400).map(line(_, i => i % 10 * (i % 10) % 13))
  private val phase2 = (400 until 800).map(line(_, i => (i * 31) % 5))

  private type Key = (Long, String, Long, Int)
  private def keyed(rs: Array[org.apache.spark.sql.Row]): Set[Key] = rs.map { r =>
    (r.getAs[java.sql.Timestamp]("window_end").getTime,
      r.getAs[String]("url"), r.getAs[Long]("cnt"), r.getAs[Int]("rn"))
  }.toSet

  /** batch oracle: same parse + window + rank over the lines sent */
  private def batchTopN(lines: Seq[String]): Set[Key] = {
    import spark.implicits._
    val parsed = CsvSources.parseApacheLines(lines.toDF("line"))
    keyed(StreamingJobs.topNPerWindow(
      StreamingJobs.windowedCounts(parsed, "10 minutes", Some("5 minutes"), Seq(col("url"))),
      3, "url").collect())
  }

  test("socket NetworkFlow stream: mid-query lines arrive, each phase == batch") {
    val server = new ServerSocket(0)
    val queue = new LinkedBlockingQueue[String]()
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        var l = queue.take()
        while (l != "<<STOP>>") { out.println(l); l = queue.take() }
        out.close(); sock.close()
      } catch { case _: java.io.IOException => () }
    })
    writer.setDaemon(true); writer.start()

    @volatile var latest = Set.empty[Key]
    val q = Jobs.networkFlowStream(spark, "localhost", server.getLocalPort, n = 3) {
      (topn, _) => latest = keyed(topn.collect())
    }
    // the socket source buffers lines on a background reader thread, so
    // processAllAvailable alone can't know a line is still in flight —
    // poll for convergence to the batch-computed expectation
    def awaitExpected(expect: Set[Key]): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (latest != expect && System.nanoTime() < deadline) {
        q.processAllAvailable(); if (latest != expect) Thread.sleep(100)
      }
      assert(latest == expect)
    }
    try {
      phase1.foreach(queue.put)
      awaitExpected(batchTopN(phase1))
      val afterPhase1 = latest
      phase2.foreach(queue.put)             // arrives while the query runs
      awaitExpected(batchTopN(phase1 ++ phase2))
      assert(latest != afterPhase1)         // phase 2 really moved the ranking
    } finally {
      queue.put("<<STOP>>"); q.stop(); server.close()
    }
  }
}
