package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.CsvSources
import graft.streaming.Machines._
import graft.streaming.StateMachineRunner

/** Golden end-to-end tests: the reference's own fixture CSVs
  * (/root/reference/src/main/resources) read through CsvSources and run
  * through the state machines with the REFERENCE's parameters
  * (login: 2 fails / 2 s; order: pay within 15 min; tx: pay waits 5 s,
  * receipt waits 3 s). Expected values were computed independently with
  * DuckDB over the same CSVs.
  */
class ReferenceGoldenSpec extends AnyFunSuite {
  private val res = "/root/reference/src/main/resources"
  private lazy val spark = TestSpark.spark
  private val US = 1000000L

  test("CsvSources parse the reference fixtures with full row counts") {
    // counts include the newline-less last record of each fixture
    assert(CsvSources.readLoginEvents(spark, s"$res/LoginLog.csv").count() == 48)
    assert(CsvSources.readOrderEvents(spark, s"$res/OrderLog.csv").count() == 79)
    assert(CsvSources.readReceiptEvents(spark, s"$res/ReceiptLog.csv").count() == 40)
    assert(CsvSources.readAdClicks(spark, s"$res/AdClickLog.csv").count() == 143)
    val apache = CsvSources.readApacheLog(spark, s"$res/apache.log")
    assert(apache.count() == 10000)
    assert(apache.filter(col("ts").isNull).count() == 0) // wall-format parse total
  }

  test("login monitor on LoginLog.csv: user 1035's consecutive-fail warnings") {
    import spark.implicits._
    val us = US // local copy: keeps the spec class out of the task closure
    val m = new LoginFailMachine(2, 2 * US)
    val warns = CsvSources.readLoginEvents(spark, s"$res/LoginLog.csv")
      .select(col("userId").as("k"), (col("eventTime") * US).as("ts_us"),
        col("eventTime").as("seq"), (col("eventType") === "fail").as("flag"))
      .as[(Long, Long, Long, Boolean)]
      .repartition(col("k")).sortWithinPartitions("k", "ts_us")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r._1, Flagged(r._2, r._3, r._4))))
          .map { case (uid, (a, b)) => (uid, a / us, b / us) }
      }.collect().toSet
    assert(warns == Set(
      (1035L, 1558430842L, 1558430843L),
      (1035L, 1558430843L, 1558430844L)))
  }

  test("order timeout on OrderLog.csv keyed by orderId: 37 paid, 2 timeouts, 1 lost create") {
    import spark.implicits._
    val m = new OrderTimeoutMachine(15 * 60 * US)
    val out = CsvSources.readOrderEvents(spark, s"$res/OrderLog.csv")
      .select(col("orderId").as("k"), (col("eventTime") * US).as("ts_us"),
        col("eventTime").as("seq"), (col("eventType") === "create").as("flag"))
      .as[(Long, Long, Long, Boolean)]
      .repartition(col("k")).sortWithinPartitions("k", "ts_us")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r._1, Flagged(r._2, r._3, r._4))))
          .map { case (oid, o) => (oid, o.status) }
      }.collect()
    val byStatus = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus("paid").size == 37)
    assert(byStatus("timeout") == Set(34767L, 34756L))
    // 34768 paid with no create anywhere; 34767/34756 paid after their
    // timeout already fired — the reference PF emits the data-loss alarm
    // for those too (state was cleared by the timer, pay re-arrives)
    assert(byStatus("paid_no_create") == Set(34768L, 34767L, 34756L))
  }

  test("tx match on OrderLog+ReceiptLog keyed by txId: 4 matched, 36+36 unmatched") {
    import spark.implicits._
    val m = new TxMatchMachine(5 * US, 3 * US)
    val pays = CsvSources.readOrderEvents(spark, s"$res/OrderLog.csv")
      .filter(length(col("txId")) > 0)
      .select(col("txId").as("k"), (col("eventTime") * US).as("ts_us"), lit(true).as("is_pay"))
    val rcpts = CsvSources.readReceiptEvents(spark, s"$res/ReceiptLog.csv")
      .select(col("txId").as("k"), (col("timestamp") * US).as("ts_us"), lit(false).as("is_pay"))
    val out = pays.unionByName(rcpts)
      .as[(String, Long, Boolean)]
      .repartition(col("k")).sortWithinPartitions("k", "ts_us", "is_pay")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r._1, SideEvent(r._2, r._3))))
          .map { case (tx, o) => (tx, o.outcome) }
      }.collect()
    val counts = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts == Map("matched" -> 4, "unmatched_pay" -> 36, "unmatched_receipt" -> 36))
  }

  test("ad blacklist on AdClickLog.csv: corrected z_FilterBlackListUser semantics") {
    import spark.implicits._
    // threshold 2 on the 142-row fixture (the reference's 100 never
    // trips on its own fixture); warn = third click on the same
    // (user, ad) within one day, later clicks suppressed
    val m = new BlacklistMachine(2)
    val out = CsvSources.readAdClicks(spark, s"$res/AdClickLog.csv")
      .select(col("userId"), col("adId"), (col("timestamp") * US).as("ts_us"))
      .as[(Long, Long, Long)]
      .repartition(col("userId"), col("adId"))
      .sortWithinPartitions("userId", "adId", "ts_us")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => ((r._1, r._2), Flagged(r._3, 0, flag = true))))
          .map { case ((uid, ad), o) => (uid, ad, o.outcome) }
      }.collect()
    val warns = out.filter(_._3 == "warn").map(t => (t._1, t._2)).toSet
    val passes = out.count(_._3 == "pass")
    // DuckDB golden: 2 (user, ad) pairs reach 3 same-day clicks;
    // 22 clicks pass, 119 are suppressed (hot-key-dominated fixture)
    assert(warns == Set((937166L, 1715L), (161501L, 36156L)))
    assert(passes == 22)
  }
}
