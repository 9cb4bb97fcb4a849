package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{CsvSources, Sinks}

/** Golden end-to-end tests through the user-facing [[Jobs]] façade: the
  * reference's own fixture CSVs run with the REFERENCE's parameters
  * (login: 2 fails / 2 s; order: pay within 15 min; tx: pay waits 5 s,
  * receipt waits 3 s). Expected values computed independently in DuckDB.
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

  test("typed Dataset views: lambda ops over the reference record types") {
    import graft.sources.Records
    val fails = CsvSources.loginEvents(spark, s"$res/LoginLog.csv")
      .filter((e: Records.LoginEvent) => e.eventType == "fail")
      .map((e: Records.LoginEvent) => e.userId)(org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    assert(fails.length == 9) // DuckDB: 9 fail rows in LoginLog.csv
    val pays = CsvSources.orderEvents(spark, s"$res/OrderLog.csv")
      .filter((e: Records.OrderEvent) => e.txId != null && e.txId.nonEmpty).count()
    assert(pays == 40)
  }

  test("login monitor job: user 1035's consecutive-fail warnings") {
    val warns = Jobs.loginFail(spark, s"$res/LoginLog.csv").collect()
      .map(r => (r.getLong(0), r.getLong(1) / US, r.getLong(2) / US)).toSet
    assert(warns == Set(
      (1035L, 1558430842L, 1558430843L),
      (1035L, 1558430843L, 1558430844L)))
    // CEP/lag form agrees
    val cep = Jobs.loginFailCep(spark, s"$res/LoginLog.csv").collect()
      .map(r => (r.getLong(0), r.getLong(1) / US, r.getLong(2) / US)).toSet
    assert(cep == warns)
  }

  test("order timeout job keyed by orderId: 37 paid, 2 timeouts, 3 data-loss alarms") {
    val out = Jobs.orderTimeout(spark, s"$res/OrderLog.csv").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val byStatus = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus("paid").size == 37)
    assert(byStatus("timeout") == Set(34767L, 34756L))
    // 34768 paid with no create anywhere; 34767/34756 paid after their
    // timeout already fired — the reference PF emits the data-loss alarm
    // for those too (state was cleared by the timer, pay re-arrives)
    assert(byStatus("paid_no_create") == Set(34768L, 34767L, 34756L))
  }

  test("tx match job keyed by txId: 4 matched, 36+36 unmatched, splittable") {
    val tagged = Jobs.txMatch(spark, s"$res/OrderLog.csv", s"$res/ReceiptLog.csv")
    val split = Sinks.splitByTag(tagged, "outcome",
      Seq("matched", "unmatched_pay", "unmatched_receipt"))
    assert(split("matched").count() == 4)
    assert(split("unmatched_pay").count() == 36)
    assert(split("unmatched_receipt").count() == 36)
  }

  test("tx interval-join form finds the in-band pay/receipt pairs") {
    val joined = Jobs.txMatchJoin(spark, s"$res/OrderLog.csv", s"$res/ReceiptLog.csv")
    // DuckDB golden: 4 pairs with rcpt in [pay-3s, pay+5s]
    assert(joined.count() == 4)
  }

  test("ad blacklist job: corrected z_FilterBlackListUser semantics") {
    val out = Jobs.adClickBlacklist(spark, s"$res/AdClickLog.csv", threshold = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val warns = out.filter(_._3 == "warn").map(t => (t._1, t._2)).toSet
    // DuckDB golden: 2 (user, ad) pairs reach 3 same-day clicks;
    // 22 clicks pass, 119 are suppressed (hot-key-dominated fixture)
    assert(warns == Set((937166L, 1715L), (161501L, 36156L)))
    assert(out.count(_._3 == "pass") == 22)
  }

  test("behavior-analytics jobs run end to end on the events table") {
    val sf = "/root/testdata/sf0.001"
    assert(Jobs.hotItems(spark, sf).count() > 0)
    assert(Jobs.pageView(spark, sf).count() > 0)
    assert(Jobs.uniqueVisitor(spark, sf).count() > 0)
    assert(Jobs.marketingByChannel(spark, sf).count() > 0)
    assert(Jobs.marketingAllChannel(spark, sf).count() > 0)
    assert(Jobs.adAnalysis(spark, sf).count() > 0)
    assert(Jobs.networkFlowTopPages(spark, s"$res/apache.log").count() == 252)
  }
}
