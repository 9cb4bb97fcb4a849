package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColumnFunctions.{epochMicros, hash64}
import graft.streaming.{Machines, StateMachineRunner}
import graft.streaming.Machines._

/** Batch surface of the stateful/CEP half of the reference (SURVEY.md
  * §2.7–§2.8), driven by the graft.streaming state machines over the
  * driver `events` table. Event-type mapping (the events table plays all
  * the reference's domain streams):
  *
  *   login monitor   fail = `error`, success = any other event
  *   order pay       create = `click`, pay = `purchase`, keyed by user
  *   tx reconcile    pay = first `purchase`/user, receipt = first `signup`/user
  *   ad blacklist    clicks keyed by (user, ad-bucket from props.k)
  *
  * Execution shape (every operator): ONE hash shuffle on the key, then
  * sortWithinPartitions (external sort, spills) and a streaming
  * mapPartitions whose memory is O(state) per key — never O(events).
  * That is the plan that survives 100 TB: no per-key buffering, no
  * driver-side state, no extra exchange. Times are epoch micros (exact
  * integers both in Spark and the DuckDB oracle's epoch_us).
  */
object Stateful {

  private val US = 1000000L

  case class FlagRow(k: Long, ts_us: Long, seq: Long, flag: Boolean)
  case class LoginWarn(user_id: Long, first_fail_us: Long, last_fail_us: Long, n_fails: Int)
  case class OrderRow(user_id: Long, create_us: Long, result_us: Long, status: String)
  case class TxRow(user_id: Long, outcome: String, t1_us: Long, t2_us: Long)
  case class ClickRow(user_id: Long, ad_id: Int, ts_us: Long, seq: Long)
  case class BlWarnRow(user_id: Long, ad_id: Int, warn_us: Long)

  /** N consecutive login failures within T — state-machine form
    * (reference loginmonitor/LoginFail.scala:38-98 intent; see
    * Machines.LoginFailMachine for the corrected semantics). */
  def loginFail(spark: SparkSession, d: String, n: Int = 2, withinSecs: Long = 7200): DataFrame = {
    import spark.implicits._
    val m = new LoginFailMachine(n, withinSecs * US)
    Tables.events(spark, d)
      .select(col("user_id").as("k"), epochMicros(col("ts")).as("ts_us"),
        col("event_id").as("seq"), (col("event_type") === "error").as("flag"))
      .as[FlagRow]
      .repartition(col("k"))
      .sortWithinPartitions("k", "ts_us", "seq")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r.k, Flagged(r.ts_us, r.seq, r.flag))))
          .map { case (uid, (first, last)) => LoginWarn(uid, first, last, n) }
      }
      .toDF()
  }

  def loginFailSql(n: Int = 2, withinSecs: Long = 7200): String = {
    require(n == 2, "oracle SQL is written for n=2")
    s"""WITH o AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_type,
       |         lag(event_type) OVER w AS prev_type,
       |         lag(epoch_us(ts)) OVER w AS prev_us
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |)
       |SELECT user_id, prev_us AS first_fail_us, ts_us AS last_fail_us, 2 AS n_fails
       |FROM o
       |WHERE event_type = 'error' AND prev_type = 'error'
       |  AND ts_us - prev_us <= ${withinSecs * US}""".stripMargin
  }

  /** Same query, CEP strict-contiguity form via lag() window functions
    * (reference loginmonitor/LoginFail_CEP.scala:31-48: begin("fail")
    * .next("fail").within(T)). Pure window-function plan — one shuffle
    * on user_id, no state machine; the two forms matching the same
    * oracle mirrors the reference shipping both implementations. */
  def loginFailCep(spark: SparkSession, d: String, withinSecs: Long = 7200): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), epochMicros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("event_type") === "error" && col("prev_type") === "error" &&
        col("ts_us") - col("prev_us") <= withinSecs * US)
      .select(col("user_id"), col("prev_us").as("first_fail_us"), col("ts_us").as("last_fail_us"))
  }

  def loginFailCepSql(withinSecs: Long = 7200): String =
    s"""WITH o AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_type,
       |         lag(event_type) OVER w AS prev_type,
       |         lag(epoch_us(ts)) OVER w AS prev_us
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |)
       |SELECT user_id, prev_us AS first_fail_us, ts_us AS last_fail_us
       |FROM o
       |WHERE event_type = 'error' AND prev_type = 'error'
       |  AND ts_us - prev_us <= ${withinSecs * US}""".stripMargin

  /** Order created-but-unpaid-within-T detector — state-machine form
    * (reference orderpay_detect/OrderTimeout_PF.scala:50-131 incl. both
    * result messages: paid with the pay time, timeout at create+T). */
  def orderTimeout(spark: SparkSession, d: String, timeoutSecs: Long = 3600): DataFrame = {
    import spark.implicits._
    val m = new OrderTimeoutMachine(timeoutSecs * US)
    Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").as("k"), epochMicros(col("ts")).as("ts_us"),
        col("event_id").as("seq"), (col("event_type") === "click").as("flag"))
      .as[FlagRow]
      .repartition(col("k"))
      .sortWithinPartitions("k", "ts_us", "seq")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r.k, Flagged(r.ts_us, r.seq, r.flag))))
          .map { case (uid, o) => OrderRow(uid, o.createUs, o.resultUs, o.status) }
      }
      .toDF()
  }

  def orderTimeoutSql(timeoutSecs: Long = 3600): String = {
    val t = timeoutSecs * US
    s"""WITH u AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |), x AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts_us END)
       |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_pay,
       |         lag(event_type) OVER (PARTITION BY user_id
       |                               ORDER BY ts_us, event_id) AS prev_type,
       |         lag(ts_us) OVER (PARTITION BY user_id
       |                          ORDER BY ts_us, event_id) AS prev_us
       |  FROM u
       |)
       |SELECT user_id, ts_us AS create_us,
       |  CASE WHEN next_pay IS NOT NULL AND next_pay - ts_us <= $t
       |       THEN next_pay ELSE ts_us + $t END AS result_us,
       |  CASE WHEN next_pay IS NOT NULL AND next_pay - ts_us <= $t
       |       THEN 'paid' ELSE 'timeout' END AS status
       |FROM x WHERE event_type = 'click'
       |UNION ALL
       |-- pay with nothing in flight (data-loss alarm): pending is empty
       |-- iff the previous click/purchase event is absent, itself a pay
       |-- (a pay flushes every pending create), or a click that already
       |-- timed out (> T before this pay; older clicks are older still)
       |SELECT user_id, ts_us AS create_us, ts_us AS result_us,
       |       'paid_no_create' AS status
       |FROM x WHERE event_type = 'purchase'
       |  AND (prev_type IS NULL OR prev_type = 'purchase' OR ts_us - prev_us > $t)""".stripMargin
  }

  /** Pay↔receipt reconciliation with per-side timeouts — state-machine
    * form of the CoProcessFunction full-outer join (reference
    * orderpay_detect/OrderPayTxMatch_2Flow_Co.scala:48-124). Streams:
    * first purchase per user (pay) vs first signup per user (receipt);
    * matched within the band, else each lone side times out to its
    * unmatched tag. The firsts are a pre-aggregation (one extra
    * map-side-combined shuffle), then the usual single-shuffle machine. */
  def txMatch(spark: SparkSession, d: String,
              payWaitSecs: Long = 86400, rcptWaitSecs: Long = 86400): DataFrame = {
    import spark.implicits._
    val m = new TxMatchMachine(payWaitSecs * US, rcptWaitSecs * US)
    val firsts = Tables.events(spark, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .groupBy(col("user_id"), (col("event_type") === "purchase").as("is_pay"))
      .agg(min(epochMicros(col("ts"))).as("ts_us"))
      .select(col("user_id").as("k"), col("ts_us"), lit(0L).as("seq"), col("is_pay").as("flag"))
      .as[FlagRow]
    firsts
      .repartition(col("k"))
      .sortWithinPartitions("k", "ts_us", "flag")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r.k, SideEvent(r.ts_us, r.flag))))
          .map { case (uid, o) => TxRow(uid, o.outcome, o.t1Us, o.t2Us) }
      }
      .toDF()
  }

  def txMatchSql(payWaitSecs: Long = 86400, rcptWaitSecs: Long = 86400): String = {
    val pw = payWaitSecs * US; val rw = rcptWaitSecs * US
    s"""WITH pay AS (
       |  SELECT user_id, min(epoch_us(ts)) AS pay_us FROM events
       |  WHERE event_type = 'purchase' GROUP BY 1
       |), rcpt AS (
       |  SELECT user_id, min(epoch_us(ts)) AS rcpt_us FROM events
       |  WHERE event_type = 'signup' GROUP BY 1
       |), j AS (
       |  SELECT coalesce(pay.user_id, rcpt.user_id) AS user_id, pay_us, rcpt_us,
       |         (pay_us IS NOT NULL AND rcpt_us IS NOT NULL
       |          AND rcpt_us - pay_us <= $pw AND pay_us - rcpt_us <= $rw) AS ok
       |  FROM pay FULL OUTER JOIN rcpt ON pay.user_id = rcpt.user_id
       |)
       |SELECT user_id, 'matched' AS outcome, pay_us AS t1_us, rcpt_us AS t2_us FROM j WHERE ok
       |UNION ALL
       |SELECT user_id, 'unmatched_pay', pay_us, pay_us + $pw FROM j
       |WHERE pay_us IS NOT NULL AND NOT ok
       |UNION ALL
       |SELECT user_id, 'unmatched_receipt', rcpt_us, rcpt_us + $rw FROM j
       |WHERE rcpt_us IS NOT NULL AND NOT ok""".stripMargin
  }

  /** Interval join — batch form of the reference's
    * orderpay_detect/OrderPayTxMatch_2Flow_Join.scala:46-66
    * (`between(-3s, +5s)` scaled ×600 to the events fixture's cadence):
    * click ⋈ purchase per user with pay ∈ [click−30m, click+50m].
    * Spark plans the equi-key + range predicate as one shuffle on
    * user_id with the band as a join filter; the streaming form is the
    * stream-stream join in graft.streaming with watermarks both sides. */
  def txMatchJoin(spark: SparkSession, d: String,
                  loSecs: Long = -1800, hiSecs: Long = 3000): DataFrame = {
    val ev = Tables.events(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), epochMicros(col("ts")).as("click_us"))
    val pays = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), epochMicros(col("ts")).as("pay_us"))
    clicks.join(pays,
        col("user_id") === col("p_user_id") &&
        col("pay_us") >= col("click_us") + lit(loSecs * US) &&
        col("pay_us") <= col("click_us") + lit(hiSecs * US))
      .select(col("user_id"), col("click_us"), col("pay_us"))
  }

  def txMatchJoinSql(loSecs: Long = -1800, hiSecs: Long = 3000): String =
    s"""SELECT a.user_id, epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS pay_us
       |FROM events a JOIN events b ON a.user_id = b.user_id
       |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
       |  AND epoch_us(b.ts) >= epoch_us(a.ts) + ${loSecs * US}
       |  AND epoch_us(b.ts) <= epoch_us(a.ts) + ${hiSecs * US}""".stripMargin

  /** AS-OF join (builder prompt's canonical "operator Spark lacks"):
    * every purchase attributed to the SAME USER's most recent click at
    * or before it — the attribution/feature-store join. Composed
    * Spark-first instead of a range join: union the two tagged event
    * sets, then one per-user ordered window where the running
    * max(click ts) over the prefix IS the most recent click (the sort
    * key is the timestamp, so prefix-max ≡ last — the classic
    * merge-join formulation of as-of). ONE shuffle on user_id, O(1)
    * state per row; a range-join formulation would explode on hot
    * users and an equality+filter join can't express "most recent".
    * Ties (click and purchase at the same microsecond) resolve
    * click-first via the tag sort key, matching DuckDB's native
    * `ASOF JOIN` at-or-before (>=) semantics; the oracle mirrors the
    * window form verbatim so tie behavior is identical by
    * construction. Null last_click/latency = purchase with no prior
    * click. */
  def attributionAsof(spark: SparkSession, d: String): DataFrame = {
    val tagged = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        epochMicros(col("ts")).as("ts_us"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_click_us",
        max(when(col("tag") === 0, col("ts_us"))).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"), col("last_click_us"),
        (col("ts_us") - col("last_click_us")).as("latency_us"))
  }

  def attributionAsofSql: String =
    """WITH tagged AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), scanned AS (
      |  SELECT *,
      |    max(CASE WHEN tag = 0 THEN ts_us END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      |  FROM tagged
      |)
      |SELECT event_id, user_id, ts_us AS purchase_us, last_click_us,
      |       ts_us - last_click_us AS latency_us
      |FROM scanned WHERE tag = 1""".stripMargin

  /** Stateful click-fraud blacklist — the full reference semantics
    * (market/z_FilterBlackListUser.scala:8-43): warn exactly once per
    * (user, ad, day) when the count crosses the threshold, suppress the
    * rest of that day's clicks, reset daily. This query surfaces the
    * warning side-output; the `pass` main flow is the other tag of the
    * same machine (see Machines.BlacklistMachine + splitByTag). */
  def blacklistStateful(spark: SparkSession, d: String, threshold: Long = 1): DataFrame = {
    import spark.implicits._
    val m = new BlacklistMachine(threshold)
    Tables.events(spark, d)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        (regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int") % 10).as("ad_id"),
        epochMicros(col("ts")).as("ts_us"), col("event_id").as("seq"))
      .as[ClickRow]
      .repartition(col("user_id"), col("ad_id"))
      .sortWithinPartitions("user_id", "ad_id", "ts_us", "seq")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m,
            it.map(r => ((r.user_id, r.ad_id), Flagged(r.ts_us, r.seq, flag = true))))
          .collect { case ((uid, ad), BlOutcome("warn", ts)) => BlWarnRow(uid, ad, ts) }
      }
      .toDF()
  }

  case class LateRow(user_id: Long, event_id: Long, ts_us: Long)

  case class LateArrRow(k: Long, ts_us: Long, seq: Long, arr: Long)

  /** Seed of the simulated-arrival permutation (shared with the oracle). */
  val ArrivalSeed: Int = 7

  /** Late-arrival detection (reference allowedLateness/side-output,
    * SURVEY §2.9 mapping): rows whose event time trails their key's
    * running max (in arrival order) by more than the allowed delay. The
    * `ontime` main flow is the other tag of the same machine
    * (Sinks.splitByTag). Same single-shuffle secondary-sort plan as the
    * other machines, but sorted by ARRIVAL order — lateness is invisible
    * in time order.
    *
    * Arrival order: by default the fixtures' physical order (event_id) —
    * which the driver generates globally time-sorted, so real lateness
    * is legitimately zero there. `simulateArrival = true` replays the
    * SAME rows in a deterministic pseudo-arrival order (the portable
    * hash64 permutation of event_id — a stand-in for network jitter) so
    * the operator's late path is exercised end-to-end on real data and
    * the oracle can replay the identical permutation. No data is
    * synthesized; only the replay order changes. */
  def lateEvents(spark: SparkSession, d: String, delaySecs: Long = 60,
                 simulateArrival: Boolean = false): DataFrame = {
    import spark.implicits._
    val m = new LateTagMachine(delaySecs * US)
    val arrCol = if (simulateArrival) hash64(col("event_id"), ArrivalSeed)
                 else col("event_id")
    Tables.events(spark, d)
      .select(col("user_id").as("k"), epochMicros(col("ts")).as("ts_us"),
        col("event_id").as("seq"), arrCol.as("arr"))
      .as[LateArrRow]
      .repartition(col("k"))
      .sortWithinPartitions("k", "arr", "seq")
      .mapPartitions { it =>
        StateMachineRunner.runPartition(m, it.map(r => (r.k, Flagged(r.ts_us, r.seq, flag = true))))
          .collect { case (uid, BlOutcome("late", ts)) => (uid, ts) }
      }
      .toDF("user_id", "late_ts_us")
  }

  def lateEventsSql(delaySecs: Long = 60, simulateArrival: Boolean = false): String = {
    val ord =
      if (simulateArrival)
        s"(md5_number_lower('$ArrivalSeed:' || event_id) % ${graft.functions.ColumnFunctions.HashPrime}::UBIGINT)::BIGINT"
      else "event_id"
    s"""WITH o AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |         max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY $ord, event_id
       |                                 ROWS BETWEEN UNBOUNDED PRECEDING
       |                                 AND 1 PRECEDING) AS prev_max
       |  FROM events
       |)
       |SELECT user_id, ts_us AS late_ts_us FROM o
       |WHERE prev_max IS NOT NULL AND ts_us < prev_max - ${delaySecs * US}""".stripMargin
  }

  def blacklistStatefulSql(threshold: Long = 1): String =
    s"""WITH c AS (
       |  SELECT user_id,
       |         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 10 AS ad_id,
       |         epoch_us(ts) AS ts_us, event_id,
       |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
       |  FROM events WHERE event_type = 'click'
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, ad_id, day
       |                               ORDER BY ts_us, event_id) AS rn
       |  FROM c
       |)
       |SELECT user_id, ad_id, ts_us AS warn_us FROM r WHERE rn = ${threshold + 1}""".stripMargin
}
