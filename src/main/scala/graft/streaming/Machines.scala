package graft.streaming

/** The four keyed state machines of the reference's stateful half
  * (SURVEY.md §2.7–§2.8), re-expressed over [[EventTimeStateMachine]].
  * All times are epoch MICROS.
  */
object Machines {

  /** A timestamped flagged event (seq breaks ts ties deterministically). */
  case class Flagged(tsUs: Long, seq: Long, flag: Boolean)

  /** N consecutive failures within T per key — the corrected intent of
    * reference loginmonitor/LoginFail.scala:38-98 (buffer fails, reset
    * on success) and exactly LoginFail_CEP.scala:31-48 for n=2 (strict
    * contiguity: `next` = no intervening event of any other kind).
    * Emits on every failure that completes n consecutive fails whose
    * span fits in `withinUs`; the buffer slides (no clear on emit), so a
    * run of n+1 fails can warn twice — matching the CEP `next` pattern
    * re-matching on each new failure.
    *
    * An instance of the [[Cep.nConsecutiveWithin]] combinator (the
    * output rows are the match spans, tag dropped). */
  final class LoginFailMachine(n: Int, withinUs: Long)
      extends EventTimeStateMachine[Flagged, List[Long], (Long, Long)] {
    private val cep = Cep.nConsecutiveWithin[Flagged](n, withinUs, _.flag, _.tsUs)
    def zero: List[Long] = cep.zero
    def eventTime(e: Flagged): Long = cep.eventTime(e)
    def onEvent(s: List[Long], e: Flagged): (List[Long], Seq[(Long, Long)], Option[Long]) = {
      val (s2, os, t) = cep.onEvent(s, e)
      (s2, os.map(m => (m.startUs, m.endUs)), t)
    }
    def onTimer(s: List[Long], t: Long): (List[Long], Seq[(Long, Long)], Option[Long]) = {
      val (s2, os, t2) = cep.onTimer(s, t)
      (s2, os.map(m => (m.startUs, m.endUs)), t2)
    }
  }

  /** A staged funnel event (kind: 1=view, 2=click, 3=purchase). */
  case class Staged(tsUs: Long, kind: Int)

  /** One funnel advancement: the key reached `stage` at `tsUs`. */
  case class StageAdvance(stage: Int, tsUs: Long)

  /** Ordered conversion funnel per key — the streaming face of
    * EventAnalytics.funnel (view → click → purchase, each hop STRICTLY
    * later than the previous advancement). Time-sorted processing
    * makes the first qualifying event of each stage exactly the batch
    * form's min, so per-stage counts are identical; ties at the same
    * timestamp resolve identically in any processing order (an
    * equal-time hop never qualifies under strict >). Event-driven, no
    * timers; state is (stage, advancement time) — O(1) per key. */
  final class FunnelMachine
      extends EventTimeStateMachine[Staged, (Int, Long), StageAdvance] {
    def zero: (Int, Long) = (0, 0L)
    def eventTime(e: Staged): Long = e.tsUs
    def onEvent(s: (Int, Long), e: Staged): ((Int, Long), Seq[StageAdvance], Option[Long]) = {
      val (stage, since) = s
      if (e.kind == stage + 1 && (stage == 0 || e.tsUs > since))
        ((stage + 1, e.tsUs), Seq(StageAdvance(stage + 1, e.tsUs)), None)
      else (s, Nil, None)
    }
    def onTimer(s: (Int, Long), t: Long): ((Int, Long), Seq[StageAdvance], Option[Long]) =
      (s, Nil, None)
  }

  /** Outcome of one create event: paid in time or timed out. */
  case class OrderOutcome(createUs: Long, resultUs: Long, status: String)

  /** Create-then-pay-within-T per key — reference
    * orderpay_detect/OrderTimeout_PF.scala:50-131 / OrderTimeout_CEP
    * `followedBy` + timeout extraction. Pending creates wait for the
    * next pay; a pay settles every pending create (all within T by
    * construction: an over-age create's timer fired before the pay's
    * event time advanced the watermark past create+T). Timer at
    * earliest-pending + T emits `timeout` at exactly create+T, matching
    * the reference's "timeout at <ts>" message time. A pay with no
    * pending create emits the reference's data-loss alarm
    * ("already payed but not found created log",
    * OrderTimeout_PF.scala:125-129) as status `paid_no_create`.
    *
    * An instance of the [[Cep.aThenBWithin]] combinator: A = create,
    * B = pay, tags renamed to the reference's statuses. */
  final class OrderTimeoutMachine(timeoutUs: Long)
      extends EventTimeStateMachine[Flagged, List[Long], OrderOutcome] {
    private val cep = Cep.aThenBWithin[Flagged](timeoutUs, _.flag, e => !e.flag,
      _.tsUs, matchedTag = "paid", timeoutTag = "timeout",
      bAloneTag = Some("paid_no_create"))
    private def conv(m: Cep.PatternMatch) = OrderOutcome(m.startUs, m.endUs, m.tag)
    def zero: List[Long] = cep.zero
    def eventTime(e: Flagged): Long = cep.eventTime(e)
    def onEvent(s: List[Long], e: Flagged): (List[Long], Seq[OrderOutcome], Option[Long]) = {
      val (s2, os, t) = cep.onEvent(s, e)
      (s2, os.map(conv), t)
    }
    def onTimer(s: List[Long], t: Long): (List[Long], Seq[OrderOutcome], Option[Long]) = {
      val (s2, os, t2) = cep.onTimer(s, t)
      (s2, os.map(conv), t2)
    }
  }

  /** One side of a two-stream reconciliation: pay or receipt. */
  case class SideEvent(tsUs: Long, isPay: Boolean)
  case class TxState(pay: Option[Long], rcpt: Option[Long])
  case class TxOutcome(outcome: String, t1Us: Long, t2Us: Long)

  /** Pay↔receipt reconciliation with per-side timeouts — reference
    * orderpay_detect/OrderPayTxMatch_2Flow_Co.scala:48-124: match →
    * emit matched pair; lone side times out after its own wait and goes
    * to the unmatched side-output (tagged union here; split with
    * graft.sources.Sinks.splitByTag). Outputs:
    *   matched           t1=payTs,  t2=rcptTs
    *   unmatched_pay     t1=payTs,  t2=payTs+payWait   (timeout instant)
    *   unmatched_receipt t1=rcptTs, t2=rcptTs+rcptWait
    * At most one side is ever pending: the second arrival either matches
    * (within the survivor's wait) or arrives after the survivor's timer
    * already fired it to unmatched.
    */
  final class TxMatchMachine(payWaitUs: Long, rcptWaitUs: Long)
      extends EventTimeStateMachine[SideEvent, TxState, TxOutcome] {
    def zero: TxState = TxState(None, None)
    def eventTime(e: SideEvent): Long = e.tsUs
    def onEvent(s: TxState, e: SideEvent): (TxState, Seq[TxOutcome], Option[Long]) =
      if (e.isPay) s.rcpt match {
        case Some(rc) => (TxState(None, None), Seq(TxOutcome("matched", e.tsUs, rc)), None)
        case None if s.pay.isDefined => (s, Nil, Some(s.pay.get + payWaitUs)) // dup pay: ignore
        case None => (TxState(Some(e.tsUs), None), Nil, Some(e.tsUs + payWaitUs))
      } else s.pay match {
        case Some(p) => (TxState(None, None), Seq(TxOutcome("matched", p, e.tsUs)), None)
        case None if s.rcpt.isDefined => (s, Nil, Some(s.rcpt.get + rcptWaitUs)) // dup receipt
        case None => (TxState(None, Some(e.tsUs)), Nil, Some(e.tsUs + rcptWaitUs))
      }
    def onTimer(s: TxState, t: Long): (TxState, Seq[TxOutcome], Option[Long]) = {
      val payOut = s.pay.filter(_ + payWaitUs <= t)
        .map(p => TxOutcome("unmatched_pay", p, p + payWaitUs))
      val rcptOut = s.rcpt.filter(_ + rcptWaitUs <= t)
        .map(r => TxOutcome("unmatched_receipt", r, r + rcptWaitUs))
      (TxState(s.pay.filterNot(_ + payWaitUs <= t), s.rcpt.filterNot(_ + rcptWaitUs <= t)),
        payOut.toSeq ++ rcptOut.toSeq, None)
    }
  }

  /** Late-data tagger — the engine's analog of the reference's
    * `allowedLateness + sideOutputLateData` (SURVEY §2.9,
    * NetworkFlowTopNPage…scala:49-58). Spark has no native "late beyond
    * watermark" side output, so the engine tracks a PER-KEY watermark
    * (running max event time in ARRIVAL order) and tags each event
    * `late` when it trails that max by more than the allowed delay,
    * else `ontime`. Per-key tracking is the scale-safe choice (a global
    * watermark would serialize through one key); feed arrival order,
    * not time order — a time-sorted input never sees lateness. */
  final class LateTagMachine(delayUs: Long)
      extends EventTimeStateMachine[Flagged, Long, BlOutcome] {
    def zero: Long = Long.MinValue
    def eventTime(e: Flagged): Long = e.seq // arrival order drives this machine
    def onEvent(s: Long, e: Flagged): (Long, Seq[BlOutcome], Option[Long]) = {
      val tag = if (s != Long.MinValue && e.tsUs < s - delayUs) "late" else "ontime"
      (math.max(s, e.tsUs), Seq(BlOutcome(tag, e.tsUs)), None)
    }
    def onTimer(s: Long, t: Long): (Long, Seq[BlOutcome], Option[Long]) = (s, Nil, None)
  }

  case class BlState(day: Long, count: Long, warned: Boolean)
  case class BlOutcome(outcome: String, tsUs: Long)

  /** Click-fraud blacklist — reference market/z_FilterBlackListUser
    * .scala:8-43 (the corrected semantics): per key count clicks; the
    * click that pushes the count past `threshold` emits ONE `warn`
    * output, later clicks are suppressed entirely, and the count resets
    * daily (reference: processing-time midnight timer; batch analog:
    * event-time day boundary — documented deviation, identical per-day
    * results under ascending event time). Clicks at or below the
    * threshold pass through as `pass` — the tagged-union main flow.
    */
  final class BlacklistMachine(threshold: Long, dayUs: Long = 86400L * 1000000L)
      extends EventTimeStateMachine[Flagged, BlState, BlOutcome] {
    def zero: BlState = BlState(-1L, 0L, warned = false)
    def eventTime(e: Flagged): Long = e.tsUs
    def onEvent(s0: BlState, e: Flagged): (BlState, Seq[BlOutcome], Option[Long]) = {
      val day = e.tsUs / dayUs
      val s = if (day != s0.day) BlState(day, 0L, warned = false) else s0
      val c = s.count + 1
      if (c > threshold && !s.warned)
        (BlState(day, c, warned = true), Seq(BlOutcome("warn", e.tsUs)), None)
      else if (c > threshold) (BlState(day, c, warned = true), Nil, None)
      else (BlState(day, c, s.warned), Seq(BlOutcome("pass", e.tsUs)), None)
    }
    def onTimer(s: BlState, t: Long): (BlState, Seq[BlOutcome], Option[Long]) =
      (s, Nil, None)
  }
}
