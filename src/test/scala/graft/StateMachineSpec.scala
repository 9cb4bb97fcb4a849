package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Machines, StateMachineRunner}
import graft.streaming.Machines._

/** Unit semantics of the four keyed state machines (reference
  * loginmonitor / orderpay_detect / market state functions) — crafted
  * sequences covering match, timeout, boundary-equality, and reset
  * paths, plus the partition runner's key-boundary handling. */
class StateMachineSpec extends AnyFunSuite {

  private def run[E, S, O](m: graft.streaming.EventTimeStateMachine[E, S, O], es: E*): List[O] =
    StateMachineRunner.runSorted(m, es.iterator).toList

  private def f(ts: Long, fail: Boolean = true) = Flagged(ts, ts, fail)

  // ---- LoginFailMachine ----------------------------------------------

  test("login: two fails within T warn") {
    val m = new LoginFailMachine(2, 2)
    assert(run(m, f(1), f(2)) == List((1L, 2L)))
  }

  test("login: success between fails resets the run") {
    val m = new LoginFailMachine(2, 2)
    assert(run(m, f(1), f(2, fail = false), f(3)).isEmpty)
  }

  test("login: fails farther apart than T do not warn") {
    val m = new LoginFailMachine(2, 2)
    assert(run(m, f(1), f(4)).isEmpty)
  }

  test("login: boundary span == T warns; run of 3 warns twice (sliding)") {
    val m = new LoginFailMachine(2, 2)
    assert(run(m, f(1), f(3)) == List((1L, 3L)))
    assert(run(m, f(1), f(2), f(3)) == List((1L, 2L), (2L, 3L)))
  }

  test("login: n=3 needs three consecutive fails within T") {
    val m = new LoginFailMachine(3, 10)
    assert(run(m, f(1), f(2), f(3)) == List((1L, 3L)))
    assert(run(m, f(1), f(2, fail = false), f(3), f(4)).isEmpty)
  }

  // ---- OrderTimeoutMachine -------------------------------------------

  private def ord = new OrderTimeoutMachine(15)
  private def create(ts: Long) = Flagged(ts, ts, flag = true)
  private def pay(ts: Long) = Flagged(ts, ts, flag = false)

  test("order: pay within T is paid; boundary == T is paid") {
    assert(run(ord, create(0), pay(10)) == List(OrderOutcome(0, 10, "paid")))
    assert(run(ord, create(0), pay(15)) == List(OrderOutcome(0, 15, "paid")))
  }

  test("order: pay after T: timeout fires at create+T, pay becomes data-loss alarm") {
    assert(run(ord, create(0), pay(16)) ==
      List(OrderOutcome(0, 15, "timeout"), OrderOutcome(16, 16, "paid_no_create")))
  }

  test("order: unpaid create times out at end of input") {
    assert(run(ord, create(7)) == List(OrderOutcome(7, 22, "timeout")))
  }

  test("order: lone pay is the reference's 'payed but no create log' alarm") {
    assert(run(ord, pay(5)) == List(OrderOutcome(5, 5, "paid_no_create")))
  }

  test("order: one pay settles all pending creates") {
    assert(run(ord, create(0), create(5), pay(12)).toSet ==
      Set(OrderOutcome(0, 12, "paid"), OrderOutcome(5, 12, "paid")))
  }

  // ---- TxMatchMachine ------------------------------------------------

  private def tx = new TxMatchMachine(5, 3) // pay waits 5, receipt waits 3
  private def p(ts: Long) = SideEvent(ts, isPay = true)
  private def r(ts: Long) = SideEvent(ts, isPay = false)

  test("tx: receipt within pay's wait matches (boundary inclusive)") {
    assert(run(tx, p(0), r(5)) == List(TxOutcome("matched", 0, 5)))
  }

  test("tx: receipt after pay's wait: both sides unmatched") {
    assert(run(tx, p(0), r(6)) ==
      List(TxOutcome("unmatched_pay", 0, 5), TxOutcome("unmatched_receipt", 6, 9)))
  }

  test("tx: pay within receipt's wait matches") {
    assert(run(tx, r(0), p(3)) == List(TxOutcome("matched", 3, 0)))
  }

  test("tx: pay after receipt's wait: both sides unmatched") {
    assert(run(tx, r(0), p(4)) ==
      List(TxOutcome("unmatched_receipt", 0, 3), TxOutcome("unmatched_pay", 4, 9)))
  }

  test("tx: lone sides time out at end of input") {
    assert(run(tx, p(1)) == List(TxOutcome("unmatched_pay", 1, 6)))
    assert(run(tx, r(1)) == List(TxOutcome("unmatched_receipt", 1, 4)))
  }

  // ---- BlacklistMachine ----------------------------------------------

  test("blacklist: warn exactly once past threshold, suppress after, reset daily") {
    val day = 86400L
    val m = new BlacklistMachine(2, day)
    val out = run(m, f(1), f(2), f(3), f(4), f(5), f(day + 1))
    assert(out == List(
      BlOutcome("pass", 1), BlOutcome("pass", 2), BlOutcome("warn", 3),
      BlOutcome("pass", day + 1))) // clicks 4,5 suppressed; next day resets
  }

  // ---- Cep combinators: a NEW pattern is one line --------------------

  import graft.streaming.Cep
  import graft.streaming.Cep.PatternMatch

  // the third pattern (beyond the two reference CEP jobs): cart
  // abandonment — a view (kind 1) followed by a purchase (kind 3)
  // within 20, anything else in between ignored (CEP `followedBy`
  // relaxed contiguity, which the named machines never exercise)
  private def abandon = Cep.aThenBWithin[Staged](20, _.kind == 1, _.kind == 3, _.tsUs,
    matchedTag = "converted", timeoutTag = "abandoned")

  test("cep one-liner: view→purchase within T converts; intervening clicks ignored") {
    assert(run(abandon, Staged(0, 1), Staged(5, 2), Staged(10, 3)) ==
      List(PatternMatch(0, 10, "converted")))
  }

  test("cep one-liner: unpurchased view abandons at exactly view+T") {
    // the click at 30 is neither A nor B: it must advance the watermark
    // and fire the timer armed at 0+20 WITHOUT disturbing state
    assert(run(abandon, Staged(0, 1), Staged(30, 2)) ==
      List(PatternMatch(0, 20, "abandoned")))
    assert(run(abandon, Staged(3, 1)) == List(PatternMatch(3, 23, "abandoned")))
  }

  test("cep one-liner: no bAlone tag means a lone B is silent") {
    assert(run(abandon, Staged(7, 3)).isEmpty)
  }

  test("cep one-liner: three consecutive high-value events within T") {
    val spike = Cep.nConsecutiveWithin[(Long, Long)](3, 10, _._2 > 100, _._1, tag = "spike")
    assert(run(spike, (1L, 200L), (2L, 300L), (3L, 150L)) ==
      List(PatternMatch(1, 3, "spike")))
    // a low-value event breaks strict contiguity (CEP `next`)
    assert(run(spike, (1L, 200L), (2L, 50L), (3L, 300L), (4L, 150L)).isEmpty)
  }

  test("cep instances: LoginFail and OrderTimeout equal their combinator forms") {
    val loginCep = Cep.nConsecutiveWithin[Flagged](2, 2, _.flag, _.tsUs)
    val evs = Seq(f(1), f(2), f(2, fail = false), f(3), f(4))
    assert(run(new LoginFailMachine(2, 2), evs: _*) ==
      run(loginCep, evs: _*).map(m => (m.startUs, m.endUs)))
    val ordCep = Cep.aThenBWithin[Flagged](15, _.flag, e => !e.flag, _.tsUs,
      matchedTag = "paid", timeoutTag = "timeout", bAloneTag = Some("paid_no_create"))
    val oevs = Seq(create(0), create(5), pay(12), create(20), pay(40), create(50))
    assert(run(new OrderTimeoutMachine(15), oevs: _*) ==
      run(ordCep, oevs: _*).map(m => OrderOutcome(m.startUs, m.endUs, m.tag)))
  }

  // ---- runPartition: key boundaries ----------------------------------

  test("runPartition flushes timers at key boundaries and partition end") {
    val m = new OrderTimeoutMachine(15)
    val rows = Iterator(
      ("a", create(0)), ("a", pay(10)), // key a: paid
      ("b", create(100)),               // key b: never paid -> flush at boundary
      ("c", create(200)))               // key c: flush at end of partition
    val out = StateMachineRunner.runPartition(m, rows).toList
    assert(out == List(
      ("a", OrderOutcome(0, 10, "paid")),
      ("b", OrderOutcome(100, 115, "timeout")),
      ("c", OrderOutcome(200, 215, "timeout"))))
  }

  test("runSorted fires timer before a later event, not before one at the timer ts") {
    val m = new OrderTimeoutMachine(15)
    // second create at exactly first's deadline: deadline not yet passed,
    // so nothing fires until the end-of-input flush
    assert(run(m, create(0), create(15)).toSet ==
      Set(OrderOutcome(0, 15, "timeout"), OrderOutcome(15, 30, "timeout")))
  }
}
