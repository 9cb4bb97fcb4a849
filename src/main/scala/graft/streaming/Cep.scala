package graft.streaming

/** Parameterized CEP pattern combinators over [[EventTimeStateMachine]]
  * — the combinator surface SURVEY §3.3 promises: the two pattern
  * shapes the reference builds with Flink CEP become one-line machine
  * instantiations instead of hand-written keyed-state classes.
  *
  *  - [[Cep.nConsecutiveWithin]] = `Pattern.begin(p).next(p)…×n
  *    .within(T)` (reference loginmonitor/LoginFail_CEP.scala:31-48):
  *    strict contiguity (`next`), a non-matching event resets the run,
  *    and the match buffer slides so overlapping completions re-fire —
  *    exactly CEP's re-match on each new qualifying event.
  *  - [[Cep.aThenBWithin]] = `Pattern.begin(A).followedBy(B).within(T)`
  *    plus the timed-out-pattern side output (reference
  *    orderpay_detect/OrderTimeout_CEP.scala:35-39 with
  *    `OrderTimeoutOutput` tag): every A opens a pattern window, a B
  *    settles ALL open A's as `matchedTag`, and an A that ages past T
  *    emits `timeoutTag` at exactly aTime+T via an event-time timer.
  *    `bAloneTag` (optional) is the reference's data-loss alarm for a
  *    B with no open A (OrderTimeout_PF.scala:125-129).
  *
  * Both are generic in the caller's event type — predicates plus a
  * time accessor instead of a fixed record — and emit the uniform
  * [[Cep.PatternMatch]] relation. [[Machines.LoginFailMachine]] and
  * [[Machines.OrderTimeoutMachine]] are thin instances (their
  * reference-parity output rows are tag/shape renames), and any NEW
  * `begin…within` pattern a porting user needs is one line. Combinator
  * machines run in both physical modes like every machine: batch via
  * the secondary-sort runner, streaming via flatMapGroupsWithState.
  */
object Cep {

  /** One pattern completion: the span [startUs, endUs] and its tag. */
  case class PatternMatch(startUs: Long, endUs: Long, tag: String)

  /** N consecutive events matching `p` whose span fits in `withinUs`
    * (CEP strict contiguity). Match-driven: no timers. */
  def nConsecutiveWithin[E](n: Int, withinUs: Long,
                            p: E => Boolean, time: E => Long,
                            tag: String = "matched")
      : EventTimeStateMachine[E, List[Long], PatternMatch] = {
    require(n >= 1, "n must be >= 1")
    new EventTimeStateMachine[E, List[Long], PatternMatch] {
      def zero: List[Long] = Nil
      def eventTime(e: E): Long = time(e)
      def onEvent(s: List[Long], e: E): (List[Long], Seq[PatternMatch], Option[Long]) =
        if (!p(e)) (Nil, Nil, None) // contiguity break resets the run
        else {
          val ts = time(e)
          val buf = (s :+ ts).takeRight(n)
          val out = if (buf.size == n && ts - buf.head <= withinUs)
            Seq(PatternMatch(buf.head, ts, tag)) else Nil
          (buf, out, None)
        }
      def onTimer(s: List[Long], t: Long): (List[Long], Seq[PatternMatch], Option[Long]) =
        (s, Nil, None)
    }
  }

  /** A followed by B within T, with timeout extraction. State is the
    * open-A queue; the armed timer always guards the EARLIEST open A,
    * so state and timer are both O(open patterns) per key. */
  def aThenBWithin[E](withinUs: Long, isA: E => Boolean, isB: E => Boolean,
                      time: E => Long,
                      matchedTag: String = "matched",
                      timeoutTag: String = "timeout",
                      bAloneTag: Option[String] = None)
      : EventTimeStateMachine[E, List[Long], PatternMatch] =
    new EventTimeStateMachine[E, List[Long], PatternMatch] {
      def zero: List[Long] = Nil
      def eventTime(e: E): Long = time(e)
      def onEvent(s: List[Long], e: E): (List[Long], Seq[PatternMatch], Option[Long]) =
        if (isA(e)) { // open a pattern window
          val pend = s :+ time(e)
          (pend, Nil, Some(pend.head + withinUs))
        } else if (!isB(e)) // neither side: state and timer unchanged
          (s, Nil, s.headOption.map(_ + withinUs))
        else if (s.isEmpty)
          (Nil, bAloneTag.map(t => PatternMatch(time(e), time(e), t)).toSeq, None)
        else // B settles ALL open A's (each within T by construction: an
             // over-age A's timer fired before this B advanced the watermark)
          (Nil, s.map(a => PatternMatch(a, time(e), matchedTag)), None)
      def onTimer(s: List[Long], t: Long): (List[Long], Seq[PatternMatch], Option[Long]) = {
        val (expired, alive) = s.partition(_ + withinUs <= t)
        (alive, expired.map(a => PatternMatch(a, a + withinUs, timeoutTag)),
          alive.headOption.map(_ + withinUs))
      }
    }
}
