package graft.streaming

/** Event-time keyed state machine — the one genuinely custom layer of
  * the engine (SURVEY.md §2.7–§2.9): everything the reference builds as
  * a Flink `KeyedProcessFunction`/`CoProcessFunction`/CEP pattern is a
  * machine here. One abstraction, two physical modes:
  *
  *  - batch: [[StateMachineRunner.runPartition]] over a Dataset that was
  *    `repartition(key).sortWithinPartitions(key, time)` — secondary
  *    sort. Memory is O(state) per key, never O(events) per key: Spark's
  *    external sort handles spilling, the runner streams the iterator.
  *    This is the 100 TB-safe shape (no per-key buffering, one shuffle).
  *  - streaming: `flatMapGroupsWithState` with `GroupState[S]` +
  *    event-time timeout (graft.streaming.StatefulStreams), sharing the
  *    same transition functions.
  *
  * Timer semantics mirror Flink event-time timers under ascending
  * watermarks (reference assigns ascending timestamps in every job, see
  * SURVEY §2.9): an armed timer with ts T fires as soon as the watermark
  * passes T — in sorted batch, immediately before the first event whose
  * time is > T; end of input is watermark=+∞ and fires everything
  * pending. `onEvent`/`onTimer` return the COMPLETE new timer state
  * (None disarms); a machine that wants to keep its timer must return it
  * again.
  */
trait EventTimeStateMachine[E, S, O] extends Serializable {
  /** Initial state for a fresh key. */
  def zero: S

  /** Event time of an event (epoch micros by convention). */
  def eventTime(e: E): Long

  /** Process one event: (new state, outputs, timer to arm or None). */
  def onEvent(s: S, e: E): (S, Seq[O], Option[Long])

  /** Timer fired (watermark passed timerTs): (new state, outputs, next timer). */
  def onTimer(s: S, timerTs: Long): (S, Seq[O], Option[Long])
}

object StateMachineRunner {

  /** Run a machine over one key's time-sorted events (batch semantics:
    * timers < incoming event time fire first; +∞ flush at end). */
  def runSorted[E, S, O](m: EventTimeStateMachine[E, S, O],
                         events: Iterator[E]): Iterator[O] = {
    val out = scala.collection.mutable.ArrayBuffer[O]()
    var s = m.zero
    var timer: Option[Long] = None
    def fire(wm: Long): Unit =
      while (timer.exists(_ < wm)) {
        val t = timer.get
        val (s2, os, t2) = m.onTimer(s, t)
        require(!t2.exists(_ <= t), s"timer must advance past $t")
        s = s2; out ++= os; timer = t2
      }
    events.foreach { e =>
      fire(m.eventTime(e))
      val (s2, os, t2) = m.onEvent(s, e)
      s = s2; out ++= os; timer = t2
    }
    fire(Long.MaxValue)
    out.iterator
  }

  /** Streaming-groups runner for a partition whose rows are sorted by
    * (key, time): detects key boundaries, runs the machine with O(state)
    * memory, flushes timers at each key change and at partition end.
    * Use after `ds.repartition(keyCols).sortWithinPartitions(keyCols,
    * timeCols)` — the scale-safe secondary-sort pattern. */
  def runPartition[K, E, S, O](m: EventTimeStateMachine[E, S, O],
                               rows: Iterator[(K, E)]): Iterator[(K, O)] =
    new Iterator[(K, O)] {
      private val in = rows.buffered
      private val pending = scala.collection.mutable.Queue[(K, O)]()
      private var cur: Option[K] = None
      private var s: S = m.zero
      private var timer: Option[Long] = None

      private def fire(k: K, wm: Long): Unit =
        while (timer.exists(_ < wm)) {
          val t = timer.get
          val (s2, os, t2) = m.onTimer(s, t)
          require(!t2.exists(_ <= t), s"timer must advance past $t")
          s = s2; timer = t2
          os.foreach(o => pending.enqueue((k, o)))
        }

      private def advance(): Unit = {
        while (pending.isEmpty && in.hasNext) {
          val (k, e) = in.head
          if (cur.isEmpty || cur.contains(k)) {
            in.next()
            cur = Some(k)
            fire(k, m.eventTime(e))
            val (s2, os, t2) = m.onEvent(s, e)
            s = s2; timer = t2
            os.foreach(o => pending.enqueue((k, o)))
          } else { // key boundary: flush previous key at watermark +∞
            fire(cur.get, Long.MaxValue)
            cur = None; s = m.zero; timer = None
          }
        }
        if (pending.isEmpty && !in.hasNext && cur.isDefined) {
          fire(cur.get, Long.MaxValue)
          cur = None
        }
      }

      override def hasNext: Boolean = { advance(); pending.nonEmpty }
      override def next(): (K, O) = { advance(); pending.dequeue() }
    }
}
