package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming execution of [[EventTimeStateMachine]]s: the same
  * transition functions the batch runner drives, hosted in
  * `flatMapGroupsWithState` with `GroupState` + event-time timeout
  * (SURVEY §2.9 keyed state + timers → GroupState mapping).
  *
  * Timer fidelity notes:
  *  - machine timers are epoch micros; GroupState timeouts are millis —
  *    armed at ceil(timer/1ms), so a wakeup can arrive "early" by <1 ms
  *    of event time; the wrapper then just re-arms (no spurious fire).
  *  - Flink can hold many timers per key; the machine contract is ONE
  *    armed timer (machines encode multiple deadlines in state and
  *    re-arm, see OrderTimeoutMachine), which maps 1:1 onto GroupState.
  *  - events inside a micro-batch are sorted by event time before
  *    processing; cross-batch order is the source's responsibility
  *    (the reference assumes ascending timestamps in every job).
  */
object StatefulStreams {

  /** Serialized-per-key state: machine state + the armed timer (µs). */
  case class MachineState[S](s: S, timer: Option[Long])

  /** Run a machine under flatMapGroupsWithState (append mode).
    * `toEvent` extracts the machine event from the grouped value INSIDE
    * the stateful function — the grouped value must keep the
    * watermarked event-time column (Spark requires the watermark
    * attribute to reach the stateful operator; a `mapValues` that
    * projects it away fails analysis). `toOut` re-attaches the key. */
  def runStreaming[K, V, E, S, O, R: Encoder](
      grouped: KeyValueGroupedDataset[K, V],
      m: EventTimeStateMachine[E, S, O])(
      toEvent: V => E)(
      toOut: (K, O) => R): Dataset[R] = {
    implicit val stateEnc: Encoder[MachineState[S]] = Encoders.kryo[MachineState[S]]
    grouped.flatMapGroupsWithState[MachineState[S], R](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V], state: GroupState[MachineState[S]]) =>
        val events = values.map(toEvent)
        var st: MachineState[S] = state.getOption.getOrElse(MachineState(m.zero, None))
        val out = scala.collection.mutable.ArrayBuffer[O]()
        def fire(bound: Long): Unit = // strict <, matching the batch runner
          while (st.timer.exists(_ < bound)) {
            val t = st.timer.get
            val (s2, os, t2) = m.onTimer(st.s, t)
            st = MachineState(s2, t2)
            out ++= os
          }
        if (state.hasTimedOut) {
          // watermark (ms→µs) passed the armed timeout: fire everything due
          fire(state.getCurrentWatermarkMs() * 1000L + 1)
        } else {
          events.toList.sortBy(e => m.eventTime(e)).foreach { e =>
            fire(m.eventTime(e))
            val (s2, os, t2) = m.onEvent(st.s, e)
            st = MachineState(s2, t2)
            out ++= os
          }
        }
        state.update(st)
        st.timer.foreach { t =>
          // ceil to ms and stay strictly above the current watermark
          state.setTimeoutTimestamp(math.max(t / 1000L + 1, state.getCurrentWatermarkMs() + 1))
        }
        out.iterator.map(o => toOut(key, o))
    }
  }
}
