package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The shared `flatMapGroupsWithState` → `transformWithState`
  * bookkeeping (r13, VERDICT item 5 widened): every fMGWS twin in this
  * package is already factored into a PURE step function
  * `(key, state, events, watermark) → (emits, state', wake)`, so the
  * port to Spark 4's StatefulProcessor API is the same four-line
  * mapping each time — this base class holds it ONCE:
  *
  *  - the GroupState value      → a named `ValueState[S]`
  *  - `setTimeoutTimestamp(at)` → `registerTimer(at)` with
  *    delete-then-register bookkeeping (fMGWS keeps ONE armed timeout
  *    per key and every set replaces it; TWS timers accumulate, so the
  *    port maintains the one-armed-wake invariant itself —
  *    `listTimers` is authoritative, no shadow state)
  *  - `hasTimedOut` invocations → `handleExpiredTimer`
  *  - `getCurrentWatermarkMs`   → `timerValues.getCurrentWatermarkInMs`
  *
  * Concrete processors ([[AsofProcessor]], [[SessionProcessor]],
  * [[FunnelProcessor]]) supply only the state name, encoder, empty
  * value, and a delegation to their twin's step — semantics stay in
  * exactly one place per operator, so the two state-API paths cannot
  * drift. WatermarkFuzzSpec drives the real processor classes through
  * an in-memory StatefulProcessorHandle over the same arbitrary-order
  * schedules as the fMGWS twins; TwsPortsSpec runs both REAL engines
  * (RocksDB provider) on identical micro-batch schedules.
  *
  * The step contract this relies on (proven per twin by the fuzz
  * property): a defined `wake` implies a defined `state'` and is
  * provably later than the current watermark — so a surviving key has
  * exactly one live timer (or none, for the NoTimeout twins such as
  * retention whose state must survive arbitrary idle gaps) and a
  * cleared key has none.
  *
  * ONE measured engine difference the port does NOT hide (pinned by
  * TwsPortsSpec's boundary test, r13): the TWS late-row filter is
  * STRICT — a row whose event time EQUALS the current watermark is
  * dropped, where fMGWS admits it (even event-time 0 against the
  * initial watermark 0). Spark's own engines differ at equality;
  * rows strictly inside the watermark behave identically on both.
  */
abstract class StepProcessor[I, S, O] extends StatefulProcessor[Long, I, O] {

  protected def stateName: String
  protected def stateEncoder: Encoder[S]
  protected def emptyState: S
  /** The twin's pure step, watermark in event-time MICROSECONDS (the
    * package convention); returned wake instant in milliseconds. */
  protected def step(key: Long, st: S, rows: Seq[I], wmUs: Long)
      : (Seq[O], Option[S], Option[Long])

  @transient private var st: ValueState[S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[S](stateName, stateEncoder, TTLConfig.NONE)

  private def invoke(key: Long, rows: Seq[I], wmUs: Long): Iterator[O] = {
    val cur = if (st.exists()) st.get() else emptyState
    val (out, next, wake) = step(key, cur, rows, wmUs)
    val armed = getHandle.listTimers().toSeq
    next match {
      case None =>
        st.clear()
        armed.foreach(getHandle.deleteTimer)
      case Some(s2) =>
        st.update(s2)
        wake match {
          case Some(at) =>
            if (!armed.contains(at)) {
              armed.foreach(getHandle.deleteTimer)
              getHandle.registerTimer(at)
            }
          case None => // surviving state with no wake (NoTimeout twins)
            armed.foreach(getHandle.deleteTimer)
        }
    }
    out.iterator
  }

  override def handleInputRows(key: Long, rows: Iterator[I],
                               timers: TimerValues): Iterator[O] =
    invoke(key, rows.toSeq, timers.getCurrentWatermarkInMs() * 1000)

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[O] =
    invoke(key, Nil, timers.getCurrentWatermarkInMs() * 1000)
}
