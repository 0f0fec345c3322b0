package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class FunnelEvent(user_id: Long, ts_us: Long, event_id: Long,
                       event_type: String)
case class FunnelSession(user_id: Long, session_start: Long, n_events: Long,
                         funnel_stage: Int)
/** Open-session funnel state: -1 marks an unreached stage. */
case class FunnelState(start: Long, last: Long, n: Long,
                       vTs: Long, cTs: Long, pTs: Long)

/** §2.K streaming twin of `e_funnel_sessions` (r10): the per-session
  * ordered funnel view → first click AFTER the view → first purchase
  * AFTER the click as an explicit per-user state machine over
  * `flatMapGroupsWithState` — the MATCH_RECOGNIZE-shaped op a
  * streaming engine runs with bounded state where the batch form uses
  * session windows + conditional mins.
  *
  * Equivalence to the batch plan (FunnelStreamSpec pins it on the
  * fixture): events fold in (ts, event_id) order; the first view IS
  * min(view ts); the first click strictly after it IS
  * min(click ts > v_ts) because later qualifying clicks are ≥ in sort
  * order; likewise for purchase. Gap rule matches the batch window:
  * a gap ≥ 30 min cuts the session.
  *
  * Scale notes ([[Sessionize]] conventions): state is ONE fixed-size
  * record per active user, the gap bounds retention, and the state
  * store shards by user_id — no corpus-sized state at any scale.
  */
object FunnelStream {
  val GapUs: Long = Sessionize.GapUs

  private def stageOf(s: FunnelState): Int =
    if (s.pTs >= 0) 3 else if (s.cTs >= 0) 2 else if (s.vTs >= 0) 1 else 0

  private def emit(uid: Long, s: FunnelState): FunnelSession =
    FunnelSession(uid, s.start, s.n, stageOf(s))

  private def fold(s: FunnelState, e: FunnelEvent): FunnelState = {
    var (v, c, p) = (s.vTs, s.cTs, s.pTs)
    e.event_type match {
      case "view"     if v < 0                       => v = e.ts_us
      case "click"    if c < 0 && v >= 0 && e.ts_us > v => c = e.ts_us
      case "purchase" if p < 0 && c >= 0 && e.ts_us > c => p = e.ts_us
      case _ =>
    }
    FunnelState(s.start, e.ts_us, s.n + 1, v, c, p)
  }

  private def fresh(ts: Long): FunnelState =
    FunnelState(ts, ts, 0, -1L, -1L, -1L)

  def process(flushAtEnd: Boolean)(
      uid: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelSession] = {
    var cur = state.getOption
    val out = Seq.newBuilder[FunnelSession]
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.last < GapUs =>
          cur = Some(fold(s, e))
        case Some(s) =>
          out += emit(uid, s)
          cur = Some(fold(fresh(e.ts_us), e))
        case None =>
          cur = Some(fold(fresh(e.ts_us), e))
      }
    }
    if (state.hasTimedOut || flushAtEnd) {
      cur.foreach(s => out += emit(uid, s))
      state.remove()
    } else {
      cur.foreach(state.update)
    }
    out.result().iterator
  }

  /** Batch funnel through the state API (one call per group, trailing
    * session flushed) — FunnelStreamSpec proves it equals the
    * `e_funnel_sessions` windowed plan row-for-row. */
  def funnelBatch(ds: Dataset[FunnelEvent]): Dataset[FunnelSession] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(flushAtEnd = true))
  }

  /** Streaming process: open sessions persist with an event-time
    * timeout at last + gap, emitting when the watermark passes the
    * session close ([[Sessionize.processStreaming]] semantics). */
  def processStreaming(uid: Long, events: Iterator[FunnelEvent],
                       state: GroupState[FunnelState])
      : Iterator[FunnelSession] = {
    val out = process(flushAtEnd = false)(uid, events, state)
    state.getOption match {
      case Some(s) =>
        // same clamp as Sessionize.processStreaming (r11): a session
        // whose gap horizon is already at-or-behind the watermark is
        // closed — emit it rather than set an in-the-past timeout
        val horizonMs = s.last / 1000 + GapUs / 1000
        if (horizonMs <= state.getCurrentWatermarkMs()) {
          state.remove()
          out ++ Iterator.single(emit(uid, s))
        } else {
          state.setTimeoutTimestamp(horizonMs)
          out
        }
      case None => out
    }
  }

  /** Streaming funnel over (user_id, ts, event_id, event_type) rows
    * whose `ts` is already watermarked; the watermarked column flows
    * into the stateful operator (conversion happens inside the group
    * function, the [[Sessionize.sessionsStreaming]] discipline). */
  def funnelStreaming(
      ds: Dataset[(Long, java.sql.Timestamp, Long, String)])
      : Dataset[FunnelSession] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[FunnelState]) =>
          processStreaming(uid,
            it.map { case (_, ts, eid, t) =>
              FunnelEvent(uid, ts.getTime * 1000, eid, t)
            }, state)
      }
  }
}
