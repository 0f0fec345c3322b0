package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user_id: Long, ts_us: Long)
case class Session(user_id: Long, first_us: Long, last_us: Long, n: Long)
case class SessionState(first_us: Long, last_us: Long, n: Long)

/** §2.K `k_stateful_sessionize` — explicit per-key session state machine
  * via `flatMapGroupsWithState`, the one op needing the state API
  * (everything else in StreamingOps is expressible as windowed aggs).
  *
  * The same function body serves batch (single invocation per group,
  * state starts empty and the trailing session is flushed on iterator
  * exhaustion via the timeout path being irrelevant) and streaming
  * (micro-batches carry state forward; ProcessingTimeTimeout flushes
  * idle sessions).
  *
  * Scale notes: state is one (first, last, n) triple per active user —
  * the 30-min gap bounds retention; at 100 TB the state store shards by
  * user_id across executors and RocksDB-backed state keeps memory flat.
  */
object Sessionize {
  val GapUs: Long = 30L * 60 * 1000000

  def process(flushAtEnd: Boolean)(
      uid: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    var cur = state.getOption
    val out = Seq.newBuilder[Session]
    events.toSeq.sortBy(_.ts_us).foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.last_us < GapUs =>
          cur = Some(SessionState(s.first_us, e.ts_us, s.n + 1))
        case Some(s) =>
          out += Session(uid, s.first_us, s.last_us, s.n)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    if (state.hasTimedOut || flushAtEnd) {
      cur.foreach(s => out += Session(uid, s.first_us, s.last_us, s.n))
      state.remove()
    } else {
      cur.foreach(state.update)
    }
    out.result().iterator
  }

  /** Batch sessionization through the state API (one call per group,
    * trailing session flushed). */
  def sessionsBatch(ds: Dataset[SessionEvent]): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(flushAtEnd = true))
  }

  /** Streaming process: same fold, but open sessions persist in the
    * state store with an event-time timeout at last_us + gap — the
    * session is emitted when the watermark passes its close, exactly
    * session_window's semantics. */
  def processStreaming(uid: Long, events: Iterator[SessionEvent],
                       state: GroupState[SessionState]): Iterator[Session] = {
    val out = process(flushAtEnd = false)(uid, events, state)
    state.getOption match {
      case Some(s) =>
        // Spark filters late rows against the PREVIOUS batch's
        // watermark but validates timeouts against the CURRENT one, so
        // a watermark jump larger than the gap inside one batch can
        // leave last+gap in the past (the r11 AttributionStream
        // lesson). Such a session is already closed by the watermark:
        // emit it NOW instead of setting an invalid timeout.
        val horizonMs = s.last_us / 1000 + GapUs / 1000
        if (horizonMs <= state.getCurrentWatermarkMs()) {
          state.remove()
          out ++ Iterator.single(Session(uid, s.first_us, s.last_us, s.n))
        } else {
          state.setTimeoutTimestamp(horizonMs)
          out
        }
      case None => out
    }
  }

  /** Streaming sessionization over (user_id, ts) rows whose `ts` is
    * already watermarked; timeouts flush idle sessions. The watermarked
    * column must flow INTO the stateful operator (mapping it away first
    * voids the watermark), so conversion happens inside the group
    * function. */
  def sessionsStreaming(ds: Dataset[(Long, java.sql.Timestamp)]): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          processStreaming(uid,
            it.map { case (_, ts) => SessionEvent(uid, ts.getTime * 1000) },
            state)
      }
  }
}
