package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class DayEvent(user_id: Long, ts_us: Long)
case class Island(user_id: Long, island_start: Long, island_end: Long,
                  island_len: Long)
/** The user's one OPEN island (the newest run of consecutive days). */
case class IslandState(start: Long, end: Long)

/** §2.K streaming twin of `e_window_gap_islands` (r11): maximal runs
  * of consecutive active days maintained as per-user interval state
  * over `flatMapGroupsWithState`, instead of the batch
  * row_number-difference window.
  *
  * Equivalence to the batch plan (GapIslandsStreamSpec pins it on the
  * fixture): an island is fully determined by the SET of active days,
  * and [[mergeDays]] folds each batch's distinct days into the open
  * interval exactly as interval union would — a day adjacent to or
  * inside the open run extends it, a gap > 1 day closes it. Closed
  * islands emit immediately; the open island emits when the watermark
  * passes `end + 2 days` (no event with day ≤ end+1 can still arrive,
  * so the run is provably maximal — the same argument that makes the
  * batch result exact). A stale open island whose horizon is already
  * at-or-behind the watermark emits in the data path rather than
  * setting an in-the-past timeout (the AttributionStream r11 lesson).
  *
  * Scale notes: state is TWO longs per user with an open streak; the
  * event-time timeout bounds retention to the streak horizon, and the
  * state store shards by user_id. Late days inside the watermark merge
  * correctly (they arrive before the island can time out); days beyond
  * the watermark are dropped by the operator's late-row filter —
  * standard append-mode semantics.
  */
object GapIslandsStream {
  val DayUs: Long = 86400000000L

  /** Merge the open interval with a batch of (not necessarily sorted,
    * possibly duplicate) day indices → (closed islands oldest-first,
    * new open island). Pure interval union over {open} ∪ days. */
  private[graft] def mergeDays(open: Option[(Long, Long)],
                                   days: Seq[Long])
      : (List[(Long, Long)], Option[(Long, Long)]) = {
    val ivs = (open.toList ++ days.distinct.sorted.map(d => (d, d)))
      .sortBy(_._1)
    val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: rest, (s2, e2)) if s2 <= e + 1 =>
        (s, math.max(e, e2)) :: rest
      case (acc, iv) => iv :: acc
    }.reverse
    (merged.dropRight(1), merged.lastOption)
  }

  private def isl(uid: Long, iv: (Long, Long)): Island =
    Island(uid, iv._1, iv._2, iv._2 - iv._1 + 1)

  def process(flushAtEnd: Boolean)(
      uid: Long, events: Iterator[DayEvent],
      state: GroupState[IslandState]): Iterator[Island] = {
    val days = events.map(_.ts_us / DayUs).toSeq
    val open0 = state.getOption.map(s => (s.start, s.end))
    val (closed, open) = mergeDays(open0, days)
    val out = Seq.newBuilder[Island]
    closed.foreach(iv => out += isl(uid, iv))
    if (state.hasTimedOut || flushAtEnd) {
      open.foreach(iv => out += isl(uid, iv))
      state.remove()
    } else {
      open.foreach { case (s, e) => state.update(IslandState(s, e)) }
    }
    out.result().iterator
  }

  /** Batch islands through the state API (one call per group, open
    * island flushed) — GapIslandsStreamSpec proves it equals the
    * `e_window_gap_islands` windowed plan row-for-row. */
  def islandsBatch(ds: Dataset[DayEvent]): Dataset[Island] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(flushAtEnd = true))
  }

  /** Streaming process: the open island persists with an event-time
    * timeout at `(end + 2) · day` — the instant the watermark proves
    * no day ≤ end+1 can arrive. If that instant already passed, the
    * island is closed NOW: emit and drop the state. */
  def processStreaming(uid: Long, events: Iterator[DayEvent],
                       state: GroupState[IslandState]): Iterator[Island] = {
    val out = process(flushAtEnd = false)(uid, events, state)
    state.getOption match {
      case Some(s) =>
        val horizonMs = (s.end + 2) * (DayUs / 1000)
        if (horizonMs <= state.getCurrentWatermarkMs()) {
          state.remove()
          out ++ Iterator.single(isl(uid, (s.start, s.end)))
        } else {
          state.setTimeoutTimestamp(horizonMs)
          out
        }
      case None => out
    }
  }

  /** Streaming islands over watermarked (user_id, ts) rows. */
  def islandsStreaming(ds: Dataset[(Long, java.sql.Timestamp)])
      : Dataset[Island] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[IslandState]) =>
          processStreaming(uid,
            it.map { case (_, ts) => DayEvent(uid, ts.getTime * 1000) },
            state)
      }
  }
}
