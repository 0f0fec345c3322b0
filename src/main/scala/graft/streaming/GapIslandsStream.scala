package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class DayEvent(user_id: Long, ts_us: Long)
case class Island(user_id: Long, island_start: Long, island_end: Long,
                  island_len: Long)
/** Every island of the user that the watermark has NOT yet proven
  * maximal, oldest-first, as flattened [s0, e0, s1, e1, …] (the
  * product encoder handles flat Seq[Long] without a nested-type
  * wrapper). Bounded: intervals ahead of the watermark span at most
  * the watermark delay in days, plus the one open run. */
case class IslandState(flat: Seq[Long]) {
  def intervals: List[(Long, Long)] =
    flat.grouped(2).map { case Seq(a, b) => (a, b) }.toList
}
object IslandState {
  def of(ivs: List[(Long, Long)]): IslandState =
    IslandState(ivs.flatMap { case (a, b) => Seq(a, b) })
}

/** §2.K streaming twin of `e_window_gap_islands` (r11): maximal runs
  * of consecutive active days maintained as per-user interval-set
  * state over `flatMapGroupsWithState`, instead of the batch
  * row_number-difference window.
  *
  * Equivalence to the batch plan (GapIslandsStreamSpec pins it): an
  * island is fully determined by the SET of active days, and
  * [[mergeDays]] folds each batch's distinct days into the interval
  * set exactly as interval union would. An island is emitted ONLY
  * when the watermark passes `end + 2 days` — the instant no day
  * ≤ end+1 can still arrive, so the run is provably maximal. Islands
  * ahead of that horizon stay in state, because a late-but-admissible
  * day can still extend them or MERGE two of them (the r11
  * code-review counterexample: days 10 then 8 then 9 under a 3-day
  * watermark delay must produce ONE island (8,10) — an eager emit of
  * (8,8) in append mode could never be retracted).
  *
  * Scale notes: state is ≤ (watermark-delay-in-days + 1) intervals of
  * two longs per active user; the event-time timeout at the OLDEST
  * unproven horizon bounds retention, and the state store shards by
  * user_id. Days beyond the watermark are dropped by the operator's
  * late-row filter — standard append-mode semantics.
  */
object GapIslandsStream {
  val DayUs: Long = 86400000000L

  /** Interval union of the existing set with a batch of (not
    * necessarily sorted, possibly duplicate) day indices →
    * merged interval set, oldest-first. */
  private[graft] def mergeDays(ivs0: List[(Long, Long)],
                               days: Seq[Long]): List[(Long, Long)] = {
    val ivs = (ivs0 ++ days.distinct.map(d => (d, d))).sortBy(_._1)
    ivs.foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: rest, (s2, e2)) if s2 <= e + 1 =>
        (s, math.max(e, e2)) :: rest
      case (acc, iv) => iv :: acc
    }.reverse
  }

  private def isl(uid: Long, iv: (Long, Long)): Island =
    Island(uid, iv._1, iv._2, iv._2 - iv._1 + 1)

  /** Horizon at which the watermark proves `iv` maximal: the first
    * instant after every possible day ≤ end+1. */
  private def horizonMs(iv: (Long, Long)): Long =
    (iv._2 + 2) * (DayUs / 1000)

  def process(flushAtEnd: Boolean)(
      uid: Long, events: Iterator[DayEvent],
      state: GroupState[IslandState]): Iterator[Island] = {
    val days = events.map(_.ts_us / DayUs).toSeq
    val merged = mergeDays(
      state.getOption.map(_.intervals).getOrElse(Nil), days)
    val out = Seq.newBuilder[Island]
    if (flushAtEnd) {
      // batch mode: everything is final at iterator exhaustion
      merged.foreach(iv => out += isl(uid, iv))
      state.remove()
    } else {
      // data and timeout invocations share this path: emit what the
      // watermark has proven maximal, keep the rest
      val wm = state.getCurrentWatermarkMs()
      val (proven, live) = merged.partition(horizonMs(_) <= wm)
      proven.foreach(iv => out += isl(uid, iv))
      if (live.isEmpty) state.remove()
      else state.update(IslandState.of(live))
    }
    out.result().iterator
  }

  /** The PURE streaming fold step, shared by the fMGWS twin and the
    * `transformWithState` port ([[GapIslandsStreamTws]], r13) — one
    * implementation, so the two state APIs cannot drift on semantics.
    * Watermark in µs (the [[StepProcessor]] convention); returns
    * (emitted islands, surviving state or None, wake-at ms — the
    * oldest unproven horizon, > the watermark by construction of the
    * partition). */
  private[streaming] def step(uid: Long, st: IslandState,
                              arrived: Seq[DayEvent], wmUs: Long)
      : (Seq[Island], Option[IslandState], Option[Long]) = {
    val merged = mergeDays(st.intervals, arrived.map(_.ts_us / DayUs))
    val wm = wmUs / 1000
    val (proven, live) = merged.partition(horizonMs(_) <= wm)
    val out = proven.map(isl(uid, _))
    if (live.isEmpty) (out, None, None)
    else (out, Some(IslandState.of(live)), Some(live.map(horizonMs).min))
  }

  /** Batch islands through the state API (one call per group, all
    * intervals flushed) — GapIslandsStreamSpec proves it equals the
    * `e_window_gap_islands` windowed plan row-for-row. */
  def islandsBatch(ds: Dataset[DayEvent]): Dataset[Island] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(flushAtEnd = true))
  }

  /** Streaming process: emit the islands the watermark has proven
    * maximal, keep the rest, and wake again at the oldest surviving
    * horizon (always > watermark by construction of the partition, so
    * the timeout is never in the past). */
  def processStreaming(uid: Long, events: Iterator[DayEvent],
                       state: GroupState[IslandState]): Iterator[Island] = {
    val st = state.getOption.getOrElse(IslandState(Nil))
    val (out, next, wake) = step(uid, st, events.toSeq,
      state.getCurrentWatermarkMs() * 1000)
    next match {
      case None => state.remove()
      case Some(s2) =>
        state.update(s2)
        state.setTimeoutTimestamp(wake.get)
    }
    out.iterator
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
