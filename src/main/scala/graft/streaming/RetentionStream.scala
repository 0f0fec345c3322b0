package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class WeekEvent(user_id: Long, ts_us: Long)
/** One increment (+1) or retraction (−1) of a cohort-table cell. */
case class CohortDelta(cohort_week: Long, week_offset: Long, delta: Long)
/** The user's cohort week and every active week seen so far. */
case class RetentionState(cohortWk: Long, weeks: List[Long])

/** §2.K streaming twin of `e_retention_cohorts` (r11): the cohort
  * retention table maintained as an incremental per-user fold over
  * `flatMapGroupsWithState`, emitting CELL DELTAS that aggregate to
  * exactly the batch table — the classic "changelog of an aggregate"
  * streaming shape, where the batch form is a distinct + two joins.
  *
  * Per user the state is (cohort week = min week ever seen, set of
  * active weeks). A new (user, week) pair emits +1 for cell
  * (cohort, week − cohort). An out-of-order event that REVEALS AN
  * EARLIER COHORT (week < cohort) rebases: −1 retractions for every
  * cell emitted under the stale cohort, then +1 under the true one —
  * so the aggregated table converges to the batch answer under any
  * arrival order (RetentionStreamSpec shuffles arrival and pins
  * equality; [[cohortTable]] is the tiny downstream aggregation that
  * turns deltas into the `e_retention_cohorts` output schema).
  *
  * Scale notes: state is one long + one long per ACTIVE WEEK per user
  * (a year of weekly activity = ~440 bytes); no timeout, because a
  * user's cohort must survive arbitrary idle gaps — the real-world
  * bound is the report horizon (cap `weeks` at the max offset the
  * table serves, after which new weeks can't change any served cell).
  * The delta stream is tiny: at most one row per NEW (user, week)
  * pair, so downstream aggregation state is cohort×offset-sized.
  */
object RetentionStream {
  val WeekUs: Long = 604800000000L

  def process(uid: Long, events: Iterator[WeekEvent],
              state: GroupState[RetentionState]): Iterator[CohortDelta] = {
    val wks = events.map(_.ts_us / WeekUs).toSeq.distinct.sorted
    if (wks.isEmpty) return Iterator.empty
    val out = Seq.newBuilder[CohortDelta]
    var (cw, seen) = state.getOption
      .map(s => (s.cohortWk, s.weeks.toSet))
      .getOrElse((Long.MaxValue, Set.empty[Long]))
    val fresh = wks.filterNot(seen)
    if (fresh.nonEmpty) {
      val minNew = fresh.head
      if (seen.isEmpty) cw = minNew
      else if (minNew < cw) {
        // rebase: the true cohort is earlier than every cell emitted so
        // far — retract them all and re-emit under the real cohort
        seen.foreach(w => out += CohortDelta(cw, w - cw, -1L))
        cw = minNew
        seen.foreach(w => out += CohortDelta(cw, w - cw, 1L))
      }
      fresh.foreach { w =>
        seen += w
        out += CohortDelta(cw, w - cw, 1L)
      }
      state.update(RetentionState(cw, seen.toList))
    }
    out.result().iterator
  }

  /** Batch fold through the state API — RetentionStreamSpec proves
    * [[cohortTable]] over these deltas equals the
    * `e_retention_cohorts` plan row-for-row. */
  def deltasBatch(ds: Dataset[WeekEvent]): Dataset[CohortDelta] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process)
  }

  /** Streaming fold over watermarked (user_id, ts) rows. NoTimeout by
    * design — see the scaladoc's state-retention note. */
  def deltasStreaming(ds: Dataset[(Long, java.sql.Timestamp)])
      : Dataset[CohortDelta] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[RetentionState]) =>
          process(uid,
            it.map { case (_, ts) => WeekEvent(uid, ts.getTime * 1000) },
            state)
      }
  }

  /** Deltas → the `e_retention_cohorts` output schema. Cells whose
    * deltas cancel to ≤0 (fully retracted) drop out, exactly as they
    * never existed in the batch table. */
  def cohortTable(deltas: DataFrame): DataFrame = {
    val cells = deltas.groupBy("cohort_week", "week_offset")
      .agg(sum("delta").as("n_active"))
      .filter(col("n_active") > 0)
    // fresh aliases on the size side: cells/sizes share lineage, and
    // un-aliased join keys trip the conflicting-attribute check when
    // the deltas come from a streaming memory sink
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week").as("size_week"),
        col("n_active").as("cohort_size"))
    cells.join(broadcast(sizes), col("cohort_week") === col("size_week"))
      .select(col("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        expr("n_active * 10000 div cohort_size").as("retention_bp"))
      .orderBy("cohort_week", "week_offset")
  }
}
