package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` retention — the PRIMARY production path (r14 docs flip: Spark 4's state API, restart-from-checkpoint proven by TwsRestartSpec; the fMGWS twin remains as the parity reference). Boundary note for production users: TWS drops rows whose event time EQUALS the watermark where fMGWS admits them — see [[StepProcessor]]. Ported from the fMGWS twin (r13, closing out
  * VERDICT item 5 across the package): semantics live in
  * [[RetentionStream.step]] (the delta/retraction cohort fold with the
  * r12 maxOffset report horizon), shared verbatim with the fMGWS twin;
  * the fMGWS→TWS bookkeeping is [[StepProcessor]]. This is the
  * package's NoTimeout twin — `step` never returns a wake, so the
  * processor never arms a timer and the state bound comes from
  * `maxOffset`, not eviction. TwsPortsSpec runs the same micro-batch
  * schedule through both real engines (RocksDB provider);
  * WatermarkFuzzSpec drives this processor through the same 250
  * arbitrary-order schedules as the fMGWS twin under the STRONG
  * property (rebase retractions make out-of-order arrival exact).
  */
class RetentionProcessor(maxOffset: Long = Long.MaxValue)
    extends StepProcessor[(Long, java.sql.Timestamp), RetentionState,
      CohortDelta] {
  override protected def stateName: String = "retention"
  override protected def stateEncoder: Encoder[RetentionState] =
    Encoders.product[RetentionState]
  override protected def emptyState: RetentionState =
    RetentionState(Long.MaxValue, Nil)
  override protected def step(
      uid: Long, st: RetentionState,
      rows: Seq[(Long, java.sql.Timestamp)], wmUs: Long)
      : (Seq[CohortDelta], Option[RetentionState], Option[Long]) =
    RetentionStream.step(uid, st,
      rows.map { case (_, ts) => WeekEvent(uid, ts.getTime * 1000) },
      wmUs, maxOffset)
}

object RetentionStreamTws {

  /** Streaming cohort deltas over watermarked (user_id, ts) rows —
    * same contract as [[RetentionStream.deltasStreaming]], modern
    * state API. Requires the RocksDB state store provider. */
  def deltasStreaming(ds: Dataset[(Long, java.sql.Timestamp)],
                      maxOffset: Long = Long.MaxValue)
      : Dataset[CohortDelta] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new RetentionProcessor(maxOffset),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
