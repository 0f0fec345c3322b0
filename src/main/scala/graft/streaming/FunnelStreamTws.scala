package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` funnel — the PRIMARY production path (r14 docs flip: Spark 4's state API, restart-from-checkpoint proven by TwsRestartSpec; the fMGWS twin remains as the parity reference). Boundary note for production users: TWS drops rows whose event time EQUALS the watermark where fMGWS admits them — see [[StepProcessor]]. Ported from the fMGWS twin (r13, widening VERDICT
  * item 5 beyond the as-of pilot): semantics live in
  * [[FunnelStream.step]] (the r12 buffer-until-watermark + ordered
  * replay through the stage machine), shared verbatim with the fMGWS
  * twin; the fMGWS→TWS bookkeeping is [[StepProcessor]]. TwsPortsSpec
  * runs the same micro-batch schedule through both real engines
  * (RocksDB provider); WatermarkFuzzSpec drives this processor through
  * the same 250 arbitrary-order schedules as the fMGWS twin.
  */
class FunnelProcessor
    extends StepProcessor[(Long, java.sql.Timestamp, Long, String),
      FunnelBufState, FunnelSession] {
  override protected def stateName: String = "funnel"
  override protected def stateEncoder: Encoder[FunnelBufState] =
    Encoders.product[FunnelBufState]
  override protected def emptyState: FunnelBufState =
    FunnelBufState(-1L, 0L, 0L, -1L, -1L, -1L, Nil, Nil, Nil)
  override protected def step(
      uid: Long, st: FunnelBufState,
      rows: Seq[(Long, java.sql.Timestamp, Long, String)], wmUs: Long)
      : (Seq[FunnelSession], Option[FunnelBufState], Option[Long]) =
    FunnelStream.step(uid, st,
      rows.map { case (_, ts, eid, t) =>
        FunnelEvent(uid, ts.getTime * 1000, eid, t) },
      wmUs)
}

object FunnelStreamTws {

  /** Streaming funnel over watermarked (user_id, ts, event_id,
    * event_type) rows — same contract as
    * [[FunnelStream.funnelStreaming]], modern state API. Requires the
    * RocksDB state store provider. */
  def funnelStreaming(
      ds: Dataset[(Long, java.sql.Timestamp, Long, String)])
      : Dataset[FunnelSession] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new FunnelProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
