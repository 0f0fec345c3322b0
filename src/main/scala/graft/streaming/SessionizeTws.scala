package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` sessionize — the PRIMARY production path (r14 docs flip: Spark 4's state API, restart-from-checkpoint proven by TwsRestartSpec; the fMGWS twin remains as the parity reference). Boundary note for production users: TWS drops rows whose event time EQUALS the watermark where fMGWS admits them — see [[StepProcessor]]. Ported from the fMGWS twin (r13, widening
  * VERDICT item 5 beyond the as-of pilot): semantics live in
  * [[Sessionize.step]] (the r12 buffer-until-watermark + ordered
  * replay design), shared verbatim with the fMGWS twin; the fMGWS→TWS
  * bookkeeping is [[StepProcessor]]. TwsPortsSpec runs the same
  * micro-batch schedule through both real engines (RocksDB provider);
  * WatermarkFuzzSpec drives this processor through the same 250
  * arbitrary-order schedules as the fMGWS twin.
  */
class SessionProcessor
    extends StepProcessor[(Long, java.sql.Timestamp), SessionBufState,
      Session] {
  override protected def stateName: String = "session"
  override protected def stateEncoder: Encoder[SessionBufState] =
    Encoders.product[SessionBufState]
  override protected def emptyState: SessionBufState =
    SessionBufState(-1L, 0L, 0L, Nil)
  override protected def step(
      uid: Long, st: SessionBufState,
      rows: Seq[(Long, java.sql.Timestamp)], wmUs: Long)
      : (Seq[Session], Option[SessionBufState], Option[Long]) =
    Sessionize.step(uid, st, rows.map(_._2.getTime * 1000), wmUs)
}

object SessionizeTws {

  /** Streaming sessionization over watermarked (user_id, ts) rows —
    * same contract as [[Sessionize.sessionsStreaming]], modern state
    * API. Requires the RocksDB state store provider. */
  def sessionsStreaming(
      ds: Dataset[(Long, java.sql.Timestamp)]): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
