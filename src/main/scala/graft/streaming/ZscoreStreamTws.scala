package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` z-score — the PRIMARY production path (r14 docs flip: Spark 4's state API, restart-from-checkpoint proven by TwsRestartSpec; the fMGWS twin remains as the parity reference). Boundary note for production users: TWS drops rows whose event time EQUALS the watermark where fMGWS admits them — see [[StepProcessor]]. Ported from the fMGWS twin (r13, closing out
  * VERDICT item 5 across the package): semantics live in
  * [[ZscoreStream.step]] (the exact-decimal ring fold with the r11
  * idle-eviction clamp), shared verbatim with the fMGWS twin; the
  * fMGWS→TWS bookkeeping is [[StepProcessor]]. TwsPortsSpec runs the
  * same micro-batch schedule through both real engines (RocksDB
  * provider); WatermarkFuzzSpec drives this processor through the same
  * schedules as the fMGWS twin (no-crash on arbitrary order, exact
  * parity on in-order — the ring is inherently arrival-order-dependent,
  * its documented envelope).
  */
class ZscoreProcessor
    extends StepProcessor[(Long, java.sql.Timestamp, Long, Double),
      ZscoreState, AnomalyHit] {
  override protected def stateName: String = "zscore"
  override protected def stateEncoder: Encoder[ZscoreState] =
    Encoders.product[ZscoreState]
  override protected def emptyState: ZscoreState = ZscoreState(Nil, 0L)
  override protected def step(
      uid: Long, st: ZscoreState,
      rows: Seq[(Long, java.sql.Timestamp, Long, Double)], wmUs: Long)
      : (Seq[AnomalyHit], Option[ZscoreState], Option[Long]) =
    ZscoreStream.step(uid, st,
      rows.map { case (_, ts, eid, v) =>
        ValueEvent(uid, ts.getTime * 1000, eid, v) },
      wmUs)
}

object ZscoreStreamTws {

  /** Streaming anomaly scoring over watermarked (user_id, ts,
    * event_id, value) rows — same contract as
    * [[ZscoreStream.zscoreStreaming]], modern state API. Requires the
    * RocksDB state store provider. */
  def zscoreStreaming(
      ds: Dataset[(Long, java.sql.Timestamp, Long, Double)])
      : Dataset[AnomalyHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new ZscoreProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
