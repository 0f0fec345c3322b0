package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` attribution — the PRIMARY production path (r14 docs flip: Spark 4's state API, restart-from-checkpoint proven by TwsRestartSpec; the fMGWS twin remains as the parity reference). Boundary note for production users: TWS drops rows whose event time EQUALS the watermark where fMGWS admits them — see [[StepProcessor]]. Ported from the fMGWS twin (r13, closing out
  * VERDICT item 5 across the package): semantics live in
  * [[AttributionStream.step]] (emit-on-arrival last-touch fold with the
  * r11 stale-horizon clamp), shared verbatim with the fMGWS twin; the
  * fMGWS→TWS bookkeeping is [[StepProcessor]]. TwsPortsSpec runs the
  * same micro-batch schedule through both real engines (RocksDB
  * provider); WatermarkFuzzSpec drives this processor through the same
  * schedules as the fMGWS twin (no-crash on arbitrary order, exact
  * parity on in-order — attribution's documented envelope, since the
  * fold is inherently arrival-order-dependent).
  */
class AttributionProcessor
    extends StepProcessor[(Long, java.sql.Timestamp, Long, String, Double),
      TouchState, AttributedPurchase] {
  override protected def stateName: String = "touch"
  override protected def stateEncoder: Encoder[TouchState] =
    Encoders.product[TouchState]
  override protected def emptyState: TouchState = TouchState("", -1L)
  override protected def step(
      uid: Long, st: TouchState,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)],
      wmUs: Long)
      : (Seq[AttributedPurchase], Option[TouchState], Option[Long]) =
    AttributionStream.step(uid, st,
      rows.map { case (_, ts, eid, t, v) =>
        TouchEvent(uid, ts.getTime * 1000, eid, t, v) },
      wmUs)
}

object AttributionStreamTws {

  /** Streaming attribution over watermarked (user_id, ts, event_id,
    * event_type, value) rows — same contract as
    * [[AttributionStream.attributionStreaming]], modern state API.
    * Requires the RocksDB state store provider. */
  def attributionStreaming(
      ds: Dataset[(Long, java.sql.Timestamp, Long, String, Double)])
      : Dataset[AttributedPurchase] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new AttributionProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
