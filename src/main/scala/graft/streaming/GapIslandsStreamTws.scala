package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` gap-islands — the PRIMARY production path (r14 docs flip: Spark 4's state API, restart-from-checkpoint proven by TwsRestartSpec; the fMGWS twin remains as the parity reference). Boundary note for production users: TWS drops rows whose event time EQUALS the watermark where fMGWS admits them — see [[StepProcessor]]. Ported from the fMGWS twin (r13, widening
  * VERDICT item 5 beyond the as-of pilot): semantics live in
  * [[GapIslandsStream.step]] (interval-set union, emit only when the
  * watermark proves a run maximal), shared verbatim with the fMGWS
  * twin; the fMGWS→TWS bookkeeping is [[StepProcessor]]. TwsPortsSpec
  * runs the same micro-batch schedule through both real engines
  * (RocksDB provider); WatermarkFuzzSpec drives this processor through
  * the same 250 arbitrary-order schedules as the fMGWS twin.
  */
class IslandProcessor
    extends StepProcessor[(Long, java.sql.Timestamp), IslandState, Island] {
  override protected def stateName: String = "islands"
  override protected def stateEncoder: Encoder[IslandState] =
    Encoders.product[IslandState]
  override protected def emptyState: IslandState = IslandState(Nil)
  override protected def step(
      uid: Long, st: IslandState,
      rows: Seq[(Long, java.sql.Timestamp)], wmUs: Long)
      : (Seq[Island], Option[IslandState], Option[Long]) =
    GapIslandsStream.step(uid, st,
      rows.map(r => DayEvent(uid, r._2.getTime * 1000)), wmUs)
}

object GapIslandsStreamTws {

  /** Streaming islands over watermarked (user_id, ts) rows — same
    * contract as [[GapIslandsStream.islandsStreaming]], modern state
    * API. Requires the RocksDB state store provider. */
  def islandsStreaming(
      ds: Dataset[(Long, java.sql.Timestamp)]): Dataset[Island] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new IslandProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
