package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** `transformWithState` streaming as-of — the PRIMARY production path
  * (r14 docs flip; restart-from-checkpoint proven by TwsRestartSpec;
  * the fMGWS twin remains as the parity reference. Boundary note for
  * production users: TWS drops rows whose event time EQUALS the
  * watermark where fMGWS admits them — see [[StepProcessor]].)
  * The API path a 100 TB deployment would actually use:
  * Spark 4's StatefulProcessor over the RocksDB store supersedes
  * `flatMapGroupsWithState` (typed state variables, explicit timers,
  * state-var evolution). ALL semantics live in [[AsofStream.step]],
  * shared verbatim with the fMGWS twin; the fMGWS→TWS bookkeeping is
  * [[StepProcessor]], shared with every other ported twin — the port
  * is a type signature, so the two API paths cannot drift.
  * AsofStreamSpec runs the same micro-batch schedule through both
  * engines' real streaming queries and asserts identical output;
  * WatermarkFuzzSpec drives this processor (real class, simulated
  * handle) through the same 250 arbitrary-order schedules as the
  * fMGWS twin.
  */
class AsofProcessor
    extends StepProcessor[(Long, Long, java.sql.Timestamp, Boolean),
      AsofState, AsofMatch] {
  override protected def stateName: String = "asof"
  override protected def stateEncoder: Encoder[AsofState] =
    Encoders.product[AsofState]
  override protected def emptyState: AsofState = AsofState(Nil, Nil)
  override protected def step(
      uid: Long, st: AsofState,
      rows: Seq[(Long, Long, java.sql.Timestamp, Boolean)], wmUs: Long)
      : (Seq[AsofMatch], Option[AsofState], Option[Long]) =
    AsofStream.step(uid, st,
      rows.map { case (_, id, ts, left) =>
        AsofEvent(uid, id, ts.getTime * 1000, left) },
      wmUs)
}

object AsofStreamTws {

  /** Streaming as-of over watermarked (user_id, event_id, ts, isLeft)
    * rows — same contract as [[AsofStream.asofStreaming]], modern
    * state API. Requires the RocksDB state store provider. */
  def asofStreaming(
      ds: Dataset[(Long, Long, java.sql.Timestamp, Boolean)])
      : Dataset[AsofMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new AsofProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
