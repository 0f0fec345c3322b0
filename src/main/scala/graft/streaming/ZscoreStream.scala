package graft.streaming

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class ValueEvent(user_id: Long, ts_us: Long, event_id: Long,
                      value: Double)
case class AnomalyHit(event_id: Long, user_id: Long, value: Double,
                      z: Double)
/** Ring of the user's most recent ≤20 values, newest last, plus the
  * last event time (drives the idle-eviction timeout). */
case class ZscoreState(window: List[Double], lastUs: Long)

/** §2.K streaming twin of `e_anomaly_zscore` (r10): each arriving
  * event scored against the mean/stddev of that user's previous ≤20
  * values — per-user bounded ring-buffer state over
  * `flatMapGroupsWithState`.
  *
  * Parity with the batch window plan is EXACT, not approximate
  * (ZscoreStreamSpec pins set equality including the z values): the
  * batch entry derives its moments from DECIMAL(20,6)/(24,6) window
  * sums, so this fold reproduces the identical arithmetic with
  * BigDecimal — per-value scale-6 HALF_UP quantization, exact decimal
  * Σx/Σx², double conversion only in the closed-form z, then the same
  * scale-4 HALF_UP round. A double accumulator would drift from the
  * batch result at the last ulp.
  *
  * Scale notes: state is ≤20 doubles + a timestamp per ACTIVE user
  * (the 30-day idle timeout evicts dormant users — after eviction the
  * ring refills exactly as a fresh user's would, matching the batch
  * semantics for any user whose history fits the watermark horizon).
  * The state store shards by user_id; no corpus-sized state anywhere.
  */
object ZscoreStream {
  val WindowN = 20
  val MinSamples = 10
  val IdleTimeoutUs: Long = 30L * 86400L * 1000000L

  private def dec6(v: Double): JBD =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP)

  /** The batch entry's z for the current value against the ring, or
    * None below the sample floor / at zero variance. Mirrors the
    * decimal-sum formulation of `e_anomaly_zscore` exactly. */
  private def zOf(ring: List[Double], v: Double): Option[Double] = {
    val n = ring.length
    if (n < MinSamples) return None
    val s = ring.map(dec6).reduce(_ add _).doubleValue()
    val sq = ring.map(x => dec6(x * x)).reduce(_ add _).doubleValue()
    val variance = (sq - s * s / n) / (n - 1)
    if (!(variance > 0)) return None
    val z = (v - s / n) / math.sqrt(variance)
    if (math.abs(z) > 2)
      Some(JBD.valueOf(z).setScale(4, RoundingMode.HALF_UP).doubleValue())
    else None
  }

  /** Ordered fold of one batch against the ring — the shared kernel
    * of the batch path, the fMGWS streaming path, and the TWS port. */
  private def foldEvents(uid: Long, cur0: ZscoreState,
                         evs: Seq[ValueEvent])
      : (ZscoreState, Seq[AnomalyHit]) = {
    var cur = cur0
    val out = Seq.newBuilder[AnomalyHit]
    evs.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      zOf(cur.window, e.value).foreach { z =>
        out += AnomalyHit(e.event_id, uid, e.value, z)
      }
      cur = ZscoreState((cur.window :+ e.value).takeRight(WindowN),
        e.ts_us)
    }
    (cur, out.result())
  }

  def process(uid: Long, events: Iterator[ValueEvent],
              state: GroupState[ZscoreState]): Iterator[AnomalyHit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val (cur, out) = foldEvents(uid,
      state.getOption.getOrElse(ZscoreState(Nil, 0L)), events.toSeq)
    state.update(cur)
    out.iterator
  }

  /** Batch scoring through the state API — ZscoreStreamSpec proves it
    * equals the `e_anomaly_zscore` windowed plan exactly. */
  def zscoreBatch(ds: Dataset[ValueEvent]): Dataset[AnomalyHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process)
  }

  /** Streaming process: the batch fold plus idle-state eviction. */
  def processStreaming(uid: Long, events: Iterator[ValueEvent],
                       state: GroupState[ZscoreState])
      : Iterator[AnomalyHit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st = state.getOption.getOrElse(ZscoreState(Nil, 0L))
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

  /** The PURE streaming fold step, shared by the fMGWS twin and the
    * `transformWithState` port ([[ZscoreStreamTws]], r13) — one
    * implementation, so the two state APIs cannot drift on semantics.
    * Idle-eviction clamp (r11, the AttributionStream lesson): a ring
    * whose idle horizon is already behind the watermark IS
    * idle-expired — dropped now, exactly what the timeout would have
    * done; otherwise the wake at last + idle-timeout is provably > the
    * watermark. */
  private[streaming] def step(uid: Long, st: ZscoreState,
                              arrived: Seq[ValueEvent], wmUs: Long)
      : (Seq[AnomalyHit], Option[ZscoreState], Option[Long]) = {
    val (cur, out) = foldEvents(uid, st, arrived)
    if (cur.lastUs == 0L && cur.window.isEmpty) (out, None, None)
    else {
      val horizonMs = cur.lastUs / 1000 + IdleTimeoutUs / 1000
      if (horizonMs <= wmUs / 1000) (out, None, None)
      else (out, Some(cur), Some(horizonMs))
    }
  }

  /** Streaming scoring with idle-state eviction. */
  def zscoreStreaming(
      ds: Dataset[(Long, java.sql.Timestamp, Long, Double)])
      : Dataset[AnomalyHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[ZscoreState]) =>
          processStreaming(uid,
            it.map { case (_, ts, eid, v) =>
              ValueEvent(uid, ts.getTime * 1000, eid, v)
            }, state)
      }
  }
}
