package graft

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming._

/** r13 widening of VERDICT item 5: the sessionize and funnel twins
  * ported to `transformWithState` ([[SessionizeTws]] /
  * [[FunnelStreamTws]] over the shared [[StepProcessor]]
  * bookkeeping). Each test drives the SAME micro-batch schedule
  * through both REAL engines (fMGWS and TWS, RocksDB provider for the
  * latter) and asserts identical rows — the schedules exercise the
  * cross-batch carry, the watermark-gap close, the out-of-order
  * buffer replay, and the stale-horizon clamp legs the fMGWS specs
  * pinned in r12. (The 250-schedule arbitrary-order properties run in
  * WatermarkFuzzSpec against the same processor classes.)
  */
class TwsPortsSpec extends SparkSpec {
  import spark.implicits._

  private val minMs = 60000L
  private val minUs = 60000000L

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** Drive `batches` through a streaming query over a MemoryStream of
    * (user_id, ts-minute[, id, type]) rows, collecting the memory-sink
    * table. */
  private def drive[I: org.apache.spark.sql.Encoder, O](
      name: String, batches: Seq[Seq[I]],
      mk: Dataset[I] => Dataset[O]): org.apache.spark.sql.DataFrame = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[I]
    val q = mk(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      assert(q.exception.isEmpty, s"$name crashed: ${q.exception}")
    } finally q.stop()
    spark.table(name)
  }

  test("SessionizeTws: identical rows to the fMGWS twin on the same " +
    "micro-batch schedule, both real engines — carry, out-of-order " +
    "replay, gap close, and watermark-jump legs") {
    withRocksDb {
      def ev(uid: Long, tMin: Long) = (uid, new Timestamp(tMin * minMs))
      // user 1: one session split across batches with an admissible
      // out-of-order arrival inside the gap, then a second session
      // opened against a far-advanced watermark (data invocation after
      // a jump); user 2 drives the watermark, including a final jump
      // that closes everything still pending
      val batches = Seq(
        Seq(ev(1, 100), ev(1, 110)),
        Seq(ev(1, 125), ev(1, 105)), // 105 is admissible (wm at 110-delay)
        Seq(ev(2, 200)),             // pushes wm past user 1's gap
        Seq(ev(1, 300), ev(2, 1000)), // new session + another jump
        Seq(ev(2, 2000)))            // final close
      def toSessions(mk: Dataset[(Long, Timestamp)] => Dataset[Session],
                     name: String) =
        drive[(Long, Timestamp), Session](name, batches,
          ds => mk(ds.toDF("user_id", "ts")
            .withWatermark("ts", "10 minutes")
            .as[(Long, Timestamp)]))
          .as[Session].collect().toSet
      val fm = toSessions(Sessionize.sessionsStreaming, "sess_fmgws_r13")
      val tws = toSessions(SessionizeTws.sessionsStreaming, "sess_tws_r13")
      assert(tws == fm, s"API ports diverged:\n tws $tws\n fm  $fm")
      // the out-of-order leg folded: user 1's first session spans
      // 100..125 with all four events; the post-jump second session
      // closed as a singleton
      assert(fm.contains(Session(1L, 100 * minUs, 125 * minUs, 4L)),
        s"out-of-order replay leg missing: $fm")
      assert(fm.contains(Session(1L, 300 * minUs, 300 * minUs, 1L)),
        s"post-jump second session missing: $fm")
    }
  }

  test("GapIslandsStreamTws: identical rows to the fMGWS twin on the " +
    "same micro-batch schedule, both real engines — the late-day " +
    "island MERGE leg (10 then 8 then 9 → one island)") {
    withRocksDb {
      val dayMs = 86400000L
      def ev(uid: Long, day: Long) = (uid, new Timestamp(day * dayMs))
      val batches = Seq(
        Seq(ev(1, 10)),
        Seq(ev(1, 8), ev(1, 9)), // admissible late days must MERGE
        Seq(ev(2, 30)),          // pushes wm past island horizon
        Seq(ev(2, 100)),
        Seq(ev(2, 200)))
      def toIslands(mk: Dataset[(Long, Timestamp)] => Dataset[Island],
                    name: String) =
        drive[(Long, Timestamp), Island](name, batches,
          ds => mk(ds.toDF("user_id", "ts")
            .withWatermark("ts", "3 days")
            .as[(Long, Timestamp)]))
          .as[Island].collect().toSet
      val fm = toIslands(GapIslandsStream.islandsStreaming, "isl_fmgws_r13")
      val tws = toIslands(GapIslandsStreamTws.islandsStreaming, "isl_tws_r13")
      assert(tws == fm, s"API ports diverged:\n tws $tws\n fm  $fm")
      assert(fm.contains(Island(1L, 8L, 10L, 3L)),
        s"late-day merge leg missing: $fm")
    }
  }

  test("FunnelStreamTws: identical rows to the fMGWS twin on the same " +
    "micro-batch schedule, both real engines — a late view revives a " +
    "buffered click (the lossy-fold case only ordered replay gets " +
    "right)") {
    withRocksDb {
      def ev(uid: Long, tMin: Long, id: Long, tp: String) =
        (uid, new Timestamp(tMin * minMs), id, tp)
      // user 1: click arrives BEFORE the view in arrival order but
      // after it in event time — the frozen ordered replay must count
      // the funnel as view→click; a purchase after the click completes
      // stage 3. user 2 drives the watermark.
      val batches = Seq(
        Seq(ev(1, 110, 10, "click")),
        Seq(ev(1, 100, 11, "view"), ev(1, 120, 12, "purchase")),
        Seq(ev(2, 300, 90, "view")),
        Seq(ev(2, 1000, 91, "view")),
        Seq(ev(2, 2000, 92, "view")))
      def toFunnels(
          mk: Dataset[(Long, Timestamp, Long, String)] => Dataset[FunnelSession],
          name: String) =
        drive[(Long, Timestamp, Long, String), FunnelSession](name, batches,
          ds => mk(ds.toDF("user_id", "ts", "event_id", "event_type")
            .withWatermark("ts", "30 minutes")
            .as[(Long, Timestamp, Long, String)]))
          .as[FunnelSession].collect().toSet
      val fm = toFunnels(FunnelStream.funnelStreaming, "funnel_fmgws_r13")
      val tws = toFunnels(FunnelStreamTws.funnelStreaming, "funnel_tws_r13")
      assert(tws == fm, s"API ports diverged:\n tws $tws\n fm  $fm")
      // the revive leg: user 1 reaches stage 3 with 3 events
      assert(fm.contains(FunnelSession(1L, 100 * minUs, 3L, 3)),
        s"ordered-replay funnel leg missing: $fm")
    }
  }
}
