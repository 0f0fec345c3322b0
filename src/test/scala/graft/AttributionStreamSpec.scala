package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{AttributionStream, TouchEvent}

case class TEv(user_id: Long, ts: Timestamp, event_id: Long,
               event_type: String, value: Double)

/** The streaming attribution twin (§2.K, r10): the per-user
  * last-touch state machine must equal `e_attribution_last_touch`'s
  * window formulation per purchase on the fixture, and under a real
  * stream it must carry touch state across micro-batches and expire
  * the lookback.
  */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stateful attribution equals the windowed per-purchase " +
    "assignment on the fixture") {
    val evs = Tables.eventsWithNanos(spark, sfDir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), col("value")).as[TouchEvent]
    val stateful = AttributionStream.attributionBatch(evs)
      .select("user_id", "event_id", "channel", "value")
      .as[(Long, Long, String, Double)].collect().toSet

    // the batch query's pre-aggregation window, re-derived per purchase
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"),
      col("event_type"))
    val windowed = Tables.eventsWithNanos(spark, sfDir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("lt_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("lt_us",
        last(when(touch.isNotNull, col("ts_us")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        coalesce(when(col("lt_us").isNotNull &&
          col("ts_us") - col("lt_us") <= AttributionStream.LookbackUs,
          col("lt_type")), lit("direct")).as("channel"),
        col("value"))
      .as[(Long, Long, String, Double)].collect().toSet

    assert(stateful == windowed)
    assert(stateful.nonEmpty)
    // the fixture exercises both credited and direct purchases
    assert(stateful.exists(_._3 == "direct") ||
      windowed.forall(_._3 != "direct"))
    assert(stateful.exists(r => r._3 == "view" || r._3 == "click"))
  }

  test("streamed attribution carries the touch across micro-batches " +
    "and expires the 7-day lookback") {
    implicit val ctx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[TEv]
    val out = AttributionStream.attributionStreaming(
      input.toDF()
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .as[(Long, Timestamp, Long, String, Double)])
    val q = out.writeStream
      .format("memory").queryName("attrib_stream_test")
      .outputMode("append")
      .start()
    try {
      // batch 1: user 1 clicks — no purchase yet
      input.addData(TEv(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0))
      q.processAllAvailable()
      // batch 2: purchase in a LATER micro-batch — only carried state
      // can credit the click
      input.addData(TEv(1, ts("2024-01-01 11:00:00"), 2, "purchase", 5.0))
      q.processAllAvailable()
      // batch 3: a purchase 8 days after the touch is outside the
      // lookback → direct
      input.addData(TEv(1, ts("2024-01-09 12:00:00"), 3, "purchase", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib_stream_test")
      .select("user_id", "event_id", "channel", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(rows.contains((1L, 2L, "click", 5.0)), rows)
    assert(rows.contains((1L, 3L, "direct", 7.0)), rows)
  }

  test("an event arriving after the watermark crossed the touch's " +
    "lookback horizon removes the dead state instead of setting an " +
    "in-the-past timeout") {
    // Regression: setTimeoutTimestamp(touch + lookback) with the
    // horizon already ≤ watermark throws in Spark and kills the query.
    implicit val ctx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[TEv]
    val out = AttributionStream.attributionStreaming(
      input.toDF()
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .as[(Long, Timestamp, Long, String, Double)])
    val q = out.writeStream
      .format("memory").queryName("attrib_stale_touch_test")
      .outputMode("append")
      .start()
    try {
      // user 1 touches, then user 2 pushes the watermark 19 days past
      // user 1's lookback horizon while user 1's state still exists
      input.addData(TEv(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0))
      q.processAllAvailable()
      input.addData(TEv(2, ts("2024-01-20 00:00:00"), 2, "click", 0.0))
      q.processAllAvailable()
      // user 1's group now runs the data path with watermark (01-20)
      // already past its horizon (01-08) — must not throw
      input.addData(TEv(1, ts("2024-01-21 00:00:00"), 3, "purchase", 9.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception)
    } finally q.stop()
    val rows = spark.table("attrib_stale_touch_test")
      .select("user_id", "event_id", "channel", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(rows.contains((1L, 3L, "direct", 9.0)), rows)
  }
}
