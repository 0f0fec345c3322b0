package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SketchStream

/** Streaming sketch-store maintenance: day-aligned micro-batches roll
  * events into per-(type, day) GK digests; range quantiles answer
  * from stored kilobytes within the rank bound; a replayed batch
  * converges (dynamic overwrite, not append).
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed day-aligned roll-up answers range quantiles within " +
    "the rank bound and converges under batch replay") {
    implicit val ctx = spark.sqlContext
    graft.functions.VectorExprs.register(spark)
    val dir = Files.createTempDirectory("graft-sketch-store").toString
    val evs = Tables.eventsWithNanos(spark, sfDir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("event_id", "ts_us", "user_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
      .map { case (id, us, uid, t, v) =>
        Ev(id, new Timestamp(us / 1000), uid, t, v) }
    // day-aligned split: batch 1 = days 1-15, batch 2 = the rest
    val (b1, b2) = evs.partition(_.ts.toLocalDateTime.getDayOfMonth <= 15)
    assert(b1.nonEmpty && b2.nonEmpty)
    val input = MemoryStream[Ev]
    val q = SketchStream.start(input.toDF(), dir)
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()

    val stored = spark.read.parquet(dir)
    val nRows = stored.count()
    // one digest row per (type, day) — the store is sketch-sized
    assert(nRows == Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts"))).distinct().count())

    def check(): Unit = {
      val got = SketchStream
        .rangeQuantile(spark, dir, "2024-01-01", "2024-12-31", 0.5)
        .as[(String, Double)].collect().toMap
      assert(got.nonEmpty)
      got.foreach { case (t, p50) =>
        val b = Tables.events(spark, sfDir)
          .filter(col("event_type") === t)
          .agg(expr("percentile(value, 0.48)"),
            expr("percentile(value, 0.52)")).head
        assert(p50 >= b.getDouble(0) && p50 <= b.getDouble(1),
          s"$t p50 $p50 outside [${b.getDouble(0)}, ${b.getDouble(1)}]")
      }
    }
    check()

    // crash replay of batch 2: same rows, same days → the overwrite
    // converges (row count and answers unchanged)
    SketchStream.runBatch(b2.toSeq.toDF(), dir, accuracy = 1000)
    assert(spark.read.parquet(dir).count() == nRows)
    check()
  }
}
