package graft.streaming

import graft.sources.Layout
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of a quantile-sketch STORE — the composition
  * of the round's pieces: per micro-batch, events aggregate into one
  * GK digest per (event_type, day) (`graft_qsketch`), and the batch's
  * day partitions land via DYNAMIC PARTITION OVERWRITE
  * ([[graft.sources.Layout.overwritePartitions]]). Any later
  * date-range percentile question is answered from the store by
  * `graft_qsketch_union` + `graft_qsketch_q` over KILOBYTES of
  * digests — the raw events never need to be re-scanned.
  *
  * Replay safety inherits [[PartitionedLoad]]'s argument: with
  * DAY-ALIGNED batches (each batch carries whole days — the
  * production shape for a daily sketch roll-up) a crash-replayed
  * batch recomputes the same days' digests from the same rows and
  * overwrites the same partitions — the store converges. Batches that
  * SPLIT a day would overwrite that day with a partial digest; align
  * the watermark-closed window to the partition grain, or stage by
  * checkpointed batchId, exactly as PartitionedLoad documents.
  */
object SketchStream {

  /** Start the roll-up: each micro-batch writes its days' digests. */
  def start(events: DataFrame, path: String,
            accuracy: Int = 1000): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        runBatch(batch.toDF(), path, accuracy)
      }
      .start()

  /** One micro-batch's roll-up — also what a crash REPLAY re-runs. */
  private[graft] def runBatch(batch: DataFrame, path: String,
                              accuracy: Int): Unit = {
    val s = batch.sparkSession
    graft.functions.VectorExprs.register(s)
    val daily = batch
      .withColumn("day", to_date(col("ts")))
      .groupBy("event_type", "day")
      .agg(expr(s"graft_qsketch(cast(value as double), $accuracy)")
        .as("sk"))
    Layout.overwritePartitions(daily, path, Seq("day"))
  }

  /** Range percentile from the store: union the day digests, query. */
  def rangeQuantile(s: SparkSession, path: String,
                    fromDay: String, toDay: String, p: Double): DataFrame = {
    graft.functions.VectorExprs.register(s)
    s.read.parquet(path)
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
      .groupBy("event_type")
      .agg(expr(s"graft_qsketch_q(graft_qsketch_union(sk), ${p}d)")
        .as("q"))
  }
}
