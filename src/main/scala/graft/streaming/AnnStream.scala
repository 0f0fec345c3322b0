package graft.streaming

import graft.operators.AnnIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest for the stored ANN index — the vector twin of
  * [[DedupStream]]: each micro-batch of new embeddings is assigned to
  * the STANDING centroids (broadcast of k stored rows; never a sample
  * or Lloyd job) and appended to the bucketed inverted lists, so the
  * index stays searchable while the crawl streams in. AnnStreamSpec
  * pins parity (streamed ingest ≡ one-shot assign+append of the same
  * vectors) and the no-re-cluster counter across all micro-batches.
  *
  * Same replay caveat as [[DedupStream]]: the append is one
  * non-transactional bucketed insert; a production deployment stages
  * it under the checkpointed batchId to make replays idempotent.
  */
object AnnStream {

  /** Start the index-ingest stream over `deltaVecs` (a streaming frame
    * exposing vec_id and a unit `array<double>` column `u`). */
  def start(deltaVecs: DataFrame, prefix: String): StreamingQuery =
    deltaVecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        runBatch(batch.toDF(), prefix)
      }
      .start()

  private[graft] def runBatch(batch: DataFrame, prefix: String): Unit = {
    val s = batch.sparkSession
    AnnIndex.append(s, prefix,
      AnnIndex.assign(s, prefix, batch.select("vec_id", "u")))
  }
}
