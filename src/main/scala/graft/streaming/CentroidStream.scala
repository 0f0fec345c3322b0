package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** §2.K streaming twin of `j_quality_centroid`'s TRAINER (r13): the
  * per-class feature-sum store maintained as a per-micro-batch fold —
  * each batch of labeled documents adds its (cls, n, Σx1..Σx5)
  * partials into the running store, and any moment's classifier reads
  * the store through the exact assignment arithmetic of the batch
  * entry ([[TextOps.centroidAssign]] — one implementation, zero twin
  * drift).
  *
  * Like the KMV store the fold is EXACT under any batching — sums of
  * longs are associative/commutative, so the streamed store equals
  * the one-shot [[TextOps.centroidTrain]] over everything ever folded
  * (CentroidStreamSpec pins row equality, not an error bound). Unlike
  * the KMV union it is NOT naturally replay-safe (re-adding a
  * delivered batch double-counts), so the fold carries
  * [[DriftStream]]'s batchId guard, published atomically with the
  * sums by the same [[StoreSwap]] rename.
  *
  * LIFECYCLE CONTRACT (same as DriftStream): the store table and the
  * streaming checkpoint form ONE unit — reset both together.
  *
  * Scale notes: the store is ≤2 rows × 7 longs at ANY corpus size;
  * the per-batch fold is one partial-aggregable groupBy; the
  * classifier read broadcasts the pivoted centroids onto a doc-local
  * projection (the batch entry's plan, proven Exchange-free over the
  * corpus by TextOpsSpec's plan pin).
  */
object CentroidStream {

  /** Fold one batch of (doc_id, lang, text) rows into the running
    * `(cls, n, s1..s5, batch_id)` store. Pass `batchId=None` for
    * non-streaming callers (each batch folded once by construction). */
  private[graft] def foldBatch(s: SparkSession, table: String,
                               batch: DataFrame,
                               batchId: Option[Long] = None): Unit = {
    StoreSwap.recover(s, table)
    val exists = s.catalog.tableExists(table)
    if (batchId.isDefined && exists &&
        s.table(table).schema.fieldNames.contains("batch_id")) {
      val last = s.table(table)
        .agg(coalesce(max(col("batch_id")), lit(Long.MinValue)))
        .head.getLong(0)
      if (last >= batchId.get) return // replayed batch: already folded
    }
    val part = TextOps.centroidTrain(TextOps.centroidFeatures(batch))
    val cols = Seq("cls", "n", "s1", "s2", "s3", "s4", "s5")
    val merged =
      if (exists)
        s.table(table).select(cols.map(col): _*).unionByName(part)
          .groupBy("cls").agg(
            sum("n").as("n"),
            sum("s1").as("s1"), sum("s2").as("s2"), sum("s3").as("s3"),
            sum("s4").as("s4"), sum("s5").as("s5"))
      else part
    StoreSwap.publish(s, table,
      merged.withColumn("batch_id", lit(batchId.getOrElse(-1L))))
  }

  /** Start the trainer: each micro-batch of (doc_id, lang, text) rows
    * folds into the running store, replay-safe via the batchId. */
  def start(docs: DataFrame, table: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.sparkSession, table, batch.toDF(), Some(batchId))
      }
      .start()

  /** Classify documents against the standing store — the batch
    * entry's exact output shape and arithmetic. */
  def classify(s: SparkSession, table: String,
               docs: DataFrame): DataFrame = {
    StoreSwap.recover(s, table)
    TextOps.centroidAssign(TextOps.centroidFeatures(docs),
      s.table(table).select("cls", "n", "s1", "s2", "s3", "s4", "s5"))
  }
}
