package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2.K streaming twin of `j_corpus_drift` (r11): the
  * train-vs-incoming distribution-drift monitor as a standing count
  * STORE — per micro-batch, the batch's term counts merge into a
  * running (tok, c) table; the JS divergence against the stored
  * REFERENCE distribution is answered from the two count artifacts at
  * any time, through the exact same [[TextOps.jsDivergence]] code the
  * batch entry runs (one implementation, zero twin drift).
  *
  * Scale notes: both artifacts are VOCABULARY-sized, never
  * corpus-sized — the per-batch fold is one partial-aggregable
  * groupBy merge (the [[SketchStream]] store discipline), and the
  * divergence read touches only the two count tables. Replay safety:
  * the fold is NOT idempotent per batch (counts add), so production
  * replays stage by checkpointed batchId exactly as
  * [[PartitionedLoad]] documents; DriftStreamSpec pins
  * batching-invariance instead — any partition of the incoming docs
  * into micro-batches folds to the same counts, hence the same
  * divergence as the one-shot batch entry.
  */
object DriftStream {

  /** Merge a batch's term counts into the running store table
    * (created on first batch). `batchId` makes the fold IDEMPOTENT
    * under foreachBatch replay (r12 review): a summed-counts store is
    * not naturally replay-safe — if the rename commits but the
    * process dies before the streaming checkpoint commits the
    * batchId, the engine re-delivers the batch and a naive fold would
    * double-count it. The store therefore carries the last folded
    * batchId on every row (vocabulary-sized table — a constant column
    * is noise), published ATOMICALLY with the counts by the same
    * rename; a replayed batch sees its own id in the store and skips.
    * Pass None for non-streaming callers (each batch folded once by
    * construction).
    *
    * LIFECYCLE CONTRACT: the store table and the streaming checkpoint
    * form ONE unit — batchIds are scoped to a checkpoint, so starting
    * a query with a FRESH checkpoint against an EXISTING store would
    * restart ids at 0 and the guard would mis-read every early batch
    * as a replay. Reset (drop) the store table whenever the
    * checkpoint is reset; DriftStreamSpec pins the contract. */
  private[graft] def foldBatch(s: SparkSession, table: String,
                               batch: DataFrame,
                               batchId: Option[Long] = None): Unit = {
    StoreSwap.recover(s, table)
    val exists = s.catalog.tableExists(table)
    if (batchId.isDefined && exists &&
        s.table(table).schema.fieldNames.contains("batch_id")) {
      // coalesce: a zero-row store (first batch tokenized to nothing)
      // has no max — treat as "nothing folded yet", not an NPE.
      val last = s.table(table)
        .agg(coalesce(max(col("batch_id")), lit(Long.MinValue)))
        .head.getLong(0)
      if (last >= batchId.get) return // replayed batch: already folded
    }
    val counts = TextOps.termCounts(batch)
    val merged =
      if (exists)
        s.table(table).select("tok", "c").unionByName(counts)
          .groupBy("tok").agg(sum(col("c")).as("c"))
      else counts
    StoreSwap.publish(s, table,
      merged.withColumn("batch_id", lit(batchId.getOrElse(-1L))))
  }

  /** Start the monitor: each micro-batch of (… text …) rows folds
    * into the running count store, replay-safe via the batchId. */
  def start(docs: DataFrame, table: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.sparkSession, table, batch.toDF(), Some(batchId))
      }
      .start()

  /** Drift of the running store vs a stored reference count table —
    * (js_nats, vocab), the batch entry's exact output shape. */
  def drift(s: SparkSession, refTable: String,
            curTable: String): DataFrame = {
    StoreSwap.recover(s, refTable); StoreSwap.recover(s, curTable)
    TextOps.jsDivergence(s.table(refTable), s.table(curTable))
  }
}
