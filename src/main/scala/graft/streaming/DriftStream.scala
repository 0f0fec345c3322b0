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

  /** Re-publish a store stranded mid-swap (ADVICE r11): the publish
    * below is write-`_next` → drop main → RENAME `_next` to main, so
    * the only unsafe window leaves `_next` complete and main missing —
    * finishing the rename restores the fold's result exactly. With
    * main present, a leftover `_next` is a NOT-YET-COMMITTED batch's
    * write (the stream will replay that batchId against main) and is
    * discarded by the next fold's reset. */
  private[graft] def recover(s: SparkSession, table: String): Unit = {
    val tmp = table + "_next"
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(tmp))
      s.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Merge a batch's term counts into the running store table
    * (created on first batch). */
  private[graft] def foldBatch(s: SparkSession, table: String,
                               batch: DataFrame): Unit = {
    recover(s, table)
    val counts = TextOps.termCounts(batch)
    val merged =
      if (s.catalog.tableExists(table))
        s.table(table).unionByName(counts)
          .groupBy("tok").agg(sum(col("c")).as("c"))
      else counts
    // stage-then-RENAME publish (the merge reads the table it
    // replaces, so it cannot write in place): ONE write of the merged
    // counts, then a metadata swap — the r11 advice closed both the
    // double-write and the unrecoverable crash window of the old
    // write-twice shape. DedupArtifacts.reset also clears stale
    // warehouse DIRECTORIES a previous JVM left behind, which a bare
    // DROP TABLE cannot see.
    val tmp = table + "_next"
    graft.operators.DedupArtifacts.reset(s, tmp)
    merged.write.format("parquet").saveAsTable(tmp)
    graft.operators.DedupArtifacts.reset(s, table)
    s.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Start the monitor: each micro-batch of (… text …) rows folds
    * into the running count store. */
  def start(docs: DataFrame, table: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        foldBatch(batch.sparkSession, table, batch.toDF())
      }
      .start()

  /** Drift of the running store vs a stored reference count table —
    * (js_nats, vocab), the batch entry's exact output shape. */
  def drift(s: SparkSession, refTable: String,
            curTable: String): DataFrame = {
    recover(s, refTable); recover(s, curTable)
    TextOps.jsDivergence(s.table(refTable), s.table(curTable))
  }
}
