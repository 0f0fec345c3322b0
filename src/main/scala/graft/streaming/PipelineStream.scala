package graft.streaming

import graft.operators.{CorpusPipeline, DedupArtifacts}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The FULL crawl-ingest loop under Structured Streaming: each
  * micro-batch of raw crawl documents runs the four-stage incremental
  * clean ([[CorpusPipeline.incStages]] — quality → langid vs the
  * stored profile → incremental dedup vs the stored artifacts →
  * decontamination vs the stored registry), writes the survivors and
  * the per-batch audit ledger, and appends the survivors' dedup
  * artifacts so the NEXT micro-batch judges against them. This is the
  * composition of [[DedupStream]] with the stored stage tables — one
  * shared stage chain, so batch and streaming cannot drift
  * (PipelineStreamSpec pins survivor parity with the one-shot batch
  * run and the cross-batch dup catch).
  *
  * Same replay caveat as [[DedupStream]]: three non-transactional
  * appends per batch; production stages them under the checkpointed
  * batchId.
  */
object PipelineStream {

  /** Start the ingest stream over `crawlDocs` (a streaming frame with
    * the full document schema: doc_id, text, lang, source, n_chars).
    * Survivors append to `survivorsTable`; ledger rows (with a
    * batch_id column) append to `auditTable`. */
  def start(crawlDocs: DataFrame, prefix: String, survivorsTable: String,
            auditTable: String): StreamingQuery =
    crawlDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        runBatch(batch.toDF(), prefix, survivorsTable, auditTable, batchId)
      }
      .start()

  private[graft] def runBatch(batch: DataFrame, prefix: String,
                              survivorsTable: String, auditTable: String,
                              batchId: Long): Unit = {
    val s = batch.sparkSession
    val chain = CorpusPipeline.incStages(s, prefix, batch)
    // survivors pinned BEFORE any append mutates the tables their
    // lineage reads (same discipline as DedupArtifacts.append)
    val s4 = chain.last.transform(graft.Pin.pin)
    val audit = CorpusPipeline.incAudit(chain)
      .withColumn("batch_id", lit(batchId))
      .transform(graft.Pin.pin)
    s4.write.mode("append").format("parquet").saveAsTable(survivorsTable)
    audit.write.mode("append").format("parquet").saveAsTable(auditTable)
    // only final survivors enter the standing corpus (dups AND
    // quality/langid/decontamination rejects all stay out), so the
    // anti-join list is empty by construction
    DedupArtifacts.append(s, prefix, s4.select("doc_id", "text"),
      s4.select("doc_id").limit(0))
    graft.Caches.release(s)
  }
}
