package graft.streaming

import graft.operators.{DedupArtifacts, LlmOps}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming cluster-label maintenance — the [[DedupStream]] of the
  * clustering path: each micro-batch of crawl documents is paired
  * against the standing corpus (stored postings; only the batch is
  * shingled), its pairs are folded into the STANDING label table over
  * contracted edges ([[LlmOps.incrementalClustersFull]]), and the
  * batch's postings are appended so the next batch pairs against it.
  *
  * Per batch, three label-store mutations:
  *   1. REMAP — a bridge pair merged standing clusters: rows of the
  *      absorbed cluster(s) rewrite to the merged (smaller) id. Merge
  *      events are rare; the rewrite is a full-table overwrite here
  *      (fixture-scale honesty; a production table bucketed by
  *      cluster_id rewrites only affected buckets, and the same
  *      non-atomic-swap caveat as [[DedupArtifacts.compact]] applies).
  *   2. APPEND batch docs' labels (docs in ≥ 1 verified pair).
  *   3. APPEND newly labeled standing docs — previously singleton
  *      corpus members a batch pair pulled into a cluster.
  *
  * Same order-conditional parity scope as [[DedupStream]]: streamed
  * id-ordered batches reproduce the one-shot incremental labels
  * (ClusterStreamSpec pins it, including a cross-batch chain), plus
  * explicit anchor rows — when a later batch clusters against a
  * stored partner, that partner (the cluster minimum) is labeled in
  * the table too, which the one-shot doc-side convention leaves
  * implicit; arrival
  * order decides which doc anchors a cluster, and per-batch combined
  * df can drift from the one-shot whole-delta df on skewed data. The
  * replay caveat is DedupStream's too: label append + artifact append
  * are separate non-transactional writes — stage under the
  * checkpointed batchId for exactly-once.
  */
object ClusterStream {

  def start(deltaDocs: DataFrame, prefix: String,
            cutoff: Int, tau: Double): StreamingQuery =
    deltaDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        runBatch(batch.toDF(), prefix, cutoff, tau)
      }
      .start()

  private[graft] def runBatch(batch: DataFrame, prefix: String,
                              cutoff: Int, tau: Double): Unit = {
    val s = batch.sparkSession
    val docs = batch.select("doc_id", "text")
    val (bp, bs, bd) = DedupArtifacts.read(s, prefix)
    val labelTable = LlmOps.clusterTable(prefix)
    // refresh before reading — foreachBatch runs in a session clone,
    // and earlier batches' appends must be visible (the same
    // cross-session contract DedupArtifacts.read keeps for the
    // postings tables)
    s.catalog.refreshTable(labelTable)
    val labels = s.table(labelTable)
    val pairs = LlmOps.incrementalPairs(bp, bs, bd, docs, cutoff, tau)
    val (deltaLabels, newBaseLabels, remap) =
      LlmOps.incrementalClustersFull(labels, pairs)
    // all three read the table about to be mutated — cut lineage first
    val dl = deltaLabels.transform(graft.Pin.pin)
    val nb = newBaseLabels.transform(graft.Pin.pin)
    val rm = remap.transform(graft.Pin.pin).collect()
    if (rm.nonEmpty) {
      // merge event: rewrite absorbed cluster ids in place
      val rmap = rm.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val remapped = s.table(labelTable)
        .withColumn("cluster_id",
          coalesce(element_at(typedLit(rmap), col("cluster_id")),
            col("cluster_id")))
        .transform(graft.Pin.pin)
      DedupArtifacts.reset(s, labelTable)
      remapped.write.format("parquet").saveAsTable(labelTable)
    }
    dl.write.mode("append").format("parquet").saveAsTable(labelTable)
    nb.write.mode("append").format("parquet").saveAsTable(labelTable)
    // every batch doc joins the standing corpus (clustering removes
    // nothing) — append postings/sizes/df for the next batch
    DedupArtifacts.append(s, prefix, docs,
      dups = docs.select(col("doc_id")).limit(0))
    graft.Caches.release(s)
  }
}
