package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, DedupArtifacts, LlmOps, TextOps}
import graft.streaming.PipelineStream

case class PipeDoc(doc_id: Long, text: String, lang: String,
                   source: String, n_chars: Long)

/** The full crawl-ingest loop streamed: micro-batched four-stage
  * cleaning against the stored stage tables produces exactly the
  * batch run's survivors and per-stage ledger totals, with survivors
  * appended so later micro-batches judge against them.
  */
class PipelineStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed ingest equals the one-shot incremental pipeline: " +
    "same survivors, same per-stage ledger totals") {
    graft.functions.VectorExprs.register(spark)
    implicit val ctx = spark.sqlContext
    val prefix = "graft_pstream_t"
    val survivorsTable = "graft_pstream_surv"
    val auditTable = "graft_pstream_audit"
    val allTables = Seq(DedupArtifacts.postTable(prefix),
      DedupArtifacts.sizesTable(prefix), DedupArtifacts.dfTable(prefix),
      s"${prefix}_langprof", s"${prefix}_benchsh",
      survivorsTable, auditTable)
    allTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = LlmOps.dedupDocs(spark, sfDir)
      val base = docs.filter(TextOps.splitBucket(col("doc_id")) < 80)
      val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
      DedupArtifacts.write(base.select("doc_id", "text"), prefix, nBuckets = 4)
      CorpusPipeline.writeAuxTables(spark, docs, base, prefix)

      // one-shot batch twin on the pristine store
      val batchChain = CorpusPipeline.incStages(spark, prefix, delta)
      val expectedSurvivors = batchChain.last
        .select("doc_id").as[Long].collect().toSet
      val expectedAudit = CorpusPipeline.incAudit(batchChain)
        .select("stage", "docs_in", "docs_out")
        .as[(Long, Long, Long)].collect()
        .map { case (st, in, out) => st -> (in - out) }.toMap
      Caches.release(spark)

      // stream the same delta in three id-ordered micro-batches
      val rows = delta.as[PipeDoc].collect().sortBy(_.doc_id)
      val chunks = rows.grouped(math.max(1, (rows.length + 2) / 3)).toSeq
      assert(chunks.length >= 2)
      val input = MemoryStream[PipeDoc]
      val q = PipelineStream.start(input.toDF(), prefix,
        survivorsTable, auditTable)
      try {
        chunks.foreach { c =>
          input.addData(c.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()

      val streamedSurvivors = spark.table(survivorsTable)
        .select("doc_id").as[Long].collect().toSet
      assert(streamedSurvivors == expectedSurvivors,
        s"streamed ${streamedSurvivors.size} vs batch ${expectedSurvivors.size}")
      assert(streamedSurvivors.nonEmpty)

      val audit = spark.table(auditTable)
      assert(audit.count() == 4L * chunks.length)
      val streamedDrops = audit
        .groupBy("stage").agg(sum(col("docs_in") - col("docs_out")).as("d"))
        .as[(Long, Long)].collect().toMap
      // per-DOC gates (quality, langid) attribute identically in any
      // batching; the dedup/decontamination split may legitimately
      // shift attribution across micro-batch boundaries — a doc whose
      // dup partner was itself decontaminated (so never entered the
      // store) survives the streamed dedup stage and falls at the same
      // decontamination gate its partner did. Total drops and the
      // survivor set are the invariants.
      assert(streamedDrops(1L) == expectedAudit(1L), "quality drift")
      assert(streamedDrops(2L) == expectedAudit(2L), "langid drift")
      assert(streamedDrops.values.sum == expectedAudit.values.sum,
        s"streamed $streamedDrops vs batch $expectedAudit")
      // every doc entered exactly one micro-batch
      val stage1In = audit.filter(col("stage") === 1)
        .agg(sum("docs_in")).head().getLong(0)
      assert(stage1In == rows.length.toLong)
      // the store composed across batches: the final df equals a
      // from-scratch recompute over base ∪ streamed survivors
      // every survivor's postings entered the store (the cross-session
      // visibility regression this spec caught: foreachBatch's cloned
      // session refreshed only its own relation cache on append)
      val (postNow, _, _) = DedupArtifacts.read(spark, prefix)
      val storeDocs = postNow.select("doc_id").distinct().as[Long].collect().toSet
      assert((streamedSurvivors -- storeDocs).isEmpty,
        s"survivors missing from store: ${(streamedSurvivors -- storeDocs).toSeq.sorted}")
      val (_, _, dfNow) = DedupArtifacts.read(spark, prefix)
      val expectedDf = LlmOps.baseArtifacts(
        base.select("doc_id", "text").unionByName(
          spark.table(survivorsTable).select("doc_id", "text")))._3
      val got = dfNow.as[(String, Long)].collect().toMap
      val want = expectedDf.as[(String, Long)].collect().toMap
      val diff = (got.keySet ++ want.keySet).toSeq.sorted
        .flatMap { k =>
          if (got.get(k) != want.get(k))
            Some(s"$k: store=${got.get(k)} expected=${want.get(k)}")
          else None
        }
      assert(diff.isEmpty, s"df drift (${diff.size}):\n${diff.take(20).mkString("\n")}")
    } finally {
      allTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Caches.release(spark)
    }
  }
}
