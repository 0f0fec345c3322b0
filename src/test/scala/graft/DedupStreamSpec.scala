package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{DedupArtifacts, LlmOps, TextOps}
import graft.streaming.DedupStream

case class DeltaDoc(doc_id: Long, text: String)

/** Streaming delta dedup (VERDICT r5 ask #4): the crawl streamed in
  * micro-batches against the standing stored corpus produces EXACTLY
  * the decisions of the one-shot batch `j_dedup_incremental` on the
  * same delta — including a batch-2 doc duping a batch-1 survivor it
  * can only know through the store.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches equal the batch j_dedup_incremental " +
    "decisions on the same delta") {
    graft.functions.VectorExprs.register(spark)
    implicit val ctx = spark.sqlContext
    val prefix = "graft_stream_inc_t"
    val resultTable = "graft_stream_inc_res"
    (Seq(DedupArtifacts.postTable(prefix), DedupArtifacts.sizesTable(prefix),
      DedupArtifacts.dfTable(prefix)) :+ resultTable)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = LlmOps.dedupDocs(spark, sfDir)
      val base = docs.filter(TextOps.splitBucket(col("doc_id")) < 80)
        .select("doc_id", "text")
      val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
        .select("doc_id", "text")
      DedupArtifacts.write(base, prefix, nBuckets = 4)

      // the one-shot batch twin on the identical base/delta split
      val expected = SparkEntry.queries("j_dedup_incremental")(spark, sfDir)
        .as[(Long, Long)].collect().toMap
      Caches.release(spark)

      // stream the delta in three id-ordered micro-batches
      val chunks = delta.as[DeltaDoc].collect().sortBy(_.doc_id)
        .grouped(math.max(1, (delta.count().toInt + 2) / 3)).toSeq
      assert(chunks.length >= 2, "need multiple micro-batches for the test")
      val input = MemoryStream[DeltaDoc]
      val q = DedupStream.start(input.toDF(), prefix, resultTable,
        cutoff = LlmOps.DfCutoff, tau = LlmOps.DefaultTau)
      try {
        chunks.foreach { c =>
          input.addData(c.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()

      val streamed = spark.table(resultTable)
        .as[(Long, Long)].collect().toMap
      assert(streamed == expected,
        s"streamed $streamed\nexpected $expected")
      assert(streamed.nonEmpty, "fixture produced no dups — test is vacuous")

      // cross-batch composition really happened: at least one decision
      // was made in a later micro-batch than its partner arrived in
      // (otherwise every dup is within one micro-batch and the store
      // contributed nothing delta-side)
      val batchOf = chunks.zipWithIndex.flatMap { case (c, i) =>
        c.map(_.doc_id -> i)
      }.toMap
      val crossBatch = streamed.exists { case (doc, dupOf) =>
        batchOf.get(dupOf).exists(_ < batchOf(doc))
      }
      val baseDup = streamed.exists { case (_, dupOf) =>
        !batchOf.contains(dupOf)
      }
      assert(crossBatch || baseDup,
        "no decision crossed a batch/store boundary — weak fixture split")
    } finally {
      (Seq(DedupArtifacts.postTable(prefix), DedupArtifacts.sizesTable(prefix),
        DedupArtifacts.dfTable(prefix)) :+ resultTable)
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Caches.release(spark)
    }
  }
}
