package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{DedupArtifacts, LlmOps, TextOps}
import graft.streaming.ClusterStream

/** Streaming cluster-label maintenance: micro-batches folded into the
  * standing label table reproduce the one-shot incremental labels, and
  * a bridge doc REMAPS merged standing clusters in the store.
  */
class ClusterStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dropStore(prefix: String): Unit =
    Seq(DedupArtifacts.postTable(prefix), DedupArtifacts.sizesTable(prefix),
      DedupArtifacts.dfTable(prefix), LlmOps.clusterTable(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("streamed id-ordered micro-batches reproduce the one-shot " +
    "incremental labels on the fixture split") {
    graft.functions.VectorExprs.register(spark)
    implicit val ctx = spark.sqlContext
    val prefix = "graft_cstream_t"
    dropStore(prefix)
    try {
      val docs = LlmOps.dedupDocs(spark, sfDir)
      val base = docs.filter(TextOps.splitBucket(col("doc_id")) < 80)
        .select("doc_id", "text")
      val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
        .select("doc_id", "text")
      DedupArtifacts.write(base, prefix, nBuckets = 4)
      LlmOps.buildStoredLabels(spark, prefix, LlmOps.DfCutoff,
        LlmOps.DefaultTau)

      // one-shot twin on the same split, computed before any append
      val (bp, bs, bd) = DedupArtifacts.read(spark, prefix)
      val oneShot = LlmOps.incrementalClusters(
          spark.table(LlmOps.clusterTable(prefix)),
          LlmOps.incrementalPairs(bp, bs, bd, delta,
            LlmOps.DfCutoff, LlmOps.DefaultTau))
        .as[(Long, Long)].collect().toMap
      Caches.release(spark)

      val chunks = delta.as[DeltaDoc].collect().sortBy(_.doc_id)
        .grouped(math.max(1, (delta.count().toInt + 1) / 2)).toSeq
      assert(chunks.length >= 2)
      val input = MemoryStream[DeltaDoc]
      val q = ClusterStream.start(input.toDF(), prefix,
        LlmOps.DfCutoff, LlmOps.DefaultTau)
      try {
        chunks.foreach { c =>
          input.addData(c.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()

      val deltaIds = delta.select("doc_id").as[Long].collect().toSet
      spark.catalog.refreshTable(LlmOps.clusterTable(prefix))
      val streamed = spark.table(LlmOps.clusterTable(prefix))
        .as[(Long, Long)].collect().filter(r => deltaIds(r._1)).toMap
      // every one-shot label is reproduced...
      assert(oneShot.nonEmpty)
      oneShot.foreach { case (docId, lbl) =>
        assert(streamed.get(docId).contains(lbl),
          s"doc $docId: streamed ${streamed.get(docId)} expected $lbl")
      }
      // ...and the only extra rows are cluster ANCHORS: a later batch
      // labels its stored partner (the cluster minimum) explicitly,
      // where the one-shot doc-side convention leaves it implicit
      (streamed.keySet -- oneShot.keySet).foreach { k =>
        assert(streamed(k) == k && oneShot.values.exists(_ == k),
          s"unexpected extra label $k -> ${streamed(k)}")
      }
    } finally {
      dropStore(prefix)
      Caches.release(spark)
    }
  }

  test("a bridge doc merges standing clusters: store remapped, " +
    "later batches label through the merged id") {
    graft.functions.VectorExprs.register(spark)
    val prefix = "graft_cstream_m"
    dropStore(prefix)
    try {
      val a = "a b c d e f g h i j"
      val b = "q r s t u v w x y z"
      val base = Seq((1L, a), (2L, a), (5L, b), (6L, b))
        .toDF("doc_id", "text")
      DedupArtifacts.write(base, prefix, nBuckets = 2)
      LlmOps.buildStoredLabels(spark, prefix, cutoff = 50, tau = 0.3)
      assert(spark.table(LlmOps.clusterTable(prefix))
        .as[(Long, Long)].collect().toMap ==
        Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))

      // batch 1: doc 100 overlaps BOTH texts (jac ≈ 0.44 to each at
      // tau 0.3) — a bridge that merges clusters 1 and 5
      ClusterStream.runBatch(Seq((100L, s"$a $b")).toDF("doc_id", "text"),
        prefix, cutoff = 50, tau = 0.3)
      val afterBridge = spark.table(LlmOps.clusterTable(prefix))
        .as[(Long, Long)].collect().toMap
      assert(afterBridge ==
        Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 100L -> 1L),
        afterBridge.toString)

      // batch 2: doc 200 duplicates text B — it can only know B's docs
      // through the store, and must label through the MERGED id
      ClusterStream.runBatch(Seq((200L, b)).toDF("doc_id", "text"),
        prefix, cutoff = 50, tau = 0.3)
      val after2 = spark.table(LlmOps.clusterTable(prefix))
        .as[(Long, Long)].collect().toMap
      assert(after2(200L) == 1L, after2.toString)
    } finally {
      dropStore(prefix)
      Caches.release(spark)
    }
  }
}
