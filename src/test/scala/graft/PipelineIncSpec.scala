package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, LlmOps}

/** The incremental corpus pipeline: a delta batch cleaned against the
  * standing corpus through stored artifacts only — no base text in the
  * delta run's plan.
  */
class PipelineIncSpec extends SparkSpec {

  test("j_pipeline_incremental: ledger chains, and the plan touches " +
    "documents only through the delta split + stored tables") {
    graft.functions.VectorExprs.register(spark)
    val out = SparkEntry.queries("j_pipeline_incremental")(spark, sfDir)
    val rows = out.collect()
    assert(rows.map(_.getString(1)).toSeq == CorpusPipeline.IncStageNames)
    // the ledger chains: stage i's docs_out is stage i+1's docs_in,
    // drops are non-negative, and something flows end to end
    rows.sliding(2).foreach {
      case Array(cur, next) =>
        assert(cur.getLong(3) == next.getLong(2),
          s"ledger broken between ${cur.getString(1)} and ${next.getString(1)}")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
      assert(r.getLong(4) >= 0L)
    }
    assert(rows.head.getLong(2) > 0L, "empty delta — vacuous")
    assert(rows.last.getLong(3) > 0L, "nothing survived the pipeline")

    // base text never enters: every documents access is the delta
    // split; profiles/benchmark/postings come from stored tables
    val conds = out.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString
    }
    assert(conds.exists(_.contains(">= cast(80")), conds.toString)
    assert(!conds.exists(_.contains("< cast(80")),
      s"base-split scan present:\n${conds.mkString("\n")}")
    assert(!conds.exists(_.contains("< cast(5")),
      s"benchmark docs scanned in-flight:\n${conds.mkString("\n")}")
    val prefix = LlmOps.storedArtifactPrefix(spark, sfDir)
    val an = out.queryExecution.analyzed.toString
    // r10: the dedup stage reads the stored batch-verify pair table
    // instead of re-deriving pairs from the postings per run
    Seq(s"${prefix}_langprof", s"${prefix}_benchsh", s"${prefix}_dpairs")
      .foreach(t => assert(an.contains(t), s"missing stored table $t"))
    Caches.release(spark)
  }

  test("the quality stage equals the standalone j_text_quality gate " +
    "restricted to the delta split") {
    graft.functions.VectorExprs.register(spark)
    def bucketOf(id: Long): Long =
      ((id % 2147483647L) * 48271L % 2147483647L) % 100L
    val expected = SparkEntry.queries("j_text_quality")(spark, sfDir)
      .collect()
      .count(r => bucketOf(r.getLong(0)) >= 80L && r.getLong(1) >= 6000L)
      .toLong
    val audit = SparkEntry.queries("j_pipeline_incremental")(spark, sfDir)
      .collect()
    assert(audit.head.getLong(3) == expected,
      s"quality stage kept ${audit.head.getLong(3)}, standalone says $expected")
    Caches.release(spark)
  }

  test("LM-gated incremental run: the stored bigram-LM artifact yields " +
    "the same ledger as an inline-trained LM (r12)") {
    import org.apache.spark.sql.functions.col
    graft.functions.VectorExprs.register(spark)
    val prefix = CorpusPipeline.incrementalPrefix(spark, sfDir)
    val delta = LlmOps.dedupDocs(spark, sfDir)
      .filter(graft.operators.TextOps.splitBucket(col("doc_id")) >= 80L)
    val pairs = spark.table(LlmOps.storedDeltaPairs(spark, sfDir))
    // stored path: the catalog artifact tables
    val lmp = CorpusPipeline.lmArtifactPrefix(spark, sfDir)
    val stored = CorpusPipeline.incAudit(CorpusPipeline.incStages(
      spark, prefix, delta, Some(pairs),
      Some((spark.table(s"${lmp}_uni"), spark.table(s"${lmp}_big")))))
      .collect().map(_.toSeq)
    Caches.release(spark)
    // inline path: train on the same base split in the same run
    val (uni, big) = graft.operators.TextOps.bigramLmTrain(
      LlmOps.dedupDocs(spark, sfDir)
        .filter(graft.operators.TextOps.splitBucket(col("doc_id")) < 80L)
        .select("doc_id", "text"))
    val inline = CorpusPipeline.incAudit(CorpusPipeline.incStages(
      spark, prefix, delta, Some(pairs), Some((uni, big))))
      .collect().map(_.toSeq)
    assert(stored.toSeq == inline.toSeq,
      s"stored-LM ledger $stored != inline-LM ledger $inline")
    // the gate is live: the ledger chains and stage 1 saw every doc
    assert(stored.head(1) == "quality" && stored.head(2)
      .asInstanceOf[Long] > 0L)
    Caches.release(spark)
  }

  test("_benchsh registry is NON-EMPTY on an id space not rooted at 0 " +
    "(r15: rank-based benchmark set in writeAuxTables)") {
    import org.apache.spark.sql.functions.col
    graft.functions.VectorExprs.register(spark)
    // pre-r15 the registry build filtered `doc_id < 5`, so a corpus
    // whose ids start at 1e9 (the Zipf corpora) wrote ZERO benchmark
    // shingles and every downstream decontamination silently no-op'd
    val shifted = LlmOps.dedupDocs(spark, sfDir)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    val base = shifted
      .filter(graft.operators.TextOps.splitBucket(col("doc_id")) < 80L)
    val prefix = "graft_t_shiftreg"
    CorpusPipeline.writeAuxTables(spark, shifted, base, prefix)
    try {
      assert(spark.table(s"${prefix}_benchsh").count() > 0L,
        "benchmark-shingle registry empty on shifted ids")
      // and it is exactly the 5 lowest-id docs' shingle set
      val expect = shifted.orderBy("doc_id").limit(5)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("graft_shingles(text, 3)"))
          .as("shingle"))
        .distinct().count()
      assert(spark.table(s"${prefix}_benchsh").count() == expect)
    } finally Seq("_benchsh", "_langprof").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $prefix$t"))
    Caches.release(spark)
  }
}
