package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, LlmOps}

/** The composed corpus-cleaning pipeline must agree with the
  * standalone §2 operators stage for stage.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs0 = Par.spread(Tables.documents(spark, sfDir))
  private lazy val stages = CorpusPipeline.stages(spark, docs0)
  private lazy val audit =
    SparkEntry.queries("j_pipeline_audit")(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect()

  test("audit rows chain: docs_in(k+1) == docs_out(k), drops add up") {
    assert(audit.map(_._2).toSeq == CorpusPipeline.StageNames)
    audit.foreach { case (_, _, in, out, dropped) =>
      assert(dropped == in - out && out <= in)
    }
    audit.sliding(2).foreach { case Array(prev, next) =>
      assert(next._3 == prev._4, s"stage chain broken at ${next._2}")
    }
    assert(audit.head._3 == docs0.count())
  }

  test("quality stage equals the standalone j_text_quality gate") {
    val standalone = SparkEntry.queries("j_text_quality")(spark, sfDir)
      .filter(col("tier") =!= "low").count()
    assert(audit(0)._4 == standalone)
  }

  test("dedup stage drops exactly the blocked cascade's decisions " +
    "over the stage input") {
    val s2 = stages(1)
    val ex2 = s2.select(col("doc_id"),
        expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dups = LlmOps.dedupCascadeBlocked(ex2, 50, 0.6).count()
    assert(audit(2)._5 == dups)
  }

  test("decontaminated survivors share no shingle with the benchmark") {
    val bench = docs0.filter(col("doc_id") < 5)
      .select(explode(expr("graft_shingles(text, 3)")).as("shingle"))
      .distinct()
    val overlap = stages(3)
      .select(col("doc_id"), explode(expr("graft_shingles(text, 3)"))
        .as("shingle"))
      .join(bench, "shingle")
    assert(overlap.count() == 0)
  }

  test("mix downsample equalizes every source to the smallest one") {
    val perSource = stages(4).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perSource.values.toSet.size == 1,
      s"sources unbalanced: $perSource")
    val s4min = stages(3).groupBy("source").count()
      .agg(min("count")).head().getLong(0)
    assert(perSource.values.head == s4min)
  }

  test("audit ledger is invariant to a +1e9 doc_id shift (r15: the " +
    "benchmark set is rank-based, not id-literal)") {
    // every stage decision is order- or content-based (quality: text
    // only; langid: token counts; dedup: min-partner over id ORDER;
    // decontaminate: the 5 LOWEST ids; mix: row_number by id), so
    // shifting the id space must not move a single ledger cell. The
    // pre-r15 `doc_id < 5` benchmark literal silently matched NOTHING
    // here — this test has teeth only while the unshifted stage 4
    // drops docs, asserted below.
    assert(audit(3)._5 > 0,
      "fixture regression: decontaminate drops nothing, shift test is vacuous")
    val shifted = docs0.withColumn("doc_id", col("doc_id") + 1000000000L)
    val shiftedAudit = CorpusPipeline.audit(spark, shifted, Some("heuristic"))
      .as[(Long, String, Long, Long, Long)].collect()
    assert(shiftedAudit.toSeq == audit.toSeq)
    graft.Caches.release(spark)
  }

  test("the quality-gate conf flips stage 1: conf-driven audit equals " +
    "the explicit lm entry, and the lm stage equals the standalone " +
    "LM-filter arithmetic") {
    val lmAudit = SparkEntry.queries("j_pipeline_audit_lm")(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect()
    // conf-driven run (no explicit gate) must equal the explicit entry
    spark.conf.set(CorpusPipeline.QualityGateKey, "lm")
    try {
      val byConf = CorpusPipeline.audit(spark, docs0)
        .as[(Long, String, Long, Long, Long)].collect()
      assert(byConf.toSeq == lmAudit.toSeq,
        "conf-driven lm audit differs from the explicit entry")
    } finally spark.conf.unset(CorpusPipeline.QualityGateKey)
    graft.Caches.release(spark)
    // the two ledgers are the same pipeline from stage 2 on: both
    // conserve docs row-to-row, and stage 1 is where they differ
    val heur = audit
    assert(lmAudit.map(_._2).toSeq == CorpusPipeline.StageNames)
    lmAudit.foreach { case (_, _, in, out, dropped) =>
      assert(in - out == dropped)
    }
    assert(lmAudit.head._3 == heur.head._3,
      "both gates must read the same raw corpus")
    assert(lmAudit.head._4 != heur.head._4 ||
      lmAudit.map(_._4).toSeq == heur.map(_._4).toSeq,
      "sanity: gates may only differ starting at stage 1's survivors")
    // stage-1 survivor count equals the standalone LM-gate arithmetic
    // applied to the full corpus (keep >= 25th percentile of scores)
    val txt = docs0.select(col("doc_id"), col("text"))
    val scored = graft.operators.TextOps.bigramLmScore(
      txt.filter(graft.operators.TextOps.splitBucket(col("doc_id")) < 80),
      txt)
    val thr = scored.agg(expr("percentile(lm_score, 0.25)")).head().getDouble(0)
    val expectKeep = scored.filter(col("lm_score") >= thr).count()
    assert(lmAudit.head._4 == expectKeep,
      s"lm stage-1 survivors ${lmAudit.head._4} != standalone $expectKeep")
    graft.Caches.release(spark)
  }
}
