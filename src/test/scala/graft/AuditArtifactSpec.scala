package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.operators.CorpusPipeline

/** The stored audit ledger (r18, VERDICT r17 item 1): the run ledger
  * is corpus-snapshot metadata with the artifact-store contract — the
  * registry entries read a catalog table built once per (session,
  * corpus, gate); a later session resolves it with ZERO jobs; and the
  * stored rows are exactly what a direct [[CorpusPipeline.audit]]
  * computation produces (so the oracle hash cannot move).
  */
class AuditArtifactSpec extends SparkSpec {

  test("the stored ledger equals a direct audit computation for both " +
    "gates (value identity — the artifact moves no output bit)") {
    for (gate <- Seq("heuristic", "lm")) {
      val key = if (gate == "lm") "j_pipeline_audit_lm" else "j_pipeline_audit"
      val stored = SparkEntry.queries(key)(spark, sfDir)
        .collect().toSeq
      Caches.release(spark)
      val direct = CorpusPipeline.audit(spark,
        Par.spread(Tables.documents(spark, sfDir)), Some(gate),
        if (gate == "lm")
          Some(CorpusPipeline.lmArtifactPrefix(spark, sfDir))
        else None).collect().toSeq
      Caches.release(spark)
      assert(stored == direct && stored.size == 5, s"gate=$gate")
    }
  }

  test("a second session resolves the stored ledger with zero stage " +
    "jobs (metadata-only tableExists probe)") {
    CorpusPipeline.auditLedgerTable(spark, sfDir, "heuristic")
    val s2 = spark.newSession()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // drain build-phase events out of the window (r19, ADVICE r18:
      // deterministic replacement for the fixed sleep)
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      jobs.set(0)
      val t = CorpusPipeline.auditLedgerTable(s2, sfDir, "heuristic")
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      assert(jobs.get() == 0,
        s"second-session ledger resolution ran ${jobs.get()} jobs")
      assert(s2.table(t).count() == 5)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
