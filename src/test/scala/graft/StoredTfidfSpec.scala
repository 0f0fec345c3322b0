package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.operators.LlmOps

/** The tf-idf index store (r19): `j_sim_tfidf_pairs_stored` reads the
  * doc-vector and blocked-candidate tables a production pipeline
  * writes once per corpus snapshot. Pins: (1) stored == in-flight row
  * equality (the shared prune/verify path must see identical inputs);
  * (2) the steady-state plan never scans the corpus — no
  * documents.parquet leaf anywhere, because both derivation passes
  * live behind the store; (3) a second session resolves the index
  * with zero build jobs (the lmArtifactPrefix contract).
  */
class StoredTfidfSpec extends SparkSpec {

  test("stored entry equals the in-flight entry row for row, and its " +
    "plan never scans documents.parquet") {
    val inflight = SparkEntry.queries("j_sim_tfidf_pairs")(spark, sfDir)
      .collect().toSeq
    Caches.release(spark)
    val storedDf = SparkEntry.queries("j_sim_tfidf_pairs_stored")(spark, sfDir)
    val stored = storedDf.collect().toSeq
    assert(stored.nonEmpty, "no pairs on the fixture — vacuous test")
    assert(stored == inflight, "stored tf-idf index diverged from in-flight")
    val scans = storedDf.queryExecution.executedPlan.toString
    assert(!scans.contains("documents.parquet"),
      s"steady-state stored plan still scans the corpus:\n$scans")
    Caches.release(spark)
  }

  test("a second session resolves the index with zero build jobs") {
    LlmOps.tfidfIndexPrefix(spark, sfDir)
    val s2 = spark.newSession()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      jobs.set(0)
      val p = LlmOps.tfidfIndexPrefix(s2, sfDir)
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      assert(jobs.get() == 0,
        s"second-session index resolution ran ${jobs.get()} jobs")
      assert(s2.table(s"${p}_vec").count() > 0)
      assert(s2.table(s"${p}_cand").count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
