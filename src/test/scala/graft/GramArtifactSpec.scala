package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.operators.AnnOps

/** The Gram-matrix session artifact (r19): the centered upper-triangle
  * cell sums behind j_embed_pca_power are corpus-snapshot metadata with
  * the chargramProfileTable / lmArtifactPrefix contract — computed once
  * per corpus by the two distributed passes, stored as a one-row
  * catalog table under a fingerprinted name, and resolved by a later
  * session with ZERO Spark jobs (tableExists is metadata-only). Stored
  * must equal the direct pass bit-for-bit, or the entry's oracle hash
  * would move (the driver eigensolve replays the same float ops either
  * way).
  */
class GramArtifactSpec extends SparkSpec {

  test("stored gram cells equal the direct distributed pass and the " +
    "entry still emits the 64 loadings") {
    val table = AnnOps.gramTable(spark, sfDir)
    val row = spark.table(table).head()
    val (storedN, storedMu, storedCells) =
      (row.getLong(0), row.getSeq[Double](1), row.getSeq[Double](2))
    // direct: the exact pre-store in-flight derivation
    val (directN, directMu, directCells) = AnnOps.gramCells(spark, sfDir)
    assert(storedN == directN)
    assert(storedMu.size == 64 && directMu.length == 64)
    assert(storedCells.size == 2080 &&
      directCells.length == 2080)
    assert(storedMu == directMu.toSeq,
      "stored gram means diverged from the direct pass")
    assert(storedCells == directCells.toSeq,
      "stored gram cells diverged from the direct pass")
    assert(SparkEntry.queries("j_embed_pca_power")(spark, sfDir)
      .count() == 64)
  }

  test("a second session resolves the gram table with zero jobs " +
    "(metadata-only tableExists probe)") {
    AnnOps.gramTable(spark, sfDir)
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
      val t = AnnOps.gramTable(s2, sfDir)
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      assert(jobs.get() == 0,
        s"second-session gram resolution ran ${jobs.get()} jobs")
      assert(s2.table(t).count() == 1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
