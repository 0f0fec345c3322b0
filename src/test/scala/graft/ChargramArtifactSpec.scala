package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** The chargram-profile session artifact (r19, VERDICT r18 item 3):
  * the Cavnar–Trenkle langs×40 rank profile is corpus-snapshot
  * metadata with the lmArtifactPrefix / trainedBpeMerges contract —
  * trained once per corpus on the standing 80% split, stored as a
  * catalog table under a fingerprinted name, and resolved by a later
  * session with ZERO Spark jobs (tableExists is metadata-only).
  * Stored must equal direct exactly, or the j_langid_chargram oracle
  * hash would move.
  */
class ChargramArtifactSpec extends SparkSpec {

  test("stored profile equals the directly-trained profile and the " +
    "entry's predictions are unchanged") {
    val table = TextOps.chargramProfileTable(spark, sfDir)
    val stored = spark.table(table)
      .orderBy("p_lang", "prk").collect().toSeq
    assert(stored.nonEmpty)
    // direct: the exact pre-r19 in-flight derivation
    val docs = Par.spread(
      Tables.documents(spark, sfDir).select("doc_id", "lang", "text"))
    val direct = TextOps.chargramProfile(
      docs.filter(TextOps.splitBucket(col("doc_id")) < 80), 40)
      .orderBy("p_lang", "prk").collect().toSeq
    assert(stored == direct, "stored chargram profile diverged from direct")
    // and the registry entry still produces rows over the 20% split
    assert(SparkEntry.queries("j_langid_chargram")(spark, sfDir)
      .count() > 0)
  }

  test("a second session resolves the profile with zero train jobs " +
    "(metadata-only tableExists probe)") {
    TextOps.chargramProfileTable(spark, sfDir)
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
      val t = TextOps.chargramProfileTable(s2, sfDir)
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      assert(jobs.get() == 0,
        s"second-session profile resolution ran ${jobs.get()} jobs")
      assert(s2.table(t).count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
