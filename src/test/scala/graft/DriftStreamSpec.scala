package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.DriftStream

case class DrDoc(doc_id: Long, text: String)

/** The streaming drift monitor (§2.K, r11): folding the incoming docs
  * into the count store — in ANY batching — must reproduce the batch
  * `j_corpus_drift` divergence exactly, because the store holds exact
  * counts and the divergence runs the same shared code.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drop(t: String): Unit =
    graft.operators.DedupArtifacts.reset(spark, t)

  private lazy val expected =
    SparkEntry.queries("j_corpus_drift")(spark, sfDir)
      .as[(Double, Long)].collect().toSeq

  test("micro-batch folds converge to the one-shot divergence under " +
    "any batching") {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(TextOps.splitBucket(col("doc_id")) < 80)
    val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
    drop("drift_ref_t"); drop("drift_cur3_t"); drop("drift_cur5_t")
    TextOps.termCounts(base).write.format("parquet")
      .saveAsTable("drift_ref_t")
    for (k <- 0 until 3)
      DriftStream.foldBatch(spark, "drift_cur3_t",
        delta.filter(pmod(col("doc_id"), lit(3)) === k))
    for (k <- 0 until 5)
      DriftStream.foldBatch(spark, "drift_cur5_t",
        delta.filter(pmod(col("doc_id"), lit(5)) === k))
    val got3 = DriftStream.drift(spark, "drift_ref_t", "drift_cur3_t")
      .as[(Double, Long)].collect().toSeq
    val got5 = DriftStream.drift(spark, "drift_ref_t", "drift_cur5_t")
      .as[(Double, Long)].collect().toSeq
    assert(got3 == expected, s"3-way batching: $got3 vs $expected")
    assert(got5 == expected, s"5-way batching: $got5 vs $expected")
  }

  test("the foreachBatch stream folds to the same store as the batch " +
    "fold") {
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
      .select("doc_id", "text").as[DrDoc].collect()
    drop("drift_ref_s"); drop("drift_cur_s")
    TextOps.termCounts(
      docs.filter(TextOps.splitBucket(col("doc_id")) < 80))
      .write.format("parquet").saveAsTable("drift_ref_s")
    val input = MemoryStream[DrDoc]
    val q = DriftStream.start(input.toDF(), "drift_cur_s")
    try {
      val (h1, h2) = delta.splitAt(delta.length / 2)
      input.addData(h1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception)
    } finally q.stop()
    val got = DriftStream.drift(spark, "drift_ref_s", "drift_cur_s")
      .as[(Double, Long)].collect().toSeq
    assert(got == expected, s"streamed: $got vs $expected")
  }

  test("a replayed batchId does not double-count (r12 review): the " +
    "fold is idempotent under foreachBatch redelivery") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
    drop("drift_cur_r"); drop("drift_ref_r")
    TextOps.termCounts(
      docs.filter(TextOps.splitBucket(col("doc_id")) < 80))
      .write.format("parquet").saveAsTable("drift_ref_r")
    val (h1, h2) = (delta.filter(col("doc_id") % 2 === 0),
      delta.filter(col("doc_id") % 2 =!= 0))
    DriftStream.foldBatch(spark, "drift_cur_r", h1, Some(0L))
    DriftStream.foldBatch(spark, "drift_cur_r", h2, Some(1L))
    val want = DriftStream.drift(spark, "drift_ref_r", "drift_cur_r")
      .as[(Double, Long)].collect().toSeq
    assert(want == expected)
    // the crash-between-rename-and-checkpoint-commit scenario: the
    // engine redelivers batch 1 — the fold must see its id in the
    // store and change NOTHING (the old shape double-counted here)
    DriftStream.foldBatch(spark, "drift_cur_r", h2, Some(1L))
    val after = DriftStream.drift(spark, "drift_ref_r", "drift_cur_r")
      .as[(Double, Long)].collect().toSeq
    assert(after == want, s"replayed batch double-counted: $after vs $want")
  }

  test("an empty first micro-batch does not poison the store (r13, " +
    "ADVICE r12): the next fold proceeds instead of NPE-ing on a " +
    "null max(batch_id)") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
    drop("drift_cur_e"); drop("drift_ref_e")
    TextOps.termCounts(
      docs.filter(TextOps.splitBucket(col("doc_id")) < 80))
      .write.format("parquet").saveAsTable("drift_ref_e")
    // batch 0 tokenizes to nothing → a ZERO-ROW store is published;
    // the r12 shape then NPE'd reading max(batch_id) on batch 1 and
    // permanently failed the query via foreachBatch
    DriftStream.foldBatch(spark, "drift_cur_e", delta.limit(0), Some(0L))
    assert(spark.table("drift_cur_e").isEmpty)
    DriftStream.foldBatch(spark, "drift_cur_e", delta, Some(1L))
    val got = DriftStream.drift(spark, "drift_ref_e", "drift_cur_e")
      .as[(Double, Long)].collect().toSeq
    assert(got == expected, s"post-empty-batch fold: $got vs $expected")
  }

  test("publish crash windows recover (r12, ADVICE r11): a store " +
    "stranded as _next is restored; a stale _next beside a live store " +
    "is discarded") {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(TextOps.splitBucket(col("doc_id")) < 80)
    val delta = docs.filter(TextOps.splitBucket(col("doc_id")) >= 80)
    drop("drift_ref_c"); drop("drift_cur_c"); drop("drift_cur_c_next")
    TextOps.termCounts(base).write.format("parquet")
      .saveAsTable("drift_ref_c")
    DriftStream.foldBatch(spark, "drift_cur_c", delta)
    val want = DriftStream.drift(spark, "drift_ref_c", "drift_cur_c")
      .as[(Double, Long)].collect().toSeq
    assert(want == expected)
    // crash window: _next written and main dropped, rename never ran —
    // simulate by renaming the live store INTO the _next slot
    spark.sql("ALTER TABLE drift_cur_c RENAME TO drift_cur_c_next")
    assert(!spark.catalog.tableExists("drift_cur_c"))
    val recovered = DriftStream.drift(spark, "drift_ref_c", "drift_cur_c")
      .as[(Double, Long)].collect().toSeq
    assert(recovered == want, "drift() did not recover the stranded _next")
    assert(spark.catalog.tableExists("drift_cur_c") &&
      !spark.catalog.tableExists("drift_cur_c_next"))
    // stale _next beside a LIVE store (uncommitted batch write): the
    // next fold must discard it and fold against main
    spark.table("drift_cur_c").limit(1).write.format("parquet")
      .saveAsTable("drift_cur_c_next")
    DriftStream.foldBatch(spark, "drift_cur_c",
      delta.limit(0)) // empty replayed batch: counts unchanged
    val after = DriftStream.drift(spark, "drift_ref_c", "drift_cur_c")
      .as[(Double, Long)].collect().toSeq
    assert(after == want, "stale _next leaked into the fold")
    assert(!spark.catalog.tableExists("drift_cur_c_next"))
  }
}
