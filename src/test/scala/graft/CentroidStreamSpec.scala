package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.CentroidStream

case class CenDoc(doc_id: Long, lang: String, text: String)

/** The streaming centroid trainer (§2.K, r13): folding labeled docs
  * into the class-sum store — in ANY batching — must reproduce the
  * one-shot trainer EXACTLY (long sums are associative/commutative),
  * and classifying against the streamed store must equal the batch
  * `j_quality_centroid` output row for row, because the store holds
  * exact sums and the assignment runs the same shared code.
  */
class CentroidStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drop(t: String): Unit =
    graft.operators.DedupArtifacts.reset(spark, t)

  private lazy val trainDocs = Tables.documents(spark, sfDir)
    .filter(TextOps.splitBucket(col("doc_id")) < 80)
    .select("doc_id", "lang", "text")
  private lazy val testDocs = Tables.documents(spark, sfDir)
    .filter(TextOps.splitBucket(col("doc_id")) >= 80)
    .select("doc_id", "lang", "text")

  private def storeRows(t: String): Set[(Long, Long, Long, Long, Long, Long, Long)] =
    spark.table(t).select("cls", "n", "s1", "s2", "s3", "s4", "s5")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet

  private lazy val oneShot =
    TextOps.centroidTrain(TextOps.centroidFeatures(trainDocs))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet

  test("micro-batch folds equal the one-shot trainer under any " +
    "batching; classification from the store equals the batch entry") {
    drop("cen_store3"); drop("cen_store5")
    for (k <- 0 until 3)
      CentroidStream.foldBatch(spark, "cen_store3",
        trainDocs.filter(pmod(col("doc_id"), lit(3)) === k))
    for (k <- 0 until 5)
      CentroidStream.foldBatch(spark, "cen_store5",
        trainDocs.filter(pmod(col("doc_id"), lit(5)) === k))
    assert(storeRows("cen_store3") == oneShot)
    assert(storeRows("cen_store5") == oneShot)
    val expected = SparkEntry.queries("j_quality_centroid")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = CentroidStream.classify(spark, "cen_store3", testDocs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected, "store-read classifier diverged from the entry")
  }

  test("replay idempotence: re-folding a committed batchId changes " +
    "nothing; a NEW batchId with the same rows would double-count " +
    "(the guard is the batchId, not the data)") {
    drop("cen_replay")
    val b0 = trainDocs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b1 = trainDocs.filter(pmod(col("doc_id"), lit(2)) === 1)
    CentroidStream.foldBatch(spark, "cen_replay", b0, Some(0L))
    CentroidStream.foldBatch(spark, "cen_replay", b1, Some(1L))
    val committed = storeRows("cen_replay")
    assert(committed == oneShot)
    // engine re-delivery of batch 1 (crash between rename and
    // checkpoint commit): the guard must skip it
    CentroidStream.foldBatch(spark, "cen_replay", b1, Some(1L))
    assert(storeRows("cen_replay") == committed, "replay double-counted")
    // sanity that the guard has teeth: the same rows under a fresh id
    // DO fold again (sums are additive, not idempotent)
    CentroidStream.foldBatch(spark, "cen_replay", b1, Some(2L))
    assert(storeRows("cen_replay") != committed,
      "the double-count probe did not fold — the replay test is vacuous")
  }

  test("the foreachBatch stream folds to the same store as the batch " +
    "fold, and classification from it matches the entry") {
    implicit val ctx = spark.sqlContext
    drop("cen_stream")
    val rows = trainDocs.as[CenDoc].collect()
    val input = MemoryStream[CenDoc]
    val q = CentroidStream.start(input.toDF(), "cen_stream")
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      input.addData(h1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception)
    } finally q.stop()
    assert(storeRows("cen_stream") == oneShot, "streamed store diverged")
    val expected = SparkEntry.queries("j_quality_centroid")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = CentroidStream.classify(spark, "cen_stream", testDocs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected)
  }
}
