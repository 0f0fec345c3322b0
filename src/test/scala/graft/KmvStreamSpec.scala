package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.streaming.KmvStream

case class KmvEv(event_type: String, user_id: Long)

/** The streaming KMV distinct-count store (§2.K, r12): because
  * bottom-k-of-union ≡ union-of-bottom-ks EXACTLY, the streamed store
  * must equal the one-shot sketch — set equality, not an error bound —
  * and the estimates must equal the batch entry's on the same data.
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drop(t: String): Unit =
    graft.operators.DedupArtifacts.reset(spark, t)

  private def oneShot(of: org.apache.spark.sql.DataFrame) = {
    graft.functions.VectorExprs.register(spark)
    of.withColumn("hv", expr(Sketches.lehmerHash("user_id")))
      .groupBy("event_type")
      .agg(expr(s"graft_kmv(hv, ${Sketches.KmvK})").as("sk"))
      .select(col("event_type"), col("sk"))
      .as[(String, Seq[Long])].collect().toMap
  }

  test("any batching folds to exactly the one-shot sketch, and the " +
    "store's estimates equal d_agg_approx_distinct") {
    val ev = Tables.events(spark, sfDir).select("event_type", "user_id")
    drop("kmv_store_b3"); drop("kmv_store_b7")
    for (k <- 0 until 3)
      KmvStream.foldBatch(spark, "kmv_store_b3",
        ev.filter(pmod(col("user_id"), lit(3)) === k))
    for (k <- 0 until 7)
      KmvStream.foldBatch(spark, "kmv_store_b7",
        ev.filter(pmod(col("user_id") * 3 + length(col("event_type")),
          lit(7)) === k))
    val want = oneShot(ev)
    Seq("kmv_store_b3", "kmv_store_b7").foreach { t =>
      val got = spark.table(t).as[(String, Seq[Long])].collect().toMap
      assert(got == want, s"$t drifted from the one-shot sketch")
    }
    val est = KmvStream.estimate(spark, "kmv_store_b3")
      .as[(String, Long)].collect().toSeq
    val batch = SparkEntry.queries("d_agg_approx_distinct")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(est == batch, s"streamed $est vs batch $batch")
  }

  test("foreachBatch stream folds to the one-shot store; publish " +
    "crash window recovers") {
    implicit val ctx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select("event_type", "user_id").as[KmvEv].collect()
    drop("kmv_store_s"); drop("kmv_store_s_next")
    val input = MemoryStream[KmvEv]
    val q = KmvStream.start(input.toDF(), "kmv_store_s")
    try {
      val (h1, h2) = evs.splitAt(evs.length / 2)
      input.addData(h1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception)
    } finally q.stop()
    val want = oneShot(Tables.events(spark, sfDir)
      .select("event_type", "user_id"))
    val got = spark.table("kmv_store_s").as[(String, Seq[Long])]
      .collect().toMap
    assert(got == want)
    // crash window: store stranded as _next — estimate() recovers it
    spark.sql("ALTER TABLE kmv_store_s RENAME TO kmv_store_s_next")
    val est = KmvStream.estimate(spark, "kmv_store_s")
      .as[(String, Long)].collect()
    assert(est.nonEmpty && spark.catalog.tableExists("kmv_store_s"))
  }
}
