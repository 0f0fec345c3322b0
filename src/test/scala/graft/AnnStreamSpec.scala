package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, AnnOps}
import graft.streaming.AnnStream

case class DeltaVec(vec_id: Long, u: Seq[Double])

/** Streaming ANN ingest: micro-batched index maintenance equals the
  * one-shot assign+append on the same vectors, with zero re-clustering.
  */
class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Double*): Seq[Double] = {
    val a = xs.toArray
    val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n).toSeq
  }

  test("streamed micro-batches equal one-shot assign+append; no Lloyd " +
    "job after the initial build") {
    graft.functions.VectorExprs.register(spark)
    implicit val ctx = spark.sqlContext
    val sPrefix = "graft_ivf_stream_t"
    val bPrefix = "graft_ivf_stream_batch_t"
    val all = Seq(sPrefix, bPrefix)
      .flatMap(p => Seq(AnnIndex.centTable(p), AnnIndex.cellsTable(p)))
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val base = Seq(
        (0L, v(1.0, 0.1, 0.0, 0.0)), (1L, v(0.0, 0.1, 1.0, 0.0)),
        (2L, v(1.0, -0.1, 0.0, 0.0)), (3L, v(0.0, -0.1, 1.0, 0.0))
      ).toDF("vec_id", "u")
      AnnIndex.write(base, sPrefix, k = 2, iters = 3, maxSample = 4, nBuckets = 2)
      AnnIndex.write(base, bPrefix, k = 2, iters = 3, maxSample = 4, nBuckets = 2)
      val delta = Seq(
        DeltaVec(100L, v(1.0, 0.05, 0.0, 0.0)),
        DeltaVec(101L, v(0.05, 0.0, 1.0, 0.0)),
        DeltaVec(102L, v(0.9, 0.2, 0.1, 0.0)),
        DeltaVec(103L, v(0.0, 0.2, 0.9, 0.0)))

      val before = AnnOps.lloydRuns.get()
      // streamed: two micro-batches
      val input = MemoryStream[DeltaVec]
      val q = AnnStream.start(input.toDF(), sPrefix)
      try {
        input.addData(delta.take(2)); q.processAllAvailable()
        input.addData(delta.drop(2)); q.processAllAvailable()
      } finally q.stop()
      // one-shot on the twin store
      val batchDf = delta.toDF()
      AnnIndex.append(spark, bPrefix,
        AnnIndex.assign(spark, bPrefix, batchDf.select("vec_id", "u")))
      assert(AnnOps.lloydRuns.get() == before, "ingest re-clustered")

      def cellsOf(p: String) = spark.table(AnnIndex.cellsTable(p))
        .select("vec_id", "cell").as[(Long, Int)].collect().toSet
      val streamed = cellsOf(sPrefix)
      assert(streamed == cellsOf(bPrefix),
        s"streamed $streamed != one-shot ${cellsOf(bPrefix)}")
      assert(delta.map(_.vec_id).toSet.subsetOf(streamed.map(_._1)))
    } finally {
      all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Caches.release(spark)
    }
  }
}
