package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** A/B harness for the AnnIndex sizing rule at scale (r15, VERDICT r14
  * ask 7): build the stored IVF index over the 80% base split with the
  * oracle-pinned k=16 vs the production `sizedK(n) ≈ √n` rule, then
  * run the `j_ann_incremental` search shape (multi-probe 8, stored
  * cells ∪ delta homes, top-3) against each and report build/search
  * seconds. Numbers land in SCALE.md §r15.
  *
  * Usage: runMain graft.operators.AnnScale [dir] — dir defaults to the
  * sf10z Zipf stress corpus.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10z")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)
    import spark.implicits._

    val u = graft.Par.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .select(col("vec_id"), expr("graft_vdiv(v, nrm)").as("u"))
    val base = u.filter(TextOps.splitBucket(col("vec_id")) < 80)
    val delta = u.filter(TextOps.splitBucket(col("vec_id")) >= 80)
    val nRows = Tables.rowCount(spark, dir, "embeddings")
    val nBuckets = LlmOps.storeBuckets(spark)
    println(s"annscale dir=$dir n=$nRows sizedK=${AnnIndex.sizedK(nRows)}")

    def search(prefix: String): Long = {
      val (cents, cells) = AnnIndex.read(spark, prefix)
      val ranked = graft.Caches.persisted(AnnOps.ivfRank(delta, cents)
        .filter(col("rn") <= 8)
        .select(col("vec_id"), col("cell_id").as("cell"), col("u"),
          col("rn")))
      val probes = ranked.drop("rn")
      val deltaHome = ranked.filter(col("rn") === 1).drop("rn")
      val nb = DedupArtifacts.bucketCount(spark, AnnIndex.cellsTable(prefix))
      val pairs = AnnOps.pairAcrossBuckets(probes,
          cells.select("vec_id", "cell", "u"), "cell", nRows,
          candBuckets = Some(nb))
        .unionByName(AnnOps.pairAcrossBuckets(probes, deltaHome, "cell",
          nRows))
      val n = pairs
        .withColumn("rk", row_number().over(Window.partitionBy("vec_id")
          .orderBy(desc("cos"), asc("nn_id"))))
        .filter(col("rk") <= 3)
        .count()
      graft.Caches.release(spark)
      n
    }

    for ((tag, kOpt) <- Seq(("k16", Some(16)), ("sized", None))) {
      val prefix = s"graft_annscale_$tag"
      val t0 = System.nanoTime()
      val k = kOpt match {
        case Some(kk) =>
          AnnIndex.write(base, prefix, kk, iters = 5, maxSample = 256,
            nBuckets = nBuckets); kk
        case None =>
          // size from the 80% base split actually being indexed, not
          // the full-corpus footers (ADVICE r15: the footer path
          // measured sizedK(n) while indexing 0.8n rows). One count
          // job — fine in a measurement harness.
          AnnIndex.writeSized(base, base.count(), prefix,
            nBuckets = nBuckets, iters = 5)
      }
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = search(prefix)
      val tSearch = (System.nanoTime() - t1) / 1e9
      println(f"annscale $tag%-6s k=$k%-6d build=$tBuild%.1f s " +
        f"search=$tSearch%.1f s rows=$rows")
    }
    spark.stop()
  }
}
