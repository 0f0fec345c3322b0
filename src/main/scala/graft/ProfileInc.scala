package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the incremental-dedup family —
  * breaks the steady-state cost of j_dedup_clusters_incremental /
  * j_dedup_incremental_stored into its pipeline stages so the heavy
  * one is attributable. Not part of the library surface.
  */
object ProfileInc {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label%-34s ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.functions.VectorExprs.register(spark)

    // one-time store + label build (memoized) — measure it separately
    t("store build (one-time)") {
      operators.LlmOps.storedArtifactPrefix(spark, d)
    }
    t("label table build (one-time)") {
      operators.LlmOps.storedClusterTable(spark, d)
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val prefix = operators.LlmOps.storedArtifactPrefix(spark, d)
      val labels = spark.table(operators.LlmOps.storedClusterTable(spark, d))
      val (bp, bs, bd) = operators.DedupArtifacts.read(spark, prefix)
      val delta = t("delta split") {
        val x = operators.LlmOps.dedupDocs(spark, d)
          .filter(operators.TextOps.splitBucket(col("doc_id")) >= 80)
        x.count(); x
      }
      // dissect incrementalPairs stage by stage (mirrors its body)
      val cutoff = operators.LlmOps.dedupDfCutoff(spark)
      val deltaPost = t("  deltaPost shingle+explode") {
        val x = graft.Caches.persisted(delta
          .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
          .select(col("doc_id"), explode(col("sh")).as("shingle")))
        println(s"  deltaPost=${x.count()}"); x
      }
      val deltaDf = deltaPost.groupBy("shingle")
        .agg(count(lit(1)).as("ddf"))
      val combDf = t("  combDf full join") {
        val x = bd.toDF("shingle", "bdf")
          .join(deltaDf, Seq("shingle"), "full")
          .select(col("shingle"),
            (coalesce(col("bdf"), lit(0L)) + coalesce(col("ddf"), lit(0L)))
              .as("df"))
        println(s"  combDf=${x.count()}"); x
      }
      val rareSh = t("  rareSh filter") {
        val x = graft.Caches.persisted(
          combDf.filter(col("df") <= cutoff).select("shingle"))
        println(s"  rareSh=${x.count()}"); x
      }
      val rareDelta = t("  rareDelta join") {
        val x = graft.Caches.persisted(deltaPost.join(rareSh, "shingle"))
        println(s"  rareDelta=${x.count()}"); x
      }
      val candBase = t("  candBase join vs stored post") {
        val x = rareDelta.as("dd").join((bp.join(rareSh, "shingle")).as("b"),
            col("dd.shingle") === col("b.shingle") &&
              col("dd.doc_id") =!= col("b.doc_id"))
          .select(col("dd.doc_id").as("doc"), col("b.doc_id").as("partner"))
          .distinct()
        println(s"  candBase=${x.count()}"); x
      }
      val pairs = t("incrementalPairs (full)") {
        val p = operators.LlmOps.incrementalPairs(bp, bs, bd, delta,
          cutoff, operators.LlmOps.cascadeTau(spark))
        println(s"  pairs=${p.count()}")
        p
      }
      t("incrementalClusters") {
        operators.LlmOps.incrementalClusters(labels, pairs).count()
      }
      t("full query") {
        SparkEntry.queries("j_dedup_clusters_incremental")(spark, d).count()
      }
      t("stored dedup query") {
        SparkEntry.queries("j_dedup_incremental_stored")(spark, d).count()
      }
      Caches.release(spark)
    }
    spark.stop()
  }
}
