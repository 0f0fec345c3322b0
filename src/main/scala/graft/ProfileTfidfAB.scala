package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B profiler for the j_sim_tfidf_pairs prune+merge tail (r19 opt
  * round): times the candidate stage and each tail variant — current
  * size-routed joins vs broadcast stats vs broadcast stats+vectors —
  * in TimeQ's session shape. Scratch harness in the ProfileTfidf
  * convention — not library surface. */
object ProfileTfidfAB {
  def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"STAGE $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val nDocs = Tables.rowCount(spark, d, "documents")
    println(s"nDocs=$nDocs  broadcastCapDocs=${1000000L / 64}")
    def cand(): DataFrame =
      operators.LlmOps.rareShingleCandidates(
        operators.LlmOps.shingleEx(spark, d), 50)
    def tail(docvecs: DataFrame, c: DataFrame,
             bStats: Boolean, bVecs: Boolean): DataFrame = {
      def ws(df: DataFrame) = if (bStats) broadcast(df) else df
      def wv(df: DataFrame) = if (bVecs) broadcast(df) else df
      val stats = docvecs.select(col("doc_id"), col("nrm"), col("maxw"),
        col("sumw"), col("nt"))
      val pruned = c
        .join(ws(stats.toDF("doc_a", "nrm_a", "maxw_a", "sumw_a", "nt_a")),
          "doc_a")
        .join(ws(stats.toDF("doc_b", "nrm_b", "maxw_b", "sumw_b", "nt_b")),
          "doc_b")
        .filter(least(col("sumw_a") * col("maxw_b"),
          col("sumw_b") * col("maxw_a"))
          + least(col("nt_a"), col("nt_b")) * lit(5e-7)
          >= lit(0.8) * col("nrm_a") * col("nrm_b"))
      pruned
        .join(wv(docvecs.select(col("doc_id").as("doc_a"),
          col("vec").as("vec_a"))), "doc_a")
        .join(wv(docvecs.select(col("doc_id").as("doc_b"),
          col("vec").as("vec_b"))), "doc_b")
        .withColumn("sim",
          expr("graft_wdot_h(vec_a, vec_b)") / (col("nrm_a") * col("nrm_b")))
        .filter(col("sim") >= 0.8)
        .select(col("doc_a"), col("doc_b"), Det.r4(col("sim")).as("sim"))
        .orderBy("doc_a", "doc_b")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val docvecs = Caches.persisted(operators.LlmOps.tfidfDocvecs(spark, d))
      t("docvecs build")(noop(docvecs))
      val cP = Caches.persisted(cand())
      t("cand build")(noop(cP))
      t("tail shuffled (cur)")(noop(tail(docvecs, cP, false, false)))
      t("tail bcast stats")(noop(tail(docvecs, cP, true, false)))
      t("tail bcast stats+vecs")(noop(tail(docvecs, cP, true, true)))
      if (rep == 1) {
        println("counts cur/bs/bsv: "
          + tail(docvecs, cP, false, false).count() + "/"
          + tail(docvecs, cP, true, false).count() + "/"
          + tail(docvecs, cP, true, true).count())
      }
      Caches.release(spark)
    }
    spark.stop()
  }
}
