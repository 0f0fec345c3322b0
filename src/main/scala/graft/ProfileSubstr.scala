package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage breakdown for j_dedup_substring (r20, guide §1): window
  * explosion, df pass, in-cell candidate explode, string verify, each
  * timed with the noop sink in the ProfileTfidfAB session shape.
  * Scratch harness — not library surface. */
object ProfileSubstr {
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
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val ex = Caches.persisted(operators.LlmOps.dedupDocs(spark, d)
        .select(col("doc_id"),
          explode(expr("graft_shingles(text, 8)")).as("w")))
      t("1 window explode+persist")(noop(ex))
      val fps = ex.select(col("doc_id"), xxhash64(col("w")).as("fp"))
      val dfreq = Caches.persisted(
        fps.groupBy("fp").agg(count(lit(1)).as("df")))
      t("2 dfreq")(noop(dfreq))
      val rare = fps.join(dfreq.filter(col("df") <= 50), "fp")
        .select("doc_id", "fp")
      val cand = Caches.persisted(
        operators.LlmOps.boundedPairExplode(rare, "fp"))
      t("3 rare+pairExplode")(noop(cand))
      val ea = ex.select(col("doc_id").as("doc_a"), col("w"))
      val eb = ex.select(col("doc_id").as("doc_b"), col("w"))
      val out = cand.join(ea, "doc_a").join(eb, Seq("doc_b", "w"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_windows"))
      t("4 string verify")(noop(out))
      t("5 full-from-persists")(noop(out.orderBy("doc_a", "doc_b")))
      if (rep == 1) println("pairs=" + out.count())
      // variant B: ONE exchange of the postings — repartition by fp
      // once, then dfreq, the rare join and the in-cell group all ride
      // that co-partitioning
      val fpsB = Caches.persisted(fps.repartition(col("fp")))
      t("3b fps repartition+persist")(noop(fpsB))
      val dfreqB = fpsB.groupBy("fp").agg(count(lit(1)).as("df"))
      val rareB = fpsB.join(dfreqB.filter(col("df") <= 50), "fp")
        .select("doc_id", "fp")
      val candB = Caches.persisted(
        operators.LlmOps.boundedPairExplode(rareB, "fp"))
      t("3b candidates co-part")(noop(candB))
      if (rep == 1) println("candA=" + cand.count() + " candB=" + candB.count())
      Caches.release(spark)
    }
    spark.stop()
  }
}
