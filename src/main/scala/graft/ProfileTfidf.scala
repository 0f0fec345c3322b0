package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for j_sim_tfidf_pairs (ProfileInc
  * convention — not part of the library surface). */
object ProfileTfidf {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label%-30s ${(System.nanoTime - t0) / 1e9}%.2f s")
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
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val nDocs = Tables.rowCount(spark, d, "documents")
      val docs = Tables.documents(spark, d)
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Caches.persisted(tf.join(dfreq, "term")
        .withColumn("w", col("tf") * log(lit(nDocs.toDouble) / col("df"))))
      t("w build+count") { w.count() }
      val ex = docs
        .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
      val cand = t("cand") {
        Caches.persisted(operators.LlmOps.rareShingleCandidates(ex, 50))
          .count()
        operators.LlmOps.rareShingleCandidates(ex, 50)
      }
      val num = t("verify join+agg") {
        cand
          .join(broadcast(w.select(col("doc_id").as("doc_a"), col("term"),
            col("w").as("wa"))), "doc_a")
          .join(broadcast(w.select(col("doc_id").as("doc_b"), col("term"),
            col("w").as("wb"))), Seq("doc_b", "term"))
          .groupBy("doc_a", "doc_b")
          .agg(Det.dsum(col("wa") * col("wb")).as("num"))
          .count()
      }
      println(s"num pairs: $num")
      Caches.release(spark)
    }
    spark.stop()
  }
}
