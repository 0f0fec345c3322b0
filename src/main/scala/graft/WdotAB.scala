package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Same-session A/B of the tf-idf merge-verify kernel (r20): the
  * string-term kernel (graft_wdot over term-sorted vectors) vs the
  * hashed-term kernel (graft_wdot_h over xxhash64-sorted vectors),
  * both packings built from the SAME (doc_id, term, w) rows and the
  * same persisted candidate set, timed with the noop sink (guide
  * §1.4) in the ProfileTfidfAB session shape. Also asserts the two
  * sims are value-identical over the full output. Scratch harness —
  * not library surface. */
object WdotAB {
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val nDocs = Tables.rowCount(spark, d, "documents")
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Caches.persisted(tf.join(dfreq, "term")
      .withColumn("w", col("tf") * log(lit(nDocs.toDouble) / col("df"))))
    val cand = Caches.persisted(operators.LlmOps.rareShingleCandidates(
      operators.LlmOps.shingleEx(spark, d), 50))
    def pack(vecCol: org.apache.spark.sql.Column): DataFrame =
      Caches.persisted(w.groupBy("doc_id")
        .agg(sort_array(collect_list(vecCol)).as("vec"),
          sqrt(Det.dsum(col("w") * col("w"))).as("nrm")))
    val vS = pack(struct(col("term"), col("w")))
    val vH = pack(struct(xxhash64(col("term")).as("h"), col("w")))
    def tail(v: DataFrame, fn: String): DataFrame = cand
      .join(v.select(col("doc_id").as("doc_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a")), "doc_a")
      .join(v.select(col("doc_id").as("doc_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), "doc_b")
      .withColumn("sim",
        expr(s"$fn(vec_a, vec_b)") / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= 0.8)
      .select(col("doc_a"), col("doc_b"), Det.r4(col("sim")).as("sim"))
    t("warm vS")(noop(vS)); t("warm vH")(noop(vH)); t("warm cand")(noop(cand))
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("merge string kernel")(noop(tail(vS, "graft_wdot")))
      t("merge hashed kernel")(noop(tail(vH, "graft_wdot_h")))
    }
    val a = tail(vS, "graft_wdot").orderBy("doc_a", "doc_b").collect().toSeq
    val b = tail(vH, "graft_wdot_h").orderBy("doc_a", "doc_b").collect().toSeq
    println(s"equal=${a == b} nA=${a.size} nB=${b.size}")
    Caches.release(spark)
    spark.stop()
  }
}
