package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the r11 LM quality gate (ProfileInc
  * convention — not part of the library surface). */
object ProfileLm {
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
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val docs0 = Par.spread(Tables.documents(spark, d))
      val txt = docs0.select(col("doc_id"), col("text"))
      val scored = t("bigramLmScore + checkpoint") {
        operators.TextOps.bigramLmScore(
          txt.filter(operators.TextOps.splitBucket(col("doc_id")) < 80), txt)
          .localCheckpoint(true)
      }
      t("threshold + keep count") {
        val thr = scored.agg(expr("percentile(lm_score, 0.25)").as("thr"))
        scored.crossJoin(broadcast(thr))
          .filter(col("lm_score") >= col("thr")).count()
      }
      Caches.release(spark)
      for (gate <- Seq("lm", "heuristic")) {
        t(s"full audit($gate)") {
          operators.CorpusPipeline.audit(spark, docs0, Some(gate)).count()
        }
        Caches.release(spark)
        val chain = operators.CorpusPipeline.stages(spark, docs0, Some(gate))
        chain.zipWithIndex.foreach { case (df, i) =>
          t(s"$gate stage ${i + 1} count") { df.count() }
        }
        Caches.release(spark)
      }
      Caches.release(spark)
    }
    spark.stop()
  }
}
