package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for j_pipeline_incremental (the r10
  * slowest-map leader) — attributes its steady-state cost across the
  * four incremental stages + the audit assembly. Not part of the
  * library surface (ProfileInc convention).
  */
object ProfilePipe {
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

    t("store+aux build (one-time)") {
      operators.CorpusPipeline.incrementalPrefix(spark, d)
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val prefix = operators.CorpusPipeline.incrementalPrefix(spark, d)
      val delta = operators.LlmOps.dedupDocs(spark, d)
        .filter(operators.TextOps.splitBucket(col("doc_id")) >= 80)
      val chain = operators.CorpusPipeline.incStages(spark, prefix, delta)
      val names = "d0" +: operators.CorpusPipeline.IncStageNames
      chain.zip(names).foreach { case (df, n) =>
        t(s"  count $n") { println(s"    n=${df.count()}") }
      }
      t("incAudit assembly") {
        operators.CorpusPipeline.incAudit(chain).collect()
      }
      Caches.release(spark)
      t("full query (fresh)") {
        SparkEntry.queries("j_pipeline_incremental")(spark, d).collect()
      }
      Caches.release(spark)
    }
    spark.stop()
  }
}
