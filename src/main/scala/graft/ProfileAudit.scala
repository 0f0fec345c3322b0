package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage-level profiler for j_pipeline_audit(_lm) — attributes
  * the steady-state floor (4.36 s at r17, the suite's slowest) across
  * the five pinned stages + the ledger assembly. Enables the
  * `graft.profile.stages` pin timer in [[operators.CorpusPipeline
  * .stages]]. Not part of the library surface (ProfileInc convention).
  */
object ProfileAudit {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label%-34s ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gate = args.lift(1).getOrElse("heuristic")
    System.setProperty("graft.profile.stages", "true")
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
    val key = if (gate == "lm") "j_pipeline_audit_lm" else "j_pipeline_audit"
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ($key) ---")
      t("full audit") {
        SparkEntry.queries(key)(spark, d).collect()
      }
      Caches.release(spark)
    }
    spark.stop()
  }
}
