package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B/C of the rare-shingle candidate stage (r20, guide §1/§2.3):
  * A = current (dfreq partial-agg exchange + full join exchange on the
  * shingle STRING), B = one string exchange reused by df/join/group,
  * C = one exchange of xxhash64(shingle) longs (16-byte rows). Counts
  * compared for equality. Scratch harness — not library surface. */
object ProfileShingleCand {
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
    import operators.LlmOps
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val ex = Caches.persisted(LlmOps.shingleEx(spark, d))
      t("warm ex")(noop(ex))
      // A: current
      t("A current")(noop(LlmOps.rareShingleCandidates(ex, 50)))
      // B: co-partitioned strings
      val exB = Caches.persisted(ex.repartition(col("shingle")))
      t("B repartition+persist")(noop(exB))
      val dfB = exB.groupBy("shingle").agg(count(lit(1)).as("df"))
      val rareB = exB.join(dfB.filter(col("df") <= 50), "shingle")
        .select("doc_id", "shingle")
      val candB = LlmOps.boundedPairExplode(rareB, "shingle")
      t("B candidates")(noop(candB))
      // C: hashed key, co-partitioned
      val exC = Caches.persisted(ex.select(col("doc_id"),
        xxhash64(col("shingle")).as("k")).repartition(col("k")))
      t("C hash+repartition+persist")(noop(exC))
      val dfC = exC.groupBy("k").agg(count(lit(1)).as("df"))
      val rareC = exC.join(dfC.filter(col("df") <= 50), "k")
        .select("doc_id", "k")
      val candC = LlmOps.boundedPairExplode(rareC, "k")
      t("C candidates")(noop(candC))
      if (rep == 1) {
        val a = LlmOps.rareShingleCandidates(ex, 50).count()
        println(s"counts A=$a B=${candB.count()} C=${candC.count()}")
      }
      Caches.release(spark)
    }
    spark.stop()
  }
}
