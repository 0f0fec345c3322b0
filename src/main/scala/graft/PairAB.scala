package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-set A/B equality check for the r19 candidate-stage rewrites
  * at an arbitrary fixture: (a) boundedPairExplode vs the former
  * postings self-join on the shingle AND window-fingerprint blockers,
  * (b) arrayPairStats vs exactPairStats on the MinHash-band candidate
  * set. Prints old/new counts and both except() directions — all four
  * zero-diffs = the rewrites are value-identical on that corpus.
  * Scratch harness in the ProfileTfidf convention. */
object PairAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1z")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)
    val docs = Tables.documents(spark, d)
    def oldPairs(rare: DataFrame, k: String): DataFrame =
      rare.as("a").join(rare.as("b"),
          col(s"a.$k") === col(s"b.$k") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    def report(tag: String, o: DataFrame, n: DataFrame): Unit =
      println(s"$tag old=${o.count()} new=${n.count()} " +
        s"exceptON=${o.except(n).count()} exceptNO=${n.except(o).count()}")

    val ex = docs.select(col("doc_id"),
        expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle")).persist()
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val rare = ex.join(dfreq.filter(col("df") <= 50), "shingle")
      .select("doc_id", "shingle").persist()
    report("SHINGLE", oldPairs(rare, "shingle"),
      operators.LlmOps.boundedPairExplode(rare, "shingle"))

    val exw = docs.select(col("doc_id"),
        explode(expr("graft_shingles(text, 8)")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("fp")).persist()
    val dfw = exw.groupBy("fp").agg(count(lit(1)).as("df"))
    val rw = exw.join(dfw.filter(col("df") <= 50), "fp")
      .select("doc_id", "fp").persist()
    report("WINDOW", oldPairs(rw, "fp"),
      operators.LlmOps.boundedPairExplode(rw, "fp"))

    val cand = operators.LlmOps.minhashCandidates(docs)
    val cols = Seq("doc_a", "doc_b", "n_common", "sh_a", "sh_b", "jac")
    report("VERIFY",
      operators.LlmOps.exactPairStats(ex, cand).select(cols.map(col): _*),
      operators.LlmOps.arrayPairStats(ex, cand).select(cols.map(col): _*))
    spark.stop()
  }
}
