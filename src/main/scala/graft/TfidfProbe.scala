package graft

import org.apache.spark.sql.SparkSession

/** Candidate-growth probe for j_sim_tfidf_pairs (r18, VERDICT r17
  * item 7): the entry's cost driver is the blocked candidate set
  * (rare-3-shingle pairs). Prints the two endpoint counts (candidates
  * and emitted pairs) per fixture so the growth exponent of the pair
  * stage is measurable against doc count; the intermediate
  * prune-survivor count stays inside the entry (ADVICE r18: this doc
  * once promised it — the probe never computed it). Usage:
  *   runMain graft.TfidfProbe <sfDir>...
  */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)
    for (d <- dirs) {
      val nDocs = Tables.rowCount(spark, d, "documents")
      val cand = operators.LlmOps.rareShingleCandidates(
        operators.LlmOps.shingleEx(spark, d),
        operators.LlmOps.oracledDfCutoff(spark)).count()
      val out = SparkEntry.queries("j_sim_tfidf_pairs")(spark, d).count()
      Caches.release(spark)
      println(s"tfidfprobe $d docs=$nDocs candidates=$cand emitted=$out")
    }
    spark.stop()
  }
}
