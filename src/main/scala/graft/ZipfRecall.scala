package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured blocking recall on a [[ZipfGen]] corpus (r14, VERDICT ask
  * 5): the generator's ids ENCODE ground truth — doc_id =
  * (orig·D + v)·32 + j + 10⁹, so docs sharing (doc_id − 10⁹) div 32
  * are near-dup copies of one (source doc, variant) family, each copy
  * one token-substitution from copy 0 (pairwise jaccard ≈ (n−2)/n for
  * an n-shingle doc). That gives an exact denominator no blocked
  * pipeline can provide for itself:
  *
  *  - family-pair RECALL of the rare-shingle blocked candidate stage
  *    (the τ=0.2 jaccard report path): |true family pairs the blocker
  *    surfaces with jac ≥ τ| / |true family pairs whose REAL jaccard
  *    ≥ τ| (real jaccard recomputed exactly per family pair — family
  *    sizes are ≤ 20·… so this stays tiny);
  *  - cascade DUP-DECISION recall at τ=0.6: fraction of j>0 copies the
  *    cascade marks as someone's duplicate.
  *
  *   sbt "runMain graft.ZipfRecall /tmp/sf1z"
  *
  * Results recorded in SCALE.md §r14.
  */
object ZipfRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1z")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
      .withColumn("fam", (col("doc_id") - 1000000000L) / 32)
      .withColumn("fam", floor(col("fam")).cast("long"))

    // ground truth: all intra-family pairs with their REAL jaccard
    // (exact — families are tiny, so the per-family cross join is
    // bounded by the Zipf cap)
    val sh = docs.select(col("doc_id"), col("fam"),
      expr("graft_shingles(text, 3)").as("s"))
    val truePairs = sh.as("a").join(sh.as("b"),
        col("a.fam") === col("b.fam") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s")))).as("true_jac"))
      .filter(col("true_jac") >= tau)
      .cache()
    val nTrue = truePairs.count()

    // what the BLOCKED pipeline (the jaccard report path) surfaces
    val found = SparkEntry.queries("j_jaccard_shingle_pairs")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val hit = truePairs.join(found, Seq("doc_a", "doc_b"), "left_semi")
      .count()
    println(f"zipf_recall blocked_pair_recall tau=$tau%.2f " +
      f"${hit.toDouble / math.max(nTrue, 1)}%.4f ($hit/$nTrue)")

    // cascade dup-decision recall over j>0 copies (τ=0.6 territory:
    // count only copies whose real jaccard to copy 0 clears 0.6)
    val copies = truePairs.filter(col("true_jac") >= 0.6)
      .select(col("doc_b").as("doc_id")).distinct()
    val nCopies = copies.count()
    val dups = SparkEntry.queries("j_dedup_cascade")(spark, dir)
      .select(col("doc_id")).distinct()
    val dHit = copies.join(dups, Seq("doc_id"), "left_semi").count()
    println(f"zipf_recall cascade_dup_recall tau=0.60 " +
      f"${dHit.toDouble / math.max(nCopies, 1)}%.4f ($dHit/$nCopies)")
    spark.stop()
  }
}
