package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate/intermediate-volume probe for the scratch-bound family
  * (r19, VERDICT r18 item 6): `j_ann_ivf_pq` / `j_ann_ivf_kmeans` /
  * `j_dedup_substring` and the audit build's dedup stage could not run
  * at sf100z on this box (>55 GB spill), so their sub-quadratic claims
  * get per-entry CANDIDATE curves instead — counts derived from the
  * blocking-key HISTOGRAMS, never from materialized pairs, so each
  * probe is a linear aggregation that runs where the full entry
  * cannot:
  *  - shingle cascade (j_dedup_cascade / j_jaccard_* / audit stage 3):
  *    postings rows + Σ_{df≤cutoff} df·(df−1)/2 — the exact pre-
  *    distinct row count the rare-shingle self-join emits;
  *  - substring (j_dedup_substring): window postings + the same sum
  *    over window-fingerprint df — the verify join's input volume;
  *  - IVF (j_ann_ivf_kmeans / j_ann_ivf_pq): Σ_cell probes·cands over
  *    the dup-collapsed reps (AnnOps.ivfCandidateHistogram) — the
  *    exact candidate-pair count of the keepSelf pairing; the PQ twin
  *    moves the same ROWS at 64 B/vector instead of 512 B.
  * The audit build's dedup stage runs this cascade on its stage-2
  * survivors, so the full-corpus shingle curve upper-bounds it.
  * Results land in SCALE.md §r19. Usage:
  *   runMain graft.CandProbe <sfDir>...
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)

    // pre-distinct pair rows a df-cutoff blocked self-join emits:
    // Σ over keys with df ≤ cutoff of df·(df−1)/2
    def blockedFanout(keyed: org.apache.spark.sql.DataFrame,
                      key: String, cutoff: Int): (Long, Long) = {
      val dfreq = keyed.groupBy(key).agg(count(lit(1)).as("df"))
      val post = keyed.count()
      val fan = dfreq.filter(col("df") <= cutoff)
        .agg(sum(expr("df * (df - 1) div 2"))).head
      (post, if (fan.isNullAt(0)) 0L else fan.getLong(0))
    }

    for (d <- dirs) {
      val t0 = System.nanoTime()
      val nDocs = Tables.rowCount(spark, d, "documents")
      val nVecs = Tables.rowCount(spark, d, "embeddings")
      val cutoff = operators.LlmOps.oracledDfCutoff(spark)

      val (shPost, shFan) = blockedFanout(
        operators.LlmOps.shingleEx(spark, d), "shingle", cutoff)
      Caches.release(spark)

      val winEx = operators.LlmOps.dedupDocs(spark, d)
        .select(col("doc_id"), explode(expr(
          s"graft_shingles(text, ${operators.LlmOps.substringK(spark)})"))
          .as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("fp"))
      val (subPost, subFan) = blockedFanout(winEx, "fp", cutoff)
      Caches.release(spark)

      val hist = operators.AnnOps.ivfCandidateHistogram(spark, d)
        .agg(sum(col("n_probes") * col("n_cands")).as("cand"),
          sum(col("n_cands")).as("reps"),
          max(col("n_cands")).as("max_cell")).head
      Caches.release(spark)

      println(s"candprobe $d docs=$nDocs vecs=$nVecs " +
        s"shingle_postings=$shPost shingle_fanout=$shFan " +
        s"substr_postings=$subPost substr_fanout=$subFan " +
        s"ivf_candidates=${hist.getLong(0)} ivf_reps=${hist.getLong(1)} " +
        s"ivf_max_cell=${hist.getLong(2)} " +
        f"probe_s=${(System.nanoTime - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
