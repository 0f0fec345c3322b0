package graft.operators

import org.apache.spark.sql.DataFrame

/** Fail-fast size gate on the DECLARED quadratic baselines (r13,
  * VERDICT item 3) — the [[graft.plans.CosineKnnCandidateGuard]]
  * convention applied to the two all-pairs entries
  * (`j_sim_cosine_topk`, `l_expr_native_cosine`): they exist as
  * correctness baselines for the ANN family, and nothing else should
  * stop a caller pointing one at a 100× corpus by accident. The gate
  * is a conf-capped input-COUNT check (a parquet count is
  * metadata-only — no extra scan) that throws with the sub-quadratic
  * sibling's name in the message; results never change for inputs
  * under the cap, and a deliberate oversized run just raises the conf.
  *
  * Default cap 100 000 rows = 5× the sf1 rehearsal's 20 000 vectors
  * (where the baselines are measured and DISCLOSED super-linear,
  * SCALE.md §r12.2) and an order of magnitude under where the n²·dim
  * loop stops being a feasible single-job baseline.
  */
object BruteGuard {
  val MaxRowsKey = "spark.graft.brute.maxInputRows"
  val DefaultMaxRows = 100000L

  /** Gate `df` (the baseline's input side) and return it unchanged. */
  def gate(df: DataFrame, entry: String, sibling: String): DataFrame = {
    val max = df.sparkSession.conf.getOption(MaxRowsKey)
      .map(_.toLong).getOrElse(DefaultMaxRows)
    val n = df.count()
    if (n > max) throw new IllegalStateException(
      s"$entry is a declared O(n²) brute-force baseline and its input " +
        s"has $n rows (> $MaxRowsKey=$max). Use the sub-quadratic " +
        s"sibling $sibling, or raise the conf for a deliberate run.")
    df
  }
}
