package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fail-fast size gate on the DECLARED quadratic baselines (r13,
  * VERDICT item 3) — the [[graft.plans.CosineKnnCandidateGuard]]
  * convention applied to the two all-pairs entries
  * (`j_sim_cosine_topk`, `l_expr_native_cosine`): they exist as
  * correctness baselines for the ANN family, and nothing else should
  * stop a caller pointing one at a 100× corpus by accident. The gate
  * is a conf-capped input-COUNT check that throws with the
  * sub-quadratic sibling's name in the message; results never change
  * for inputs under the cap, and a deliberate oversized run just
  * raises the conf.
  *
  * For the registry entries the count comes straight from the parquet
  * FOOTERS ([[gatePath]]) — driver-side block metadata, zero Spark
  * jobs, so the gate costs milliseconds even on a warm bench loop
  * (the r13 first cut ran `df.count()`, a real 32-task job per
  * invocation — measurable at bench headline granularity). The
  * DataFrame overload stays for gating arbitrary (non-parquet-leaf)
  * inputs.
  *
  * Default cap 100 000 rows = 5× the sf1 rehearsal's 20 000 vectors
  * (where the baselines are measured and DISCLOSED super-linear,
  * SCALE.md §r12.2) and an order of magnitude under where the n²·dim
  * loop stops being a feasible single-job baseline.
  */
object BruteGuard {
  val MaxRowsKey = "spark.graft.brute.maxInputRows"
  val DefaultMaxRows = 100000L

  private def maxRows(s: SparkSession): Long =
    s.conf.getOption(MaxRowsKey).map(_.toLong).getOrElse(DefaultMaxRows)

  private def refuse(entry: String, sibling: String, sizeDesc: String,
                     max: Long): Nothing =
    throw new IllegalStateException(
      s"$entry is a declared O(n²) brute-force baseline and its input " +
        s"has $sizeDesc (> $MaxRowsKey=$max). Use the sub-quadratic " +
        s"sibling $sibling, or raise the conf for a deliberate run " +
        s"(a conf >= ${Int.MaxValue} disables the guard entirely).")

  /** Total row count of `path` (a parquet file or a directory of
    * part-files) from the footers' block metadata — driver-side only,
    * no Spark job. */
  def footerRows(s: SparkSession, path: String): Long = {
    val conf = s.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(root)
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Gate a parquet-backed input by its footer row count. */
  def gatePath(s: SparkSession, path: String, entry: String,
               sibling: String): Unit = {
    val max = maxRows(s)
    val n = footerRows(s, path)
    if (n > max) refuse(entry, sibling, s"$n rows", max)
  }

  val RouteKey = "spark.graft.brute.route"

  /** Size-routed dispatch (r16, VERDICT r15 suggestion): run `brute`
    * when the parquet-backed input is under the cap; above it, either
    * refuse (default — an approximate answer must be OPTED INTO, never
    * substituted silently) or, with `spark.graft.brute.route=true`,
    * return the schema-compatible sub-quadratic `sibling` result. The
    * caller guarantees the sibling's schema matches the baseline's
    * (the registry pair contract; PropertySpec-style parity is the
    * sibling's own gate). */
  def routePath(s: SparkSession, path: String, entry: String,
                sibling: String)(brute: => DataFrame)
               (alt: => DataFrame): DataFrame = {
    val max = maxRows(s)
    val n = footerRows(s, path)
    if (n <= max) brute
    else if (s.conf.getOption(RouteKey).contains("true")) alt
    else refuse(entry, sibling, s"$n rows", max)
  }

  /** Gate `df` (the baseline's input side) and return it unchanged —
    * for inputs that are not a plain parquet leaf. The check is
    * BOUNDED, not a full count (VERDICT r13 nit): `limit(max+1)` lets
    * the scan stop as soon as the cap is provably exceeded, so an
    * oversized caller pays at most cap+1 rows before being refused
    * instead of one full pass over the input it was about to square. */
  def gate(df: DataFrame, entry: String, sibling: String): DataFrame = {
    val max = maxRows(df.sparkSession)
    // a cap at or beyond Int.MaxValue can't be enforced through
    // limit() (the bounded count would saturate). Default is well
    // under the ceiling, so reaching it takes a deliberate conf set:
    // treat that as "guard disabled by explicit operator choice"
    // (ADVICE r15 — the r14 `require` left >2.1B-row DataFrame-gated
    // inputs with NO conf value permitting a deliberate run).
    if (max >= Int.MaxValue) return df
    val bound = max.toInt
    val n = df.limit(bound + 1).count()
    if (n > max) {
      // the bounded count stops at cap+1, so n is a floor, not the
      // actual input size — phrase it that way (ADVICE r14)
      val sizeDesc =
        if (n == bound + 1L) s"more than $max rows" else s"$n rows"
      refuse(entry, sibling, sizeDesc, max)
    }
    df
  }
}
