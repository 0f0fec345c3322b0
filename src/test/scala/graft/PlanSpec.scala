package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan regression assertions (SURVEY §4): the properties that
  * make these queries scale — pushdown, pruning, broadcast, partial
  * aggregation, top-k without full sort — must survive refactors.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("scan pushes predicate and prunes columns") {
    val p = plan("a_scan_prune_pushdown")
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregates in two phases with a pushed date filter") {
    val p = plan("d_agg_groupby_q1")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "q1 read a column it doesn't need")
  }

  test("dim joins broadcast (no shuffle of the fact side)") {
    val p = plan("c_join_broadcast")
    // formatted mode prints each node in tree + detail section
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q5 join chain broadcasts the dimension tables") {
    val p = plan("c_join_multiway_q5")
    // region→nation→customer and supplier→facts are all broadcast; the
    // only shuffled joins are the two fact joins (customer⋈orders,
    // ⋈lineitem). Pinned after the r3 regression: the supplier join
    // must never fall back to sort-merge under the AQE-off bench.
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert("SortMergeJoin".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    // date filter reaches the orders scan
    assert(p.contains("o_orderdate"), p)
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("f_topk_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("incremental extract pushes the cursor predicate to the scan") {
    val p = plan("i_incremental_extract")
    // the cursor literal is in the fixture's raw tick unit (the driver
    // has shipped events.ts as both nanos and micros across regens)
    val cursor = 1705276800L * 1000000000L / Tables.tsNsPerTick(spark, sfDir)
    assert(p.contains(s"GreaterThan(ts,$cursor)"), p)
  }

  test("partitioned-layout read prunes at the file listing") {
    val p = plan("a_partitioned_prune")
    // the lang predicate must be a PartitionFilter on the scan (pruned
    // directories never opened), not a post-scan Filter
    assert(p.contains("PartitionFilters"), p)
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined, p)
  }

  test("dim join prunes the partitioned fact scan dynamically (DPP)") {
    val p = plan("c_join_dpp")
    // the dim's runtime values must reach the fact scan as a
    // dynamicpruning subquery in its PartitionFilters — the star-join
    // partition-elimination mechanism; a static literal can't do this
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery on the fact scan:\n$p")
  }

  test("funnel computes all three stages over ONE hash exchange — " +
    "no join back to the corpus (r9 plan defect)") {
    val p = plan("e_funnel_sessions")
    // one hashpartitioning(user_id) feeds the session window, both
    // funnel windows AND the final (user_id, sid) aggregate (subset
    // rule); the only other exchange is the output-order range sort
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2, p)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
    assert(p.contains("rangepartitioning"), p) // the output-order sort
    assert(!p.contains("Join"), "funnel re-joined the corpus:\n" + p)
  }

  test("IVF search equi-joins on the cell key, never all-pairs") {
    val p = plan("j_ann_ivf_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("LSH search equi-joins on the signature bucket, never all-pairs") {
    val p = plan("j_ann_lsh_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("above the broadcast row limit the ANN search co-partitions " +
    "both sides on the bucket key (Exchange-on-cell, no table broadcast)") {
    spark.conf.set(operators.AnnOps.BroadcastRowLimitKey, "0")
    try {
      val ivf = plan("j_ann_ivf_topk")
      // the pair join shuffles on the cell key and sort-merges — the
      // scale shape where no candidate list is ever broadcast
      assert(ivf.contains("hashpartitioning(cell"), ivf)
      assert(ivf.contains("SortMergeJoin"), ivf)
      val lsh = plan("j_ann_lsh_topk")
      assert(lsh.contains("hashpartitioning(bucket"), lsh)
      assert(lsh.contains("SortMergeJoin"), lsh)
    } finally spark.conf.unset(operators.AnnOps.BroadcastRowLimitKey)
  }

  test("ANN results are identical in broadcast and co-partition modes") {
    def run(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect().map(_.toString).toSeq
    }
    val (bIvf, bLsh) = (run("j_ann_ivf_topk"), run("j_ann_lsh_topk"))
    spark.conf.set(operators.AnnOps.BroadcastRowLimitKey, "0")
    try {
      assert(run("j_ann_ivf_topk") == bIvf)
      assert(run("j_ann_lsh_topk") == bLsh)
    } finally spark.conf.unset(operators.AnnOps.BroadcastRowLimitKey)
  }

  test("PQ candidate pass: only the int8 codes cross the pair " +
    "exchange; the approximate score is the native graft_dot8") {
    // isolate the candidate-pair subplan (before the exact re-rank,
    // which legitimately touches the double vectors again)
    graft.functions.VectorExprs.register(spark)
    val u = Par.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .select(col("vec_id"), expr("graft_vdiv(v, nrm)").as("u"))
    val q = u.select(col("vec_id"),
      transform(col("u"), x => round(x * lit(127.0)).cast("byte")).as("q"))
    val asg = u.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell_vec"))  // stand-in cells 0..15
    val withCell = q.withColumn("cell", pmod(col("vec_id"), lit(16L)))
    val probes = withCell.select(col("vec_id"), col("cell"),
      col("q").as("qa"))
    val cands = withCell.select(col("vec_id").as("nn_id"), col("cell"),
      col("q").as("qb"))
    spark.conf.set(operators.AnnOps.BroadcastRowLimitKey, "0")
    try {
      val pairs = operators.AnnOps.pqPairs(probes, cands, "cell", 1L << 40)
      val p = pairs.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(p.contains("graft_dot8"), p)
      assert(p.contains("hashpartitioning(cell"), p)
      // the double-vector column u must be pruned before the exchange:
      // no attribute named u#N survives anywhere in the pair subplan
      assert(!"""\bu#\d""".r.findFirstIn(p).isDefined,
        s"double vectors crossed the PQ pair exchange:\n$p")
    } finally spark.conf.unset(operators.AnnOps.BroadcastRowLimitKey)
  }

  test("the distributed global-rank rewrites never move corpus-sized " +
    "data through a single-partition exchange (r16 scale pin)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- Seq("e_window_analytic", "e_window_ntile",
          "e_window_pareto", "d_agg_gini")) {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // populate runtime metrics
        val singles = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition => e
        }
        // the only single-partition traffic allowed is the ≤ nB-row
        // bucket-count frame feeding the offset windows — a corpus-
        // sized regression (the old empty-partitionBy window) would
        // ship every row through one partition here
        singles.foreach { e =>
          val written = e.metrics.collectFirst {
            case (k, m) if k.toLowerCase.contains("records") => m.value
          }
          assert(written.exists(_ <= 64L),
            s"$name: single-partition exchange carried $written rows")
        }
        // the analytic's offset frame IS single-partition by design —
        // prove the pin observes it rather than passing vacuously
        if (name == "e_window_analytic")
          assert(singles.nonEmpty, s"$name: offset-frame exchange missing")
        Caches.release(spark)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("the robust-stats family never plans a sort-based percentile " +
    "aggregate (r17 histogram-order-statistics pin)") {
    for (name <- Seq("d_agg_mad_robust", "d_agg_mode_median",
        "d_agg_percentile")) {
      val p = plan(name).toLowerCase
      // the whole-group-buffering Percentile/Median expression must
      // not reappear; the histogram path plans only hash aggregates
      // and tiny windows
      assert(!p.contains("percentile") && !p.contains("median("),
        s"$name regressed to a sort-based percentile aggregate:\n$p")
    }
  }

  test("whale-routed windows: plain single-window plan when no " +
    "whales; forced whale routing is value-identical (r17)") {
    val key = "spark.graft.window.whaleRows"
    // plain-path Window node counts: the three r17 windows are one
    // Window each; zscore's plain path is 3 (cumsums / lags / rn)
    for ((name, nWin) <- Seq("e_window_sliding_avg" -> 1,
        "e_window_running" -> 1, "e_window_gap_fill" -> 1,
        "e_anomaly_zscore" -> 3)) {
      // sf0.001 has no whale keys → plain window plan, no union branch
      val plainPlan = plan(name)
      assert("\\(\\d+\\) Window".r.findAllIn(plainPlan).size == nWin,
        s"$name: uniform fixture took the banded branch:\n$plainPlan")
      assert(!plainPlan.contains("Union"), plainPlan)
      val base = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      Caches.release(spark)
      // force EVERY sampled key through the banded branch; outputs
      // must match bit-for-bit (routing is performance-only)
      spark.conf.set(key, "0")
      try {
        val routed = SparkEntry.queries(name)(spark, sfDir)
        val rp = routed.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(rp.contains("Union"),
          s"$name: whaleRows=0 did not force the banded branch:\n$rp")
        assert(routed.collect().toSeq == base,
          s"$name: banded branch diverged from the plain window")
      } finally {
        spark.conf.unset(key)
        Caches.release(spark)
      }
    }
  }

  test("no accidental cartesian products outside the explicit cross join") {
    SparkEntry.queries.keys.filterNot(_ == "c_join_cross").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }
}
