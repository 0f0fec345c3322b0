package graft

/** The cache-release contract (VERDICT r5 "What's wrong" #2): every
  * operator-persisted intermediate is tracked, and after a query's
  * terminal action + `Caches.release` the session's CacheManager is
  * EMPTY — nothing accumulates for the session lifetime. Verify calls
  * release after each query's write, Bench after each query's timed
  * passes; this spec drives the heaviest persist users through the
  * same protocol.
  */
class CachesSpec extends SparkSpec {

  test("LLM-family queries leave no cached frames behind after release") {
    graft.functions.VectorExprs.register(spark)
    // the persist-heavy family: blocked pair stats, the cascades, the
    // incremental paths (in-flight + cluster fold), minhash
    // candidates, tf-idf, and the 5-stage pipeline audit. (The stored
    // dedup entry left this list in r10: its per-run plan is a stored-
    // pair-table read that persists nothing — the batch-verify persists
    // happen once inside storedDeltaPairs, which releases them itself.)
    val names = Seq(
      "j_jaccard_shingle_pairs", "j_dedup_cascade", "j_dedup_cascade_lsh",
      "j_dedup_near_minhash", "j_dedup_incremental",
      "j_dedup_clusters_incremental", "j_tfidf_topterms",
      // r17 distributed-rank/histogram rewrites persist their rank or
      // count frames too — same release contract
      "e_window_ntile", "e_window_pareto", "d_agg_gini",
      "d_agg_mad_robust", "d_agg_mode_median")
    spark.catalog.clearCache()
    // the 5-stage audit COMPUTATION (r18: the registry entry reads the
    // stored per-session ledger and persists nothing on re-entry, so
    // the release contract is asserted on the build path directly)
    val runs: Seq[(String, () => Long)] =
      names.map(n => n -> (() =>
        SparkEntry.queries(n)(spark, sfDir).count())) :+
        ("audit (direct)" -> (() =>
          graft.operators.CorpusPipeline.audit(spark,
            Par.spread(Tables.documents(spark, sfDir)), Some("heuristic"))
            .count()))
    runs.foreach { case (n, run) =>
      run()
      assert(Caches.trackedCount(spark) > 0,
        s"$n persisted nothing — this spec lost its subject")
      Caches.release(spark)
      assert(Caches.trackedCount(spark) == 0, n)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$n left frames in the CacheManager after release")
    }
  }

  test("release is scoped: values are identical with and without it") {
    graft.functions.VectorExprs.register(spark)
    val before = SparkEntry.queries("j_dedup_cascade")(spark, sfDir)
      .collect().toSeq
    Caches.release(spark)
    val after = SparkEntry.queries("j_dedup_cascade")(spark, sfDir)
      .collect().toSeq
    Caches.release(spark)
    assert(before == after)
  }
}
