package graft

import graft.operators.BruteGuard

/** r13 (VERDICT item 3): the fail-fast gate on the two declared
  * quadratic baselines. Results under the cap are untouched (the
  * oracle gate pins the hashes); over the cap the entries refuse to
  * run and the message names the sub-quadratic sibling.
  */
class BruteGuardSpec extends SparkSpec {

  private def withCap[A](rows: Long)(f: => A): A = {
    spark.conf.set(BruteGuard.MaxRowsKey, rows.toString)
    try f finally spark.conf.unset(BruteGuard.MaxRowsKey)
  }

  test("gate is identity under the cap") {
    val df = Tables.embeddings(spark, sfDir)
    assert(BruteGuard.gate(df, "e", "s") eq df)
  }

  test("gate throws over the cap, naming the ANN sibling") {
    val ex = withCap(10) {
      intercept[IllegalStateException] {
        BruteGuard.gate(Tables.embeddings(spark, sfDir), "j_sim_cosine_topk",
          "j_ann_ivf_topk")
      }
    }
    assert(ex.getMessage.contains("j_ann_ivf_topk"))
    assert(ex.getMessage.contains(BruteGuard.MaxRowsKey))
  }

  test("footer row count equals the scan count (no Spark job on the " +
    "registry path)") {
    assert(BruteGuard.footerRows(spark, s"$sfDir/embeddings.parquet") ==
      Tables.embeddings(spark, sfDir).count())
    val ex = withCap(10) {
      intercept[IllegalStateException] {
        BruteGuard.gatePath(spark, s"$sfDir/embeddings.parquet",
          "j_sim_cosine_topk", "j_ann_ivf_topk")
      }
    }
    assert(ex.getMessage.contains("j_ann_ivf_topk"))
  }

  test("both baseline entries are gated end-to-end") {
    for (entry <- Seq("j_sim_cosine_topk", "l_expr_native_cosine")) {
      val ex = withCap(10) {
        intercept[IllegalStateException] {
          SparkEntry.queries(entry)(spark, sfDir).collect()
        }
      }
      assert(ex.getMessage.contains("j_ann_ivf_topk"), entry)
      // …and under the default cap they still run (smoke; the oracle
      // gate pins the exact rows at sf0.01)
      assert(SparkEntry.queries(entry)(spark, sfDir).count() == 10, entry)
    }
  }

  test("j_dedup_embed_cosine is gated, naming the LSH sibling (r16 — " +
    "the last unguarded brute baseline)") {
    val ex = withCap(10) {
      intercept[IllegalStateException] {
        SparkEntry.queries("j_dedup_embed_cosine")(spark, sfDir).collect()
      }
    }
    assert(ex.getMessage.contains("j_dedup_embed_ann"))
    assert(ex.getMessage.contains("j_dedup_embed_cosine"))
    // under the default cap the entry still runs (oracle pins the hash)
    assert(SparkEntry.queries("j_dedup_embed_cosine")(spark, sfDir)
      .count() > 0)
  }

  test("size-routed dispatch (r16): over the cap, route=true returns " +
    "the sub-quadratic sibling's result; default still refuses") {
    import org.apache.spark.sql.functions.col
    val entry = "j_dedup_embed_cosine"
    // over the cap, route unset → refusal (approximation is opt-in)
    val ex = withCap(10) {
      intercept[IllegalStateException] {
        SparkEntry.queries(entry)(spark, sfDir).collect()
      }
    }
    assert(ex.getMessage.contains("j_dedup_embed_ann"))
    // over the cap, route=true → the ANN sibling's rows, same schema
    spark.conf.set(BruteGuard.RouteKey, "true")
    try {
      val routed = withCap(10) {
        SparkEntry.queries(entry)(spark, sfDir)
      }
      val sibling = SparkEntry.queries("j_dedup_embed_ann")(spark, sfDir)
      assert(routed.columns.toSeq == Seq("vec_a", "vec_b", "cos"))
      val r = routed.orderBy("vec_a", "vec_b").collect().toSeq
      Caches.release(spark)
      val sb = sibling.orderBy("vec_a", "vec_b").collect().toSeq
      assert(r == sb && r.nonEmpty)
      Caches.release(spark)
      // routed result is SOUND vs the brute truth: every routed pair
      // appears in the under-cap brute pair set
      val brute = SparkEntry.queries(entry)(spark, sfDir)
        .select(col("vec_a"), col("vec_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(r.map(x => (x.getLong(0), x.getLong(1)))
        .forall(brute.contains))
    } finally spark.conf.unset(BruteGuard.RouteKey)
  }

  test("size-routed dispatch covers the global top-10 baseline too: " +
    "routed rows are sound (scores from the exact verify) and ordered") {
    spark.conf.set(BruteGuard.RouteKey, "true")
    try {
      val routed = withCap(10) {
        SparkEntry.queries("j_sim_cosine_topk")(spark, sfDir)
          .collect().toSeq
      }
      Caches.release(spark)
      assert(routed.nonEmpty && routed.size <= 10)
      val scores = routed.map(_.getDouble(2))
      assert(scores == scores.sorted.reverse, scores)
      // soundness: every routed pair is in the brute pair universe
      // with the identical exact score
      val brute = withCap(Long.MaxValue) {
        SparkEntry.queries("j_dedup_embed_cosine")(spark, sfDir)
          .collect().map(x => (x.getLong(0), x.getLong(1),
            x.getDouble(2))).toSet
      }
      assert(routed.map(x => (x.getLong(0), x.getLong(1),
        x.getDouble(2))).forall(brute.contains))
    } finally spark.conf.unset(BruteGuard.RouteKey)
  }

  test("conf at/above Int.MaxValue disables the DataFrame gate by " +
    "explicit choice (ADVICE r15)") {
    val df = Tables.embeddings(spark, sfDir)
    withCap(Int.MaxValue.toLong) {
      assert(BruteGuard.gate(df, "e", "s") eq df)
    }
    withCap(Long.MaxValue) {
      assert(BruteGuard.gate(df, "e", "s") eq df)
    }
    // the refusal message documents the disable ceiling
    val ex = withCap(10) {
      intercept[IllegalStateException] { BruteGuard.gate(df, "e", "s") }
    }
    assert(ex.getMessage.contains(Int.MaxValue.toString))
  }
}
