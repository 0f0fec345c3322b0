package graft

import graft.operators.BruteGuard

/** Routed-mode recall floor (r18, VERDICT r17 item 5): the
  * `spark.graft.brute.route=true` escape substitutes the sub-quadratic
  * sibling for a guarded O(n²) baseline with a DISCLOSED recall
  * caveat; this spec pins the measured behavior on the unit fixture so
  * the caveat stays a number, not a vibe. Measured at scale
  * (graft.BruteRecall, SCALE.md §r18): top-10 overlap 10/10 on every
  * shape (sf0.1 / sf1 clique / sf1z zipf); pair recall 0.95–0.975,
  * precision 1.0 (the sibling verifies exact cosines on candidates, so
  * it can only miss, never invent).
  */
class BruteRouteRecallSpec extends SparkSpec {

  private def run(name: String, exact: Boolean): Set[(Long, Long)] = {
    if (exact) {
      spark.conf.set(BruteGuard.MaxRowsKey, "1000000000000")
      spark.conf.unset(BruteGuard.RouteKey)
    } else {
      spark.conf.set(BruteGuard.MaxRowsKey, "0")
      spark.conf.set(BruteGuard.RouteKey, "true")
    }
    try SparkEntry.queries(name)(spark, sfDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    finally {
      spark.conf.unset(BruteGuard.MaxRowsKey)
      spark.conf.unset(BruteGuard.RouteKey)
      Caches.release(spark)
    }
  }

  test("routed top-10 matches the exact top-10 on the unit fixture " +
    "(the measured 10/10 overlap floor)") {
    val exact = run("j_sim_cosine_topk", exact = true)
    val routed = run("j_sim_cosine_topk", exact = false)
    assert(exact.size == 10 && routed.size == 10)
    assert((exact intersect routed).size == 10,
      s"routed top-10 diverged: exact=$exact routed=$routed")
  }

  test("routed pair set is sound (precision 1.0) and above the " +
    "measured recall floor on the unit fixture") {
    val exact = run("j_dedup_embed_cosine", exact = true)
    val routed = run("j_dedup_embed_cosine", exact = false)
    assert(exact.nonEmpty)
    // soundness: every routed pair is a true >=tau pair
    assert((routed diff exact).isEmpty,
      s"routed invented pairs: ${(routed diff exact).take(5)}")
    // recall floor: measured 0.95-0.975 across the scale shapes; pin
    // conservatively below the worst measured value
    val recall = (exact intersect routed).size.toDouble / exact.size
    assert(recall >= 0.90, f"routed recall $recall%.4f under the floor")
  }
}
