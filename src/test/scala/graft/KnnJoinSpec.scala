package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.KnnJoin

/** The mapPartitions block kNN operator is value-identical to the
  * declarative join→window-top-k formulation.
  */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private def unitVecs = {
    graft.functions.VectorExprs.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("label"),
        expr("transform(v, x -> x / sqrt(graft_dot(v, v)))").as("u"))
  }

  test("block kNN equals join + window top-k") {
    val u = unitVecs
    val fast = KnnJoin.knnBruteForce(u, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val a = u.select(col("vec_id").as("a_id"), col("u").as("ua"))
    val b = u.select(col("vec_id").as("b_id"), col("u").as("ub"))
    val slow = a.join(broadcast(b), col("a_id") =!= col("b_id"))
      .withColumn("cos", expr("graft_dot(ua, ub)"))
      .select("a_id", "b_id", "cos")
      .withColumn("rn", row_number().over(
        Window.partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))))
      .filter(col("rn") <= 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    assert(fast == slow)
    assert(fast.size == u.count() * 5)
  }

  test("custom CosineKnn operator (LogicalPlan+Strategy+SparkPlan) " +
    "agrees with the mapPartitions form row for row") {
    val u = unitVecs
    val viaStrategy = graft.plans.CosineKnn.knn(
      u.select(col("vec_id"), col("u"), col("label")), 5)
    // the custom node must actually plan to its physical operator
    // (SparkPlan.nodeName strips the Exec suffix in plan strings); the
    // exchange requirement makes the plan adaptive, so assert on the
    // plan string rather than a tree collect that stops at the AQE root
    val planStr = viaStrategy.queryExecution.executedPlan.toString
    assert(planStr.contains("CosineKnn"), planStr)
    // the candidate side flows through Spark's own broadcast exchange
    // (no hand-rolled driver collect)
    assert(planStr.contains("BroadcastExchange"), planStr)
    val sRows = viaStrategy
      .select("a_id", "b_id", "b_label", "cos")
      .as[(Long, Long, Int, Double)].collect().sorted.toSeq
    val mRows = KnnJoin.knnBruteForce(u, 5)
      .select("a_id", "b_id", "b_label", "cos")
      .as[(Long, Long, Int, Double)].collect().sorted.toSeq
    assert(sRows == mRows)
  }

  test("the candidate-budget guard fails fast (no broadcast attempt) " +
    "when the candidate side exceeds spark.graft.knn.maxCandidateBytes") {
    val u = unitVecs
    spark.conf.set("spark.graft.knn.maxCandidateBytes", "1")
    try {
      val e = intercept[Throwable] {
        graft.plans.CosineKnn.knn(
          u.select(col("vec_id"), col("u"), col("label")), 5).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("maxCandidateBytes")),
        s"unexpected failure: $e")
    } finally spark.conf.unset("spark.graft.knn.maxCandidateBytes")
    // and the same query under the default budget still runs
    assert(graft.plans.CosineKnn.knn(
      u.select(col("vec_id"), col("u"), col("label")), 5).count() > 0)
  }

  test("every probe gets exactly k ordered neighbors") {
    val knn = KnnJoin.knnBruteForce(unitVecs, 5)
      .as[KnnJoin.Neighbor].collect()
    knn.groupBy(_.a_id).foreach { case (aId, ns) =>
      assert(ns.length == 5, s"$aId has ${ns.length} neighbors")
      val sorted = ns.sortBy(n => (-n.cos, n.b_id)).toSeq
      assert(ns.toSeq == sorted, s"$aId neighbors out of order")
      assert(!ns.exists(_.b_id == aId), "self in neighbor list")
    }
  }
}
