package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Brute-force kNN join as a block nested-loop over a broadcast
  * vector set — the physical operator behind `j_knn_per_vector`.
  *
  * Operator-preference cascade (SURVEY §4): (a) composing existing ops
  * gives join→window-top-k, which materializes all n² pair rows
  * through a shuffle just to discard all but k per probe (measured
  * 4.4 s at sf0.1); (b) a scalar Expression can't skip the
  * materialization; so (d) mapPartitions implements the operator
  * directly: candidates broadcast once, each probe row keeps a size-k
  * ordered buffer, and only n·k rows are ever produced.
  *
  * Dot products run over unit vectors in index order — bit-identical
  * to the `graft_dot` codegen loop, so results match the declarative
  * formulation exactly (KnnJoinSpec asserts equality).
  *
  * Scale notes (100 TB): this is the IVF-style building block — at
  * scale the candidate set is not the whole table but one coarse
  * bucket (LSH band or centroid cell, cf. j_dedup_near_minhash), each
  * bucket broadcast to the probes hashing into it. The per-probe cost
  * is bucket_size·dim, and no shuffle carries vector payloads.
  *
  * This object is the cascade-step-(d) REFERENCE twin used by
  * KnnJoinSpec to pin the custom operator's semantics; the shipped
  * operator path is `CosineKnn` (cascade step (c)), whose candidate
  * side flows through Spark's BroadcastExchange rather than this
  * driver-side collect, and whose bounded form is `j_knn_ivf`.
  */
object KnnJoin {

  case class Neighbor(a_id: Long, b_id: Long, b_label: Int, cos: Double)

  /** k nearest neighbors (cosine) for every vector against every other.
    * `emb` must have columns (vec_id: Long, u: Array[Double] unit
    * vector, label: Int).
    */
  def knnBruteForce(emb: DataFrame, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val typed = emb.select(col("vec_id"), col("u"), col("label"))
      .as[(Long, Array[Double], Int)]
    val all = typed.collect()           // candidate set: n×dim doubles
    val bc = spark.sparkContext.broadcast(all)
    // probes arrive as ONE partition from a single-row-group scan —
    // spread them so the O(n·|cand|·dim) loop uses every core
    typed.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { probes =>
      val cand = bc.value
      probes.flatMap { case (aId, ua, _) =>
        // ordered size-k buffer: (cos desc, b_id asc)
        val top = new Array[Neighbor](k)
        var filled = 0
        var ci = 0
        while (ci < cand.length) {
          val (bId, ub, bLabel) = cand(ci)
          if (bId != aId) {
            var dot = 0.0
            var i = 0
            val n = math.min(ua.length, ub.length)
            while (i < n) { dot += ua(i) * ub(i); i += 1 }
            // insertion position: after all strictly-better entries
            var pos = filled
            while (pos > 0 && {
              val t = top(pos - 1)
              t.cos < dot || (t.cos == dot && t.b_id > bId)
            }) pos -= 1
            if (pos < k) {
              val upper = math.min(filled, k - 1)
              var j = upper
              while (j > pos) { top(j) = top(j - 1); j -= 1 }
              top(pos) = Neighbor(aId, bId, bLabel, dot)
              if (filled < k) filled += 1
            }
          }
          ci += 1
        }
        top.iterator.take(filled)
      }
    }.toDF()
  }

  /** j_knn_per_vector semantics: majority label over the k nearest
    * (ties broken by smaller label), one row per probe vector. */
  def majorityLabel(knn: DataFrame, k: Int): DataFrame =
    knn.groupBy("a_id", "b_label").agg(count(lit(1)).as("votes"))
      .withColumn("mr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("a_id").orderBy(desc("votes"), asc("b_label"))))
      .filter(col("mr") === 1)
      .select(col("a_id").as("vec_id"), col("b_label").as("maj_label"),
        col("votes"))
}
