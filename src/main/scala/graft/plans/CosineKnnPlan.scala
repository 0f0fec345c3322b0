package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** The full custom-operator path (preference cascade step (c), SURVEY
  * §4): a kNN self-join as a first-class Catalyst citizen — logical
  * node → planner strategy → physical operator — injected through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * Semantics are identical to `plans/KnnJoin.knnBruteForce` (the
  * mapPartitions formulation, cascade step (d)) and to the declarative
  * join+window formulation; KnnJoinSpec asserts all three agree. The
  * value of the (c) path: the operator is visible to the optimizer and
  * EXPLAIN (`CosineKnnExec` in the plan), composes with downstream
  * logical rewrites, and owns its distribution decision.
  *
  * Physical shape: candidates are collected once on the driver and
  * broadcast (n×dim doubles — at 100 TB, one IVF cell's inverted list,
  * cf. AnnOps); probes stream per-partition keeping a size-k ordered
  * buffer, so only n·k rows are ever materialized and no vector
  * payload enters a shuffle.
  */
case class CosineKnn(child: LogicalPlan, k: Int,
                     override val output: Seq[Attribute]) extends UnaryNode {
  // the operator mints its output attributes (they don't derive from
  // the child), so declare them produced or CheckAnalysis flags them
  // as missing from the input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the node consumes the child rows positionally but holds no
  // Expressions over them, so the derived `references` is EMPTY —
  // without this override ColumnPruning prunes the child to zero
  // columns and the operator reads type-defaults (0) from empty rows
  // whenever any projection sits above it
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): CosineKnn =
    copy(child = c)
}

object CosineKnn {
  /** Fresh output attributes for one operator instance. */
  def apply(child: LogicalPlan, k: Int): CosineKnn =
    new CosineKnn(child, k, Seq(
      AttributeReference("a_id", LongType, nullable = false)(),
      AttributeReference("b_id", LongType, nullable = false)(),
      AttributeReference("b_label", IntegerType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)()))

  /** Dataset-API entry: `df` must expose (id: bigint, u: array<double>
    * unit vector, label: int) in that positional order. The strategy is
    * ensured on the session (idempotently) so the helper works on
    * sessions built without GraftExtensions, e.g. the harness-owned
    * one. */
  def knn(df: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    if (!s.experimental.extraStrategies.contains(CosineKnnStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ CosineKnnStrategy
    org.apache.spark.sql.GraftPlanBridge.ofRows(
      s, CosineKnn(df.queryExecution.analyzed, k))
  }
}

/** Plans the logical CosineKnn onto its physical operator. */
object CosineKnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ck: CosineKnn =>
      CosineKnnExec(planLater(ck.child), ck.k, ck.output) :: Nil
    case _ => Nil
  }
}

/** Broadcast block nested-loop kNN. Child rows must be
  * (id: bigint, u: array<double> unit vector, label: int). */
case class CosineKnnExec(child: SparkPlan, k: Int,
                         override val output: Seq[Attribute])
    extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildInternal(c: SparkPlan): CosineKnnExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    // candidate set: one driver collect + broadcast (bounded — a cell's
    // inverted list at scale, never a shuffled pair materialization)
    val cand = child.executeCollect().map { r =>
      (r.getLong(0), r.getArray(1).toDoubleArray, r.getInt(2))
    }
    val bc = sparkContext.broadcast(cand)
    val outTypes: Array[DataType] = output.map(_.dataType).toArray
    child.execute().mapPartitions { probes =>
      val proj = UnsafeProjection.create(outTypes)
      val cs = bc.value
      probes.flatMap { row =>
        val aId = row.getLong(0)
        val ua = row.getArray(1).toDoubleArray
        // ordered size-k buffer: (cos desc, b_id asc) — same tie rule
        // as the declarative window formulation
        val ids = new Array[Long](kk)
        val labels = new Array[Int](kk)
        val coss = new Array[Double](kk)
        var filled = 0
        var ci = 0
        while (ci < cs.length) {
          val (bId, ub, bLabel) = cs(ci)
          if (bId != aId) {
            var dot = 0.0
            var i = 0
            val n = math.min(ua.length, ub.length)
            while (i < n) { dot += ua(i) * ub(i); i += 1 }
            var pos = filled
            while (pos > 0 && {
              coss(pos - 1) < dot ||
                (coss(pos - 1) == dot && ids(pos - 1) > bId)
            }) pos -= 1
            if (pos < kk) {
              val upper = math.min(filled, kk - 1)
              var j = upper
              while (j > pos) {
                ids(j) = ids(j - 1); labels(j) = labels(j - 1)
                coss(j) = coss(j - 1); j -= 1
              }
              ids(pos) = bId; labels(pos) = bLabel; coss(pos) = dot
              if (filled < kk) filled += 1
            }
          }
          ci += 1
        }
        (0 until filled).iterator.map { i =>
          proj.apply(InternalRow(aId, ids(i), labels(i), coss(i))).copy()
        }
      }
    }
  }
}
