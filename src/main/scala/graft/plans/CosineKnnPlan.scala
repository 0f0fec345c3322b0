package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** The full custom-operator path (preference cascade step (c), SURVEY
  * §4): a kNN join as a first-class Catalyst citizen — logical node →
  * planner strategy → physical operator — injected through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * Semantics are identical to `plans/KnnJoin.knnBruteForce` (the
  * mapPartitions formulation, cascade step (d)) and to the declarative
  * join+window formulation; KnnJoinSpec asserts all three agree.
  *
  * Physical shape: a BINARY operator — probes on the left, candidates
  * on the right. The candidate side declares
  * `BroadcastDistribution(IdentityBroadcastMode)`, so EnsureRequirements
  * plans a real `BroadcastExchangeExec` under it: the candidate rows
  * are collected and shipped by Spark's executor-side broadcast
  * machinery (size-guarded by `spark.sql.broadcastExchangeMaxSize`,
  * visible in EXPLAIN, reusable across plan fragments) — never by a
  * hand-rolled driver `executeCollect`. Each child is its own subtree
  * executed exactly once, so a nondeterministic input can no longer
  * yield inconsistent candidate/probe sets for the self-join case (the
  * caller passes the same deterministic frame twice).
  *
  * Probes stream per-partition keeping a size-k ordered buffer, so only
  * n·k rows are ever materialized and no vector payload enters a
  * shuffle. At 100 TB the candidate side is one IVF cell's inverted
  * list (cf. `j_knn_ivf` in AnnOps), bounded by construction.
  */
case class CosineKnn(probe: LogicalPlan, candidates: LogicalPlan, k: Int,
                     override val output: Seq[Attribute]) extends BinaryNode {
  override def left: LogicalPlan = probe
  override def right: LogicalPlan = candidates
  // the operator mints its output attributes (they don't derive from
  // the children), so declare them produced or CheckAnalysis flags
  // them as missing from the input
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // the node consumes child rows positionally but holds no Expressions
  // over them, so the derived `references` is EMPTY — without this
  // override ColumnPruning prunes the children to zero columns and the
  // operator reads type-defaults (0) from empty rows whenever any
  // projection sits above it
  override def references: AttributeSet =
    probe.outputSet ++ candidates.outputSet
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): CosineKnn =
    copy(probe = newLeft, candidates = newRight)
}

object CosineKnn {
  /** Fresh output attributes for one operator instance. */
  def apply(probe: LogicalPlan, candidates: LogicalPlan, k: Int): CosineKnn =
    new CosineKnn(probe, candidates, k, Seq(
      AttributeReference("a_id", LongType, nullable = false)(),
      AttributeReference("b_id", LongType, nullable = false)(),
      AttributeReference("b_label", IntegerType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)()))

  /** Dataset-API entry, probe and candidate sides separate: both frames
    * must expose (id: bigint, u: array<double> unit vector, label: int)
    * in that positional order. The candidate frame should be bounded
    * (an IVF cell / LSH bucket at scale); it flows through a real
    * BroadcastExchange. The strategy is ensured on the session
    * (idempotently) so the helper works on sessions built without
    * GraftExtensions, e.g. the harness-owned one. */
  def knn(probe: org.apache.spark.sql.DataFrame,
          candidates: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = probe.sparkSession
    if (!s.experimental.extraStrategies.contains(CosineKnnStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ CosineKnnStrategy
    org.apache.spark.sql.GraftPlanBridge.ofRows(
      s, CosineKnn(probe.queryExecution.analyzed,
        candidates.queryExecution.analyzed, k))
  }

  /** Self-kNN: every vector against every other (the brute-force
    * correctness baseline behind j_knn_per_vector). */
  def knn(df: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = knn(df, df, k)
}

/** Injected optimizer rule (GraftExtensions → `injectOptimizerRule`):
  * fail FAST with an actionable message when the kNN candidate side's
  * estimated size exceeds the broadcast budget, instead of letting the
  * BroadcastExchange OOM an executor mid-query. The estimate is
  * Catalyst's `stats.sizeInBytes` for the candidate subtree; the
  * budget is `spark.graft.knn.maxCandidateBytes` (default 512 MB —
  * of the order of Spark's own broadcast-size ceiling). The guard is
  * advisory-by-config, not semantic: results never change, queries
  * under the budget are untouched. */
class CosineKnnCandidateGuard
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  val MaxBytesKey = "spark.graft.knn.maxCandidateBytes"
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case ck: CosineKnn =>
        val max = conf.getConfString(MaxBytesKey,
          (512L << 20).toString).toLong
        val est = ck.candidates.stats.sizeInBytes
        if (est > max)
          throw new IllegalStateException(
            s"CosineKnn candidate side estimated $est bytes exceeds " +
              s"$MaxBytesKey=$max. Bound the candidates (e.g. one IVF " +
              "cell, cf. j_knn_ivf) or raise the budget.")
      case _ => ()
    }
    plan
  }
}

/** Plans the logical CosineKnn onto its physical operator. */
object CosineKnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ck: CosineKnn =>
      CosineKnnExec(planLater(ck.probe), planLater(ck.candidates),
        ck.k, ck.output) :: Nil
    case _ => Nil
  }
}

/** Broadcast block nested-loop kNN. Child rows must be
  * (id: bigint, u: array<double> unit vector, label: int). */
case class CosineKnnExec(probe: SparkPlan, candidates: SparkPlan, k: Int,
                         override val output: Seq[Attribute])
    extends BinaryExecNode {

  override def left: SparkPlan = probe
  override def right: SparkPlan = candidates

  override def producedAttributes: AttributeSet = AttributeSet(output)

  // EnsureRequirements satisfies this with a BroadcastExchangeExec over
  // the candidate child — Spark's own broadcast path (driver memory
  // guard, torrent broadcast, exchange reuse), not a manual collect
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): CosineKnnExec =
    copy(probe = newLeft, candidates = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val bc = candidates.executeBroadcast[Array[InternalRow]]()
    val outTypes: Array[DataType] = output.map(_.dataType).toArray
    probe.execute().mapPartitions { probes =>
      val proj = UnsafeProjection.create(outTypes)
      // decode the broadcast candidate rows once per partition; the
      // arrays then feed the hot loop without per-probe row access
      val rows = bc.value
      val n = rows.length
      val candIds = new Array[Long](n)
      val candVecs = new Array[Array[Double]](n)
      val candLabels = new Array[Int](n)
      var d = 0
      while (d < n) {
        val r = rows(d)
        candIds(d) = r.getLong(0)
        candVecs(d) = r.getArray(1).toDoubleArray
        candLabels(d) = r.getInt(2)
        d += 1
      }
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
        while (ci < n) {
          val bId = candIds(ci)
          if (bId != aId) {
            val ub = candVecs(ci)
            var dot = 0.0
            var i = 0
            val len = math.min(ua.length, ub.length)
            while (i < len) { dot += ua(i) * ub(i); i += 1 }
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
              ids(pos) = bId; labels(pos) = candLabels(ci); coss(pos) = dot
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
