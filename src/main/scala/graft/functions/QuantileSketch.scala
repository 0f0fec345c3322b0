package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** §2.Q `d_agg_quantile_sketch_union` — mergeable QUANTILE sketches as
  * a stored artifact: the percentile twin of the HLL distinct-count
  * entry. One Greenwald–Khanna digest per (group, day) lives as a
  * binary column; any date range's p50/p95/p99 is answered by UNIONING
  * the day sketches — kilobytes of stored state instead of a re-scan
  * of the raw values, with the GK rank-error guarantee (±ε·n)
  * surviving every merge.
  *
  * All three functions reuse Spark's own `PercentileDigest` (the
  * engine of `percentile_approx`) and its serializer, so the sketch
  * binary is exactly the aggregation-buffer format the built-in
  * aggregate ships across exchanges:
  *  - `graft_qsketch(x, accuracy)` → binary digest of a double column
  *  - `graft_qsketch_union(bin)`   → binary union of digests
  *  - `graft_qsketch_q(bin, p)`    → double quantile estimate
  *
  * Like the Misra–Gries summary, the digest's internal samples depend
  * on merge order, so estimates are invariant-tested (rank-error bound
  * vs exact percentile; union-vs-oneshot within the same bound), not
  * DuckDB-oracled.
  */
case class QuantileSketchAgg(
    child: Expression,
    accuracyExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproximatePercentile.PercentileDigest]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = accuracyExpr

  private lazy val accuracy: Long = {
    require(accuracyExpr.foldable, "graft_qsketch accuracy must be a literal")
    val v = accuracyExpr.eval(InternalRow.empty) match {
      case i: Int => i.toLong
      case l: Long => l
    }
    require(v > 0, s"graft_qsketch accuracy out of range: $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && accuracyExpr.foldable &&
        (accuracyExpr.dataType == IntegerType ||
          accuracyExpr.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, literal int accuracy), got " +
        s"${child.dataType.sql}, ${accuracyExpr.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch"

  override def createAggregationBuffer(): ApproximatePercentile.PercentileDigest =
    new ApproximatePercentile.PercentileDigest(1.0d / accuracy)

  override def update(buf: ApproximatePercentile.PercentileDigest,
                      input: InternalRow): ApproximatePercentile.PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: ApproximatePercentile.PercentileDigest,
                     b: ApproximatePercentile.PercentileDigest): ApproximatePercentile.PercentileDigest = {
    a.merge(b); a
  }

  override def eval(buf: ApproximatePercentile.PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: ApproximatePercentile.PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchAgg =
    copy(child = newLeft, accuracyExpr = newRight)
}

/** Union of stored digest binaries — the range query over a per-day
  * sketch table. */
case class QuantileSketchUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproximatePercentile.PercentileDigest]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary digests, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsketch_union"

  // empty-buffer sentinel: relative error is taken from the first
  // merged digest (digests created by graft_qsketch carry theirs)
  override def createAggregationBuffer(): ApproximatePercentile.PercentileDigest =
    new ApproximatePercentile.PercentileDigest(
      1.0d / ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY)

  override def update(buf: ApproximatePercentile.PercentileDigest,
                      input: InternalRow): ApproximatePercentile.PercentileDigest = {
    val v = child.eval(input)
    if (v != null) {
      buf.merge(ApproximatePercentile.serializer
        .deserialize(v.asInstanceOf[Array[Byte]]))
    }
    buf
  }

  override def merge(a: ApproximatePercentile.PercentileDigest,
                     b: ApproximatePercentile.PercentileDigest): ApproximatePercentile.PercentileDigest = {
    a.merge(b); a
  }

  override def eval(buf: ApproximatePercentile.PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: ApproximatePercentile.PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): QuantileSketchUnionAgg = copy(child = newChild)
}

/** Quantile estimate from a stored digest binary. Null on an empty
  * digest (zero rows sketched). Interpreted eval — runs once per
  * GROUP on sketch bytes, never in a per-row hot path. */
case class QuantileSketchQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qsketch_q"

  override def nullSafeEval(bin: Any, p: Any): Any = {
    val digest = ApproximatePercentile.serializer
      .deserialize(bin.asInstanceOf[Array[Byte]])
    val res = digest.getPercentiles(Array(p.asInstanceOf[Double]))
    if (res.isEmpty) null else res.head
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchQuery =
    copy(left = newLeft, right = newRight)
}
