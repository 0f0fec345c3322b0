package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-bounded buffer of the k largest (value, id) pairs, ordered by
  * value DESC then id ASC — the per-group state of [[TopKAgg]]. Two
  * primitive arrays, insertion by shift (k is small by contract: a
  * top-k an analyst asks for, not a sort), no boxing, O(k) per insert
  * worst case and O(1) for the overwhelmingly common below-threshold
  * row (one comparison against the current floor). */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val vs: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  // java.lang.Double.compare, not >/==: primitive comparison makes NaN
  // beat nothing (it would be silently dropped), while Spark's total
  // ordering — and the window twin this aggregate claims row-for-row
  // equality with — ranks NaN above every double (ADVICE r7). Also
  // normalizes -0.0 < 0.0 to match Spark's ordering.
  @inline private def beats(v1: Double, id1: Long, v2: Double,
                            id2: Long): Boolean = {
    val c = java.lang.Double.compare(v1, v2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def insert(v: Double, id: Long): Unit = {
    if (n == k && !beats(v, id, vs(n - 1), ids(n - 1))) return
    var pos = if (n < k) n else k - 1
    while (pos > 0 && beats(v, id, vs(pos - 1), ids(pos - 1))) pos -= 1
    var i = math.min(n, k - 1)
    while (i > pos) { vs(i) = vs(i - 1); ids(i) = ids(i - 1); i -= 1 }
    vs(pos) = v; ids(pos) = id
    if (n < k) n += 1
  }
}

/** §2.Q `d_agg_topk_partial` — top-k per group as a bounded-heap
  * AGGREGATE instead of a window sort.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * v DESC) <= k`, `e_window_topk_per_group`) shuffles EVERY input row
  * to its group's reducer and sorts the whole group just to discard all
  * but k rows. This aggregate computes the same rows with partial
  * aggregation: each map task keeps at most k (value, id) pairs per
  * group it sees, the exchange carries those bounded buffers, and the
  * final merge is a k-way bounded insert. At 100 TB the difference is
  * the whole job — the shuffle drops from every-row to
  * ≤ k · groups-per-map-task rows, per-group sort disappears, and a
  * hot group costs its reducer O(maps · k) instead of O(rows). This is
  * the standard production shape for "top N per key" at scale; the
  * window twin stays as the oracle-checkable baseline (their equality
  * IS the correctness gate — same oracle SQL).
  *
  * Deterministic by construction: total order (value DESC, id ASC) with
  * a unique id — merge order cannot change the result. Returns
  * `array<struct<id, v>>` in rank order; `posexplode` turns it into the
  * window twin's (rank, id, value) rows.
  *
  * TypedImperativeAggregate plans as ObjectHashAggregate (no codegen
  * for the buffer update — the codegen'd path cannot hold an object
  * buffer), which is the right trade: the buffer update is two
  * primitive-array ops, and the exchange-byte cut dominates.
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with TernaryLike[Expression] {

  override def first: Expression = valueExpr
  override def second: Expression = idExpr
  override def third: Expression = kExpr

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk k must be a literal")
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v > 0 && v <= (1 << 20), s"graft_topk k out of range: $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType &&
        kExpr.dataType == IntegerType && kExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint, literal int), got " +
        s"${valueExpr.dataType.sql}, ${idExpr.dataType.sql}, " +
        s"${kExpr.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.vs(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), buf.vs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.vs(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    // pairs were serialized in rank order — inserts append in O(1) scans
    var i = 0
    while (i < n) {
      val v = bb.getDouble; val id = bb.getLong
      buf.insert(v, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKAgg =
    copy(valueExpr = newFirst, idExpr = newSecond, kExpr = newThird)
}
