package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** §2.Q portable sketches (r12) — the bottom-k (KMV) family that puts
  * the four approximate-aggregate rows on the hard DuckDB-oracle gate.
  *
  * The engine-locked sketches (Datasketches HLL, GK digests) estimate
  * well but their internals are merge-order dependent, so no SQL twin
  * can hash-match them. A bottom-k sketch over the repo's PROVEN
  * portable hash family is different in kind: "the k smallest distinct
  * hash values" is a pure SET function of the input — independent of
  * row order, partitioning, and merge shape — so DuckDB computes the
  * identical sketch with a window rank and the estimate is exact-equal
  * arithmetic on both engines, while Spark still gets the mergeable
  * bounded-state aggregate the 100 TB story needs (the exchange
  * carries ≤ k longs per group per map task, never the value set).
  *
  *  - `graft_kmv(h, k)`          → array<bigint>: k smallest DISTINCT
  *                                 hashes (ascending)
  *  - `graft_kmv_union(sk, k)`   → merge of stored sketches — equals
  *                                 the one-shot sketch of the union
  *                                 (that identity IS the oracle)
  *  - `graft_ksample(h, v, k)`   → array<struct<h,v>>: the (hash,
  *                                 value) pairs with the k smallest
  *                                 distinct (h, v) keys — a
  *                                 deterministic uniform row sample,
  *                                 i.e. a mergeable RANK sketch:
  *                                 quantiles over the sample estimate
  *                                 quantiles over the population
  *  - `graft_ksample_union(sk, k)` → merge of stored samples
  *
  * Estimators stay OUT of the aggregates on purpose: distinct-count
  * `(k−1)·2⁶²/h_(k)` and sample-quantile interpolation are plain
  * column arithmetic both engines run bit-identically (see
  * Aggregations `kmvEstimate` / `ksampleQuantile`).
  *
  * Accuracy (invariant-tested, not oracled — the oracle checks
  * determinism): distinct-count se ≈ 1/√(k−2) ≈ 9% at k=128; sampled
  * quantile rank se ≈ √(p(1−p)/k) ≈ 0.8% at k=4096. The sketches are
  * exact below k (estimate = |sketch|).
  */
final class KmvBuffer(val k: Int) {
  var n: Int = 0
  var hs: Array[Long] = new Array[Long](math.min(k, 64))

  def insert(h: Long): Unit = {
    // Fast-reject only at capacity (r13, ADVICE): a MaxValue-sentinel
    // ceiling would drop h == Long.MaxValue even while below k,
    // diverging from a DISTINCT-based twin on full-range 64-bit input.
    if (n == k && h >= hs(n - 1)) return
    // binary search for the insertion point; drop exact duplicates
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && hs(lo) == h) return
    if (n < k && n == hs.length)
      hs = java.util.Arrays.copyOf(hs, math.min(k, hs.length * 2))
    val last = if (n < k) n else k - 1
    var i = last
    while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
    hs(lo) = h
    if (n < k) n += 1
  }
}

private[functions] trait KmvLikeAgg extends TypedImperativeAggregate[KmvBuffer] {
  protected def kExpr: Expression

  protected lazy val k: Int = {
    require(kExpr.foldable, s"$prettyName k must be a literal")
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v > 0 && v <= (1 << 20), s"$prettyName k out of range: $v")
    v
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.hs(i)); i += 1 }
    a
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Long](buf.n)
    System.arraycopy(buf.hs, 0, out, 0, buf.n)
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.hs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    // serialized ascending — inserts append without shifting
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }
}

/** `graft_kmv(hash, k)` — bottom-k distinct hashes of a group. */
case class KmvAgg(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvLikeAgg with BinaryLike[Expression] {

  override def left: Expression = hashExpr
  override def right: Expression = kExpr
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && kExpr.dataType == IntegerType &&
        kExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, literal int), got " +
        s"${hashExpr.dataType.sql}, ${kExpr.dataType.sql}")

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvAgg =
    copy(hashExpr = newLeft, kExpr = newRight)
}

/** `graft_kmv_union(sketch, k)` — bottom-k of stored sketches. The
  * union of per-partition bottom-k sets contains every global bottom-k
  * hash (a globally-small hash is small within its own partition), so
  * union-of-sketches ≡ sketch-of-union exactly — the mergeability
  * identity the oracle and the spec both pin. */
case class KmvUnionAgg(
    sketchExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvLikeAgg with BinaryLike[Expression] {

  override def left: Expression = sketchExpr
  override def right: Expression = kExpr
  override def prettyName: String = "graft_kmv_union"

  override def checkInputDataTypes(): TypeCheckResult =
    sketchExpr.dataType match {
      case ArrayType(LongType, _)
        if kExpr.dataType == IntegerType && kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, literal int), got " +
          s"${sketchExpr.dataType.sql}, ${kExpr.dataType.sql}")
    }

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val sk = sketchExpr.eval(input)
    if (sk != null) {
      val arr = sk.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buf.insert(arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnionAgg =
    copy(sketchExpr = newLeft, kExpr = newRight)
}

/** Bottom-k buffer over (hash, value) pairs, ordered by (h ASC, v ASC)
  * with exact-duplicate pairs dropped — the deterministic row-sample
  * state of [[KSampleAgg]]. The (h, v) total order (not h alone) keeps
  * the sketch a pure set function even under hash collisions. */
final class KSampleBuffer(val k: Int) {
  var n: Int = 0
  var hs: Array[Long] = new Array[Long](math.min(k, 64))
  var vs: Array[Double] = new Array[Double](math.min(k, 64))

  @inline private def less(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && java.lang.Double.compare(v1, v2) < 0)

  def insert(h: Long, v: Double): Unit = {
    if (n == k && !less(h, v, hs(n - 1), vs(n - 1))) return
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (less(hs(mid), vs(mid), h, v)) lo = mid + 1 else hi = mid
    }
    if (lo < n && hs(lo) == h &&
        java.lang.Double.compare(vs(lo), v) == 0) return
    if (n < k && n == hs.length) {
      val cap = math.min(k, hs.length * 2)
      hs = java.util.Arrays.copyOf(hs, cap)
      vs = java.util.Arrays.copyOf(vs, cap)
    }
    val last = if (n < k) n else k - 1
    var i = last
    while (i > lo) { hs(i) = hs(i - 1); vs(i) = vs(i - 1); i -= 1 }
    hs(lo) = h; vs(lo) = v
    if (n < k) n += 1
  }
}

private[functions] trait KSampleLikeAgg
  extends TypedImperativeAggregate[KSampleBuffer] {
  protected def kExpr: Expression

  protected lazy val k: Int = {
    require(kExpr.foldable, s"$prettyName k must be a literal")
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v > 0 && v <= (1 << 20), s"$prettyName k out of range: $v")
    v
  }

  override def dataType: DataType = KSampleLikeAgg.SketchType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KSampleBuffer = new KSampleBuffer(k)

  override def merge(a: KSampleBuffer, b: KSampleBuffer): KSampleBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.hs(i), b.vs(i)); i += 1 }
    a
  }

  override def eval(buf: KSampleBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = InternalRow(buf.hs(i), buf.vs(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KSampleBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.hs(i)); bb.putDouble(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KSampleBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KSampleBuffer(k)
    var i = 0
    while (i < n) {
      val h = bb.getLong; val v = bb.getDouble
      buf.insert(h, v); i += 1
    }
    buf
  }
}

object KSampleLikeAgg {
  val SketchType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)
}

/** `graft_ksample(hash, value, k)` — deterministic bottom-k row sample:
  * the k (hash, value) pairs with the smallest (h, v) keys. */
case class KSampleAgg(
    hashExpr: Expression,
    valueExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KSampleLikeAgg with TernaryLike[Expression] {

  override def first: Expression = hashExpr
  override def second: Expression = valueExpr
  override def third: Expression = kExpr
  override def prettyName: String = "graft_ksample"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType && valueExpr.dataType == DoubleType &&
        kExpr.dataType == IntegerType && kExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, double, literal int), got " +
        s"${hashExpr.dataType.sql}, ${valueExpr.dataType.sql}, " +
        s"${kExpr.dataType.sql}")

  override def update(buf: KSampleBuffer, input: InternalRow): KSampleBuffer = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null)
      buf.insert(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): KSampleAgg =
    copy(hashExpr = newFirst, valueExpr = newSecond, kExpr = newThird)
}

/** `graft_ksample_union(sample, k)` — merge of stored row samples;
  * union-of-samples ≡ sample-of-union by the same bottom-k argument
  * as [[KmvUnionAgg]]. */
case class KSampleUnionAgg(
    sketchExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KSampleLikeAgg with BinaryLike[Expression] {

  override def left: Expression = sketchExpr
  override def right: Expression = kExpr
  override def prettyName: String = "graft_ksample_union"

  override def checkInputDataTypes(): TypeCheckResult =
    sketchExpr.dataType match {
      case ArrayType(st: StructType, _)
        if st.length == 2 && st(0).dataType == LongType &&
          st(1).dataType == DoubleType &&
          kExpr.dataType == IntegerType && kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<h:bigint,v:double>>, " +
          s"literal int), got ${sketchExpr.dataType.sql}, " +
          s"${kExpr.dataType.sql}")
    }

  override def update(buf: KSampleBuffer, input: InternalRow): KSampleBuffer = {
    val sk = sketchExpr.eval(input)
    if (sk != null) {
      val arr = sk.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val row = arr.getStruct(i, 2)
        buf.insert(row.getLong(0), row.getDouble(1))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KSampleUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KSampleUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KSampleUnionAgg =
    copy(sketchExpr = newLeft, kExpr = newRight)
}
