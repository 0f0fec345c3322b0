package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** §2.Q `j_text_heavy_hitters` — Misra–Gries frequent-items summary as
  * a native aggregate (`graft_mg(token, m)`).
  *
  * The exact "which tokens dominate the corpus" query is a full
  * groupBy over the VOCABULARY — at 100 TB that shuffle carries every
  * distinct token with its partial counts. Misra–Gries keeps at most
  * `m` counters per partial buffer; the exchange carries ≤ m
  * (token, count) pairs per map task regardless of vocabulary size.
  * The classic guarantees survive the merge (Agarwal et al.'s
  * mergeable-summaries bound): every item with true frequency
  * > n/(m+1) is PRESENT in the summary, and each kept counter
  * undercounts by at most n/(m+1).
  *
  * The sketch's counter VALUES (and which sub-threshold items linger)
  * depend on merge order, so the raw summary is not oracle-safe.
  * The entry therefore uses the production two-pass shape: the sketch
  * proposes ≤ m candidates, a second map-side pass counts EXACTLY the
  * candidate tokens only (broadcast semi-join — the shuffle carries
  * candidate tokens, not the vocabulary), and the threshold filter
  * runs on exact counts. The output is deterministic and oracled
  * against the plain exact HAVING query — a hash-match PROVES the
  * completeness guarantee held (a lost heavy hitter would drop a row).
  *
  * Buffer: a plain HashMap (≤ m entries + transient overflow during
  * merge). update() is O(1) amortized — the decrement-all step runs
  * once per m below-capacity inserts; merge() sums counters then
  * subtracts the (m+1)-th largest value, the standard mergeable-MG
  * reduction.
  */
case class MisraGriesAgg(
    child: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = mExpr

  private lazy val m: Int = {
    require(mExpr.foldable, "graft_mg m must be a literal")
    val v = mExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v > 0 && v <= (1 << 20), s"graft_mg m out of range: $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && mExpr.dataType == IntegerType &&
        mExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, literal int), got " +
        s"${child.dataType.sql}, ${mExpr.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UTF8String buffer
      val t = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(t)
      if (cur != 0L || buf.containsKey(t)) buf.put(t, cur + 1L)
      else if (buf.size < m) buf.put(t, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** Subtract `by` from every counter, dropping non-positives — the
    * MG overflow step (and the merge reduction with by = the
    * (m+1)-th largest combined count). */
  private def decrementAll(buf: java.util.HashMap[String, Long],
                           by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach { (t, c) =>
      val cur = a.get(t)
      a.put(t, cur + c)
    }
    if (a.size > m) {
      // subtract the (m+1)-th largest count; at most m survive
      val counts = new Array[Long](a.size)
      var i = 0
      val it = a.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val kth = counts(a.size - m - 1) // (m+1)-th largest
      decrementAll(a, kth)
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    // presentation order only — consumers treat this as a candidate SET
    java.util.Arrays.sort(entries, (x: (String, Long), y: (String, Long)) =>
      if (x._2 != y._2) java.lang.Long.compare(y._2, x._2)
      else x._1.compareTo(y._1))
    val out = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      out(i) = InternalRow(UTF8String.fromString(entries(i)._1), entries(i)._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(child = newLeft, mExpr = newRight)
}
