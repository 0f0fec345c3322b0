package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, IntegerType, LongType}

/** §2.L `l_expr_native_cosine` — native codegen'd vector expressions.
  *
  * The composable-API formulation (`aggregate(zip_with(a, b, *), …)`)
  * allocates an intermediate array per row and evaluates the lambda
  * interpreted per element; on an all-pairs similarity join that is the
  * entire runtime (measured 45–85 s at sf0.1). These expressions emit a
  * tight primitive loop inside whole-stage codegen instead: no
  * allocation, no virtual calls, auto-vectorizable by the JIT.
  *
  * Registered through the public `SparkSessionExtensions.injectFunction`
  * hook (GraftExtensions) — usable as SQL `graft_dot(a, b)` /
  * `graft_cosine(a, b)` and from the DataFrame API via `expr(...)`.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double> (AbstractDataType, needed for
  // implicit casts, is private[sql]; callers cast explicitly)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over int8-quantized vectors (`array<tinyint>`) —
  * the scoring kernel of the PQ/scalar-quantized ANN candidate pass
  * (`j_ann_ivf_pq`). The candidate exchange carries 1-byte components
  * instead of 8-byte doubles; this expression keeps the approximate
  * scoring inside whole-stage codegen (int multiply-accumulate, no
  * allocation). */
case class ArrayDotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_dot8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) { acc += x.getByte(i) * y.getByte(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((int) $a.getByte($i)) * ((int) $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProductInt8 =
    copy(left = newLeft, right = newRight)
}

/** Full cosine similarity in one pass: dot / (||a|| * ||b||). */
case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double> (AbstractDataType, needed for
  // implicit casts, is private[sql]; callers cast explicitly)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Elementwise divide of a double array by a scalar — the unit-vector
  * normalization step. The `transform(v, x -> x / nrm)` HOF it replaces
  * evaluates its lambda interpreted per element (a measured tax on
  * every vector query's n×dim prenormalization); this emits a tight
  * primitive loop and builds the result array without boxing. Values
  * are bit-identical to the HOF formulation (same per-element IEEE
  * division in index order). */
case class ArrayDivideScalar(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vdiv"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) / k; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val tmp = ctx.freshName("tmp")
      s"""
         |int $n = $a.numElements();
         |double[] $tmp = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $tmp[$i] = $a.getDouble($i) / $b;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDivideScalar =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => ArrayDotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_vdiv"),
      new ExpressionInfo(classOf[ArrayDivideScalar].getName, "graft_vdiv"),
      (args: Seq[Expression]) => ArrayDivideScalar(args(0), args(1))),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => ArrayCosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (args: Seq[Expression]) => ShingleArray(args(0), args(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64Agg].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64Agg(args(0))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash64].getName, "graft_polyhash"),
      (args: Seq[Expression]) => PolyHash64(args(0))),
    (FunctionIdentifier("graft_normtext"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normtext"),
      (args: Seq[Expression]) => NormalizeText(args(0))),
    (FunctionIdentifier("graft_dot8"),
      new ExpressionInfo(classOf[ArrayDotProductInt8].getName, "graft_dot8"),
      (args: Seq[Expression]) => ArrayDotProductInt8(args(0), args(1))),
    (FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_bpe_count"),
      (args: Seq[Expression]) => BpeTokenCount(args(0), args(1))),
    (FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (args: Seq[Expression]) => BpeTokens(args(0), args(1))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (args: Seq[Expression]) => TopKAgg(args(0), args(1), args(2))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_mg"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_mg"),
      (args: Seq[Expression]) => MisraGriesAgg(args(0), args(1))
        .toAggregateExpression()),
    // Spark's own runtime-filter Bloom expressions, surfaced as SQL
    // functions: graft_bloom_agg(xxhash64(key), est_items, n_bits) →
    // binary sketch; graft_bloom_contains(sketch, xxhash64(key)) →
    // boolean. The optimizer injects these only for its own runtime
    // filters; registering them lets an OPERATOR build a semi-join
    // pre-filter explicitly (ScaleOps.bloomSemiFilter).
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2)).toAggregateExpression()),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))),
    (FunctionIdentifier("graft_qsketch"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "graft_qsketch"),
      (args: Seq[Expression]) => QuantileSketchAgg(args(0), args(1))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_qsketch_union"),
      new ExpressionInfo(classOf[QuantileSketchUnionAgg].getName,
        "graft_qsketch_union"),
      (args: Seq[Expression]) => QuantileSketchUnionAgg(args(0))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_qsketch_q"),
      new ExpressionInfo(classOf[QuantileSketchQuery].getName,
        "graft_qsketch_q"),
      (args: Seq[Expression]) => QuantileSketchQuery(args(0), args(1))),
    // portable bottom-k sketch family (r12) — KmvSketch.scala
    (FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv"),
      (args: Seq[Expression]) => KmvAgg(args(0), args(1))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_kmv_union"),
      new ExpressionInfo(classOf[KmvUnionAgg].getName, "graft_kmv_union"),
      (args: Seq[Expression]) => KmvUnionAgg(args(0), args(1))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_ksample"),
      new ExpressionInfo(classOf[KSampleAgg].getName, "graft_ksample"),
      (args: Seq[Expression]) => KSampleAgg(args(0), args(1), args(2))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_ksample_union"),
      new ExpressionInfo(classOf[KSampleUnionAgg].getName,
        "graft_ksample_union"),
      (args: Seq[Expression]) => KSampleUnionAgg(args(0), args(1))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_wdot"),
      new ExpressionInfo(classOf[WeightedDotSorted].getName, "graft_wdot"),
      (args: Seq[Expression]) => WeightedDotSorted(args(0), args(1))),
    (FunctionIdentifier("graft_wdot_h"),
      new ExpressionInfo(classOf[WeightedDotHashed].getName, "graft_wdot_h"),
      (args: Seq[Expression]) => WeightedDotHashed(args(0), args(1))),
    (FunctionIdentifier("graft_audio_windows"),
      new ExpressionInfo(classOf[AudioWindowsExpr].getName,
        "graft_audio_windows"),
      (args: Seq[Expression]) => AudioWindowsExpr(args(0), args(1))))

  /** Idempotent registration against an existing session (the driver
    * builds the SparkSession before our code runs, so extensions can't
    * always be injected at build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `SparkSessionExtensions` entry point — the build-time injection path:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorExprs.functions.foreach(ext.injectFunction)
    // custom whole-operator path (plans/CosineKnnPlan.scala)
    ext.injectPlannerStrategy(_ => graft.plans.CosineKnnStrategy)
    // fail-fast broadcast-budget guard for the kNN candidate side
    ext.injectOptimizerRule(_ => new graft.plans.CosineKnnCandidateGuard)
  }
}

/** Distinct word n-gram shingles of a text in one pass — replaces the
  * interpreted `array_distinct(transform(sequence(...), slice+concat))`
  * pipeline that dominated the near-dup operators' runtime (it
  * re-tokenized the text once per shingle position).
  * Set semantics and values are identical to that formulation and to
  * DuckDB's `list_distinct(list_transform(...))` oracle SQL.
  */
case class ShingleArray(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.types.{IntegerType, StringType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(text: Any, nAny: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.split(" ")
    val n = nAny.asInstanceOf[Int]
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      seen.add(sb.toString); i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleArray =
    copy(left = newLeft, right = newRight)
}

/** Portable 62-bit string hash (r8 — it makes SimHash oracle-able):
  * two INDEPENDENT polynomial hashes of the UTF-16 code units
  * (multipliers 31 and 131, both mod 2³¹−1) each pushed through one
  * Lehmer mixing step, packed as H = mix(h1) « 31 | mix(h2). Two
  * independent polynomials, not an affine pair — an affine-derived
  * second half repeats the first half's correlations and measured 5×
  * the band near-collisions on the fixture corpus (8934 vs 1805 pairs;
  * xxhash64 baseline 1034). Unlike xxhash64 the identical arithmetic
  * is expressible in DuckDB (`list_reduce` over `ascii(c)` — code
  * units equal code points on the ASCII fixture corpus), so the
  * SimHash band pipeline built on it hash-matches a SQL twin. Bits
  * 62–63 of H are structurally zero (each half < 2³¹), which both
  * engines' signatures reflect identically. */
case class PolyHash64(child: Expression)
    extends UnaryExpression with codegen.CodegenFallback {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val M = 2147483647L
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h1 = (h1 * 31 + c) % M
      h2 = (h2 * 131 + c) % M
      i += 1
    }
    (((h1 * 48271L) % M) << 31) | ((h2 * 16807L) % M)
  }

  override protected def withNewChildInternal(c: Expression): PolyHash64 =
    copy(child = c)
}

/** Exact-decimal weighted dot of two TERM-SORTED sparse vectors
  * (`array<struct<term:string, w:double>>`, as built by
  * `sort_array(collect_list(struct(term, w)))`) — the per-pair verify
  * kernel of `j_sim_tfidf_pairs` (r12). One merge pass over the two
  * arrays; on a term match the product is quantized to DECIMAL(·,6)
  * exactly as Spark's `CAST(w_a*w_b AS DECIMAL(20,6))` does
  * (`BigDecimal.valueOf` → `setScale(6, HALF_UP)`) and accumulated
  * exactly, so the result is bit-identical to the former
  * `Det.dsum(wa*wb)` join-expansion formulation and to the DuckDB
  * twin's decimal sum — while turning the (pair × terms)-row shuffle
  * expansion (68 M rows at sf0.1) into an O(|a|+|b|) scalar kernel
  * per candidate pair. Term comparison is UTF8String byte order, the
  * same ordering `sort_array` used to build the inputs.
  */
case class WeightedDotSorted(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  import org.apache.spark.sql.types.{StringType, StructType}

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) =>
      st.length == 2 && st(0).dataType == StringType &&
        st(1).dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<term:string,w:double>>, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_wdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val na = xa.numElements(); val nb = xb.numElements()
    var acc = java.math.BigDecimal.ZERO
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val ra = xa.getStruct(i, 2); val rb = xb.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        val p = ra.getDouble(1) * rb.getDouble(1)
        acc = acc.add(java.math.BigDecimal.valueOf(p)
          .setScale(6, java.math.RoundingMode.HALF_UP))
        i += 1; j += 1
      }
    }
    acc.doubleValue()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedDotSorted =
    copy(left = newLeft, right = newRight)
}

/** Hashed-term variant of [[WeightedDotSorted]] (r20 opt round —
  * VERDICT r19 "Next round" item 3): the inputs are
  * `array<struct<h:bigint, w:double>>` sorted by `h = xxhash64(term)`,
  * so the merge compares 8-byte longs instead of UTF8String bytes —
  * the compare is the hot instruction of the merge-verify pass (terms
  * match on only a small fraction of the |a|+|b| merge steps, so
  * nearly every iteration is one compare + one advance). Everything
  * else — the per-match DECIMAL(·,6) quantization and exact
  * accumulation — is byte-for-byte the string kernel's, so the sum is
  * bit-identical as long as no two DISTINCT terms of a candidate
  * pair's vocabulary share an xxhash64 value. That collision would
  * need ~2⁶⁴ draws to be likely (the same convention the substring
  * fingerprint and minhash families document); the oracle gate at
  * sf0.01/sf0.1/sf1z re-proves absence on every fixture corpus.
  * Term-hash order is NOT term order, but BigDecimal addition is
  * exact and therefore order-independent — reordering the matched
  * products cannot move the result.
  */
case class WeightedDotHashed(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  import org.apache.spark.sql.types.StructType

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) =>
      st.length == 2 && st(0).dataType == LongType &&
        st(1).dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<h:bigint,w:double>>, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_wdot_h"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val na = xa.numElements(); val nb = xb.numElements()
    var acc = java.math.BigDecimal.ZERO
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val ra = xa.getStruct(i, 2); val rb = xb.getStruct(j, 2)
      val ha = ra.getLong(0); val hb = rb.getLong(0)
      if (ha < hb) i += 1
      else if (ha > hb) j += 1
      else {
        val p = ra.getDouble(1) * rb.getDouble(1)
        acc = acc.add(java.math.BigDecimal.valueOf(p)
          .setScale(6, java.math.RoundingMode.HALF_UP))
        i += 1; j += 1
      }
    }
    acc.doubleValue()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedDotHashed =
    copy(left = newLeft, right = newRight)
}

/** Fixed-window audio energy over a binary payload (r20): the bytes as
  * 8-bit PCM samples, `window`-sample windows, per-window sum of
  * squared samples — one array row per payload, exploded by the
  * caller. Replaces the typed `mapPartitions` closure in
  * `Multimodal.audioEnergy`, whose Deserialize/Serialize boundary was
  * the only non-expression link in the op's chain (guide §4: prefer
  * expressions over closures); values are the same exact integer
  * arithmetic, window-for-window. */
case class AudioWindowsExpr(left: Expression, right: Expression)
    extends BinaryExpression with codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{BinaryType, IntegerType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, literal int), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("win_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_audio_windows"

  override def nullSafeEval(payload: Any, winAny: Any): Any = {
    val bytes = payload.asInstanceOf[Array[Byte]]
    val window = winAny.asInstanceOf[Int]
    val n = (bytes.length + window - 1) / window
    val out = new Array[Any](n)
    var wi = 0
    while (wi < n) {
      val start = wi * window
      val end = math.min(start + window, bytes.length)
      var e = 0L
      var i = start
      while (i < end) { val v = bytes(i) & 0xff; e += v.toLong * v; i += 1 }
      out(wi) = org.apache.spark.sql.catalyst.InternalRow(wi, end - start, e)
      wi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioWindowsExpr =
    copy(left = newLeft, right = newRight)
}

/** Native SimHash-64 aggregate: per-group bit-vote counts folded into
  * one 64-bit signature. Replaces the 64-sum-columns formulation in
  * j_dedup_simhash (one aggregate buffer of 64 ints vs 64 separate
  * sum aggregates through the shuffle).
  */
case class SimHash64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Int]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash column, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHash64Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHash64Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHash64Agg =
    copy(child = c)
}
