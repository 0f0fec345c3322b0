package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, DoubleType, DecimalType, LongType}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md /
  * FIXTURES.md). One method per table; `sfDir` is the scale-factor
  * directory passed by the harness.
  *
  * Schemas are declared explicitly (matching the fixtures' parquet
  * types exactly) rather than inferred: skipping footer-based schema
  * inference saves a driver round-trip per table reference — measurable
  * when a benchmark runs 85 queries — and is the describe()-driven read
  * pattern of the reference ETL (SURVEY §1.1).
  *
  * Scale notes (100 TB design): each loader returns the raw scan so
  * Catalyst can push filters/projection into the parquet reader. On a
  * real cluster these would be partitioned tables (orders/lineitem by
  * date, events by ts-day); the query code never assumes single-file
  * inputs.
  */
object Tables {
  private def ddl(s: String): StructType = StructType.fromDDL(s)

  val schemas: Map[String, StructType] = Map(
    "region" -> ddl("r_regionkey INT, r_name STRING"),
    "nation" -> ddl("n_nationkey INT, n_name STRING, n_regionkey INT"),
    "customer" -> ddl("c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"),
    "supplier" -> ddl("s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"),
    "part" -> ddl("p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE"),
    "orders" -> ddl("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"),
    "lineitem" -> ddl("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"),
    "documents" -> ddl("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"),
    "embeddings" -> ddl("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"),
    // ts declared as raw INT64 ticks: the driver has shipped the events
    // fixture both as parquet TIMESTAMP(NANOS) (which Spark 4 rejects at
    // inference without spark.sql.legacy.parquet.nanosAsLong) and as
    // TIMESTAMP_MICROS — an explicit BIGINT schema reads the raw int64
    // under either annotation; tsNsPerTick sniffs the footer for the
    // unit and the loaders below normalize.
    "events" -> ddl("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"))

  private def read(s: SparkSession, d: String, t: String): DataFrame =
    s.read.schema(schemas(t)).parquet(s"$d/$t.parquet")

  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Nanoseconds per raw int64 tick of `column` in `path`'s parquet
    * footer (NANOS → 1, MICROS → 1_000, MILLIS → 1_000_000;
    * unannotated INT64 → raw nanos; non-INT64 → -1, caller uses the
    * native typed read). A driver-side footer read, no Spark job;
    * cached per (path, column) — fixtures are immutable within a
    * session. Keeping every unit path alive means a future fixture
    * regeneration in any direction stays green (the r8 lesson:
    * events.ts silently flipped nanos→micros between rounds).
    */
  private def footerTsUnit(s: SparkSession, path: String,
                           column: String): Long =
    tsUnitCache.computeIfAbsent(s"$path#$column", { _ =>
      import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
      import LogicalTypeAnnotation.TimeUnit
      val conf = s.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"no parquet part-files under $path"))
        else root
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      val prim =
        try {
          val schema = r.getFooter.getFileMetaData.getSchema
          schema.getType(schema.getFieldIndex(column)).asPrimitiveType()
        } finally r.close()
      if (prim.getPrimitiveTypeName !=
          PrimitiveType.PrimitiveTypeName.INT64) -1L
      else prim.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.NANOS  => 1L
            case TimeUnit.MICROS => 1000L
            case TimeUnit.MILLIS => 1000000L
          }
        case _: LogicalTypeAnnotation.IntLogicalTypeAnnotation | null =>
          1L // unannotated INT64: raw nanos
        case _ => -1L // non-timestamp annotation: native read
      }
    })

  /** events.ts unit (see [[footerTsUnit]]). Fails fast on the -1
    * sentinel (non-INT64 physical type or a non-timestamp annotation):
    * every caller divides or multiplies by this value, and a silent -1
    * would corrupt every derived timestamp instead of erroring
    * (ADVICE r9) — if a future regen changes events.ts to such a type,
    * the events readers need a new native-read path, not a unit. */
  def tsNsPerTick(s: SparkSession, d: String): Long = {
    val tick = footerTsUnit(s, s"$d/events.parquet", "ts")
    if (tick <= 0L) sys.error(
      s"events.ts under $d is not an INT64 timestamp/raw-nano column " +
        "(footer sniff returned the native-read sentinel); the tick-" +
        "normalizing readers cannot handle this layout — extend " +
        "Tables.events with a native read for it")
    tick
  }

  /** events with `ts` as the RAW int64 tick value (unit per
    * tsNsPerTick) — for callers that need a predicate pushed down onto
    * the physical column (a filter on a derived `ts * k` expression
    * never reaches the parquet scan). */
  def eventsRaw(s: SparkSession, d: String): DataFrame = read(s, d, "events")

  /** `ts` raw ticks → epoch microseconds (integer arithmetic: double
    * division rounds-to-nearest, off by 1µs for ~half of nano inputs). */
  private def tickToMicros(tick: Long): org.apache.spark.sql.Column =
    if (tick >= 1000L) expr(s"ts * ${tick / 1000L}")
    else expr(s"ts div ${1000L / tick}")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    readWithTsDefense(s, d, "orders", "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    readWithTsDefense(s, d, "lineitem", "l_shipdate")
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Read `table` whose `tsCol` is declared TIMESTAMP_NTZ — with the
    * same regeneration defense events.ts needed in r8: Spark's native
    * NTZ read handles parquet TIMESTAMP_MICROS and TIMESTAMP_MILLIS,
    * but a regen to TIMESTAMP(NANOS) (or bare INT64) would fail the
    * typed read, so that case falls back to an explicit BIGINT schema
    * and integer-normalizes to NTZ micros, exactly the events path. */
  private def readWithTsDefense(s: SparkSession, d: String, table: String,
                                tsCol: String): DataFrame = {
    val unit = footerTsUnit(s, s"$d/$table.parquet", tsCol)
    if (unit != 1L) read(s, d, table)
    else {
      val rawSchema = StructType(schemas(table).map { f =>
        if (f.name == tsCol) f.copy(dataType = LongType) else f
      })
      s.read.schema(rawSchema).parquet(s"$d/$table.parquet")
        .withColumn(tsCol,
          timestamp_micros(expr(s"$tsCol div 1000")).cast(TimestampNTZType))
    }
  }

  /** events.ts read as raw int64 ticks via the explicit schema,
    * normalized to epoch microseconds per the footer-sniffed unit,
    * presented as TIMESTAMP_NTZ (session TZ is UTC) — exactly the value
    * DuckDB sees reading the same file (its oracle SQL uses the
    * unit-agnostic epoch_us(ts)).
    */
  def events(s: SparkSession, d: String): DataFrame =
    read(s, d, "events")
      .withColumn("ts",
        timestamp_micros(tickToMicros(tsNsPerTick(s, d))).cast(TimestampNTZType))

  /** events with the epoch-NANOSECOND long preserved as `ts_ns`
    * regardless of the fixture's physical unit. When the fixture is
    * already nanos, `ts_ns` stays a bare column alias so predicates on
    * it still push down to the scan. */
  def eventsWithNanos(s: SparkSession, d: String): DataFrame = {
    val tick = tsNsPerTick(s, d)
    read(s, d, "events")
      .withColumn("ts_ns", if (tick == 1L) col("ts") else expr(s"ts * $tick"))
      .withColumn("ts",
        timestamp_micros(tickToMicros(tick)).cast(TimestampNTZType))
  }

  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Exact row count of a fixture table from its parquet footer
    * metadata — a driver-side file read, NO Spark job (the ANN query
    * builders use it to pick their physical mode; an eager
    * `df.count()` there submitted a job per query construction).
    * Cached per path for the session lifetime — fixtures are
    * immutable; a mutable table would need invalidation. */
  def rowCount(s: SparkSession, d: String, t: String): Long = {
    val key = s"$d/$t.parquet"
    rowCountCache.computeIfAbsent(key, { _ =>
      val conf = s.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(key)
      val fs = root.getFileSystem(conf)
      val files: Seq[org.apache.hadoop.fs.Path] =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).toIndexedSeq.map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
        else Seq(root)
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
  }
}

/** Parallelism repair for CPU-bound stages.
  *
  * The fixture tables are single-file / single-row-group parquet, so a
  * scan yields ONE input partition and every downstream map-side stage
  * (n² broadcast joins, shingle explosion, per-token hashing) runs on
  * one core of local[32]. On a production layout (thousands of files /
  * row groups per table) the scan parallelizes by itself — this helper
  * re-establishes that property where the stage after the scan is
  * compute-bound.
  *
  * r20 (guide §2.4/§8): the repartition is now CONDITIONAL — when the
  * scan already yields at least `defaultParallelism` partitions (every
  * production layout), spread is the identity. The unconditional form
  * was a full shuffle of the scanned rows — "tiny" on the KB fixtures
  * but a corpus-payload exchange at 100 TB, bolted onto 21 query
  * paths purely to fix the local single-file layout. Values are
  * unaffected either way (round-robin repartition is values-neutral
  * and every downstream op pins its own determinism); on the local
  * fixtures the scan is 1 partition, so the bench plans are unchanged.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Partition probe via .rdd: free for the scan-shaped frames that
    // dominate the call sites (no exchange → no stage runs). For the
    // two join-shaped callers (CorpusPipeline keep-joins) AQE may
    // materialize the join's stages eagerly here — those run inside
    // once-per-session store builds, and the subsequent action reuses
    // the materialized stages, so the net cost is ~zero (bench-checked
    // before/after; r20).
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}

/** Cross-engine determinism helpers (SURVEY §0.2).
  *
  * Double summation is order-dependent; Spark and DuckDB both sum in
  * arbitrary order, so raw double sums flake at the oracle's hash
  * compare. All fixture measures are exact 2-decimal values (verified
  * in FIXTURES.md), so casting each row to DECIMAL(20,6) is exact and
  * the decimal sum is deterministic on both engines. The final cast
  * back to double is a deterministic IEEE rounding.
  *
  * Oracle SQL must use the same formulation:
  *   CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)
  */
object Det {
  import org.apache.spark.sql.Column

  /** Binary half-away-from-zero quantization to integer MICROS, in
    * pure IEEE ops (r14, found by the boundary fuzzer's 4·10⁹-scale
    * derived products): floor(|x|·10⁶ + 0.5) with sign restored. Both
    * engines compute the identical double chain, so the micros agree
    * even where a decimal CAST's repr-vs-binary choice diverges
    * (Spark casts the shortest decimal repr, DuckDB the binary value
    * — at |x| ≥ ~10⁹ a derived product's repr gap reaches the 10⁻⁶
    * quantum and the old casts measurably disagreed; FUZZ sweep 1,
    * SCALE.md §r14). Exact for |x| < 2⁵³/10⁶ ≈ 9·10⁹ per row —
    * beyond that a double has no 6-decimal resolution at all. */
  private def microsD(c: Column): Column =
    when(c < 0, -floor(-c * lit(1000000.0) + lit(0.5)))
      .otherwise(floor(c * lit(1000000.0) + lit(0.5)))

  private def microsSqlD(e: String): String =
    s"CASE WHEN ($e) < 0 THEN -floor(-($e) * 1000000 + 0.5) " +
      s"ELSE floor(($e) * 1000000 + 0.5) END"

  /** The per-row binary-micros quantizer of [[dsum]], public for
    * consumers that stay in EXACT integer arithmetic after quantizing
    * (r15, ADVICE r14: gini's rational rounding multiplies the rank
    * into the quantized value instead of quantizing the rank·value
    * product, whose repr-vs-binary cast gap reaches the 10⁻⁶ quantum
    * at |i·v| ≥ ~10⁹). Both engines floor the identical double chain. */
  def micros(c: Column): Column = microsD(c)

  /** SQL twin of [[micros]]. */
  def microsSql(e: String): String = microsSqlD(e)

  /** Deterministic sum of a double expression: binary-micros
    * quantization per row (see [[microsD]]), exact DECIMAL(38,0)
    * accumulation, one correctly-rounded decimal→double hop, one IEEE
    * division by 10⁶. For raw ≤2-decimal business columns this equals
    * the pre-r14 DECIMAL(20,6) cast exactly; for DERIVED products at
    * large magnitude it is the portable form the old cast wasn't. */
  def dsum(c: Column): Column =
    sum(microsD(c).cast(DecimalType(38, 0))).cast(DoubleType) /
      lit(1000000.0)

  /** Deterministic average: deterministic sum / count — the same two
    * IEEE divisions on both engines. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL fragment for the oracle side of dsum — the mirror of the
    * Spark chain: binary-micros per row, HUGEINT sum (exact), then
    * the decimal→double hop THROUGH A STRING (r12): DuckDB's direct
    * `CAST(... AS DOUBLE)` from wide integers is not correctly
    * rounded — it can land one ulp off the nearest double — whereas
    * its VARCHAR→DOUBLE path is a correctly-rounded strtod, which
    * always agrees with Spark's BigDecimal.doubleValue. */
  def dsumSql(expr: String): String =
    s"(CAST(CAST(SUM(CAST(${microsSqlD(expr)} AS HUGEINT)) AS STRING) " +
      s"AS DOUBLE) / 1000000.0)"

  /** SQL fragment for the oracle side of davg. */
  def davgSql(expr: String): String = s"(${dsumSql(expr)} / COUNT(*))"

  /** [[dsum]] as SPARK SQL text — for the entries that are themselves
    * `spark.sql(...)` programs (grouping sets). Same micros chain;
    * Spark's decimal→double is BigDecimal.doubleValue (correctly
    * rounded), so no string hop is needed on this side. */
  def dsumSparkSql(expr: String): String =
    s"(CAST(SUM(CAST(${microsSqlD(expr)} AS DECIMAL(38,0))) AS DOUBLE) " +
      s"/ 1000000.0)"

  /** Round a double to 4 decimals — for expressions (stddev, corr,
    * cosine…) that cannot go through exact decimals. Both engines
    * round half away from zero.
    *
    * KNOWN HAZARD (r13, found by the sf1 full-suite oracle): when the
    * value lands exactly on a .00005 half-way boundary, Spark rounds
    * the double's SHORTEST DECIMAL repr (BigDecimal.valueOf) while
    * DuckDB rounds the binary value — one final digit apart. Rare
    * (needs the boundary to split the ulp), invisible at fixture
    * densities, bitten twice at sf1. Where the rounded value is an
    * AVERAGE of decimal-quantized terms, use [[r4AvgMicrosSql]]; for
    * a RATIO OF COUNTS use [[r4Ratio]]/[[r4RatioSql]]; for a ratio of
    * integer-micros sums use the wide pair
    * [[r4RatioWideSparkSql]]/[[r4RatioWideDuckSql]].
    *
    * r14 ELIMINATED the repr hazard for the whole class (the first
    * fuzz sweep caught it live on a quantile interpolation): r4 and
    * every oracle `round(x, 4)` now compute BINARY half-away-from-zero
    * — floor(|x|·10⁴ + 0.5)/10⁴, sign restored, −0.0 normalized — the
    * same IEEE ops in the same order on both engines, so identical
    * input doubles round identically at ANY value, boundaries
    * included. (Exact-rational sites — jaccard, containment, gini,
    * regr_avgx/avgy, window percentiles, LM averages — stay on the
    * strictly stronger exact integer half-up of the TRUE value.)
    *
    * Residual, disclosed: where an engine-INTERNAL aggregate (stddev,
    * corr, median, regr slope/r2) produces doubles that differ by an
    * ulp ACROSS engines due to summation order, no rounding scheme can
    * force agreement on a boundary-straddling pair; probability is
    * ~measure-zero and the r14 boundary fuzzer (scripts/fuzz_gen.py +
    * FUZZ sweeps in SCALE.md) probes exactly this residual each round.
    *
    * Inputs with |x| ≥ 9·10¹¹ (no 4-decimal resolution left in a
    * double) pass through unchanged — portable by construction since
    * both engines take that branch.
    */
  def r4(c: Column): Column = {
    val pos = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    val neg = -(floor(-c * lit(10000.0) + lit(0.5)) / lit(10000.0))
    when(not(abs(c) < lit(9.0e11)), c) // NaN/±inf/huge: identity
      .when(c < 0, neg)
      .otherwise(pos) + lit(0.0)
  }

  /** SQL twin of [[r4]] — one string, valid in BOTH Spark SQL and
    * DuckDB (floor/CASE/abs are IEEE-identical), so Spark expr
    * fragments and oracle SQL share it verbatim. */
  def r4Sql(e: String): String =
    s"(CASE WHEN NOT (abs($e) < 9.0e11) THEN ($e) " +
      s"WHEN ($e) < 0 THEN -(floor(-($e) * 10000 + 0.5) / 10000) " +
      s"ELSE floor(($e) * 10000 + 0.5) / 10000 END + 0)"

  /** Binary half-away-from-zero to an INTEGER (scale 0) — the
    * quantization round (int8 PQ, embedding grids). Same portability
    * argument as [[r4]]. */
  def r0(c: Column): Column =
    when(not(abs(c) < lit(9.0e15)), c)
      .when(c < 0, -(floor(-c + lit(0.5))))
      .otherwise(floor(c + lit(0.5))) + lit(0.0)

  /** SQL twin of [[r0]], valid in both engines. */
  def r0Sql(e: String): String =
    s"(CASE WHEN NOT (abs($e) < 9.0e15) THEN ($e) " +
      s"WHEN ($e) < 0 THEN -(floor(-($e) + 0.5)) " +
      s"ELSE floor(($e) + 0.5) END + 0)"

  /** Exact 4-decimal half-up rounding of a NONNEGATIVE integer ratio
    * a/b — the direct-rational sibling of [[r4AvgMicrosSql]]:
    * (2·10⁴·a + b) div 2b, then one IEEE division. */
  def r4RatioSql(a: String, b: String, div: String): String =
    s"CAST((20000 * ($a) + ($b)) $div (2 * ($b)) AS DOUBLE) " +
      s"/ CAST(10000 AS DOUBLE)"

  /** Column twin of [[r4RatioSql]] for NONNEGATIVE integer ratios a/b
    * (b > 0): num = 2·10⁴·a + b and den = 2b stay exact BIGINTs,
    * num − num%den is an exact multiple of den, and both final IEEE
    * divisions are exact (the quotient is a small integer), so the
    * result equals round-half-up(a/b, 4) with no double-repr
    * boundary trap (r14, VERDICT ask 7 — the class that bit
    * e_window_analytic at sf1). Requires 2·10⁴·a < 2⁶³: fine for any
    * count-derived numerator. */
  def r4Ratio(a: Column, b: Column): Column = {
    val num = a.cast(LongType) * lit(20000L) + b.cast(LongType)
    val den = b.cast(LongType) * lit(2L)
    ((num - num % den) / den).cast(DoubleType) / lit(10000.0)
  }

  /** WIDE-arithmetic r4 half-up of a NONNEGATIVE integer ratio for
    * sums whose 2·10⁴× product overflows BIGINT (price-scale micros
    * sums at sf ≥ 1): operands go through DECIMAL(38,0) on the Spark
    * side, HUGEINT on the DuckDB side — `div`/`//` both truncate, and
    * the quotient (≤ 2·10⁴ · ratio) fits a BIGINT exactly. */
  def r4RatioWideSparkSql(a: String, b: String): String =
    s"CAST((CAST($a AS DECIMAL(38,0)) * 20000 + CAST($b AS DECIMAL(38,0))) div " +
      s"(2 * CAST($b AS DECIMAL(38,0))) AS DOUBLE) / CAST(10000 AS DOUBLE)"

  /** DuckDB twin of [[r4RatioWideSparkSql]]. */
  def r4RatioWideDuckSql(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) * 20000 + CAST($b AS HUGEINT)) // " +
      s"(2 * CAST($b AS HUGEINT)) AS DOUBLE) / CAST(10000 AS DOUBLE)"

  /** Exact 4-decimal HALF-AWAY-FROM-ZERO rounding of an average
    * (Σ micros)/(n·10⁶), as SQL over BIGINT columns `sm` (the
    * decimal-quantized sum scaled to micros, possibly negative) and
    * `n` (the count) — half-up of |a|/b is (2·10⁴·|a| + b) div (2b),
    * all intermediates exact integers on both engines, then ONE
    * correctly-rounded IEEE division by 10⁴. `div` is the engine's
    * integer-division token: "div" (Spark), "//" (DuckDB). */
  def r4AvgMicrosSql(div: String): String =
    s"CAST(CASE WHEN sm < 0 THEN -((-sm * 20000 + n * 1000000) $div " +
      s"(2 * n * 1000000)) ELSE (sm * 20000 + n * 1000000) $div " +
      s"(2 * n * 1000000) END AS DOUBLE) / CAST(10000 AS DOUBLE)"
}
