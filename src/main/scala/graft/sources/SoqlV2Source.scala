package graft.sources.v2

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 shell for the reference's extract side (SURVEY §1.1 /
  * §3.1): the describe → SOQL-with-pushdown shape as a first-class
  * Spark source. `spark.read.format("graft-soql").option("object", x)`
  * resolves an endpoint, `inferSchema` is the describe() call, and the
  * scan builder folds Catalyst's pushed filters and required columns
  * into the SOQL the endpoint executes — so
  * `df.filter(cursor > x).select(a, b)` reaches the remote API as
  * `SELECT a, b FROM obj WHERE cursor > x`, exactly the incremental
  * pull IncrementalSource implements relationally.
  *
  * Offline the endpoint is an in-memory fake fed from parquet
  * (Dsv2SourceSpec); the live deployment implements [[SoqlEndpoint]]
  * over the REST API. Scale notes: pagination IS the parallelism —
  * `planInputPartitions` yields one partition per page range, each
  * reader pulls its own page (the Bulk-API pattern), so extraction
  * saturates executors without a driver bottleneck.
  */
trait SoqlEndpoint extends Serializable {
  /** describe(): the object's schema, field names + types. */
  def describe(): StructType
  /** Number of parallel page partitions for a full pull. */
  def pageCount: Int
  /** Execute the (column-pruned, filter-pushed) query for one page.
    * `filters` are the pushed predicates this endpoint accepted via
    * [[accepts]]; rows come back column-ordered per `cols`. */
  def query(cols: Seq[String], filters: Seq[Filter], page: Int): Iterator[Seq[Any]]
  /** Which pushed predicates this endpoint can evaluate remotely
    * (translate into the SOQL WHERE clause). */
  def accepts(f: Filter): Boolean = SoqlFilters.translatable(f)
}

/** SOQL translation for the pushable predicate subset. */
object SoqlFilters {
  def translatable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull => true
    case And(l, r) => translatable(l) && translatable(r)
    case _ => false
  }

  private def lit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "\\'") + "'"
    case other => String.valueOf(other)
  }

  /** The WHERE-clause rendering of one pushed filter. */
  def toSoql(f: Filter): String = f match {
    case EqualTo(a, v) => s"$a = ${lit(v)}"
    case GreaterThan(a, v) => s"$a > ${lit(v)}"
    case GreaterThanOrEqual(a, v) => s"$a >= ${lit(v)}"
    case LessThan(a, v) => s"$a < ${lit(v)}"
    case LessThanOrEqual(a, v) => s"$a <= ${lit(v)}"
    case IsNotNull(a) => s"$a != null"
    case IsNull(a) => s"$a = null"
    case And(l, r) => s"(${toSoql(l)} AND ${toSoql(r)})"
    case other => throw new IllegalArgumentException(s"untranslatable $other")
  }

  def soqlFor(obj: String, cols: Seq[String], filters: Seq[Filter]): String = {
    val where =
      if (filters.isEmpty) "" else " WHERE " + filters.map(toSoql).mkString(" AND ")
    s"SELECT ${cols.mkString(", ")} FROM $obj$where"
  }
}

/** Endpoint registry — the offline-test seam. Options carry strings
  * only, so the provider resolves the endpoint by name; a live
  * deployment registers a REST-backed endpoint under its object name
  * at session setup. Endpoints must be constructible executor-side
  * (they are Serializable and ship inside the reader factory). */
object SoqlEndpoints {
  private val reg = new ConcurrentHashMap[String, SoqlEndpoint]()
  def register(name: String, ep: SoqlEndpoint): Unit = reg.put(name, ep)
  def apply(name: String): SoqlEndpoint = {
    val ep = reg.get(name)
    require(ep != null, s"no SoqlEndpoint registered under '$name'")
    ep
  }
}

/** In-memory endpoint fake: rows loaded from parquet by the test,
  * filters evaluated locally — the contract double for the REST API. */
final case class InMemoryEndpoint(schema: StructType, rows: Seq[Seq[Any]],
                                  override val pageCount: Int = 4)
    extends SoqlEndpoint {
  override def describe(): StructType = schema

  private def idx(name: String): Int = schema.fieldIndex(name)

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (null, _) | (_, null) => throw new IllegalArgumentException("null cmp")
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue)
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue)
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue)
    case (x: String, y: String) => x.compareTo(y)
    case other => throw new IllegalArgumentException(s"uncomparable $other")
  }

  private def eval(f: Filter, row: Seq[Any]): Boolean = f match {
    case EqualTo(a, v) => row(idx(a)) != null && cmp(row(idx(a)), v) == 0
    case GreaterThan(a, v) => row(idx(a)) != null && cmp(row(idx(a)), v) > 0
    case GreaterThanOrEqual(a, v) => row(idx(a)) != null && cmp(row(idx(a)), v) >= 0
    case LessThan(a, v) => row(idx(a)) != null && cmp(row(idx(a)), v) < 0
    case LessThanOrEqual(a, v) => row(idx(a)) != null && cmp(row(idx(a)), v) <= 0
    case IsNotNull(a) => row(idx(a)) != null
    case IsNull(a) => row(idx(a)) == null
    case And(l, r) => eval(l, row) && eval(r, row)
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }

  override def query(cols: Seq[String], filters: Seq[Filter],
                     page: Int): Iterator[Seq[Any]] = {
    val colIdx = cols.map(idx)
    rows.iterator.zipWithIndex
      .filter { case (_, i) => i % pageCount == page }
      .map(_._1)
      .filter(r => filters.forall(eval(_, r)))
      .map(r => colIdx.map(r))
  }
}

/** `spark.read.format("graft-soql")` — registered via
  * META-INF/services so the short name resolves; the fully-qualified
  * class name works too. */
class SoqlTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-soql"

  private def objName(options: CaseInsensitiveStringMap): String = {
    val n = options.get("object")
    require(n != null, "graft-soql requires .option(\"object\", <name>)")
    n
  }

  // describe() IS schema inference — the reference's field-map call
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SoqlEndpoints(objName(options)).describe()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    SoqlTable(properties.get("object"), schema)

  override def supportsExternalMetadata(): Boolean = false
}

final case class SoqlTable(obj: String, override val schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"soql:$obj"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SoqlScanBuilder(obj, schema)
}

/** Folds Catalyst pushdown into the SOQL: accepted filters join the
  * WHERE clause (and are NOT re-evaluated by Spark); pruned columns
  * become the SELECT list. */
final class SoqlScanBuilder(obj: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val ep = SoqlEndpoints(obj)
    val (accepted, rejected) = filters.partition(ep.accepts)
    pushed = accepted
    rejected // Spark keeps evaluating what the endpoint can't
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve describe() field order (SOQL SELECT lists are ordered)
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = SoqlScan(obj, required, pushed)
}

final case class SoqlScan(obj: String, required: StructType,
                          pushed: Array[Filter]) extends Scan with Batch {
  val soql: String =
    SoqlFilters.soqlFor(obj, required.fieldNames.toSeq, pushed.toSeq)

  override def readSchema(): StructType = required

  // EXPLAIN shows the exact remote query — PlanSpec pins the pushed
  // cursor predicate through this
  override def description(): String = s"SoqlScan soql=[$soql]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(SoqlEndpoints(obj).pageCount)(SoqlPagePartition(_))

  override def createReaderFactory(): PartitionReaderFactory =
    SoqlReaderFactory(obj, required, pushed.toSeq)
}

final case class SoqlPagePartition(page: Int) extends InputPartition

final case class SoqlReaderFactory(obj: String, required: StructType,
                                   filters: Seq[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val page = p.asInstanceOf[SoqlPagePartition].page
    new PartitionReader[InternalRow] {
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(required)
      private val it = SoqlEndpoints(obj)
        .query(required.fieldNames.toSeq, filters, page)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          current = toCatalyst(org.apache.spark.sql.Row.fromSeq(it.next()))
            .asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
