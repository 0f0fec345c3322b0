package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent ANSI SQL for
  * every oracle-checkable entry (column names and row order match the
  * Spark side exactly — the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("d_agg_groupby_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Filters.queries ++ Joins.queries ++
      Aggregations.queries ++ Windows.queries ++ ScalarFuncs.queries ++
      EtlOps.queries ++ LlmOps.queries ++ TextOps.queries ++
      AnnOps.queries ++ ScaleOps.queries ++ StreamingOps.queries ++
      UdfOps.queries ++ CorpusPipeline.queries ++ GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracles ++ Filters.oracles ++ Joins.oracles ++
      Aggregations.oracles ++ Windows.oracles ++ ScalarFuncs.oracles ++
      EtlOps.oracles ++ LlmOps.oracles ++ TextOps.oracles ++
      AnnOps.oracles ++ ScaleOps.oracles ++ StreamingOps.oracles ++
      UdfOps.oracles ++ CorpusPipeline.oracles ++ GraphOps.oracles
}
