package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY §3.2 entry point 2): register the fixture
  * tables as temp views and run a SQL string through Catalyst — the
  * "switch surface" for a user whose queries are SQL text rather than
  * DataFrame programs.
  *
  * Queries written in the portable ANSI subset (explicit casts, decimal
  * sums, TIMESTAMP literals, no engine-specific functions) run
  * verbatim on both this engine and DuckDB — `a_sql_entrypoint` proves
  * it by using ONE string as both the Spark query and its oracle.
  */
object Sql {

  /** All fixture loaders, with events already nanosecond-normalized. */
  def tables(s: SparkSession, d: String): Map[String, DataFrame] = Map(
    "region" -> Tables.region(s, d),
    "nation" -> Tables.nation(s, d),
    "customer" -> Tables.customer(s, d),
    "supplier" -> Tables.supplier(s, d),
    "part" -> Tables.part(s, d),
    "orders" -> Tables.orders(s, d),
    "lineitem" -> Tables.lineitem(s, d),
    "documents" -> Tables.documents(s, d),
    "embeddings" -> Tables.embeddings(s, d),
    "events" -> Tables.events(s, d))

  /** Register every fixture table as a temp view named like the table. */
  def registerViews(s: SparkSession, d: String): Unit =
    tables(s, d).foreach { case (name, df) => df.createOrReplaceTempView(name) }

  // last directory registered per session — repeated run() calls over
  // the same fixture dir (Bench passes, Verify) skip the 10 view
  // re-registrations
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Run a SQL string against the registered fixture views. */
  def run(s: SparkSession, d: String, sql: String): DataFrame = {
    if (registered.get(s) != d) {
      registerViews(s, d)
      registered.put(s, d)
    }
    s.sql(sql)
  }
}
