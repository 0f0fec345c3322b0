package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md /
  * FIXTURES.md). One method per table; `sfDir` is the scale-factor
  * directory passed by the harness.
  *
  * Scale notes (100 TB design): each loader returns the raw scan so
  * Catalyst can push filters/projection into the parquet reader. On a
  * real cluster these would be partitioned tables (orders/lineitem by
  * date, events by ts-day); the query code never assumes single-file
  * inputs.
  */
object Tables {
  def region(s: SparkSession, d: String): DataFrame    = s.read.parquet(s"$d/region.parquet")
  def nation(s: SparkSession, d: String): DataFrame    = s.read.parquet(s"$d/nation.parquet")
  def customer(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/customer.parquet")
  def supplier(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/supplier.parquet")
  def part(s: SparkSession, d: String): DataFrame      = s.read.parquet(s"$d/part.parquet")
  def orders(s: SparkSession, d: String): DataFrame    = s.read.parquet(s"$d/orders.parquet")
  def lineitem(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/lineitem.parquet")
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/embeddings.parquet")

  /** events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark 4 rejects
    * at schema inference (PARQUET_TYPE_ILLEGAL) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`. We set that conf
    * (runtime-settable), read ts as raw nanos, and truncate to
    * microseconds — exactly what DuckDB does when it reads the same
    * file — then shed the timezone (session TZ is UTC) so the column is
    * TIMESTAMP_NTZ like every other fixture timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      // integer division: double division rounds-to-nearest and is off
      // by 1µs for ~half the nanos values
      .withColumn("ts", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
  }

  /** events with the raw nanosecond long preserved as `ts_ns`. */
  def eventsWithNanos(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
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

  /** Deterministic sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(20, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, in double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL fragment for the oracle side of dsum. */
  def dsumSql(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(20,6))) AS DOUBLE)"

  /** SQL fragment for the oracle side of davg. */
  def davgSql(expr: String): String = s"(${dsumSql(expr)} / COUNT(*))"

  /** Round a double to 4 decimals — for expressions (stddev, corr,
    * cosine…) that cannot go through exact decimals. Both engines
    * round half away from zero.
    */
  def r4(c: Column): Column = round(c, 4)
}
