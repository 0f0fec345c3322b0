package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.A — scans / sources. The extract side of the reference ETL
  * (Salesforce SOQL: projection + filter + cursor pushed to the API) is
  * re-expressed as parquet scans where Catalyst pushes projection and
  * predicates into the vectorized reader.
  *
  * Scale notes (100 TB): these scans read only the requested columns
  * (ReadSchema) and push predicates to row-group stats (PushedFilters),
  * so cost is proportional to selected bytes, not table size. On a real
  * cluster the fixture files become date-partitioned tables and the same
  * filters additionally prune partitions.
  */
object Scans {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full scan, all columns, total order.
    "a_scan_full" -> { (s, d) =>
      Tables.region(s, d).orderBy("r_regionkey")
    },

    // Column pruning + predicate pushdown: 3 of 16 columns survive to
    // the reader; l_quantity > 45 reaches PushedFilters.
    "a_scan_prune_pushdown" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_quantity") > 45)
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures —
        // order over ALL output columns for a hash-stable total order
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    },

    // Explicit user schema (the describe()-driven read of the reference,
    // SURVEY §1.1): events read with a hand-built StructType — ts stays
    // the raw nanosecond long and is projected to epoch micros.
    // (no session-conf mutation here: the explicit LongType schema read
    // handles parquet TIMESTAMP(NANOS) without the legacy flag, exactly
    // as Tables.events does everywhere)
    "a_scan_schema_enforce" -> { (s, d) =>
      val st = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType),          // raw nanos
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      s.read.schema(st).parquet(s"$d/events.parquet")
        .select(
          col("event_id"),
          expr("ts div 1000").as("ts_us"),
          col("user_id"),
          col("event_type"),
          col("value"))
        .orderBy("event_id")
    },

    // SQL-text entry point: ONE portable ANSI string (Q3 shape) runs
    // verbatim through Catalyst here AND as the DuckDB oracle — the
    // switch surface for SQL-text users (graft.Sql).
    "a_sql_entrypoint" -> { (s, d) =>
      graft.Sql.run(s, d, Scans.portableQ3)
    },

    // CSV round-trip (the Bulk-API CSV batch shape of the reference's
    // extract side): write the table as CSV, read it back with the
    // declared schema, prove losslessness against the parquet oracle.
    // Doubles survive because Spark writes the shortest decimal repr,
    // which parses back to the identical bits.
    "a_source_csv_roundtrip" -> { (s, d) =>
      val out = s"/tmp/graft_csv_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      Tables.customer(s, d).write.mode("overwrite")
        .option("header", "true").csv(out)
      s.read.schema(Tables.schemas("customer"))
        .option("header", "true").csv(out)
        .orderBy("c_custkey")
    },

    // JSON ingest (stand-in for the REST-JSON record batches the
    // reference pulls from Salesforce): parse E.props.
    "a_source_jsonl" -> { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy("event_id")
    }
  )

  /** TPC-H Q3 shape in the portable ANSI subset: decimal-cast sum for
    * cross-engine determinism, TIMESTAMP literals, total-order tail.
    * Runs unmodified on Spark SQL and DuckDB. */
  val portableQ3: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
      |  o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "a_sql_entrypoint" -> portableQ3,
    "a_scan_full" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "a_scan_prune_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin,
    "a_scan_schema_enforce" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a_source_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "a_source_jsonl" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
