package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types._
import graft.sources.{JdbcCursorStore, JdbcExec}
import graft.sources.v2.{MutableSoqlEndpoint, SoqlEndpoint, SoqlEndpoints}

/** §3.1's full sync lifecycle EXECUTED through BOTH real endpoints in
  * one test (r14, VERDICT ask 6): the DSv2 `graft-soql` source (fake
  * transport, real describe/pushdown/page-parallel scan) feeding the
  * executed Derby MERGE sink via [[Pipeline.syncOnceV2]] —
  * describe → SOQL pushdown read → type normalize → staged MERGE →
  * cursor advance → incremental second pass → soft-delete propagation
  * → idempotent replay, asserted on final Derby state and cursor
  * across sync rounds. Before this spec the two endpoints had each
  * run for real but never as ONE composed lifecycle.
  */
class V2LifecycleSpec extends SparkSpec {

  private val url =
    s"jdbc:derby:memory:graftv2sync${System.nanoTime};create=true"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", DoubleType),
    StructField("cur", LongType),
    StructField("is_deleted", BooleanType)))

  private def row(id: Long, name: String, amount: Double, cur: Long,
                  deleted: Boolean = false): Seq[Any] =
    Seq(id, name, amount, cur, deleted)

  private def readTarget() =
    JdbcExec.readTable(spark, url, "account_api_tgt")
      .orderBy("id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.math.BigDecimal]("amount"))
          .map(_.toPlainString).orNull,
        r.getLong(3), r.getBoolean(4)))

  private def cursorOf(): Option[Long] =
    new JdbcCursorStore(url, "v2_sync_state").get("account_api")

  private def sync(): Long =
    Pipeline.syncOnceV2(spark, url, "account_api", Seq("id"),
      cursorField = "cur", deletedField = "is_deleted",
      targetTypes = Map("amount" -> DecimalType(12, 2)),
      stateTable = "v2_sync_state", batchSize = 3)

  test("describe→pushdown→normalize→MERGE→cursor across two sync " +
    "rounds, with soft-delete propagation and idempotent replay") {
    val ep = new RecordingEndpoint(schema, Seq(
      row(1, "alpha", 10.125, 100),
      row(2, "beta", 20.5, 110),
      row(2, "beta-v2", 21.5, 120),       // in-window update: latest wins
      row(3, "gamma", 30.0, 130),
      row(4, "delta", 40.0, 140, deleted = true), // born-dead: DELETE route
      row(5, "eps", 50.0, 150)))
    SoqlEndpoints.register("account_api", ep)
    V2LifecycleSpec.seenFilters.clear()

    // ---- round 1: full window ----
    val c1 = sync()
    assert(c1 == 150L && cursorOf().contains(150L))
    // target created FROM describe() (DDL leg), amount normalized to
    // DECIMAL(12,2) (HALF_UP: 10.125 → 10.13), latest-wins applied,
    // the born-dead pk never lands
    assert(readTarget() == Seq(
      (1L, "alpha", "10.13", 100L, false),
      (2L, "beta-v2", "21.50", 120L, false),
      (3L, "gamma", "30.00", 130L, false),
      (5L, "eps", "50.00", 150L, false)))
    // the cursor predicate was PUSHED into the endpoint's SOQL — the
    // executor-side scan saw GreaterThan(cur, MinValue), so pre-cursor
    // rows never leave the remote API
    assert(V2LifecycleSpec.recorded.exists(_.exists {
      case GreaterThan("cur", v: Long) => v == Long.MinValue
      case _ => false
    }), s"round-1 filters: ${V2LifecycleSpec.recorded}")

    // ---- source mutates: update, insert, tombstone an existing pk ----
    ep.append(Seq(
      row(3, "gamma-v2", 33.0, 160),           // update
      row(6, "zeta", 60.0, 170),               // insert
      row(5, "eps", 50.0, 180, deleted = true) // soft-delete propagates
    ))
    V2LifecycleSpec.seenFilters.clear()

    // ---- round 2: incremental ----
    val c2 = sync()
    assert(c2 == 180L && cursorOf().contains(180L))
    val afterRound2 = Seq(
      (1L, "alpha", "10.13", 100L, false),
      (2L, "beta-v2", "21.50", 120L, false),
      (3L, "gamma-v2", "33.00", 160L, false),
      (6L, "zeta", "60.00", 170L, false))
    assert(readTarget() == afterRound2)
    // only rows PAST the stored cursor were requested from the API
    assert(V2LifecycleSpec.recorded.nonEmpty)
    assert(V2LifecycleSpec.recorded.forall(_.exists {
      case GreaterThan("cur", v: Long) => v == 150L
      case _ => false
    }), s"round-2 filters: ${V2LifecycleSpec.recorded}")

    // ---- round 3: nothing new → cursor holds, state untouched ----
    assert(sync() == 180L)
    assert(readTarget() == afterRound2)

    // ---- crash-replay: cursor reset to pre-round-2, re-run converges
    // (keyed MERGE/DELETE idempotence — the exactly-once ladder) ----
    JdbcExec.withConnection(url) { conn =>
      conn.setAutoCommit(false)
      new JdbcCursorStore(url, "v2_sync_state")
        .putInTxn(conn, "account_api", 150L)
      conn.commit()
    }
    assert(sync() == 180L)
    assert(readTarget() == afterRound2)
  }
}

object V2LifecycleSpec {
  // static: endpoint copies run executor-side (serialized into the
  // reader factory) — the JdbcSinkSpec.captured convention
  val seenFilters = new ConcurrentLinkedQueue[Seq[Filter]]()
  def recorded: Seq[Seq[Filter]] = {
    import scala.jdk.CollectionConverters._
    seenFilters.asScala.toSeq
  }
}

/** MutableSoqlEndpoint that records every query's pushed filters into
  * the static queue — the proof the cursor predicate reached the
  * (fake) remote API instead of being evaluated Spark-side. */
class RecordingEndpoint(schema: StructType, initial: Seq[Seq[Any]])
    extends SoqlEndpoint {
  private val inner = new MutableSoqlEndpoint(schema, initial, pages = 2)
  def append(rows: Seq[Seq[Any]]): Unit = inner.append(rows)
  override def describe(): StructType = inner.describe()
  override def pageCount: Int = inner.pageCount
  override def maxCursor(field: String): Option[Long] = inner.maxCursor(field)
  override def query(cols: Seq[String], filters: Seq[Filter],
                     page: Int): Iterator[Seq[Any]] = {
    V2LifecycleSpec.seenFilters.add(filters)
    inner.query(cols, filters, page)
  }
}
