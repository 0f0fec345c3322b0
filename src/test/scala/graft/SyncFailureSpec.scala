package graft

import org.apache.spark.sql.types._
import graft.sources.{JdbcCursorStore, JdbcExec}

/** Failure injection on the sync lifecycle (r16, VERDICT r15 ask 5):
  * the exactly-once ladder JdbcExec's scaladoc claims — partition
  * writes atomic, every write keyed-idempotent, cursor advance LAST —
  * is only proven if the failure branches actually execute. Three
  * branches, each asserting the two convergence invariants:
  *
  *   1. the cursor NEVER advances past a failed batch, and
  *   2. a replay (same pull, fault gone) converges to the state a
  *      clean one-shot sync would have produced.
  *
  * Branch 1–2 crash mid-sequence at exact statements via
  * [[RecordingJdbc]]'s one-shot injection (upsert batch / cursor
  * advance); branch 3 is a REAL constraint violation raised by
  * embedded Derby's MERGE, with the corrected re-pull compared
  * against a clean one-shot sync on a fresh database. Under local[*]
  * a task failure is fatal (no retry), so the injected executor-side
  * SQLException surfaces as the job failure a driver crash-replay
  * loop would observe.
  */
class SyncFailureSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("cur", LongType),
    StructField("is_deleted", BooleanType)))

  test("crash INSIDE the upsert batch: the load transaction rolls " +
    "back, no commit, the cursor never advances; replay converges " +
    "through the same keyed statements") {
    RecordingJdbc.register()
    val url = s"jdbc:postgresql://fake/fi${System.nanoTime}"
    val db = RecordingJdbc.db(url)
    import spark.implicits._
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "fi_tgt", schema, Seq("id"),
        JdbcExec.dialectFor(url))
    }
    val batch = Seq(
      (1L, "a", 100L, false),
      (2L, "b", 110L, false),
      (3L, "c", 120L, true)) // tombstone: DELETE route
      .toDF("id", "name", "cur", "is_deleted").coalesce(1)
    def sync(): Long = JdbcExec.syncOnce(spark, url, "fi_tgt", Seq("id"),
      "fi_state", "fi", _ => batch, "cur", "is_deleted", batchSize = 10)

    // ---- arm: the first upsert executeBatch throws ----
    db.failOnce = Some("INSERT INTO \"fi_tgt\"")
    intercept[Exception](sync())
    val ev1 = db.seq
    val iFail = ev1.indexWhere(_.contains("FAIL-INJECTED"))
    assert(iFail >= 0, s"injection never fired: $ev1")
    // the failing connection rolled back and NEVER committed
    val failConn = ev1(iFail).split(" ")(0)
    val onConn = ev1.filter(_.startsWith(s"$failConn "))
    assert(onConn.exists(_.endsWith("rollback")), onConn)
    assert(!onConn.exists(_.endsWith("commit")),
      s"failed load transaction committed: $onConn")
    // invariant 1: the cursor never advanced past the failed batch —
    // no state-table write anywhere, store still empty
    assert(!ev1.exists(_.contains("\"fi_state\"") )
      || !ev1.exists(e => e.contains("executeUpdate[INSERT INTO \"fi_state\"")
           || e.contains("executeUpdate[UPDATE \"fi_state\"")),
      s"cursor touched after a failed load:\n${ev1.mkString("\n")}")
    assert(!db.cursors.containsKey("fi"))

    // ---- replay, fault gone: the SAME pull re-runs (cursor held),
    // the full sequence lands, the cursor advances exactly once ----
    val before = db.seq.size
    assert(sync() == 120L)
    assert(db.cursors.get("fi") == 120L)
    val replay = db.seq.drop(before)
    assert(replay.exists(_.contains("executeBatch: INSERT INTO \"fi_tgt\"")))
    assert(replay.exists(_.contains("executeBatch: DELETE FROM \"fi_tgt\"")))
    // latest-wins parameters identical to what the failed attempt was
    // about to write — replay is the same idempotent statement set
    val binds = replay.filter(_.contains("bind[INSERT INTO \"fi_tgt\""))
    assert(binds.exists(_.endsWith("(1,a,100,false)")) &&
      binds.exists(_.endsWith("(2,b,110,false)")), binds)
    assert(replay.count(_.contains("executeUpdate[INSERT INTO \"fi_state\"")) == 1,
      replay.filter(_.contains("fi_state")))
  }

  test("crash ON the cursor advance: the loads stay committed, the " +
    "cursor transaction rolls back; replay re-applies the idempotent " +
    "loads and lands the cursor") {
    RecordingJdbc.register()
    val url = s"jdbc:postgresql://fake/fi2${System.nanoTime}"
    val db = RecordingJdbc.db(url)
    import spark.implicits._
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "fi2_tgt", schema, Seq("id"),
        JdbcExec.dialectFor(url))
    }
    val batch = Seq((1L, "a", 100L, false), (2L, "b", 110L, false))
      .toDF("id", "name", "cur", "is_deleted").coalesce(1)
    def sync(): Long = JdbcExec.syncOnce(spark, url, "fi2_tgt", Seq("id"),
      "fi2_state", "fi2", _ => batch, "cur", "is_deleted", batchSize = 10)

    // first sync on an empty state table: putInTxn's UPDATE matches 0
    // rows, then the INSERT fires — arm the crash on that INSERT, i.e.
    // AFTER both distributed loads committed
    db.failOnce = Some("INSERT INTO \"fi2_state\"")
    intercept[Exception](sync())
    val ev1 = db.seq
    val iFail = ev1.indexWhere(_.contains("FAIL-INJECTED"))
    assert(iFail >= 0, s"injection never fired: $ev1")
    // the upsert batch committed BEFORE the cursor crash (cursor-last)
    val iUp = ev1.indexWhere(_.contains("executeBatch: INSERT INTO \"fi2_tgt\""))
    assert(iUp >= 0 && iUp < iFail, ev1)
    val upConn = ev1(iUp).split(" ")(0)
    assert(ev1.zipWithIndex.exists { case (e, i) =>
      i > iUp && i < iFail && e == s"$upConn commit" },
      s"load not committed before the cursor crash:\n${ev1.mkString("\n")}")
    // the cursor's own transaction rolled back; the store never moved
    val curConn = ev1(iFail).split(" ")(0)
    val curEvents = ev1.filter(_.startsWith(s"$curConn "))
    assert(curEvents.exists(_.endsWith("rollback")) &&
      !curEvents.exists(_.endsWith("commit")), curEvents)
    assert(!db.cursors.containsKey("fi2"))

    // replay: the held cursor re-pulls the same window; the keyed
    // upsert re-applies (idempotent — same latest-wins binds), and the
    // cursor commits this time
    val before = db.seq.size
    assert(sync() == 110L)
    assert(db.cursors.get("fi2") == 110L)
    val replay = db.seq.drop(before)
    val binds = replay.filter(_.contains("bind[INSERT INTO \"fi2_tgt\""))
    assert(binds.exists(_.endsWith("(1,a,100,false)")) &&
      binds.exists(_.endsWith("(2,b,110,false)")),
      s"replay did not re-apply the committed-but-uncursored loads: $binds")
  }

  test("REAL constraint violation (Derby CHECK rejects the MERGE): " +
    "the violating partition rolls back, the cursor holds; the " +
    "corrected re-pull converges to the clean one-shot state") {
    val dSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType),
      StructField("cur", LongType),
      StructField("is_deleted", BooleanType)))
    val url = s"jdbc:derby:memory:fisync${System.nanoTime};create=true"
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "fc_tgt", dSchema, Seq("id"),
        JdbcExec.dialectFor(url))
      val st = conn.createStatement()
      try st.execute("""ALTER TABLE "fc_tgt" ADD CONSTRAINT amount_pos
                       | CHECK ("amount" >= 0)""".stripMargin.replace("\n", ""))
      finally st.close()
    }
    import spark.implicits._
    // row 2 violates the target's CHECK — the real mid-sequence
    // failure a warehouse raises, not an injected one
    var rows = Seq(
      (1L, 10.0, 100L, false),
      (2L, -5.0, 110L, false))
    def sync(): Long = JdbcExec.syncOnce(spark, url, "fc_tgt", Seq("id"),
      "fc_state", "fc",
      _ => rows.toDF("id", "amount", "cur", "is_deleted").coalesce(1),
      "cur", "is_deleted", batchSize = 10)

    intercept[Exception](sync())
    // invariant 1: the cursor never advanced past the failed batch
    assert(new JdbcCursorStore(url, "fc_state").get("fc").isEmpty)
    // partition atomicity: the violating key's whole partition rolled
    // back — nothing with a negative amount ever became visible, and
    // key 2 is absent (the ladder promises partition atomicity +
    // convergence, NOT global atomicity across partitions)
    val mid = JdbcExec.readTable(spark, url, "fc_tgt").collect()
    assert(!mid.exists(_.getDouble(1) < 0), mid.toSeq)
    assert(!mid.exists(_.getLong(0) == 2L), mid.toSeq)

    // the source corrects the bad row under a HIGHER cursor version —
    // the replay re-pulls EVERYTHING (cursor held) and latest-wins
    // picks the fix
    rows = rows :+ ((2L, 5.0, 120L, false))
    assert(sync() == 120L)
    assert(new JdbcCursorStore(url, "fc_state").get("fc").contains(120L))
    def state(u: String, t: String): Seq[(Long, Double, Long)] =
      JdbcExec.readTable(spark, u, t).collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1)
    val replayed = state(url, "fc_tgt")
    // invariant 2: convergence — identical to a clean one-shot sync of
    // the final source on a fresh database (no constraint there; the
    // oracle is the happy path)
    val url2 = s"jdbc:derby:memory:fisyncO${System.nanoTime};create=true"
    JdbcExec.withConnection(url2) { conn =>
      JdbcExec.ensureTable(conn, "fc_tgt", dSchema, Seq("id"),
        JdbcExec.dialectFor(url2))
    }
    assert(JdbcExec.syncOnce(spark, url2, "fc_tgt", Seq("id"),
      "fc_state", "fc",
      _ => rows.toDF("id", "amount", "cur", "is_deleted").coalesce(1),
      "cur", "is_deleted", batchSize = 10) == 120L)
    assert(replayed == state(url2, "fc_tgt") &&
      replayed == Seq((1L, 10.0, 100L), (2L, 5.0, 120L)))
  }
}
