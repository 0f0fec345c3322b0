package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{IncrementalSource, JdbcUpsertSink}

/** §2.A `a_sink_jdbc` (design-level): DDL/MERGE SQL generation and the
  * partition-level write protocol, with the JDBC round-trip stubbed.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("amount", DecimalType(18, 2)),
    StructField("modstamp", TimestampType),
    StructField("is_deleted", BooleanType),
    StructField("tags", ArrayType(StringType)),
    StructField("payload", MapType(StringType, StringType))))

  test("createTableSql maps the Salesforce→PG type table") {
    val ddl = JdbcUpsertSink.createTableSql("account", schema, pk = Seq("id"))
    assert(ddl ==
      """CREATE TABLE IF NOT EXISTS "account" ("id" text NOT NULL, """ +
      """"amount" numeric(18,2), "modstamp" timestamptz, """ +
      """"is_deleted" boolean, "tags" text[], "payload" jsonb, """ +
      """PRIMARY KEY ("id"))""")
  }

  test("addColumnsSql handles schema drift") {
    val stmts = JdbcUpsertSink.addColumnsSql("account",
      Seq(StructField("new_field__c", DoubleType)))
    assert(stmts == Seq(
      """ALTER TABLE "account" ADD COLUMN IF NOT EXISTS "new_field__c" double precision"""))
  }

  test("upsertSql emits INSERT ... ON CONFLICT DO UPDATE") {
    val sql = JdbcUpsertSink.upsertSql("account",
      StructType(schema.take(3)), pk = Seq("id"))
    assert(sql ==
      """INSERT INTO "account" ("id", "amount", "modstamp") VALUES (?, ?, ?) """ +
      """ON CONFLICT ("id") DO UPDATE SET "amount" = EXCLUDED."amount", """ +
      """"modstamp" = EXCLUDED."modstamp"""")
  }

  test("writeUpsert streams every row through executor-side batches") {
    val df = (1 to 107).map(i => (i.toLong, s"name$i")).toDF("id", "name")
      .repartition(4)
    JdbcSinkSpec.captured.clear()
    JdbcUpsertSink.writeUpsert(df, "t", Seq("id"), batchSize = 25) {
      (sql, batch) =>
        assert(sql.startsWith("INSERT INTO \"t\""))
        assert(batch.nonEmpty && batch.size <= 25)
        batch.foreach(r => JdbcSinkSpec.captured.add(r.head.asInstanceOf[Long]))
    }
    val seen = JdbcSinkSpec.captured.toArray(Array.empty[java.lang.Long])
    assert(seen.length == 107)
    assert(seen.map(_.toLong).sorted.toSeq == (1L to 107L))
  }

  test("IncrementalSource pulls strictly past the cursor and advances it") {
    val src = IncrementalSource(
      read = s => Tables.eventsWithNanos(s, sfDir)
        .withColumn("ts_us", expr("ts_ns div 1000")),
      cursorField = "ts_us")
    val all = src.read(spark)
    val mid = all.select(expr("percentile(ts_us, 0.5)")).head().getDouble(0).toLong
    val pulled = src.pull(spark, mid, Seq("event_id", "ts_us"))
    assert(pulled.filter(col("ts_us") <= mid).count() == 0)
    assert(pulled.count() > 0)
    val next = src.nextCursor(pulled)
    assert(next.contains(all.agg(max("ts_us")).head().getLong(0)))
    // empty pull → no cursor advance
    assert(src.nextCursor(src.pull(spark, Long.MaxValue, Seq("event_id", "ts_us"))).isEmpty)
  }
}

object JdbcSinkSpec {
  // static: foreachPartition closures run on executor threads (same JVM
  // in local mode) — a driver-captured field would not round-trip
  val captured = new ConcurrentLinkedQueue[java.lang.Long]()
}

/** §2.A `a_sink_jdbc`, EXECUTED (r13, VERDICT item 1): the full
  * create→load→upsert→delete→re-run cycle against embedded Derby
  * (`jdbc:derby:memory:`), asserted row-for-row — the staged
  * session-temp-table MERGE protocol, schema-drift ALTERs, and the
  * cursor advance sharing a load transaction all run for real. The
  * PostgreSQL SQL generation above stays as the production-dialect
  * unit surface; this suite is the proof the protocol itself works.
  */
class DerbySinkSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.{DerbySql, JdbcCursorStore, JdbcExec}
  import java.sql.Timestamp

  // one in-memory database per suite run; Derby keeps it alive for the
  // JVM's lifetime once created
  private val url = s"jdbc:derby:memory:graftsink${System.nanoTime};create=true"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("modstamp", TimestampType),
    StructField("active", BooleanType),
    StructField("score", DoubleType)))

  private def mkRows(ids: Range, tag: String, ver: Int) = ids.map { i =>
    (i.toLong, s"$tag$i", BigDecimal(i).setScale(2) + BigDecimal("0.25"),
      Timestamp.valueOf(f"2026-01-01 00:0$ver:00"), i % 2 == 0,
      i * 1.5 + ver)
  }.toDF("id", "name", "amount", "modstamp", "active", "score")
    // tuple encoding infers DecimalType(38,18) — past Derby's cap of 31
    .withColumn("amount", col("amount").cast(DecimalType(18, 2)))

  private def readBack() =
    JdbcExec.readTable(spark, url, "account_tgt")
      .orderBy("id").collect().toSeq

  private def expect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().toSeq

  test("executed cycle: create, bulk load, upsert, delete, idempotent re-run") {
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "account_tgt", schema, pk = Seq("id"))
      assert(JdbcExec.tableExists(conn, "account_tgt"))
      JdbcExec.ensureTable(conn, "account_tgt", schema, pk = Seq("id")) // no-op
    }

    // 1) bulk load 1..100 across 4 partitions (4 concurrent MERGEs)
    val v1 = mkRows(1 to 100, "n", ver = 1).repartition(4)
    JdbcExec.writeUpsert(v1, url, "account_tgt", Seq("id"), batchSize = 17)
    assert(readBack() == expect(v1))

    // 2) upsert: 40 updated rows (51..90, new values) + 20 inserts
    val v2 = mkRows(51 to 90, "upd", ver = 2)
      .unionByName(mkRows(101 to 120, "new", ver = 2)).repartition(3)
    JdbcExec.writeUpsert(v2, url, "account_tgt", Seq("id"), batchSize = 17)
    val afterUpsert = expect(
      mkRows(1 to 50, "n", 1).unionByName(mkRows(51 to 90, "upd", 2))
        .unionByName(mkRows(91 to 100, "n", 1))
        .unionByName(mkRows(101 to 120, "new", 2)))
    assert(readBack() == afterUpsert)

    // 3) soft-delete propagation: tombstone ids 10..19 → real DELETEs
    val dead = (10L to 19L).toDF("id")
    JdbcExec.writeDeletes(dead, url, "account_tgt", Seq("id"), batchSize = 3)
    val afterDelete = afterUpsert.filterNot(r => (10L to 19L).contains(r.getLong(0)))
    assert(readBack() == afterDelete)

    // 4) idempotent re-run: replaying the same upsert + deletes is a no-op
    JdbcExec.writeUpsert(v2, url, "account_tgt", Seq("id"), batchSize = 17)
    JdbcExec.writeDeletes(dead, url, "account_tgt", Seq("id"), batchSize = 3)
    assert(readBack() == afterDelete)
  }

  test("schema drift: ensureColumns ALTERs only the missing fields") {
    val drifted = schema.add(StructField("new_field__c", DoubleType))
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "drift_tgt", schema, pk = Seq("id"))
      JdbcExec.ensureColumns(conn, "drift_tgt", drifted)
      JdbcExec.ensureColumns(conn, "drift_tgt", drifted) // idempotent
    }
    val row = Seq((1L, "a", BigDecimal("1.00"),
      Timestamp.valueOf("2026-01-01 00:00:00"), true, 0.5, 9.75))
      .toDF("id", "name", "amount", "modstamp", "active", "score",
        "new_field__c")
      .withColumn("amount", col("amount").cast(DecimalType(18, 2)))
    JdbcExec.writeUpsert(row, url, "drift_tgt", Seq("id"), batchSize = 10)
    val got = JdbcExec.readTable(spark, url, "drift_tgt").collect()
    assert(got.length == 1 && got.head.getAs[Double]("new_field__c") == 9.75)
  }

  test("cursor advance shares the load transaction; rollback leaves both untouched") {
    val cursors = new JdbcCursorStore(url, "sync_state")
    cursors.init(); cursors.init() // idempotent
    assert(cursors.get("account").isEmpty)
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "txn_tgt", schema, pk = Seq("id"))
      // crash sim: load a batch + advance the cursor, then ROLLBACK —
      // neither the rows nor the cursor may survive
      conn.setAutoCommit(false)
      JdbcExec.loadBatch(conn, "txn_tgt", schema, Seq("id"),
        mkRows(1 to 5, "x", 1).collect().iterator, batchSize = 2)
      cursors.putInTxn(conn, "account", 500L)
      conn.rollback()
    }
    assert(JdbcExec.readTable(spark, url, "txn_tgt").isEmpty)
    assert(cursors.get("account").isEmpty)
    // the committed path: one transaction carries load + cursor
    JdbcExec.withConnection(url) { conn =>
      conn.setAutoCommit(false)
      JdbcExec.loadBatch(conn, "txn_tgt", schema, Seq("id"),
        mkRows(1 to 5, "x", 1).collect().iterator, batchSize = 2)
      cursors.putInTxn(conn, "account", 500L)
      conn.commit()
    }
    assert(JdbcExec.readTable(spark, url, "txn_tgt").count() == 5)
    assert(cursors.get("account").contains(500L))
  }

  test("syncOnce: incremental pull → upsert + tombstones → cursor, replay converges") {
    val source = mkRows(1 to 30, "s", 1)
      .withColumn("cur", col("id") * 10)
      .withColumn("is_deleted", col("id").isin(4L, 9L))
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "sync_tgt", source.schema, pk = Seq("id"))
    }
    def pull(past: Long) = source.filter(col("cur") > past)
    val c1 = JdbcExec.syncOnce(spark, url, "sync_tgt", Seq("id"),
      "sync_state2", "account", pull, "cur", "is_deleted", batchSize = 7)
    assert(c1 == 300L)
    val live = JdbcExec.readTable(spark, url, "sync_tgt")
    assert(live.count() == 28 && live.filter(col("id").isin(4L, 9L)).isEmpty)
    // nothing new past the cursor → cursor holds, state unchanged
    val c2 = JdbcExec.syncOnce(spark, url, "sync_tgt", Seq("id"),
      "sync_state2", "account", pull, "cur", "is_deleted", batchSize = 7)
    assert(c2 == 300L)
    // crash-replay sim: reset the cursor (as if the advance never
    // committed) and re-run — idempotent writes converge to the same state
    JdbcExec.withConnection(url) { conn =>
      conn.setAutoCommit(false)
      new JdbcCursorStore(url, "sync_state2").putInTxn(conn, "account", 150L)
      conn.commit()
    }
    val before = JdbcExec.readTable(spark, url, "sync_tgt")
      .orderBy("id").collect().toSeq
    val c3 = JdbcExec.syncOnce(spark, url, "sync_tgt", Seq("id"),
      "sync_state2", "account", pull, "cur", "is_deleted", batchSize = 7)
    assert(c3 == 300L)
    assert(JdbcExec.readTable(spark, url, "sync_tgt")
      .orderBy("id").collect().toSeq == before)
  }

  test("null column values round-trip through the typed setNull path") {
    // ADVICE r13: untyped setObject(i, null) is driver-dependent; the
    // write path must go through ps.setNull(i, <sql type>). Exercise a
    // null in every non-PK type the schema carries, both on insert and
    // on a MERGE-update that overwrites a non-null with a null.
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "null_tgt", schema, pk = Seq("id"))
    }
    val rows = Seq(
      Row(1L, null, null, null, null, null),
      Row(2L, "full", new java.math.BigDecimal("2.25"),
        Timestamp.valueOf("2026-01-01 00:01:00"), true, 3.5))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    JdbcExec.writeUpsert(df, url, "null_tgt", Seq("id"), batchSize = 1)
    val got = JdbcExec.readTable(spark, url, "null_tgt").orderBy("id").collect()
    assert(got.length == 2)
    assert((1 to 5).forall(got(0).isNullAt))
    assert(got(1).getAs[String]("name") == "full")
    // MERGE-update: row 2's name/score go null; typed nulls again
    val upd = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(2L, null, new java.math.BigDecimal("9.00"),
          Timestamp.valueOf("2026-01-01 00:02:00"), false, null)), 1), schema)
    JdbcExec.writeUpsert(upd, url, "null_tgt", Seq("id"), batchSize = 5)
    val after = JdbcExec.readTable(spark, url, "null_tgt").orderBy("id").collect()
    assert(after(1).isNullAt(1) && after(1).isNullAt(5))
    assert(after(1).getAs[java.math.BigDecimal]("amount")
      .compareTo(new java.math.BigDecimal("9.00")) == 0)
  }

  test("binary values round-trip EXECUTED through Derby: setBytes on " +
    "insert and MERGE-update, typed VARBINARY null both ways (r18)") {
    // The PG dialect's bytea bind is render-asserted (PgDialectSpec);
    // Derby's VARCHAR FOR BIT DATA executes the SAME setBytes /
    // setNull(VARBINARY) calls end-to-end, shrinking the live-PG
    // residual to the array/jsonb binds Derby cannot express.
    val bschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType)))
    JdbcExec.withConnection(url) { conn =>
      JdbcExec.ensureTable(conn, "bin_tgt", bschema, pk = Seq("id"))
    }
    val rows = Seq(
      Row(1L, Array[Byte](1, 2, -1, 0, 127, -128)),
      Row(2L, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), bschema)
    JdbcExec.writeUpsert(df, url, "bin_tgt", Seq("id"), batchSize = 1)
    val got = JdbcExec.readTable(spark, url, "bin_tgt").orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Array[Byte]]("blob").toSeq ==
      Seq[Byte](1, 2, -1, 0, 127, -128))
    assert(got(1).isNullAt(1))
    // MERGE-update: non-null -> null and null -> non-null
    val upd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null), Row(2L, Array[Byte](42))), 1), bschema)
    JdbcExec.writeUpsert(upd, url, "bin_tgt", Seq("id"), batchSize = 5)
    val after = JdbcExec.readTable(spark, url, "bin_tgt").orderBy("id").collect()
    assert(after(0).isNullAt(1))
    assert(after(1).getAs[Array[Byte]]("blob").toSeq == Seq[Byte](42))
  }

  test("Derby DDL + MERGE text: the dialect deltas are explicit") {
    val ddl = DerbySql.createTableSql("t", StructType(schema.take(3)),
      pk = Seq("id"))
    assert(ddl == """CREATE TABLE "t" ("id" BIGINT NOT NULL, """ +
      """"name" VARCHAR(32672), "amount" DECIMAL(18,2), PRIMARY KEY ("id"))""")
    val merge = DerbySql.mergeSql("t", "stg_t", StructType(schema.take(3)),
      pk = Seq("id"))
    assert(merge == """MERGE INTO "t" t USING SESSION."stg_t" s """ +
      """ON t."id" = s."id" WHEN MATCHED THEN UPDATE SET """ +
      """"name" = s."name", "amount" = s."amount" """ +
      """WHEN NOT MATCHED THEN INSERT ("id", "name", "amount") """ +
      """VALUES (s."id", s."name", s."amount")""")
    // array/map columns have no Derby lowering — fail fast, loudly
    intercept[IllegalArgumentException] {
      DerbySql.derbyType(ArrayType(StringType))
    }
  }
}
