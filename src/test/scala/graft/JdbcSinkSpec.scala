package graft

import java.util.concurrent.ConcurrentLinkedQueue
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
