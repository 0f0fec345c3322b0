package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Pipeline.ObjectSync

/** End-to-end sync lifecycle (SURVEY §3.1): full sync then incremental
  * sync of the events object into a captured upsert sink.
  */
class PipelineSpec extends SparkSpec {

  private def eventsSync = ObjectSync(
    name = "events_t",
    read = s => Tables.eventsWithNanos(s, sfDir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("event_id", "ts_us", "user_id", "event_type", "value"),
    pk = "event_id",
    cursorField = "ts_us",
    targetTypes = Map("value" -> DecimalType(18, 2)))

  test("full sync writes every row exactly once through the sink") {
    PipelineSpec.rows.clear()
    val n = Pipeline.fullSync(spark, eventsSync, batchSize = 100) {
      (sql, batch) =>
        assert(sql.contains("ON CONFLICT (\"event_id\") DO UPDATE"))
        batch.foreach(r => PipelineSpec.rows.add(r.head.asInstanceOf[Long]))
    }
    assert(n == 1000)
    val seen = PipelineSpec.rows.toArray(Array.empty[java.lang.Long])
    assert(seen.length == 1000)
    assert(seen.map(_.toLong).distinct.length == 1000)
  }

  test("incremental sync pulls only past the cursor and advances it") {
    val all = eventsSync.read(spark)
    val mid = all.selectExpr("percentile(ts_us, 0.5)").head()
      .getDouble(0).toLong
    PipelineSpec.rows.clear()
    val (n, next) = Pipeline.incrementalSync(spark, eventsSync, mid, 100) {
      (_, batch) =>
        batch.foreach(r => PipelineSpec.rows.add(r.head.asInstanceOf[Long]))
    }
    val expected = all.filter(col("ts_us") > mid).count()
    assert(n == expected && n > 0)
    assert(PipelineSpec.rows.size == expected)
    assert(next.contains(all.agg(max("ts_us")).head().getLong(0)))
    // second pull from the advanced cursor is empty and keeps no cursor
    val (n2, next2) = Pipeline.incrementalSync(spark, eventsSync,
      next.get, 100)((_, _) => fail("sink must not be called"))
    assert(n2 == 0 && next2.isEmpty)
  }

  test("normalize picks a deterministic survivor for duplicate " +
    "(pk, cursor) pairs regardless of input order") {
    import spark.implicits._
    // two rows with identical pk AND cursor, differing payloads — the
    // advisor-flagged case where a pk-only tiebreak is a no-op
    val rows = Seq(
      (1L, 100L, "payload_a"), (1L, 100L, "payload_b"),
      (2L, 50L, "x"), (2L, 60L, "y"))
    val sync = ObjectSync("t", _ => spark.emptyDataFrame, "id", "cur")
    def survivors(data: Seq[(Long, Long, String)]): Map[Long, String] =
      Pipeline.normalize(
        data.toDF("id", "cur", "payload").repartition(3), sync)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val fwd = survivors(rows)
    val rev = survivors(rows.reverse)
    assert(fwd == rev, "survivor depends on input order")
    assert(fwd(2L) == "y", "latest cursor must win")
    assert(Set("payload_a", "payload_b").contains(fwd(1L)))
  }

  test("normalize applies the type map and target DDL reflects it") {
    val ddl = Pipeline.targetDdl(spark, eventsSync)
    assert(ddl.contains("\"value\" numeric(18,2)"))
    assert(ddl.contains("PRIMARY KEY (\"event_id\")"))
  }
}

object PipelineSpec {
  val rows = new ConcurrentLinkedQueue[java.lang.Long]()
}
