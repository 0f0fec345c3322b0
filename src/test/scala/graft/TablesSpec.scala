package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-regeneration defenses in [[Tables]] (the r8 lesson:
  * events.ts silently flipped TIMESTAMP(NANOS)→TIMESTAMP_MICROS
  * between rounds and broke every event-time query). The loaders
  * sniff the parquet footer's unit and normalize; these tests pin
  * both directions of that defense.
  */
class TablesSpec extends SparkSpec {

  test("tsNsPerTick reads the shipped fixture's footer unit") {
    val tick = Tables.tsNsPerTick(spark, sfDir)
    assert(Set(1L, 1000L, 1000000L).contains(tick), tick.toString)
    // whatever the unit, the normalized read must land in the
    // documented 2024-01 range — the regression r8 shipped was events
    // collapsing onto 1970-01-20
    val bounds = Tables.events(spark, sfDir)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .collect()(0)
    assert(bounds.getAs[java.time.LocalDateTime]("lo").getYear == 2024,
      bounds.toString)
    assert(bounds.getAs[java.time.LocalDateTime]("hi").getYear == 2024,
      bounds.toString)
  }

  test("ts_ns is true epoch nanos under the shipped fixture unit") {
    val row = Tables.eventsWithNanos(spark, sfDir)
      .select(col("ts_ns"), unix_micros(col("ts").cast(TimestampType))
        .as("us"))
      .limit(100).collect()
    row.foreach { r =>
      assert(r.getLong(0) / 1000L == r.getLong(1), r.toString)
    }
  }

  test("orders/lineitem NTZ loaders survive a raw-INT64-nanos regen " +
    "(the events r8 drift applied to the other timestamp tables)") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsdef")
      .toString
    // an orders fixture whose o_orderdate is a BARE INT64 of epoch
    // nanos — the shape Spark's native TIMESTAMP_NTZ read rejects
    val baseNs = 820454400000000000L // 1996-01-01T00:00:00Z
    val rawSchema = StructType(Tables.schemas("orders").map { f =>
      if (f.name == "o_orderdate") f.copy(dataType = LongType) else f
    })
    val rows = (1 to 5).map { i =>
      org.apache.spark.sql.Row(i.toLong, i.toLong, "O", i * 10.0,
        baseNs + i * 86400000000000L, "1-URGENT")
    }
    spark.createDataFrame(rows.asJava, rawSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val read = Tables.orders(spark, dir)
    assert(read.schema("o_orderdate").dataType == TimestampNTZType,
      read.schema.treeString)
    val got = read.orderBy("o_orderkey")
      .select(col("o_orderkey"), col("o_orderdate"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toString))
    assert(got.head == (1L, "1996-01-02T00:00"), got.mkString(", "))
    assert(got.last == (5L, "1996-01-06T00:00"), got.mkString(", "))
    // and the shipped micros fixture still rides the native read
    assert(Tables.orders(spark, sfDir).schema("o_orderdate").dataType ==
      TimestampNTZType)
  }
}
