package graft

import graft.sources.SchemaDrift
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDriftSpec extends AnyFunSuite {
  private val cur = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("amount", IntegerType),
    StructField("score", FloatType),
    StructField("legacy", StringType),
    StructField("narrowme", LongType)))
  private val inc = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("amount", LongType),         // widening retype
    StructField("score", FloatType),         // unchanged
    StructField("narrowme", IntegerType),    // narrowing retype
    StructField("created_at", TimestampNTZType))) // added

  test("diff classifies added/removed/retyped") {
    val d = SchemaDrift.diff(cur, inc)
    assert(d.added.map(_.name) == Seq("created_at"))
    assert(d.removed.map(_.name) == Seq("legacy"))
    assert(d.retyped.map(_._2.name).sorted == Seq("amount", "narrowme"))
    assert(SchemaDrift.diff(cur, cur).isEmpty)
  }

  test("widening matrix") {
    import SchemaDrift.isWidening
    assert(isWidening(IntegerType, LongType))
    assert(isWidening(FloatType, DoubleType))
    assert(isWidening(LongType, StringType))
    assert(isWidening(DecimalType(10, 2), DecimalType(18, 2)))
    assert(!isWidening(LongType, IntegerType))
    assert(!isWidening(DoubleType, FloatType))
    assert(!isWidening(DecimalType(18, 2), DecimalType(10, 2)))
    assert(!isWidening(DecimalType(10, 2), DecimalType(10, 4))) // int digits shrink
  }

  test("migration SQL applies adds and widenings, flags the rest") {
    val sql = SchemaDrift.migrationSql("contact", SchemaDrift.diff(cur, inc))
    assert(sql.exists(_ ==
      "ALTER TABLE \"contact\" ADD COLUMN IF NOT EXISTS \"created_at\" timestamp"))
    assert(sql.exists(_ ==
      "ALTER TABLE \"contact\" ALTER COLUMN \"amount\" TYPE bigint"))
    assert(sql.exists(s => s.startsWith("-- MANUAL") && s.contains("narrowme")))
    assert(sql.exists(s => s.startsWith("-- SKIPPED") && s.contains("legacy")))
    assert(!sql.exists(_.contains("DROP COLUMN")))
  }
}
