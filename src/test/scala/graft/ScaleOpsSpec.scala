package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Skew/co-location patterns: result equivalence + plan shape. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed synthetic fact: 90% of rows share key 0
  private lazy val skewed = spark.range(0, 10000)
    .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
      (col("id") % 100).as("v"))

  test("salted aggregation equals plain aggregation on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = ScaleOps.saltedAggregate(skewed, Seq("k"), nSalts = 8,
      partial = Seq(sum(col("v")) -> "p_sum", count(lit(1)) -> "p_n"),
      merge = Seq(sum(col("p_sum")) -> "sum_v", sum(col("p_n")) -> "n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salted join equals plain join and spreads the hot key") {
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("dname"))
    val plain = skewed.join(dim, "k")
      .select("k", "v", "dname").as[(Long, Long, String)].collect().sorted
    val salted = ScaleOps.saltedJoin(skewed, dim, "k", nSalts = 8)
      .select("k", "v", "dname").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("date-partitioned layout prunes partitions under a day filter") {
    val dir = "/tmp/graft-events-partitioned"
    Tables.eventsWithNanos(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(day"), plan)
    // only one day directory is actually read
    val nDays = Tables.eventsWithNanos(spark, sfDir)
      .select(to_date(col("ts"))).distinct().count()
    assert(nDays > 1)
    assert(pruned.count() ==
      Tables.eventsWithNanos(spark, sfDir)
        .filter(to_date(col("ts")) === "2024-01-05").count())
  }

  test("bucketed join plans without an exchange on the join key") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(spark, sfDir)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.customer(spark, sfDir)
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.orders(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
