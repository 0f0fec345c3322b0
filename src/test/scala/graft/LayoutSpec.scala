package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.sources.Layout

/** The written-layout proofs behind SCALE.md: a join over two tables
  * bucketed on the join key plans with NO Exchange, and a partition
  * predicate over a partitioned write prunes at the scan.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join with no Exchange on either side") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal")
    Layout.writeBucketed(orders, "layout_orders_b", "o_custkey", 8)
    Layout.writeBucketed(customer, "layout_customer_b", "c_custkey", 8)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("layout_orders_b")
          .join(spark.table("layout_customer_b"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey").agg(sum("o_totalprice").as("total"))
        val plan = joined.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
        assert(plan.contains("SelectedBucketsCount"), plan)
        // and it computes the right thing
        val viaBuckets = joined.orderBy("c_custkey").collect()
        val direct = orders.join(customer,
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey").agg(sum("o_totalprice").as("total"))
          .orderBy("c_custkey").collect()
        assert(viaBuckets.sameElements(direct))
      } finally spark.conf
        .set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS layout_orders_b")
      spark.sql("DROP TABLE IF EXISTS layout_customer_b")
    }
  }

  test("bucket-pruned single-table aggregation skips the shuffle too") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(orders, "layout_orders_agg", "o_custkey", 8)
    try {
      val agg = spark.table("layout_orders_agg")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // grouping on the bucket key reuses the write-time hash layout:
      // partial+final aggregate collapse onto the scan, no Exchange
      assert(!plan.contains("Exchange"),
        s"groupBy on bucket key still shuffles:\n$plan")
      assert(agg.count() == orders.select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS layout_orders_agg")
  }

  test("partitioned write prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-layout-part").toString
    val orders = Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
    Layout.writePartitioned(orders, dir, Seq("o_year"))
    val read = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val plan = read.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the predicate lands in PartitionFilters (directory pruning), not
    // PushedFilters (row-group skipping) — the scan never opens files
    // outside o_year=1995
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("o_year"), plan)
    assert(read.count() ==
      orders.filter(col("o_year") === 1995).count())
  }
}
