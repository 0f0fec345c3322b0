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

  test("dynamic partition overwrite rewrites only the loaded " +
    "partitions and re-running a load is idempotent") {
    val dir = Files.createTempDirectory("graft-layout-dyn").toString
    val orders = Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
    Layout.writePartitioned(orders, dir, Seq("o_year"))
    def files(year: Int): Map[String, Long] = {
      val d = new java.io.File(s"$dir/o_year=$year")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val years = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("o_year=")).map(_.getName)
    assert(years.length > 1, years.mkString(","))
    val untouched = files(1995)
    // reload 1996 with doubled prices — only that partition may change
    val batch = orders.filter(col("o_year") === 1996)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Layout.overwritePartitions(batch, dir, Seq("o_year"))
    assert(files(1995) == untouched,
      "untouched partition's files changed")
    val reread = spark.read.parquet(dir)
    assert(reread.filter(col("o_year") === 1996)
      .agg(sum("o_totalprice")).head.getDouble(0) ==
      orders.filter(col("o_year") === 1996)
        .agg(sum(col("o_totalprice") * 2)).head.getDouble(0))
    assert(reread.count() == orders.count())
    // idempotence: the same batch again converges (no append-dup)
    Layout.overwritePartitions(batch, dir, Seq("o_year"))
    assert(spark.read.parquet(dir).count() == orders.count())
    assert(files(1995) == untouched)
  }

  test("compact collapses a fragmented directory into range-disjoint " +
    "files with the same rows") {
    val dir = Files.createTempDirectory("graft-layout-compact")
      .resolve("t").toString
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // simulate micro-batch fragmentation: 64 hash-scattered files
    orders.repartition(64).write.parquet(dir)
    val expected = orders.orderBy("o_orderkey").collect()
    val (before, after) = Layout.compact(spark, dir, "o_orderkey",
      targetRowsPerFile = math.max(1L, expected.length / 4L))
    assert(before >= 64, s"fragmentation setup wrote $before files")
    assert(after <= 5, s"compaction left $after files")
    val reread = spark.read.parquet(dir)
    assert(reread.orderBy("o_orderkey").collect().sameElements(expected),
      "compaction changed the row set")
    // each output file covers a disjoint o_orderkey range (footer
    // min/max stays selective for post-compaction range predicates)
    val ranges = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val one = spark.read.parquet(f.getAbsolutePath)
          .agg(min("o_orderkey"), max("o_orderkey")).head
        (one.getLong(0), one.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file key ranges overlap: $hi > $lo2")
      case _ =>
    }
  }

  test("z-order layout keeps per-file min/max selective on BOTH " +
    "columns where a linear sort only serves its leading column") {
    val base = Files.createTempDirectory("graft-layout-zorder")
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val zDir = base.resolve("z").toString
    val linDir = base.resolve("lin").toString
    val nFiles = 16
    Layout.writeZOrdered(orders, zDir, "o_custkey", "o_totalprice", nFiles)
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(linDir)
    // row-set equality: layout never changes content
    assert(spark.read.parquet(zDir).count() == orders.count())

    // files a mid-range point predicate CANNOT skip, per column:
    // a file survives if its [min, max] contains the probe value
    def survivors(dir: String, c: String, v: Double): Int =
      new java.io.File(dir).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .count { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c).cast("double")), max(col(c).cast("double")))
            .head
          r.getDouble(0) <= v && v <= r.getDouble(1)
        }
    val custProbe = orders.stat.approxQuantile("o_custkey",
      Array(0.5), 0.01).head
    val priceProbe = orders.stat.approxQuantile("o_totalprice",
      Array(0.5), 0.01).head
    val zCust = survivors(zDir, "o_custkey", custProbe)
    val zPrice = survivors(zDir, "o_totalprice", priceProbe)
    val linCust = survivors(linDir, "o_custkey", custProbe)
    val linPrice = survivors(linDir, "o_totalprice", priceProbe)
    // the linear sort serves its leading column (near-perfect pruning)
    // but its trailing column hits ~every file
    assert(linCust <= 2, s"linear sort should prune o_custkey: $linCust")
    assert(linPrice >= nFiles - 2,
      s"baseline sanity: trailing column should NOT prune: $linPrice")
    // the z-order prunes BOTH dimensions meaningfully
    assert(zCust <= nFiles / 2,
      s"z-order failed to prune o_custkey: $zCust of $nFiles")
    assert(zPrice <= nFiles / 2,
      s"z-order failed to prune o_totalprice: $zPrice of $nFiles")
  }

  test("compact recovers from a crash stranded between the publish " +
    "renames and from leftover temp/backup dirs") {
    val base = Files.createTempDirectory("graft-layout-recover")
    val dir = base.resolve("t").toString
    val nations = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    nations.write.parquet(dir)
    val rows = spark.read.parquet(dir).count()
    // branch 1: crash BETWEEN the renames — live dir moved aside to
    // _pre_compact, nothing published yet
    val live = new java.io.File(dir)
    val bak = new java.io.File(dir + "_pre_compact")
    assert(live.renameTo(bak))
    val (_, after1) = Layout.compact(spark, dir, "n_nationkey", rows)
    assert(after1 >= 1)
    assert(spark.read.parquet(dir).count() == rows, "restore lost rows")
    assert(!bak.exists(), "recovery left the backup behind")
    // branch 2: crash AFTER publish, before cleanup — stale backup and
    // an aborted _compacting dir alongside a live path
    nations.limit(3).write.parquet(bak.getAbsolutePath)
    nations.limit(2).write.parquet(dir + "_compacting")
    val (_, after2) = Layout.compact(spark, dir, "n_nationkey", rows)
    assert(after2 >= 1)
    assert(spark.read.parquet(dir).count() == rows)
    assert(!bak.exists() && !new java.io.File(dir + "_compacting").exists(),
      "recovery left stale dirs behind")
  }
}
