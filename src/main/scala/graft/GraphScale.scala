package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the iterative graph family: replicates the sf0.1
  * part↔supplier edge basis `factor`× with shifted key ranges (each
  * replica is a disjoint component — graph size grows linearly, so
  * ideal superstep cost does too) and times
  * [[operators.GraphOps.pagerank]]-shaped iteration at 1× and factor×.
  *
  *   sbt "runMain graft.GraphScale /root/testdata/sf0.1 10"
  *
  * Measured results live in SCALE.md §"Round-10 session-2 addenda".
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(replicas: Int): DataFrame = {
      val e0 = Tables.lineitem(spark, src)
        .select(col("l_partkey").as("src"),
          (col("l_suppkey") + graft.operators.GraphOps.SupplierOffset).as("dst"))
        .distinct()
      val rep = (0 until replicas).map { k =>
        e0.select((col("src") + lit(k * 10000000L)).as("src"),
          (col("dst") + lit(k * 10000000L)).as("dst"))
      }.reduce(_ unionByName _)
      rep.union(rep.select(col("dst").as("src"), col("src").as("dst")))
    }

    def pagerank(e: DataFrame, iters: Int): (Long, Long) = {
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val edgesDeg = Caches.persisted(
        e.join(deg, "src").repartition(col("src")))
      val n = edgesDeg.agg(countDistinct(col("src"))).head.getLong(0)
      val base = 150000000000L / n
      var ranks = deg.select(col("src").as("node"),
        lit(1000000000000L / n).as("r"))
      for (_ <- 1 to iters) {
        ranks = edgesDeg
          .join(ranks, edgesDeg("src") === ranks("node"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
          .select(col("dst").as("node"),
            (lit(base) + expr("(85 * sc) div 100")).as("r"))
      }
      val top = ranks.orderBy(desc("r"), asc("node")).limit(1)
        .head
      (n, top.getLong(1))
    }

    for (replicas <- Seq(1, factor); rep <- 1 to 2) {
      Caches.release(spark)
      val t0 = System.nanoTime()
      val (n, topRank) = pagerank(edges(replicas), iters = 5)
      println(f"graphscale replicas=$replicas%-3d rep=$rep " +
        f"nodes=$n%-9d topRank=$topRank ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
