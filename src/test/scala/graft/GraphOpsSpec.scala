package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Invariants for the r10 graph family (the oracle pins exact values;
  * these pin the algebra so a refactor can't silently change it).
  */
class GraphOpsSpec extends SparkSpec {

  test("pagerank conserves total mass up to integer floor loss") {
    val pr = GraphOps.pagerank(spark, sfDir)
    val n = pr.count()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct().count()
    val nEdges = 2 * li // symmetrized
    val total = pr.agg(sum("r")).head.getLong(0)
    // floor loss per iteration: < 1 pico-unit per edge (r div outdeg
    // spread over outdeg edges loses < outdeg), < 2 per node (the
    // //100 damping and the base //n), over five iterations + init
    val maxLoss = 5L * (nEdges + 2 * n) + n
    assert(total <= 1000000000000L, s"mass grew: $total")
    assert(total >= 1000000000000L - maxLoss,
      s"mass lost beyond floor bound: $total (n=$n, e=$nEdges)")
    Caches.release(spark)
  }

  test("uniform rank is the fixed point of a regular graph") {
    import spark.implicits._
    // 4-cycle: every node degree 2, pagerank must stay uniform
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (2L, 1L), (3L, 2L), (4L, 3L), (1L, 4L))
      .toDF("src", "dst")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val init = 1000000000000L / 4
    var ranks = deg.select(col("src").as("node"), lit(init).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges.join(deg, "src")
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
      ranks = contrib.groupBy("dst").agg(sum("c").as("sc"))
        .select(col("dst").as("node"),
          (lit(150000000000L / 4) + expr("(85 * sc) div 100")).as("r"))
    }
    val rs = ranks.select("r").distinct().collect()
    assert(rs.length == 1, s"regular graph drifted: ${rs.toSeq}")
  }

  test("r19: a superstep join over the bucketed edge store plans with " +
    "NO edge-side Exchange — only the rank side and the dst rollup " +
    "shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at spec SF the rank frame would broadcast — force the shuffle
    // join so the pin exercises the bucket layout (the 100 TB shape)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edgesDeg = spark.table(GraphOps.edgeStoreTable(spark, sfDir))
      // a rank frame with NO parquet lineage, so every Exchange in the
      // plan is attributable: one for this side of the join, one for
      // the dst rollup — an edge-side shuffle would make three
      val ranks = spark.range(0, 1000)
        .select(col("id").as("node"), lit(1000000L).as("r"))
      val step = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      val plan = step.queryExecution.executedPlan
      val str = plan.toString
      assert(str.contains("Bucketed: true"),
        s"edge scan lost the bucket spec:\n$str")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 2,
        s"expected 2 exchanges (rank side + dst rollup), " +
          s"got ${shuffles.size}:\n$str")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("degree histogram accounts for every node once") {
    val q = SparkEntry.queries("j_graph_degree")(spark, sfDir)
    val pr = GraphOps.pagerank(spark, sfDir, iterations = 1)
    val nodes = pr.count()
    val histTotal = q.agg(sum("n_nodes")).head.getLong(0)
    assert(histTotal == nodes,
      s"histogram covers $histTotal nodes, graph has $nodes")
    Caches.release(spark)
  }
}
