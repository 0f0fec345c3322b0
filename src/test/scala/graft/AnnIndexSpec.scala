package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, AnnOps}

/** The stored-IVF-index incremental-ANN path (VERDICT r5 ask #3):
  * `j_ann_incremental` assigns the delta split to STANDING centroids —
  * no sample/Lloyd job on the delta run (the lloydRuns counter is
  * direct evidence), no base-embedding scan in the plan — and searches
  * the merged inverted lists at recall@3 ≥ 0.8 vs brute force over
  * base∪delta. Plus the append loop: a batch-2 probe finds a batch-1
  * vector that exists only in the stored lists.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // driver-side twin of TextOps.splitBucket
  private def bucketOf(id: Long): Long =
    ((id % 2147483647L) * 48271L % 2147483647L) % 100L

  test("j_ann_incremental: delta run reuses standing centroids — no " +
    "Lloyd job, no base-embedding scan, stored tables in the plan") {
    graft.functions.VectorExprs.register(spark)
    val prefix = AnnOps.storedIndexPrefix(spark, sfDir) // one-time build
    val before = AnnOps.lloydRuns.get()
    val out = SparkEntry.queries("j_ann_incremental")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(AnnOps.lloydRuns.get() == before,
      "delta run re-clustered (kmeansCentroids ran)")
    // every embeddings access in the plan is the delta split; the base
    // side enters ONLY through the stored tables
    val conds = out.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString
    }
    assert(conds.exists(_.contains(">= cast(80")), conds.toString)
    assert(!conds.exists(_.contains("< cast(80")),
      s"base-split scan present:\n${conds.mkString("\n")}")
    val an = out.queryExecution.analyzed.toString
    assert(an.contains(AnnIndex.centTable(prefix)), an)
    assert(an.contains(AnnIndex.cellsTable(prefix)), an)
    // probes are delta vectors only
    assert(rows.forall(r => bucketOf(r.getLong(0)) >= 80L))
    Caches.release(spark)
  }

  test("j_ann_incremental recall@3 vs brute force over base∪delta is " +
    ">= 0.8 on sf0.01") {
    graft.functions.VectorExprs.register(spark)
    val d = "/root/testdata/sf0.01"
    val inc = SparkEntry.queries("j_ann_incremental")(spark, d)
      .select("vec_id", "nn_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // brute-force exact top-3 over ALL vectors (same tie rule: cos
    // desc, nn_id asc), evaluated for the delta probes only
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val units = emb.map { case (id, v) => id -> unit(v) }
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val exact = units.filter(p => bucketOf(p._1) >= 80L).map { case (id, ua) =>
      id -> units.filter(_._1 != id)
        .map { case (bid, ub) => (dot(ua, ub), bid) }
        .sortBy { case (c, bid) => (-c, bid) }.take(3).map(_._2).toSet
    }.toMap
    assert(inc.keySet.subsetOf(exact.keySet), "probe outside the delta split")
    val recalls = exact.toSeq.map { case (id, ex) =>
      inc.getOrElse(id, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"incremental mean recall@3 = $mean%.3f over ${recalls.size} probes")
    assert(mean >= 0.8, f"recall@3 $mean%.3f below 0.8")
    Caches.release(spark)
  }

  test("j_ann_incremental_pq: recall@3 >= 0.8 on sf0.01, near-total " +
    "agreement with the unquantized entry, and the candidate pass " +
    "reads the cells table WITHOUT the exact vectors") {
    graft.functions.VectorExprs.register(spark)
    val d = "/root/testdata/sf0.01"
    def sets(name: String) = SparkEntry.queries(name)(spark, d)
      .select("vec_id", "nn_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = sets("j_ann_incremental_pq")
    val un = sets("j_ann_incremental")
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val units = emb.map { case (id, v) => id -> unit(v) }
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val exact = units.filter(p => bucketOf(p._1) >= 80L).map { case (id, ua) =>
      id -> units.filter(_._1 != id)
        .map { case (bid, ub) => (dot(ua, ub), bid) }
        .sortBy { case (c, bid) => (-c, bid) }.take(3).map(_._2).toSet
    }.toMap
    val recalls = exact.toSeq.map { case (id, ex) =>
      pq.getOrElse(id, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"incremental pq mean recall@3 = $mean%.3f")
    assert(mean >= 0.8, f"recall@3 $mean%.3f below 0.8")
    val agree = un.toSeq.map { case (id, ks) =>
      pq.getOrElse(id, Set.empty).intersect(ks).size.toDouble /
        math.max(ks.size, 1)
    }
    val meanAgree = agree.sum / agree.size
    info(f"pq vs unquantized agreement = $meanAgree%.3f")
    assert(meanAgree >= 0.95, f"quantization lost too much: $meanAgree%.3f")
    Caches.release(spark)

    // the candidate side scans (vec_id, cell, q) only — the exact
    // vectors stay out of the pq pass (plan inspected with AQE off)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("j_ann_incremental_pq")(spark, sfDir)
        .queryExecution.executedPlan
      val cellScans = exec.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table.endsWith("_cells")) =>
          f.output.map(_.name).toSet
      }
      assert(cellScans.nonEmpty, exec.toString)
      assert(cellScans.exists(cols => cols.contains("q") && !cols.contains("u")),
        s"no u-free candidate scan of the cells table: $cellScans")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Caches.release(spark)
    }
  }

  test("co-partition regime: the stored cells table never crosses an " +
    "Exchange (probes pre-partition to the write-time bucket count), " +
    "and results are identical to the broadcast regime") {
    graft.functions.VectorExprs.register(spark)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    AnnOps.storedIndexPrefix(spark, sfDir)
    val broadcastRes = Seq("j_ann_incremental", "j_ann_incremental_pq")
      .map(n => n -> SparkEntry.queries(n)(spark, sfDir).collect().toSeq)
      .toMap
    Caches.release(spark)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(AnnOps.BroadcastRowLimitKey, "0") // force co-partition
    try {
      Seq("j_ann_incremental", "j_ann_incremental_pq").foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val exec = df.queryExecution.executedPlan
        val badExchanges = exec.collect {
          case e: ShuffleExchangeExec
            if e.collectLeaves().nonEmpty && e.collectLeaves().forall {
              case f: FileSourceScanExec =>
                f.tableIdentifier.exists(_.table.endsWith("_cells"))
              case _ => false
            } => e
        }
        assert(badExchanges.isEmpty,
          s"$name: stored cells crossed an Exchange:\n$exec")
        val cellScans = exec.collect {
          case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table.endsWith("_cells")) => f
        }
        assert(cellScans.nonEmpty && cellScans.exists(_.bucketedScan),
          s"$name: cells read without the bucket layout:\n$exec")
        assert(df.collect().toSeq == broadcastRes(name),
          s"$name: co-partition result differs from broadcast result")
        Caches.release(spark)
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.unset(AnnOps.BroadcastRowLimitKey)
      Caches.release(spark)
    }
  }

  test("index append composes: a batch-2 probe finds a batch-1 vector " +
    "from the stored lists, with no re-clustering") {
    graft.functions.VectorExprs.register(spark)
    val prefix = "graft_ivf_append_t"
    Seq(AnnIndex.centTable(prefix), AnnIndex.cellsTable(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // two clean clusters on the 4-sphere: around +e1 and +e2
    def v(xs: Double*) = {
      val a = xs.toArray
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n).toSeq
    }
    val base = Seq(
      (0L, v(1.0, 0.1, 0.0, 0.0)), (1L, v(0.0, 0.1, 1.0, 0.0)),
      (2L, v(1.0, -0.1, 0.0, 0.0)), (3L, v(0.0, -0.1, 1.0, 0.0)),
      (4L, v(1.0, 0.0, 0.1, 0.0)), (5L, v(0.1, 0.0, 1.0, 0.0))
    ).toDF("vec_id", "u")
    AnnIndex.write(base, prefix, k = 2, iters = 3, maxSample = 6, nBuckets = 2)
    try {
      // batch 1: a new vector deep in the e1 cluster
      val batch1 = Seq((100L, v(1.0, 0.05, 0.0, 0.0))).toDF("vec_id", "u")
      val asg1 = AnnIndex.assign(spark, prefix, batch1)
      AnnIndex.append(spark, prefix, asg1)
      val before = AnnOps.lloydRuns.get()
      // batch 2: a probe next to batch-1's vector — its true nearest
      // neighbor is 100, which exists ONLY in the stored lists
      val batch2 = Seq((200L, v(1.0, 0.06, 0.0, 0.0))).toDF("vec_id", "u")
      val asg2 = AnnIndex.assign(spark, prefix, batch2)
      val (_, cells) = AnnIndex.read(spark, prefix)
      val nn = asg2.select(col("vec_id"), col("cell"), col("u").as("ua"))
        .join(cells.select(col("vec_id").as("nn_id"), col("cell"),
          col("u").as("ub")), Seq("cell"))
        .withColumn("cos", expr("graft_dot(ua, ub)"))
        .orderBy(desc("cos"), asc("nn_id"))
        .select("nn_id").head().getLong(0)
      assert(nn == 100L, s"batch-2 probe found $nn, expected batch-1's 100")
      assert(AnnOps.lloydRuns.get() == before,
        "append/search path re-clustered")
      // compaction consolidates the appended files, changing nothing
      val pre = spark.table(AnnIndex.cellsTable(prefix))
        .select("vec_id", "cell").collect().map(_.toSeq).toSet
      AnnIndex.compact(spark, prefix)
      val post = spark.table(AnnIndex.cellsTable(prefix))
      assert(post.select("vec_id", "cell").collect().map(_.toSeq).toSet == pre)
      assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          AnnIndex.cellsTable(prefix))).bucketSpec.exists(_.numBuckets == 2),
        "compaction lost the bucket spec")
    } finally {
      Seq(AnnIndex.centTable(prefix), AnnIndex.cellsTable(prefix))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Caches.release(spark)
    }
  }

  test("production sizing rule: nlist = sizedK(n) ~ sqrt(n) clamped to " +
    "[16, 65536], and writeSized derives it from the parquet footers " +
    "(r15, VERDICT ask 7)") {
    // the rule itself
    assert(AnnIndex.sizedK(0L) == 16)
    assert(AnnIndex.sizedK(100L) == 16)           // floor: tiny corpora
    assert(AnnIndex.sizedK(256L) == 16)
    assert(AnnIndex.sizedK(10000L) == 100)        // sqrt regime
    assert(AnnIndex.sizedK(202500L) == 450)       // the sf10z scale
    assert(AnnIndex.sizedK(4L * 1000 * 1000 * 1000 + 1) == 63246)
    assert(AnnIndex.sizedK(Long.MaxValue) == 65536) // cap
    // writeSized: footer-derived k lands in the stored centroid table
    graft.functions.VectorExprs.register(spark)
    val prefix = "graft_ivf_sized_t"
    Seq(AnnIndex.centTable(prefix), AnnIndex.cellsTable(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val path = s"$sfDir/embeddings.parquet"
      val n = graft.operators.BruteGuard.footerRows(spark, path)
      val u = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
        .select(col("vec_id"), expr("graft_vdiv(v, nrm)").as("u"))
      val k = AnnIndex.writeSized(u, path, prefix,
        nBuckets = 2, iters = 2)
      assert(k == AnnIndex.sizedK(n), s"writeSized chose $k for n=$n")
      assert(spark.table(AnnIndex.centTable(prefix)).count() == k.toLong)
      // every vector landed in exactly one of the k cells
      val cells = spark.table(AnnIndex.cellsTable(prefix))
      assert(cells.count() == u.count())
      assert(cells.agg(max("cell")).head().getInt(0) < k)
    } finally {
      Seq(AnnIndex.centTable(prefix), AnnIndex.cellsTable(prefix))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Caches.release(spark)
    }
  }
}
