package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The stored-labels contract of j_dedup_clusters_incremental: the
  * standing cluster table is built once (from stored postings — no
  * base text), and a delta run performs exactly one component pass —
  * the contracted delta one.
  */
class StoredClusterSpec extends SparkSpec {

  test("delta runs read standing labels: one CC pass per run, no base " +
    "re-shingle, documents scanned once (delta split only)") {
    // warm the store + label table (first invocation pays the build)
    SparkEntry.queries("j_dedup_clusters_incremental")(spark, sfDir).count()

    val before = operators.LlmOps.ccRuns.get()
    val df = SparkEntry.queries("j_dedup_clusters_incremental")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val after = operators.LlmOps.ccRuns.get()
    // exactly ONE component run — the contracted delta pass; the base
    // corpus is never re-clustered
    assert(after - before == 1, s"expected 1 CC run, saw ${after - before}")

    // at most one documents.parquet scan reaches the plan — the delta
    // split (zero when CacheManager substitutes the persisted delta
    // postings from the warm-up run); base text never enters the run
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    val docScans = scans.filter(
      _.metadata.get("Location").exists(_.contains("documents.parquet")))
    assert(docScans.size <= 1,
      s"expected <=1 documents scan, saw ${docScans.size}")
  }

  test("stored-label entry matches a from-scratch in-flight computation") {
    import spark.implicits._
    val stored = SparkEntry.queries("j_dedup_clusters_incremental")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // independent recomputation: in-flight base labels + in-flight
    // artifacts, same algebra
    graft.functions.VectorExprs.register(spark)
    val docs = operators.LlmOps.dedupDocs(spark, sfDir)
    val isBase = operators.TextOps.splitBucket(col("doc_id")) < 80
    val baseEx = docs.filter(isBase)
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val basePairs = operators.LlmOps.blockedPairStats(baseEx, 50)
      .filter(col("jac") >= 0.6)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val baseLabels = operators.LlmOps.connectedComponents(basePairs)
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
    val (bp, bs, bd) = operators.LlmOps.baseArtifacts(docs.filter(isBase))
    val deltaPairs = operators.LlmOps.incrementalPairs(
      bp, bs, bd, docs.filter(!isBase), 50, 0.6)
    val inflight = operators.LlmOps.incrementalClusters(baseLabels, deltaPairs)
      .as[(Long, Long)].collect().toMap
    assert(stored == inflight && stored.nonEmpty)
  }
}
