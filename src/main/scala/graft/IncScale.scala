package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AnnOps, DedupArtifacts, LlmOps, TextOps}

/** Scaling experiment for the round-6 stored/incremental family, run
  * against a ScaleGen corpus:
  *
  *   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sfx10 10"
  *   sbt "runMain graft.IncScale /tmp/sfx10"
  *
  * Measures (a) the one-time store builds (the amortized cost), (b) a
  * delta batch deduped against the STORED artifacts vs the same batch
  * with the base re-shingled in-flight — the claim under test is that
  * the stored path removes the corpus-sized work from the per-batch
  * loop, so its advantage must GROW with corpus size — (c) the
  * survivors' append, and (d) the incremental ANN search against the
  * stored index. Results recorded in SCALE.md §"Measured scaling".
  */
object IncScale {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfx10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)
    // layout sized to the corpus: 8 buckets capped every bucket-local
    // stage at 8 tasks on this 32-core session (measured 1.3× slower
    // than in-flight at 10×; the knob is the fix, not a bigger default
    // — the fixture SFs stay at 8)
    spark.conf.set("spark.graft.store.buckets", "32")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"IncScale $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // the production shape: a SMALL crawl batch against a LARGE
    // standing corpus (98/2 id-bucket split — the fixture entries'
    // 80/20 split makes the delta-driven verify stage dominate and
    // hides the base-side cost this experiment isolates)
    val docs = LlmOps.dedupDocs(spark, d)
    val isBase = TextOps.splitBucket(col("doc_id")) < 98
    val base = docs.filter(isBase).select("doc_id", "text")
    val delta = docs.filter(!isBase).select("doc_id", "text")
    println(s"IncScale corpus: ${docs.count()} docs " +
      s"(${delta.count()} delta), ${Tables.embeddings(spark, d).count()} vectors")

    // one-time store builds (amortized over every later batch)
    val prefix = "graft_incscale"
    Seq(DedupArtifacts.postTable(prefix), DedupArtifacts.sizesTable(prefix),
      DedupArtifacts.dfTable(prefix), LlmOps.clusterTable(prefix))
      .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
    t("dedup store build (one-time base shingle + bucket)") {
      DedupArtifacts.write(base, prefix, nBuckets = 32)
    }
    t("ann index build (one-time sample+Lloyd + bucket)") {
      AnnOps.storedIndexPrefix(spark, d)
    }

    // per-batch loop: stored vs in-flight
    val stored = t("delta dedup vs STORED artifacts") {
      val (bp, bs, bd) = DedupArtifacts.read(spark, prefix)
      val dups = LlmOps.incrementalDedup(bp, bs, bd, delta,
        LlmOps.dedupDfCutoff(spark), LlmOps.cascadeTau(spark))
        .localCheckpoint(true)
      println(s"IncScale stored-run dups: ${dups.count()}")
      dups
    }
    Caches.release(spark)
    t("delta dedup IN-FLIGHT (base re-shingled per batch)") {
      val (bp0, bs, bd) = LlmOps.baseArtifacts(base)
      val bp = Caches.persisted(bp0)
      val n = LlmOps.incrementalDedup(bp, bs, bd, delta,
        LlmOps.dedupDfCutoff(spark), LlmOps.cascadeTau(spark)).count()
      println(s"IncScale in-flight dups: $n")
    }
    Caches.release(spark)
    // the corpus-sized work in-flight repeats every batch and the
    // store amortizes to once: shingle-explode the standing corpus and
    // aggregate its df
    t("in-flight base tax alone (shingle + df over the standing corpus)") {
      val (bp0, _, bd) = LlmOps.baseArtifacts(base)
      val bp = Caches.persisted(bp0)
      println(s"IncScale base postings: ${bp.count()}, df keys: ${bd.count()}")
    }
    Caches.release(spark)
    // incremental clustering: one-time label build over the stored
    // postings, then the per-batch contracted-component fold — the
    // claim is the same as dedup's: per-batch cost tracks the DELTA
    t("cluster label build (one-time components over stored postings)") {
      LlmOps.buildStoredLabels(spark, prefix,
        LlmOps.dedupDfCutoff(spark), LlmOps.cascadeTau(spark))
    }
    t("delta clusters vs STORED labels (contracted components)") {
      val (bp, bs, bd) = DedupArtifacts.read(spark, prefix)
      val pairs = LlmOps.incrementalPairs(bp, bs, bd, delta,
        LlmOps.dedupDfCutoff(spark), LlmOps.cascadeTau(spark))
      val out = LlmOps.incrementalClusters(
        spark.table(LlmOps.clusterTable(prefix)), pairs)
      println(s"IncScale clustered delta docs: ${out.count()}")
    }
    Caches.release(spark)
    t("append survivors' artifacts (bucketed insert, no re-shuffle)") {
      DedupArtifacts.append(spark, prefix, delta, stored)
    }

    // incremental ANN: standing centroids, merged-list search
    t("ann delta search vs STORED index (exact candidates)") {
      println("IncScale ann rows: " +
        SparkEntry.queries("j_ann_incremental")(spark, d).count())
    }
    Caches.release(spark)
    t("ann delta search vs STORED index (int8 candidates + re-rank)") {
      println("IncScale ann pq rows: " +
        SparkEntry.queries("j_ann_incremental_pq")(spark, d).count())
    }
    Caches.release(spark)
    spark.stop()
  }
}
