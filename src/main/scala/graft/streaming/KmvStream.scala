package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Sketches

/** §2.K streaming twin of `d_agg_sketch_union` (r12): the standing
  * distinct-count store as a per-micro-batch KMV fold — each batch's
  * user hashes sketch into `graft_kmv`, merge into the running
  * per-group sketch table via `graft_kmv_union`, and any moment's
  * distinct-user estimate reads from the stored kilobyte sketches
  * through the exact estimator arithmetic of the BATCH entry
  * ([[Sketches.kmvEstimate]] — one implementation, zero twin drift).
  *
  * Unlike the engine-locked sketch stores ([[SketchStream]]'s GK
  * digests), the KMV fold is EXACT under any batching: bottom-k of a
  * union is the bottom-k of per-part bottom-ks, so the streamed store
  * equals the one-shot sketch of everything ever folded — KmvStreamSpec
  * pins that as set equality, not an error bound.
  *
  * Scale notes: the store is ≤ k longs per group at any corpus scale;
  * the per-batch fold is one partial-aggregable sketch + one
  * group-count merge; publish is the [[DriftStream]] stage-then-RENAME
  * discipline with the same crash recovery.
  */
object KmvStream {

  /** Fold one batch of (event_type, user_id) rows into the running
    * sketch table `(event_type, sk array<bigint>)`. Publish/recovery
    * go through the shared [[StoreSwap]] discipline. Unlike the
    * summed-counts drift store, this fold is replay-safe WITHOUT a
    * batchId guard — and deliberately, not by accident: the KMV merge
    * is a set UNION, so re-folding a committed batch is idempotent
    * (union with an already-absorbed sketch changes nothing). */
  private[graft] def foldBatch(s: SparkSession, table: String,
                               batch: DataFrame): Unit = {
    graft.functions.VectorExprs.register(s)
    StoreSwap.recover(s, table)
    val k = Sketches.KmvK
    val sk = batch
      .withColumn("hv", expr(Sketches.lehmerHash("user_id")))
      .groupBy("event_type")
      .agg(expr(s"graft_kmv(hv, $k)").as("sk"))
    val merged =
      if (s.catalog.tableExists(table))
        s.table(table).unionByName(sk)
          .groupBy("event_type")
          .agg(expr(s"graft_kmv_union(sk, $k)").as("sk"))
      else sk
    StoreSwap.publish(s, table, merged)
  }

  /** Start the fold over a stream of (… event_type, user_id …) rows. */
  def start(events: DataFrame, table: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        foldBatch(batch.sparkSession, table, batch.toDF())
      }
      .start()

  /** Read the store: per-group approximate distinct users, the batch
    * entry's exact estimator arithmetic over the stored sketch. */
  def estimate(s: SparkSession, table: String): DataFrame = {
    graft.functions.VectorExprs.register(s)
    StoreSwap.recover(s, table)
    s.table(table)
      .select(col("event_type"),
        expr(Sketches.kmvEstimate("sk")).as("approx_users"))
      .orderBy("event_type")
  }
}
