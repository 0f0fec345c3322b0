package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge for constructing a DataFrame over a custom logical
  * plan node: in Spark 4 that constructor is
  * `classic.Dataset.ofRows(classic.SparkSession, LogicalPlan)`, scoped
  * `private[sql]` — so the one-line accessor lives in this package
  * (the standard technique for libraries shipping custom LogicalPlan
  * operators; everything else in graft stays outside Spark's
  * namespace).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** A 1-row 1-column DataFrame as a scalar-subquery Column — the lazy
    * way to feed a computed singleton (a Bloom sketch, a count, a
    * percentile cut) into an expression that requires a constant or
    * scalar subquery (e.g. `might_contain`). Nothing executes at
    * construction time; the subquery plans as a separate stage of the
    * consuming query and its result is broadcast into the expression. */
  def scalarSubquery(df: DataFrame): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed))

  /** Free the storage behind a `df.localCheckpoint(true)` or
    * `df.checkpoint(true)` result (the checkpoint pins an RDD, which
    * `Dataset.unpersist` does NOT release — that walks the SQL
    * CacheManager only). Local checkpoints hold block-manager storage
    * (unpersisted here); reliable checkpoints additionally hold a full
    * copy of the frame in the checkpoint dir, which Spark only deletes
    * at application exit — for a standing job that pins per pass
    * (syncOnce batches, per-round CC labels, streaming maintenance)
    * that dir would otherwise grow without bound, so the RDD's
    * checkpoint files are deleted here too. After unpinning, the frame
    * is unreadable (its lineage was cut), so this is strictly an
    * end-of-scope release. No-op on non-checkpointed frames.
    *
    * MUST receive the exact `pin()`/`checkpoint()` RESULT, not a frame
    * derived from it: storage is released only when the plan ROOT is
    * the checkpointed LogicalRDD (ADVICE r17 — a recursive walk would
    * let `unpin(pinned.filter(...))` destroy upstream reliable
    * checkpoint files other consumers still read). A derived frame is
    * a silent no-op, same as any other non-checkpointed frame. */
  def unpin(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        l.rdd.getCheckpointFile.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
        }
      case _ => ()
    }
}
