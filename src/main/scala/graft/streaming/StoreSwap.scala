package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The standing-store publish discipline shared by every foreachBatch
  * fold that replaces a table it also reads ([[DriftStream]],
  * [[KmvStream]]; factored out by the r12 review — two verbatim
  * copies of crash-recovery logic drift apart the first time only one
  * is fixed):
  *
  *  - [[publish]]: stage the replacement as `<table>_next` (ONE write)
  *    → drop the live table → metadata RENAME. The only unsafe window
  *    leaves `_next` complete and the live table missing.
  *  - [[recover]]: finish a stranded swap by renaming `_next` into
  *    place. With the live table present, a leftover `_next` is a
  *    not-yet-committed batch's write and is discarded by the next
  *    publish's reset.
  *
  * `DedupArtifacts.reset` (not bare DROP TABLE) also clears stale
  * warehouse DIRECTORIES a previous JVM left behind.
  */
private[graft] object StoreSwap {

  def recover(s: SparkSession, table: String): Unit = {
    val tmp = table + "_next"
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(tmp))
      s.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  def publish(s: SparkSession, table: String, replacement: DataFrame): Unit = {
    val tmp = table + "_next"
    graft.operators.DedupArtifacts.reset(s, tmp)
    replacement.write.format("parquet").saveAsTable(tmp)
    graft.operators.DedupArtifacts.reset(s, table)
    s.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }
}
