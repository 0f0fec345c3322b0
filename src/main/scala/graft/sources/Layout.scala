package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Table-layout write path — the operator a user calls to lay data out
  * for the 100 TB claims the scaladocs make (SURVEY §2.N):
  *
  * - `writePartitioned`: directory partitioning on a low-cardinality
  *   column (date, region). Readers with a partition predicate scan
  *   only matching directories — partition pruning shows up as
  *   `PartitionFilters` on the scan, and at 100 TB it is the difference
  *   between reading a day and reading a decade.
  * - `writeBucketed`: hash-bucket (and optionally sort) rows by a join
  *   key into a fixed bucket count, persisted as a table so the bucket
  *   spec survives in the catalog. Two tables bucketed on the same key
  *   with the same count join with NO Exchange on either side — the
  *   shuffle happened once at write time and is amortized over every
  *   subsequent join (LayoutSpec proves the Exchange-free plan over the
  *   written layout).
  *
  * Bucket-count sizing at scale: buckets ≈ table_bytes / 128 MB,
  * rounded to a power of two shared by the tables that join together;
  * partition columns stay low-cardinality (dates, not ids) so the
  * file count stays bounded.
  */
object Layout {

  /** Directory-partitioned parquet at `path`. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Incremental load into a directory-partitioned layout: DYNAMIC
    * partition overwrite rewrites ONLY the partitions present in
    * `batch`, leaving every other partition's files untouched — the
    * idempotent daily-load sink (re-running a day's load converges to
    * the same state instead of duplicating via append). At 100 TB a
    * day's reload touches a day's files, never the decade; LayoutSpec
    * proves untouched partitions keep their exact files and a re-run
    * is a no-op state-wise. */
  def overwritePartitions(batch: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    batch.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed (and bucket-sorted) catalog table. Optional directory
    * partitioning composes with the bucket spec. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, partitionCols: Seq[String] = Nil,
                    sortCols: Seq[String] = Nil): Unit = {
    val base = df.write.mode(SaveMode.Overwrite).format("parquet")
    val withPart =
      if (partitionCols.nonEmpty) base.partitionBy(partitionCols: _*)
      else base
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(bucketCol)
    withPart
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
