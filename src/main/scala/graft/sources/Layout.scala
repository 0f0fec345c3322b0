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

  /** Small-file compaction (r10): rewrite a fragmented parquet
    * directory into ~`targetRowsPerFile`-row files, range-clustered on
    * `sortCol` so each output file covers a contiguous key range
    * (min/max footer stats stay selective — a post-compaction range
    * predicate still skips whole files).
    *
    * This is the maintenance operator every streaming/incremental sink
    * eventually needs: micro-batch and per-partition appends leave
    * thousands of KB-sized files, and at 100 TB the resulting listing +
    * footer + task-schedule overhead dominates scan cost long before
    * the bytes do. Compaction is one range exchange (sampling pass +
    * shuffle) and a rewrite of only the fragmented directory — never a
    * table-wide rewrite; pair with [[overwritePartitions]] to compact
    * partition-by-partition.
    *
    * Publish protocol (LOCAL-FS semantics — this operator targets the
    * local/posix layout path; an object-store deployment would swap the
    * two renames for a manifest commit): rewrite lands complete in
    * `_compacting`, then a double rename via `_pre_compact`. The window
    * between the renames is not atomic for concurrent readers, and a
    * crash inside it strands the data in `_pre_compact` — so entry
    * RECOVERS first: a leftover `_pre_compact` with no live `path` is
    * restored (crash between the renames), a leftover alongside a live
    * `path` is discarded (crash after publish, before cleanup), and any
    * stale `_compacting` from an aborted rewrite is removed.
    *
    * Returns (files_before, files_after). LayoutSpec pins: row-set
    * equality, file-count collapse, per-file key-range disjointness,
    * and both crash-recovery branches. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              sortCol: String, targetRowsPerFile: Long): (Int, Int) = {
    def dataFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    recover(path)
    val before = dataFiles(path).length
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val tmp = path.stripSuffix("/") + "_compacting"
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: the rewrite lands complete before the original moves away
    val fs = new java.io.File(path)
    val bak = new java.io.File(path.stripSuffix("/") + "_pre_compact")
    if (!fs.renameTo(bak))
      sys.error(s"compact: could not move $path aside")
    if (!new java.io.File(tmp).renameTo(fs)) {
      bak.renameTo(fs) // restore
      sys.error(s"compact: could not publish $tmp")
    }
    rm(bak)
    (before, dataFiles(path).length)
  }

  /** Z-order (Morton-curve) layout (r11): cluster a table on the
    * interleaved bit pattern of two quantile-bucketed columns, so the
    * per-file min/max footer stats stay selective on BOTH columns at
    * once. A linear sort gives perfect skipping on its leading column
    * and none on the second; the Z-curve trades a little of the first
    * for real skipping on both — at 100 TB this is the difference
    * between a two-dimensional scan problem (date × customer, region ×
    * price) pruning to a thin band of files or reading the table.
    *
    * Quantization is SCALE-SAFE: per-column bucket bounds come from
    * `approxQuantile` (one pass, driver gets 257 doubles — bounded),
    * the bucket lookup is an in-scan HOF over the broadcast-literal
    * bounds array, and the final placement is ONE range exchange on
    * the z-value + local sort — the epochShards discipline, no global
    * sort. LayoutSpec measures the skipping: both dimensions prune,
    * where the linear-sort baseline's trailing column cannot. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    val Bits = 8 // 256 buckets per dimension → 16-bit z-value
    val probs = (0 to (1 << Bits)).map(_.toDouble / (1 << Bits)).toArray
    // ONE quantile pass covers both dimensions (multi-column overload)
    val allBounds = df.stat.approxQuantile(Array(colA, colB), probs, 0.001)
    def bucket(c: String, bounds: Array[Double])
        : org.apache.spark.sql.Column = {
      // index of the last inner bound ≤ value, clamped to [0, 255]
      val inner = bounds.slice(1, bounds.length - 1)
      least(
        size(filter(
          lit(inner), b => b <= col(c).cast("double"))),
        lit((1 << Bits) - 1)).cast("long")
    }
    val z = (0 until Bits).map { k =>
      (shiftright(col("__ba"), k).bitwiseAND(1) * lit(1L << (2 * k + 1))) +
        (shiftright(col("__bb"), k).bitwiseAND(1) * lit(1L << (2 * k)))
    }.reduce(_ + _)
    df.withColumn("__ba", bucket(colA, allBounds(0)))
      .withColumn("__bb", bucket(colB, allBounds(1)))
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__ba", "__bb", "__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  /** Crash recovery for [[compact]]'s double-rename publish — see its
    * scaladoc for the three branches. Idempotent; safe to call on a
    * clean directory. */
  private[graft] def recover(path: String): Unit = {
    val live = new java.io.File(path)
    val bak = new java.io.File(path.stripSuffix("/") + "_pre_compact")
    val tmp = new java.io.File(path.stripSuffix("/") + "_compacting")
    if (bak.exists()) {
      if (!live.exists()) {
        if (!bak.renameTo(live))
          sys.error(s"compact.recover: could not restore $bak to $path")
      } else rm(bak)
    }
    if (tmp.exists()) rm(tmp)
  }
}
