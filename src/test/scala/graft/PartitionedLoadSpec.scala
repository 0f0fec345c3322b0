package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.PartitionedLoad

case class LoadRow(event_id: Long, day: String, value: Double)

/** Replay-safe streaming load: micro-batches land via dynamic
  * partition overwrite, so a replayed batch converges instead of
  * double-appending — the exactly-once composition the dedup/cluster
  * streams document as their staging recommendation.
  */
class PartitionedLoadSpec extends SparkSpec {
  import spark.implicits._

  test("streamed partitioned load is idempotent under batch replay " +
    "and leaves other partitions' files untouched") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-load").toString
    val b1 = Seq(LoadRow(1, "2024-01-01", 1.0), LoadRow(2, "2024-01-01", 2.0),
      LoadRow(3, "2024-01-02", 3.0))
    val b2 = Seq(LoadRow(4, "2024-01-03", 4.0))
    val input = MemoryStream[LoadRow]
    val q = PartitionedLoad.start(input.toDF(), dir, Seq("day"))
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    def files(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val day1Before = files("2024-01-01")
    assert(spark.read.parquet(dir).count() == 4)

    // crash-replay of batch 2: a restarted query re-delivers the same
    // batch — the overwrite must converge, not append
    graft.sources.Layout.overwritePartitions(
      b2.toDF(), dir, Seq("day"))
    val after = spark.read.parquet(dir)
    assert(after.count() == 4)
    assert(after.filter(col("day") === "2024-01-03").count() == 1)
    // partitions not in the replayed batch kept their exact files
    assert(files("2024-01-01") == day1Before)
  }
}
