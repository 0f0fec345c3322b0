package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-key synthetic for the per-key window growth probe (r17,
  * VERDICT r16 item 6): rewrite an orders fixture so ONE customer key
  * holds 1/`hotDenom` of all rows (deterministic hash of the order
  * key — no RNG), keeping every other column untouched. Timing
  * e_window_sliding_avg on two sizes of this shape isolates the
  * per-key sort term: if the hot key's single task dominates, the
  * exponent between the sizes approaches 1 regardless of cluster
  * width. Usage:
  *   runMain graft.SkewGen <inDir> <outDir> [hotDenom=5]
  */
object SkewGen {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    require(new java.io.File(in).getCanonicalPath !=
      new java.io.File(out).getCanonicalPath,
      "SkewGen: in == out would overwrite the input parquet while " +
        "lazily reading it (ADVICE r17); pick a distinct outDir")
    val hotDenom = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$in/orders.parquet")
      .withColumn("o_custkey",
        when(pmod(xxhash64(col("o_orderkey")), lit(hotDenom)) === 0,
          lit(1L)).otherwise(col("o_custkey")))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // Count the INJECTED rows (hash-selected), not every o_custkey==1 —
    // rows whose original key was already 1 would overstate the skew.
    val n = spark.read.parquet(s"$out/orders.parquet")
      .filter(pmod(xxhash64(col("o_orderkey")), lit(hotDenom)) === 0)
      .count()
    println(s"skewgen wrote $out: injected hot-key rows=$n " +
      s"(1/$hotDenom of input)")
    spark.stop()
  }
}
