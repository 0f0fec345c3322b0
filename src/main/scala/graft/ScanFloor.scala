package graft

import org.apache.spark.sql.SparkSession

/** Output-hash floor control for the exponent sweeps: times
  * scan + xxhash64-fold of a table's columns — the cost ANY
  * hash-consumed full-output query pays before doing its own work, so
  * window-op exponents can be attributed between operator growth and
  * linear output hashing. Usage:
  *   runMain graft.ScanFloor <sfDir> <table>...
  */
object ScanFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tables = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (rep <- 1 to 3; t <- tables) {
      val t0 = System.nanoTime()
      val n = spark.read.parquet(s"$sfDir/$t.parquet")
        .selectExpr("count(1) AS n", "bit_xor(xxhash64(*)) AS h")
        .head().getLong(0)
      println(f"scanfloor rep=$rep $t%-12s ${(System.nanoTime - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
