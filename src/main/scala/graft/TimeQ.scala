package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc session conf for A/B runs, e.g.
    // SPARK_GRAFT_CONF=spark.graft.ann.broadcastRowLimit=0
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    spark.range(1000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_CONSUME=hash forces FULL evaluation of every output
    // column (sum(xxhash64(*)) can prune nothing — count(xxhash64(*))
    // would NOT work: count of a non-nullable expression rewrites to
    // count(1) and prunes everything again) — plain count() lets
    // Catalyst drop unused window/projection expressions, so a
    // projection-only entry times as a parquet metadata count (r16:
    // the e_window_* "negative exponents" were exactly that).
    val consume = sys.env.getOrElse("SPARK_GRAFT_CONSUME", "count")
    def action(df: org.apache.spark.sql.DataFrame): Long = consume match {
      case "hash" =>
        // bit_xor, not sum: long-sum of hashes overflows under ANSI
        df.selectExpr("count(1) AS n", "bit_xor(xxhash64(*)) AS h")
          .head().getLong(0)
      case _ => df.count()
    }
    for (rep <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      val c = action(SparkEntry.queries(n)(spark, sfDir))
      println(f"timeq rep=$rep $n%-28s ${(System.nanoTime()-t0)/1e9}%.3f s  rows=$c")
    }
    spark.stop()
  }
}
