package graft

import org.apache.spark.sql.SparkSession

/** Bit-identity harness for the route-then-band family: runs a
  * registry entry twice — plain (whaleRows=∞) and forced-routed
  * (whaleRows=0) — on the given fixture and compares (count,
  * bit_xor(xxhash64(*))) of the FULL output. The whale-fixture gate
  * the routed windows re-run each round. Usage:
  *   runMain graft.HashQ <sfDir> <queryName>...
  */
object HashQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def nh(n: String): (Long, Long) = {
      val r = SparkEntry.queries(n)(spark, sfDir)
        .selectExpr("count(1) AS n", "bit_xor(xxhash64(*)) AS h").head()
      Caches.release(spark)
      (r.getLong(0), r.getLong(1))
    }
    var bad = 0
    for (n <- names) {
      spark.conf.set("spark.graft.window.whaleRows", Long.MaxValue.toString)
      val plain = nh(n)
      spark.conf.set("spark.graft.window.whaleRows", "0")
      val routed = nh(n)
      spark.conf.unset("spark.graft.window.whaleRows")
      val ok = plain == routed
      if (!ok) bad += 1
      println(s"hashq $n plain=$plain routed=$routed " +
        (if (ok) "MATCH" else "MISMATCH"))
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
