package graft
import org.apache.spark.sql.SparkSession

/** Isolated steady-state FLOORS for named queries under the BENCH's
  * exact session shape (r20, VERDICT r19 item 5): master
  * `local[$SPARK_GRAFT_CPUS]`, shuffle partitions min(cpus, 8), AQE on
  * — unlike TimeQ (fixed local[32], AQE off), so numbers here are
  * comparable to the `floors` map the driver reads from Bench's JSON.
  * Protocol per query: min over SPARK_GRAFT_FLOOR_PASSES (default 3)
  * `.count()` passes, then Caches.release — timeQN inlined.
  *
  * Usage: scripts_runmain.sh graft.FloorQ <sfDir> <query> [query ...]
  * (measurement tooling only — never on the driver's timed path).
  */
object FloorQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.min(cpus.toInt, 8).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        (sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1").toString)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    spark.range(1000).selectExpr("sum(id)").collect()
    // replicate Bench's fixture-table pin (Bench.scala:79): the
    // driver's floors are measured with the hot-table cache in place,
    // so comparable numbers need the same InMemoryRelation
    // substitution. SPARK_GRAFT_PIN=0 for the cold-scan variant.
    if (sys.env.getOrElse("SPARK_GRAFT_PIN", "1") == "1") {
      Seq(Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
        Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
        Tables.part(spark, sfDir), Tables.orders(spark, sfDir),
        Tables.lineitem(spark, sfDir), Tables.documents(spark, sfDir),
        Tables.embeddings(spark, sfDir), Tables.events(spark, sfDir),
        Tables.eventsWithNanos(spark, sfDir))
        .foreach { df => df.cache(); df.count() }
    }
    val passes = sys.env.getOrElse("SPARK_GRAFT_FLOOR_PASSES", "3").toInt
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      Caches.release(spark)
      println(f"floorq cpus=$cpus $n%-28s floor=${ts.min}%.3f s  " +
        s"passes=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
