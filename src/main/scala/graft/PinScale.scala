package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B harness for the [[Pin]] strategies (r16, VERDICT r15 ask 4):
  * times the two pin call sites under each `spark.graft.pin.mode` —
  *
  *  - `stages`: the full `j_pipeline_audit` query (4 pinned stage
  *    frames + the one-job ledger) on the given corpus dir;
  *  - `sync`: one `JdbcExec.syncOnce` pass of a k-row lineitem-derived
  *    batch into embedded Derby (the pinned pull feeding isEmpty /
  *    max-cursor / MERGE / DELETE).
  *
  * Scratch profiler, not library surface (ProfileInc convention).
  * Usage: runMain graft.PinScale [dir] [syncRows] [modesCsv] — one
  * mode per invocation gives a fresh JVM per mode (running all three
  * in one session lets JIT/session aging masquerade as mode deltas —
  * measured: whichever mode ran last looked fastest). Results land in
  * SCALE.md §r16.2.
  */
object PinScale {
  def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1z")
    val syncRows = args.lift(1).map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    import graft.sources.JdbcExec
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType),
      StructField("cur", LongType),
      StructField("is_deleted", BooleanType)))

    val modes = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("local", "reliable", "persist"))
    for (mode <- modes) {
      spark.conf.set(Pin.ModeKey, mode)
      for (rep <- 1 to 2) {
        val sec = t {
          SparkEntry.queries("j_pipeline_audit")(spark, dir).collect()
        }
        Caches.release(spark)
        println(f"pinscale stages mode=$mode%-9s dir=$dir rep=$rep $sec%.2f s")
      }
      val batch = Tables.lineitem(spark, dir)
        .select((col("l_orderkey") * lit(10L) + col("l_linenumber")).as("id"),
          col("l_extendedprice").as("amount"),
          (col("l_orderkey") * lit(10L) + col("l_linenumber")).as("cur"),
          (pmod(col("l_orderkey"), lit(20L)) === 0L).as("is_deleted"))
        .limit(syncRows)
      val url = s"jdbc:derby:memory:pin$mode${System.nanoTime};create=true"
      JdbcExec.withConnection(url) { conn =>
        JdbcExec.ensureTable(conn, "pin_tgt", schema, Seq("id"),
          JdbcExec.dialectFor(url))
      }
      val sec = t {
        JdbcExec.syncOnce(spark, url, "pin_tgt", Seq("id"), "pin_state",
          "pin", _ => batch, "cur", "is_deleted", batchSize = 1000)
      }
      println(f"pinscale sync   mode=$mode%-9s dir=$dir rows=$syncRows $sec%.2f s")
    }
    spark.stop()
  }
}
