package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes one `.explain("formatted")` dump per query to
  * `<outDir>/<query>_<suffix>.txt` — the per-round plan evidence files
  * (plans/r19/...) the optimization journal cites. Usage:
  *   scripts_runmain.sh graft.PlanFiles <sfDir> <outDir> <suffix> q1 q2 ...
  * Same session shape as PlanDump (AQE on, as in Verify) so the two
  * evidence surfaces stay comparable.
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).trim
        .linesIterator.map { l =>
          if (l.length > 400) l.take(400) + s"…[${l.length - 400} chars elided]"
          else l
        }.mkString("\n")
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (txt + "\n").getBytes(StandardCharsets.UTF_8))
      println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
