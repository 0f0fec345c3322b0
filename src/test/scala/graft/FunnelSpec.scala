package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** e_funnel_sessions on planted data: the fixture's random events
  * almost never complete view→click→purchase inside one session, so
  * the oracle compare exercises stages 0–2 only; this spec plants a
  * full funnel, an out-of-ORDER session (purchase before view — must
  * NOT count), and a session-boundary split (funnel straddling a
  * 30-min gap — must NOT count) to pin stage 3 and the ordering
  * semantics.
  */
class FunnelSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw nanos (unannotated INT64)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("planted funnels: complete in-order = stage 3; wrong order and " +
    "gap-split sessions never reach it") {
    import scala.jdk.CollectionConverters._
    val base = 1704067200000000000L // 2024-01-01T00:00Z in ns
    val m = 60000000000L           // one minute in ns
    def ev(id: Long, user: Long, offMin: Long, t: String) =
      Row(id, base + offMin * m, user, t, 1.0, """{"k": 1}""")
    val rows = Seq(
      // user 1: clean funnel inside one session → stage 3
      ev(1, 1, 0, "view"), ev(2, 1, 5, "click"), ev(3, 1, 10, "purchase"),
      // user 2: purchase FIRST, then view, then click → stage 2 only
      ev(4, 2, 0, "purchase"), ev(5, 2, 5, "view"), ev(6, 2, 10, "click"),
      // user 3: view, then a 40-min gap cuts the session before the
      // click+purchase → first session stage 1, second session stage 0
      ev(7, 3, 0, "view"), ev(8, 3, 40, "click"), ev(9, 3, 45, "purchase"),
      // user 4: click before view, purchase after view but no click
      // after the view → stage 1
      ev(10, 4, 0, "click"), ev(11, 4, 5, "view"), ev(12, 4, 10, "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel")
      .toString
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("e_funnel_sessions")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)))
      .toSeq
    assert(out == Seq((1L, 3), (2L, 2), (3L, 1), (3L, 0), (4L, 1)),
      out.toString)
  }
}
