package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.K — streaming semantics, batch twins. Spark's unified model makes
  * each windowed aggregation below byte-identical code in a
  * `readStream` pipeline; StreamingSpec proves the same expressions run
  * under MemoryStream with watermarks (SURVEY §2.K).
  *
  * Scale notes: tumbling/sliding windows shuffle on (window, key) with
  * map-side partial aggregation; session windows keep per-user state in
  * the state store keyed by watermark — the 30-min gap bounds state
  * retention. Late data beyond the watermark is dropped (tested in
  * StreamingSpec, not oracled — DuckDB has no watermark notion).
  */
object StreamingOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 1h tumbling window × event_type.
    "k_window_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("ws", "event_type")
    },

    // 1h window sliding every 15m: each event lands in 4 windows.
    "k_window_sliding" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"))
        .orderBy("ws", "event_type")
    },

    // Per-user sessions with 30-minute inactivity gap. Emits min/max
    // event ts (engine-neutral) rather than the half-open window end.
    // Boundary convention (r16 — found by the fuzz gap-==-threshold
    // probe): native session_window MERGES touching sessions — an
    // event at exactly prev+gap extends the session; the cut fires
    // only at gap > 30 min. The SQL twin mirrors that (strict >).
    // The manual sessionizer in e_funnel_sessions cuts at >= gap —
    // each pair is internally consistent and pinned by its own twin.
    "k_window_session" -> { (s, d) =>
      Tables.eventsWithNanos(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"),
          min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
        .select("user_id", "first_us", "last_us", "n")
        .orderBy("user_id", "first_us")
    },

    // Batch twin of dropDuplicatesWithinWatermark: deterministic
    // keep-min-event_id per (user, type, minute) key.
    "k_stream_dedup" -> { (s, d) =>
      Tables.eventsWithNanos(s, d)
        .withColumn("minute_us",
          expr("(ts_ns div 60000000000) * 60000000"))
        .groupBy("user_id", "event_type", "minute_us")
        .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n_in_key"))
        .orderBy("user_id", "event_type", "minute_us")
    },

    // Stream-stream interval join, batch twin: view→purchase
    // attribution per user within 1 hour. The equi-key (user_id)
    // carries the shuffle; the time band is a post-join range filter —
    // under readStream the same join runs with watermarks on both
    // sides and the band bounds each side's state retention
    // (StreamingSpec proves streaming/batch parity).
    "k_stream_join" -> { (s, d) =>
      val e = Tables.eventsWithNanos(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts_us").as("view_us"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts_us").as("buy_us"))
      views.join(buys, col("user_id") === col("b_user") &&
          col("buy_us") >= col("view_us") &&
          col("buy_us") <= col("view_us") + 3600000000L)
        .select("user_id", "view_id", "buy_id", "view_us", "buy_us")
        .orderBy("user_id", "view_id", "buy_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "k_window_tumbling" ->
      s"""SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
         |    '%Y-%m-%d %H:%M:%S') AS ws,
         |  event_type, count(*) AS n, ${Det.dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "k_window_sliding" ->
      """WITH slid AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL 15 MINUTES, ts)
        |      - k.k * INTERVAL 15 MINUTES AS ws
        |  FROM events, (SELECT unnest([0,1,2,3]) AS k) k)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type,
        |  count(*) AS n
        |FROM slid GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    // merge-on-touch twin (strict = false): an event at exactly
    // last+gap extends — matching native session_window above, NOT
    // e_funnel_sessions' >= cut (see graft.SessionBounds).
    "k_window_session" ->
      s"""WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY epoch_us(ts))
        |      ${graft.SessionBounds.sqlCut(strict = false)} THEN 1
        |      ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(ts_us) AS first_us, max(ts_us) AS last_us,
        |  count(*) AS n
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, first_us""".stripMargin,
    "k_stream_dedup" ->
      """SELECT user_id, event_type,
        |  (epoch_us(ts) // 60000000) * 60000000 AS minute_us,
        |  min(event_id) AS keep_id, count(*) AS n_in_key
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, minute_us""".stripMargin,
    "k_stream_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |v AS (
        |  SELECT user_id, event_id AS view_id, ts_us AS view_us
        |  FROM e WHERE event_type = 'view'),
        |b AS (
        |  SELECT user_id, event_id AS buy_id, ts_us AS buy_us
        |  FROM e WHERE event_type = 'purchase')
        |SELECT v.user_id AS user_id, view_id, buy_id, view_us, buy_us
        |FROM v JOIN b ON v.user_id = b.user_id
        | AND buy_us >= view_us AND buy_us <= view_us + 3600000000
        |ORDER BY v.user_id, view_id, buy_id""".stripMargin
  )
}
