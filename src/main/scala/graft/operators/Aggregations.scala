package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Det._

/** §2.D — aggregations. Each entry returns a totally-ordered DataFrame
  * whose column names match its oracle SQL exactly.
  *
  * Scale notes: all groupBys here are partial-aggregated map-side by
  * Spark (HashAggregate partial → shuffle on group keys → final); group
  * key cardinality is tiny relative to input, so the shuffle volume is
  * the number of groups, not rows — this shape holds at 100 TB.
  */
object Aggregations {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_agg_groupby_q1" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val charge = discPrice * (lit(1) + col("l_tax"))
      l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(discPrice).as("sum_disc_price"),
          dsum(charge).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "d_agg_global" -> { (s, d) =>
      Tables.orders(s, d).agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
    },

    "d_agg_distinct" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          sum_distinct(col("o_custkey")).as("sum_cust"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    "d_agg_having" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Det.dsum(col("c_acctbal")).as("sum_bal"))
        .filter(col("n") > 10)
        .orderBy("c_mktsegment")
    },

    "d_agg_rollup" -> { (s, d) =>
      // via SQL: the DataFrame rollup().agg(grouping(...)) path trips
      // Spark's ambiguous-self-join check on the grouping columns
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("cust_nation_ru")
      s.sql("""
        SELECT n_name, c_mktsegment, count(*) AS n,
          CAST(grouping(n_name) AS INT) AS g_nation,
          CAST(grouping(c_mktsegment) AS INT) AS g_seg
        FROM cust_nation_ru
        GROUP BY ROLLUP (n_name, c_mktsegment)
        ORDER BY g_nation ASC, g_seg ASC,
          n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""")
    },

    "d_agg_cube" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("ym", date_format(col("ts"), "yyyy-MM"))
        .cube("event_type", "ym")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("ym")).cast("int").as("g_ym"))
        .orderBy(asc("g_type"), asc("g_ym"),
          asc_nulls_first("event_type"), asc_nulls_first("ym"))
    },

    "d_agg_grouping_sets" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          ${dsumSql("o_totalprice")} AS sum_price,
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status ASC, g_prio ASC,
          o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    },

    "d_agg_stats" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          r4(var_samp(col("l_quantity"))).as("var_qty"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
          r4(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_qp"))
        .orderBy("l_returnflag")
    },

    // Linear-regression aggregates (r10): slope/intercept/R² of
    // extendedprice on quantity per return flag — the trend-fit shape
    // analytics dashboards push into the engine instead of exporting
    // points. Both engines compute from the same closed-form moment
    // sums; r4 absorbs the last-ulp FP divergence (the d_agg_stats
    // convention). One partial-aggregable groupBy — scale-free.
    "d_agg_regression" -> { (s, d) =>
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          r4(regr_slope(y, x)).as("slope"),
          r4(regr_intercept(y, x)).as("intercept"),
          r4(regr_r2(y, x)).as("r2"),
          r4(regr_avgx(y, x)).as("avg_qty"),
          r4(regr_avgy(y, x)).as("avg_price"))
        .orderBy("l_returnflag")
    },

    // Median + mode (r10): the two order statistics dashboards reach
    // for after mean. Median is the interpolating 0.5-percentile on
    // both engines; mode is stated as a portable argmax (count desc,
    // value asc) rather than the engines' native `mode`, whose
    // tie-breaking is unspecified — determinism wins at the oracle
    // boundary. Cost: one value-count groupBy (partial-aggregable,
    // output is |distinct values| per flag — tiny) + a per-flag
    // row_number over that tiny frame + a 3-row join. The median's
    // sort-based agg is the only corpus-sized stage.
    "d_agg_mode_median" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
      val med = li.groupBy("l_returnflag")
        .agg(r4(median(col("l_quantity"))).as("med_qty"))
      val counts = li.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(desc("n"), asc("l_quantity"))
      val mode = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("n").as("mode_n"))
      med.join(mode, "l_returnflag").orderBy("l_returnflag")
    },

    // Robust statistics (r10): median absolute deviation per return
    // flag — the outlier-resistant dispersion twin of d_agg_stats'
    // stddev. Two sort-based aggregations (the median, then the
    // median of absolute residuals) with a broadcast-sized join of
    // the 3 per-flag medians in between; both engines interpolate the
    // 0.5-percentile identically and r4 absorbs the last ulp.
    "d_agg_mad_robust" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val med = li.groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("m"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(r4(max(col("m"))).as("med_qty"),
          r4(median(abs(col("l_quantity") - col("m")))).as("mad_qty"))
        .orderBy("l_returnflag")
    },

    // Same-day audience overlap (r10): user-days on which BOTH halves
    // of each behavior pair occurred — the exact-set-intersection
    // counting the sketch entries (d_agg_sketch_union) approximate.
    // One pass builds per-(user, day) behavior flags (partial-
    // aggregable), then the three intersections are flag products in
    // a single tiny aggregate; `stack` reshapes the 1×3 result long.
    "d_agg_audience_overlap" -> { (s, d) =>
      Tables.eventsWithNanos(s, d)
        .select(col("user_id"),
          expr("(ts_ns div 1000) div 86400000000").as("day"),
          col("event_type"))
        .groupBy("user_id", "day")
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("p"))
        .agg(sum(col("v") * col("c")).as("vc"),
          sum(col("v") * col("p")).as("vp"),
          sum(col("c") * col("p")).as("cp"))
        .selectExpr("""stack(3,
          'click_and_purchase', cp,
          'view_and_click', vc,
          'view_and_purchase', vp) AS (pair, n_user_days)""")
        .select(col("pair"), col("n_user_days").cast("long")
          .as("n_user_days"))
        .orderBy("pair")
    },

    // Boolean aggregate family (r10): every/some/count_if — the
    // assertion-style aggregates a data-quality rule engine compiles
    // to ("EVERY order above the floor", "ANY whale present").
    // Partial-aggregable short-circuiting AND/OR trees; booleans
    // serialize identically on both engines.
    "d_agg_bool" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_whale"),
          count_if(col("o_orderstatus") === "F").as("n_f"))
        .orderBy("o_orderpriority")
    },

    // Gini concentration (r10): revenue-inequality coefficient per
    // market segment from the rank formulation
    // G = 2·Σ(i·vᵢ)/(n·Σvᵢ) − (n+1)/n over ascending-ranked customer
    // revenues — the concentration metric behind "is this segment
    // whale-driven". Both moment sums go through exact decimals (the
    // ranks are integers, the revenues exact 2-decimal sums), so the
    // double division at the end is identical on both engines. One
    // customer-level aggregation + one rank window per segment.
    "d_agg_gini" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
        .agg(Det.dsum(col("o_totalprice")).as("v"))
      val w = Window.partitionBy("seg").orderBy(asc("v"), asc("c_custkey"))
      rev.withColumn("i", row_number().over(w))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          sum((col("i") * col("v")).cast(DecimalType(24, 6)))
            .cast(DoubleType).as("s1"),
          sum(col("v").cast(DecimalType(20, 6)))
            .cast(DoubleType).as("s2"))
        .select(col("seg"),
          r4(lit(2.0) * col("s1") / (col("n") * col("s2")) -
            (col("n") + lit(1.0)) / col("n")).as("gini"),
          col("n").as("n_customers"))
        .orderBy("seg")
    },

    // Equi-width histogram (r10): 20 fixed $25k buckets over order
    // totalprice, top bucket open — the distribution profile behind
    // every dashboard histogram, stated as pure integer bucket
    // arithmetic (floor of a double division is deterministic on both
    // engines) so it partial-aggregates: the shuffle carries ≤20 rows
    // per map partition at any scale, unlike a sort-based percentile.
    "d_agg_histogram" -> { (s, d) =>
      Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / 25000.0), lit(19.0))
          .cast("long").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .withColumn("lo", col("bucket") * 25000L)
        .orderBy("bucket")
    },

    // Exact interpolating percentile (sort-based agg on both engines).
    "d_agg_percentile" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          r4(expr("percentile(l_quantity, 0.5)")).as("p50_qty"),
          r4(expr("percentile(l_quantity, 0.9)")).as("p90_qty"))
        .orderBy("l_returnflag")
    },

    // HLL sketch — no oracle (non-deterministic across engines);
    // ScalaTest bounds it to exact ±5%.
    "d_agg_approx_distinct" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    },

    // Mergeable distinct-count sketches as a STORED artifact (§2.Q):
    // one Datasketches HLL per (event_type, day), then any window's
    // distinct-user estimate is a UNION of day sketches — the
    // incremental-stats production pattern, where the daily ETL
    // appends kilobyte sketches and dashboards never rescan history.
    // approx_count_distinct answers one question per scan; the sketch
    // TABLE answers every date-range question from stored bytes.
    // Declared no-oracle (DuckDB has no Datasketches HLL);
    // AggregationsSpec gates it: union-of-daily == one-shot sketch
    // estimate EXACTLY (merge correctness), and within 5% of exact.
    "d_agg_sketch_union" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy("event_type", "day")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      daily.groupBy("event_type")
        .agg(expr(
          "cast(hll_sketch_estimate(hll_union_agg(sk, false)) as bigint)")
          .as("approx_users"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    },

    // Mergeable quantile sketches as a STORED artifact (§2.Q): the
    // percentile twin of d_agg_sketch_union — one GK digest per
    // (event_type, day) in a binary column, any date range's p50/p95
    // answered by unioning day sketches (graft_qsketch_union) and
    // querying (graft_qsketch_q). Kilobytes of stored state replace a
    // raw-value re-scan; the ±ε·n rank guarantee survives every
    // merge. No oracle (sketch internals are merge-order dependent);
    // LlmOpsSpec bounds union estimates against exact percentiles and
    // pins the one-shot digest's error too.
    "d_agg_quantile_sketch_union" -> { (s, d) =>
      graft.functions.VectorExprs.register(s)
      val daily = Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy("event_type", "day")
        .agg(expr("graft_qsketch(cast(value as double), 1000)").as("sk"))
      daily.groupBy("event_type")
        .agg(expr("graft_qsketch_q(graft_qsketch_union(sk), 0.5d)")
          .as("p50_approx"),
          expr("graft_qsketch_q(graft_qsketch_union(sk), 0.95d)")
            .as("p95_approx"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    },

    // Greenwald–Khanna quantile sketch (percentile_approx) — the
    // mergeable one-pass quantile path for 100 TB (exact percentile
    // needs a full sort per group). No oracle (DuckDB's approx_quantile
    // is a t-digest, a different sketch); ScalaTest bounds it against
    // the exact percentile within the sketch's rank error.
    "d_agg_approx_percentile" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000))
            .as("p90_approx"))
        .orderBy("l_returnflag")
    },

    "d_agg_collect_sorted" -> { (s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(sort_array(collect_list(col("s_name"))), ",")
          .as("suppliers"),
          count(lit(1)).as("n_supp"))
        .orderBy("n_name")
    },

    // Conditional/boolean aggregates: count_if, bool_and/bool_or, and
    // the conditional-max CASE pattern — all deterministic (no
    // any_value/first, which are partition-order dependent).
    "d_agg_conditional" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_orderstatus") === "F").as("any_final"),
          max(when(col("o_orderstatus") === "O", col("o_totalprice")))
            .as("max_open"))
        .orderBy("o_orderpriority")
    }
  )

  val oracles: Map[String, String] = Map(
    "d_agg_groupby_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "d_agg_global" ->
      s"""SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
         |  ${dsumSql("o_totalprice")} AS sum_price, count(*) AS n
         |FROM orders""".stripMargin,

    "d_agg_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  CAST(sum(DISTINCT o_custkey) AS BIGINT) AS sum_cust,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "d_agg_having" ->
      s"""SELECT c_mktsegment, count(*) AS n,
         |  ${Det.dsumSql("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY c_mktsegment
         |HAVING count(*) > 10
         |ORDER BY c_mktsegment""".stripMargin,

    "d_agg_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n,
        |  CAST(grouping(n_name) AS INT) AS g_nation,
        |  CAST(grouping(c_mktsegment) AS INT) AS g_seg
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY g_nation ASC, g_seg ASC,
        |  n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,

    "d_agg_cube" ->
      s"""SELECT event_type, strftime(ts, '%Y-%m') AS ym, count(*) AS n,
         |  ${dsumSql("value")} AS sum_value,
         |  CAST(grouping(event_type) AS INT) AS g_type,
         |  CAST(grouping(strftime(ts, '%Y-%m')) AS INT) AS g_ym
         |FROM events
         |GROUP BY CUBE (event_type, strftime(ts, '%Y-%m'))
         |ORDER BY g_type ASC, g_ym ASC,
         |  event_type ASC NULLS FIRST, ym ASC NULLS FIRST""".stripMargin,

    "d_agg_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  ${dsumSql("o_totalprice")} AS sum_price,
         |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
         |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY g_status ASC, g_prio ASC,
         |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "d_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "d_agg_regression" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "d_agg_mode_median" ->
      """WITH med AS (
        |  SELECT l_returnflag, round(median(l_quantity), 4) AS med_qty
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |m AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY n DESC, l_quantity ASC) AS rn
        |  FROM c)
        |SELECT med.l_returnflag, med.med_qty, m.mode_qty, m.mode_n
        |FROM med JOIN m ON med.l_returnflag = m.l_returnflag AND m.rn = 1
        |ORDER BY med.l_returnflag""".stripMargin,

    "d_agg_mad_robust" ->
      """WITH med AS (
        |  SELECT l_returnflag, median(l_quantity) AS m
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  round(max(med.m), 4) AS med_qty,
        |  round(median(abs(l.l_quantity - med.m)), 4) AS mad_qty
        |FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "d_agg_audience_overlap" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        |  FROM events GROUP BY user_id, day)
        |SELECT 'click_and_purchase' AS pair,
        |  CAST(sum(c * p) AS BIGINT) AS n_user_days FROM u
        |UNION ALL SELECT 'view_and_click', CAST(sum(v * c) AS BIGINT)
        |FROM u
        |UNION ALL SELECT 'view_and_purchase', CAST(sum(v * p) AS BIGINT)
        |FROM u
        |ORDER BY pair""".stripMargin,

    "d_agg_bool" ->
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_whale,
        |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
        |    AS n_f
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "d_agg_gini" ->
      """WITH rev AS (
        |  SELECT c_mktsegment AS seg, c_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY seg, c_custkey),
        |rk AS (
        |  SELECT seg, v,
        |    row_number() OVER (PARTITION BY seg ORDER BY v, c_custkey)
        |      AS i,
        |    count(*) OVER (PARTITION BY seg) AS n
        |  FROM rev)
        |SELECT seg,
        |  round(2.0 * CAST(SUM(CAST(i * v AS DECIMAL(24,6))) AS DOUBLE)
        |    / (max(n) * CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE))
        |    - (max(n) + 1.0) / max(n), 4) AS gini,
        |  CAST(max(n) AS BIGINT) AS n_customers
        |FROM rk GROUP BY seg ORDER BY seg""".stripMargin,

    "d_agg_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 25000.0), 19.0) AS BIGINT)
        |    AS bucket,
        |  count(*) AS n,
        |  CAST(least(floor(o_totalprice / 25000.0), 19.0) AS BIGINT)
        |    * 25000 AS lo
        |FROM orders
        |GROUP BY 1, 3 ORDER BY bucket""".stripMargin,

    "d_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "d_agg_collect_sorted" ->
      """SELECT n_name,
        |  string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
        |  count(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "d_agg_conditional" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_totalprice > 200000) AS n_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'F') AS any_final,
        |  max(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)
        |    AS max_open
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
