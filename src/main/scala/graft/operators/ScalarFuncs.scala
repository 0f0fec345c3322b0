package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.H — scalar function surface (string / date / math / conditional /
  * array / map / json / struct). This is the type-mapping layer of the
  * reference ETL (SURVEY §1.1): every Salesforce field transform it
  * performs is one of these expression families.
  *
  * Scale notes: all pure projections — narrow transformations, no
  * shuffle except the final presentation orderBy; everything stays
  * inside whole-stage codegen (built-in functions only, no UDFs).
  * Array outputs are flattened to strings so the oracle hash compare is
  * engine-neutral (map/list hashing differs across engines).
  */
object ScalarFuncs {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h_string_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_up"),
          lower(col("c_name")).as("name_lo"),
          trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("seg_trim"),
          substring(col("c_name"), 10, 5).as("name_sub"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
          length(col("c_name")).as("name_len"),
          lpad(col("c_custkey").cast(StringType), 10, "0").as("key_pad"),
          regexp_replace(col("c_name"), "0+", "0").as("name_squeeze"),
          regexp_extract(col("c_name"), "#(\\d+)", 1).as("name_digits"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_part"))
        .orderBy("c_custkey")
    },

    "h_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(date_trunc("month", col("o_orderdate")),
            "yyyy-MM-dd").as("month_start"),
          date_add(col("o_orderdate"), 30).as("plus30"),
          datediff(lit("2002-01-01").cast(DateType),
            col("o_orderdate")).as("days_to_2002"),
          last_day(col("o_orderdate")).as("month_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          to_date(col("o_orderdate")).as("odate"))
        .orderBy("o_orderkey")
    },

    "h_math_funcs" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // decimal-round: well-defined HALF_UP on both engines (double
          // round at a .x5 boundary is representation-dependent)
          round(col("l_extendedprice").cast(DecimalType(18, 2)), 1).as("price_r1"),
          abs(col("l_discount") - 0.05).as("disc_abs"),
          ceil(col("l_quantity")).as("qty_ceil"),
          floor(col("l_quantity") / 7).as("qty_div7"),
          // squared via IEEE MULTIPLY, not pow() (r15 FUZZ find: JVM
          // Math.pow(x,2) and libm pow disagree by 1 ulp at |x²|≥4e12,
          // past r4's identity cutoff — x*x is correctly rounded and
          // identical on both engines at any magnitude)
          Det.r4(col("l_quantity") * col("l_quantity")).as("qty_sq"),
          Det.r4(sqrt(col("l_extendedprice"))).as("price_sqrt"),
          Det.r4(log(col("l_extendedprice"))).as("price_ln"),
          Det.r4(log10(col("l_extendedprice"))).as("price_log10"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
          signum(col("l_discount") - 0.05).as("disc_sign"))
        // (l_orderkey, l_linenumber) is not unique: total-order over a
        // column set that determines every output
        .orderBy("l_orderkey", "l_linenumber", "price_sqrt", "qty_sq",
          "disc_abs", "disc_sign")
    },

    "h_conditional" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 40000, "high")
            .when(col("o_totalprice") > 20000, "mid")
            .otherwise("low").as("tier"),
          coalesce(nullif(col("o_orderstatus"), lit("P")),
            lit("PENDING")).as("status_c"),
          greatest(col("o_totalprice"), lit(1000.0)).as("price_floor"),
          least(col("o_totalprice"), lit(50000.0)).as("price_cap"))
        .orderBy("o_orderkey")
    },

    "h_array_funcs" -> { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).as("n_tok"),
          array_contains(toks, "key").as("has_key"),
          size(array_distinct(toks)).as("n_distinct"),
          array_join(slice(sort_array(toks), 1, 3), " ").as("first3_sorted"),
          size(filter(toks, t => length(t) > 4)).as("n_long"),
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("sum_len"))
        .orderBy("doc_id")
    },

    "h_explode_posexplode" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos1"), col("col").as("token"))
        .orderBy("doc_id", "pos1")
    },

    // MapType demonstrated in-plan (map_from_entries / map_keys); the
    // oracled output is the engine-neutral projection: sorted
    // "type:count" entries joined to one string per user.
    "h_map_funcs" -> { (s, d) =>
      val counts = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      counts
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("cnt"))))).as("m"))
        .select(
          col("user_id"),
          array_join(transform(map_keys(col("m")),
            k => concat(k, lit(":"), element_at(col("m"), k))), ",").as("entries"),
          size(map_keys(col("m"))).as("n_types"))
        .orderBy("user_id")
    },

    "h_json_funcs" -> { (s, d) =>
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"),
          from_json(col("props"), schema).getField("k").as("k_struct"),
          to_json(from_json(col("props"), schema)).as("json_rt"))
        .orderBy("event_id")
    },

    // Map-typed operator (VERDICT r8 stretch #9): unlike h_map_funcs'
    // string_agg projection, the computation here flows through a real
    // in-plan MapType — map_from_entries → map_entries → element_at —
    // but the ORACLED output serializes the entries array via to_json
    // (`[{"key":"click","value":3},…]`) because the driver's pandas
    // compare lexsorts over all columns and Categorical(list) raises on
    // nested python values (CORRECTNESS_r09: h_map_funcs_typed err).
    // The typed ARRAY<STRUCT<key,value>> frame itself stays pinned in
    // ScalarFuncsTypedSpec; DuckDB's to_json emits the byte-identical
    // string for the same ordered structs.
    "h_map_funcs_typed" -> { (s, d) =>
      val counts = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      counts
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("cnt"))))).as("m"))
        .select(
          col("user_id"),
          to_json(sort_array(map_entries(col("m")))).as("entries"),
          element_at(col("m"), "click").as("click_cnt"),
          size(col("m")).as("n_types"))
        .orderBy("user_id")
    },

    "h_struct_nested" -> { (s, d) =>
      Tables.orders(s, d)
        .select(struct(col("o_orderkey"), col("o_totalprice")).as("s"))
        .orderBy(desc("s.o_totalprice"), asc("s.o_orderkey"))
        .select(col("s.o_orderkey").as("okey"), col("s.o_totalprice").as("price"))
        .limit(500)
    },

    // Wide→long unpivot (melt): the schema-normalization shape used
    // when flattening Salesforce compound fields into EAV rows.
    "h_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        // duplicate (okey, linenumber) pairs exist: include val
        .orderBy("l_orderkey", "l_linenumber", "measure", "val")
    },

    // Bitwise algebra (band extraction, flag masks, popcount — the
    // primitives behind SimHash banding, surfaced as an operator).
    "h_bitwise_funcs" -> { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          col("event_id").bitwiseAND(lit(255L)).as("band"),
          col("event_id").bitwiseOR(lit(16L)).as("flagged"),
          col("event_id").bitwiseXOR(shiftright(col("event_id"), 3))
            .as("mixed"),
          bit_count(col("event_id")).as("bits"),
          shiftleft(pmod(col("event_id"), lit(8L)).cast("int"), 4)
            .cast(LongType).as("shifted"))
        .orderBy("event_id")
    },

    // Regex surface: extract / replace-all / match — pattern kept in
    // the RE2∩Java-regex common subset so both engines agree.
    "h_regex_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
          col("c_name").rlike("0{3}").as("has_triple_zero"))
        .orderBy("c_custkey")
    },

    // URL parsing (§2.H): host/path/query-param extraction — the
    // crawl-metadata projection every web-corpus pipeline runs. URLs
    // are derived deterministically from fixture columns on BOTH
    // engines; the oracle reconstructs the parts by construction, so
    // the hash-match proves parse_url's decomposition semantics.
    "h_url_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id").cast(StringType),
          lit("?lang="), col("lang"), lit("&ref=graft")))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("qlang"))
        .orderBy("doc_id")
    },

    // Correlated scalar subquery (decorrelated by Catalyst to a join).
    "b_subquery_correlated" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_sq o
        WHERE o_totalprice > (
          SELECT 2 * avg(i.o_totalprice) FROM orders_sq i
          WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },

    // Parent-to-child SOQL shape (subselect → per-parent ordered list).
    "h_array_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          array_join(transform(sort_array(collect_list(col("o_orderkey"))),
            k => k.cast(StringType)), ",").as("order_keys"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    },

    // The typed twin of h_array_agg (r9): the per-parent list is built
    // as a genuine ARRAY<BIGINT> (sort_array ∘ collect_list) and probed
    // with element_at head/last lookups, but the ORACLED column ships
    // as to_json of that array (`[1,2,3]`) — the driver's pandas
    // all-column sort crashes on list values (CORRECTNESS_r09), so the
    // nested frame is pinned in ScalarFuncsTypedSpec instead. DuckDB's
    // to_json(list(... ORDER BY ...)) emits the identical string.
    "h_array_agg_typed" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(col("o_orderkey"))).as("keys_arr"),
          count(lit(1)).as("n_orders"))
        .select(
          col("o_custkey"),
          to_json(col("keys_arr")).as("order_keys"),
          element_at(col("keys_arr"), 1).as("first_key"),
          element_at(col("keys_arr"), -1).as("last_key"),
          col("n_orders"))
        .orderBy("o_custkey")
    },

    // Long→wide pivot (r10), the inverse of h_unpivot: order counts and
    // revenue per priority, one column pair per status. Values are
    // DECLARED (`pivot(col, Seq("F","O","P"))`) — an undeclared pivot
    // adds a distinct-collect driver round-trip before planning, which
    // is the wrong shape at 100 TB; with declared values this is one
    // partial-aggregable groupBy, same cost as the flat aggregation.
    // Empty cells are made explicit (count 0 / revenue 0.0) because
    // Spark's pivot yields NULL for absent groups while a conditional-
    // aggregation twin yields 0 — the oracle pins the coalesced form.
    "h_pivot" -> { (s, d) =>
      val piv = Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("rev"))
      piv.select(
        col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("f_n"),
        coalesce(col("F_rev"), lit(0.0)).as("f_rev"),
        coalesce(col("O_n"), lit(0L)).as("o_n"),
        coalesce(col("O_rev"), lit(0.0)).as("o_rev"),
        coalesce(col("P_n"), lit(0L)).as("p_n"),
        coalesce(col("P_rev"), lit(0.0)).as("p_rev"))
        .orderBy("o_orderpriority")
    },

    // Data-masking scalar family (r10): format-preserving `mask()`
    // (upper→X, lower→x, digit→n, punctuation kept — the shape-
    // preserving redaction that keeps length/format validations
    // working downstream) plus edge-revealing partial masking (first
    // 2 + last 2 visible). The display-tier privacy layer next to
    // i_anonymize_hash's join-preserving pseudonyms and j_pii_scrub's
    // pattern scrubber. Pure projections, in-scan at any scale.
    "h_mask_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          mask(col("c_name")).as("masked"),
          concat(substring(col("c_name"), 1, 2),
            expr("repeat('*', greatest(0, length(c_name) - 4))"),
            expr("substring(c_name, length(c_name) - 1, 2)"))
            .as("partial"))
        .orderBy("c_custkey")
    }
  )

  val oracles: Map[String, String] = Map(
    "h_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_up,
        |  lower(c_name) AS name_lo,
        |  trim('  ' || c_mktsegment || ' ') AS seg_trim,
        |  substring(c_name, 10, 5) AS name_sub,
        |  concat_ws('-', c_mktsegment, c_custkey) AS seg_key,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  lpad(CAST(c_custkey AS STRING), 10, '0') AS key_pad,
        |  regexp_replace(c_name, '0+', '0', 'g') AS name_squeeze,
        |  regexp_extract(c_name, '#(\d+)', 1) AS name_digits,
        |  split_part(c_name, '#', 2) AS name_part
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "h_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS INT) AS days_to_2002,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate AS DATE) AS odate
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "h_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS price_r1,
        |  abs(l_discount - 0.05) AS disc_abs,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
        |  (CASE WHEN NOT (abs((l_quantity * l_quantity)) < 9.0e11) THEN ((l_quantity * l_quantity)) WHEN ((l_quantity * l_quantity)) < 0 THEN -(floor(-((l_quantity * l_quantity)) * 10000 + 0.5) / 10000) ELSE floor(((l_quantity * l_quantity)) * 10000 + 0.5) / 10000 END + 0) AS qty_sq,
        |  (CASE WHEN NOT (abs(sqrt(l_extendedprice)) < 9.0e11) THEN (sqrt(l_extendedprice)) WHEN (sqrt(l_extendedprice)) < 0 THEN -(floor(-(sqrt(l_extendedprice)) * 10000 + 0.5) / 10000) ELSE floor((sqrt(l_extendedprice)) * 10000 + 0.5) / 10000 END + 0) AS price_sqrt,
        |  (CASE WHEN NOT (abs(ln(l_extendedprice)) < 9.0e11) THEN (ln(l_extendedprice)) WHEN (ln(l_extendedprice)) < 0 THEN -(floor(-(ln(l_extendedprice)) * 10000 + 0.5) / 10000) ELSE floor((ln(l_extendedprice)) * 10000 + 0.5) / 10000 END + 0) AS price_ln,
        |  (CASE WHEN NOT (abs(log10(l_extendedprice)) < 9.0e11) THEN (log10(l_extendedprice)) WHEN (log10(l_extendedprice)) < 0 THEN -(floor(-(log10(l_extendedprice)) * 10000 + 0.5) / 10000) ELSE floor((log10(l_extendedprice)) * 10000 + 0.5) / 10000 END + 0) AS price_log10,
        |  ((l_orderkey % 7) + 7) % 7 AS key_mod7,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_sqrt,
        |  qty_sq, disc_abs, disc_sign""".stripMargin,
    "h_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 40000 THEN 'high'
        |       WHEN o_totalprice > 20000 THEN 'mid'
        |       ELSE 'low' END AS tier,
        |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_c,
        |  greatest(o_totalprice, 1000.0) AS price_floor,
        |  least(o_totalprice, 50000.0) AS price_cap
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "h_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |  list_contains(string_split(text, ' '), 'key') AS has_key,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |  array_to_string(list_sort(string_split(text, ' '))[1:3], ' ') AS first3_sorted,
        |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INT) AS n_long,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS INT) AS sum_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "h_explode_posexplode" ->
      """SELECT doc_id, CAST(u['pos1'] AS INT) AS pos1, u['token'] AS token
        |FROM (
        |  SELECT doc_id, unnest(list_transform(string_split(text, ' '),
        |    (t, i) -> {'token': t, 'pos1': i})) AS u
        |  FROM documents WHERE doc_id < 50)
        |ORDER BY doc_id, pos1""".stripMargin,
    "h_map_funcs" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS entries,
        |  CAST(count(*) AS INT) AS n_types
        |FROM counts GROUP BY user_id ORDER BY user_id""".stripMargin,
    "h_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |  '{"k":' || json_extract_string(props, '$.k') || '}' AS json_rt
        |FROM events ORDER BY event_id""".stripMargin,
    "h_map_funcs_typed" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  CAST(to_json(array_agg({'key': event_type, 'value': cnt}
        |    ORDER BY event_type)) AS STRING) AS entries,
        |  max(CASE WHEN event_type = 'click' THEN cnt END) AS click_cnt,
        |  CAST(count(*) AS INT) AS n_types
        |FROM counts GROUP BY user_id ORDER BY user_id""".stripMargin,
    "h_struct_nested" ->
      """SELECT o_orderkey AS okey, o_totalprice AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 500""".stripMargin,
    "h_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, val
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |      FROM lineitem WHERE l_orderkey < 100)
        |UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin,
    "h_bitwise_funcs" ->
      """SELECT event_id,
        |  event_id & 255 AS band,
        |  event_id | 16 AS flagged,
        |  xor(event_id, event_id >> 3) AS mixed,
        |  CAST(bit_count(event_id) AS INT) AS bits,
        |  CAST((event_id % 8) << 4 AS BIGINT) AS shifted
        |FROM events ORDER BY event_id""".stripMargin,
    "h_url_funcs" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/docs/' || CAST(doc_id AS STRING) AS path,
        |  lang AS qlang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "h_regex_funcs" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(c_name, '0{3}') AS has_triple_zero
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "b_subquery_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT 2 * avg(i.o_totalprice) FROM orders i
        |  WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "h_array_agg" ->
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS STRING), ',' ORDER BY o_orderkey) AS order_keys,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "h_array_agg_typed" ->
      """SELECT o_custkey,
        |  CAST(to_json(list(o_orderkey ORDER BY o_orderkey)) AS STRING)
        |    AS order_keys,
        |  min(o_orderkey) AS first_key,
        |  max(o_orderkey) AS last_key,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "h_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
        |  coalesce(CAST(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
        |    THEN o_totalprice END AS DECIMAL(20,6))) AS STRING) AS DOUBLE),
        |    0.0) AS f_rev,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
        |  coalesce(CAST(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O'
        |    THEN o_totalprice END AS DECIMAL(20,6))) AS STRING) AS DOUBLE),
        |    0.0) AS o_rev,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n,
        |  coalesce(CAST(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P'
        |    THEN o_totalprice END AS DECIMAL(20,6))) AS STRING) AS DOUBLE),
        |    0.0) AS p_rev
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "h_mask_funcs" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS masked,
        |  concat(substring(c_name, 1, 2),
        |    repeat('*', greatest(0, length(c_name) - 4)),
        |    substring(c_name, length(c_name) - 1, 2)) AS partial
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
