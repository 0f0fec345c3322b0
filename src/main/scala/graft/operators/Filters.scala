package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.B projection/filter/predicates + §2.F sorts/limits + §2.G set ops.
  *
  * Scale notes: every filter here is a Column expression (never a UDF),
  * so Catalyst pushes it into the parquet reader; sorts are total-order
  * range-partitioned exchanges (TakeOrderedAndProject when followed by
  * limit, which never materializes the full sort at scale); set ops are
  * hash-partition shuffles on the full row.
  */
object Filters {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rename + cast + derive (the type-normalization projection every
    // ETL applies, SURVEY §1.1 type table).
    "b_project_rename_cast" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey").as("okey"),
          col("o_custkey").as("ckey"),
          // decimal cast exercised, then surfaced as double: the driver
          // hashes our parquet directly, and a DECIMAL column arrives as
          // python Decimal objects vs DuckDB's float result — same value,
          // different repr → hash mismatch (round-1 lesson)
          col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType)
            .as("price_dec"),
          year(col("o_orderdate")).as("oyear"),
          col("o_orderstatus").as("status"))
        .orderBy("okey")
    },

    // Compound boolean algebra: AND/OR/NOT, IN, BETWEEN on timestamps.
    "b_filter_compound" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          ((col("l_quantity") > 30 && col("l_discount") < lit(0.05)) ||
            !(col("l_returnflag") === "A")) &&
          col("l_linestatus").isin("F", "O") &&
          col("l_shipdate").between(
            lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_returnflag", "l_linestatus")
        // (l_orderkey, l_linenumber) is not unique: total-order over
        // every output column
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_returnflag", "l_linestatus")
    },

    // LIKE / RLIKE / NULL handling / null-safe equality. Fixtures have
    // no NULLs, so nulls are derived (negative balances → NULL).
    "b_filter_like_null" -> { (s, d) =>
      val nbal = when(col("c_acctbal") < 0, lit(null).cast(DoubleType))
        .otherwise(col("c_acctbal"))
      Tables.customer(s, d)
        .withColumn("nbal", nbal)
        .filter(col("c_name").like("Customer#%") &&
          col("c_name").rlike("[02468]$"))
        .select(
          col("c_custkey"),
          col("nbal"),
          col("nbal").isNull.as("bal_is_null"),
          col("nbal").isNotNull.as("bal_not_null"),
          col("nbal") <=> lit(null).cast(DoubleType) as "bal_nullsafe_eq_null")
        .orderBy("c_custkey")
    },

    // §2.F multi-key sort with explicit null placement.
    "f_sort_multi" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(asc("o_orderstatus"), desc_nulls_last("o_totalprice"),
          asc("o_orderkey"))
    },

    // §2.F global top-k: orderBy+limit plans as TakeOrderedAndProject —
    // per-partition heaps + driver merge, no full sort at 100 TB.
    "f_topk_limit" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
          asc("l_linenumber"))
        .limit(20)
    },

    // OFFSET pagination (r10): page 3 of the key-ordered orders
    // (rows 41–60) — the API-results shape. Spark plans
    // offset+limit as a global limit of offset+pageSize then a skip;
    // honest scale note: deep pagination (offset ≫ page) still sorts
    // the prefix, so a 100 TB service paginates by KEY-SET
    // (WHERE key > last_seen ORDER BY key LIMIT n — exactly the
    // incremental-extract cursor shape in i_incremental_extract);
    // this entry covers the SQL surface itself.
    "f_offset_pagination" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
    },

    // §2.G set operations over 1995-vs-1996 active customer keys.
    "g_union_all" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey"), lit("y1995").as("yr"))
      val y96 = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey"), lit("y1996").as("yr"))
      y95.unionByName(y96).orderBy("o_custkey", "yr")
    },

    "g_union_distinct" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.union(y96).distinct().orderBy("o_custkey")
    },

    // Schema-evolution union (§2.G): an old extract (no lang column)
    // unions with the current one by NAME with missing columns
    // null-filled — the cross-version concatenation every long-lived
    // feed needs (positional union would silently misalign). Splits
    // derived from the Lehmer bucket so both engines agree.
    "g_union_byname_drift" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val bucket = TextOps.splitBucket(col("doc_id"))
      val oldExtract = docs.filter(bucket < 50)
        .select(col("doc_id"), col("n_chars"))
      val newExtract = docs.filter(bucket >= 50)
        .select(col("doc_id"), col("n_chars"), col("lang"))
      oldExtract.unionByName(newExtract, allowMissingColumns = true)
        .orderBy("doc_id")
    },

    "g_intersect" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.intersect(y96).orderBy("o_custkey")
    },

    "g_except" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.except(y96).orderBy("o_custkey")
    },

    // Multiset set ops: per-key multiplicity = min/difference of the
    // two sides' counts (bag semantics, not the distinct forms above).
    "g_intersect_all" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.intersectAll(y96).orderBy("o_custkey")
    },

    "g_except_all" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.exceptAll(y96).orderBy("o_custkey")
    }
  )

  val oracles: Map[String, String] = Map(
    "b_project_rename_cast" ->
      """SELECT o_orderkey AS okey, o_custkey AS ckey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(year(o_orderdate) AS INT) AS oyear,
        |  o_orderstatus AS status
        |FROM orders ORDER BY okey""".stripMargin,
    "b_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE ((l_quantity > 30 AND l_discount < 0.05)
        |       OR NOT (l_returnflag = 'A'))
        |  AND l_linestatus IN ('F','O')
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1996-12-31 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_returnflag, l_linestatus""".stripMargin,
    "b_filter_like_null" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS nbal,
        |  (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS bal_is_null,
        |  (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NOT NULL AS bal_not_null,
        |  (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NOT DISTINCT FROM NULL AS bal_nullsafe_eq_null
        |FROM customer
        |WHERE c_name LIKE 'Customer#%' AND regexp_matches(c_name, '[02468]$')
        |ORDER BY c_custkey""".stripMargin,
    "f_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST,
        |  o_orderkey ASC""".stripMargin,
    "f_topk_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 20""".stripMargin,
    "f_offset_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin,
    "g_union_all" ->
      """SELECT o_custkey, 'y1995' AS yr FROM orders WHERE year(o_orderdate) = 1995
        |UNION ALL
        |SELECT o_custkey, 'y1996' AS yr FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey, yr""".stripMargin,
    "g_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |UNION
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "g_union_byname_drift" ->
      s"""SELECT doc_id, n_chars, CAST(NULL AS VARCHAR) AS lang
         |FROM documents WHERE ${TextOps.splitBucketSql("doc_id")} < 50
         |UNION ALL
         |SELECT doc_id, n_chars, lang
         |FROM documents WHERE ${TextOps.splitBucketSql("doc_id")} >= 50
         |ORDER BY doc_id""".stripMargin,
    "g_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "g_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "g_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "g_except_all" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin
  )
}
