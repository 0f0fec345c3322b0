package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** §2.I — the reference's distinctive ETL-pipeline surface
  * (SURVEY §1.1/§3.1), re-expressed as pure DataFrame transforms:
  * incremental extract (SystemModstamp cursor), upsert (MERGE), CDC
  * snapshot diff, PK dedupe, describe()-driven type normalization,
  * null cleaning, and the post-load reconciliation audit.
  *
  * Scale notes: incremental extract is a pushed-down range predicate
  * (partition-pruned on a date-partitioned layout); upsert/dedupe
  * shuffle once on the business key and use window-top-1 rather than
  * dropDuplicates (which is row-order nondeterministic); the CDC diff
  * is a single full-outer join on the key — at 100 TB both snapshots
  * would be bucketed on the key to make it shuffle-free.
  */
object EtlOps {

  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.eventsWithNanos(s, d).withColumn("ts_us", expr("ts_ns div 1000"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SystemModstamp-cursor incremental pull: rows strictly after the
    // persisted cursor, replication columns only.
    "i_incremental_extract" -> { (s, d) =>
      // cursor compared against the RAW tick column so the predicate
      // pushes into the parquet scan (PlanSpec asserts this); filtering
      // a derived `ts * k` timestamp would read every row-group. The
      // cursor is converted driver-side to the fixture's footer unit —
      // exact, since it is a whole second.
      val cursorNs = 1705276800L * 1000000000L // 2024-01-15T00:00Z
      val tick = Tables.tsNsPerTick(s, d)
      val tsUs =
        if (tick >= 1000L) expr(s"ts * ${tick / 1000L}")
        else expr(s"ts div ${1000L / tick}")
      Tables.eventsRaw(s, d)
        .filter(col("ts") > cursorNs / tick)
        .select(col("event_id"), tsUs.as("ts_us"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // MERGE / INSERT..ON CONFLICT equivalent: base ∪ delta, latest
    // version per key wins (deterministic window-top-1, not
    // dropDuplicates).
    "i_upsert_latest_wins" -> { (s, d) =>
      val e = eventsUs(s, d)
      val base = e.filter(dayofmonth(col("ts")) <= 15)
        .select(col("event_id"), col("value"), lit(0).as("version"))
      val delta = e.filter(dayofmonth(col("ts")).between(14, 16))
        .select(col("event_id"), (col("value") * 2).as("value"),
          lit(1).as("version"))
      val w = Window.partitionBy("event_id").orderBy(desc("version"))
      base.unionByName(delta)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "version", "value")
        .orderBy("event_id")
    },

    // CDC via snapshot diff: day-1..20 snapshot vs day-1..25 snapshot
    // with simulated in-place updates (value bumped for day<=5 rows).
    "i_cdc_snapshot_diff" -> { (s, d) =>
      val e = eventsUs(s, d)
      val snapA = e.filter(dayofmonth(col("ts")) <= 20)
        .select(col("event_id"), col("value"))
      val snapB = e.filter(dayofmonth(col("ts")) <= 25)
        .select(col("event_id"),
          when(dayofmonth(col("ts")) <= 5, col("value") + 1)
            .otherwise(col("value")).as("value"))
      snapA.as("a").join(snapB.as("b"),
          col("a.event_id") === col("b.event_id"), "full")
        .select(
          coalesce(col("a.event_id"), col("b.event_id")).as("event_id"),
          when(col("a.event_id").isNull, "inserted")
            .when(col("b.event_id").isNull, "deleted")
            .when(col("a.value") =!= col("b.value"), "changed")
            .otherwise("unchanged").as("change_type"))
        .filter(col("change_type") =!= "unchanged")
        .orderBy("event_id")
    },

    // Exact PK dedupe keeping the deterministic survivor (min event_id
    // per business key) — never bare dropDuplicates.
    "i_dedupe_pk" -> { (s, d) =>
      eventsUs(s, d)
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("user_id", "event_type")
    },

    // describe()-driven type normalization: the Salesforce→PG type-map
    // pass, driven by a declarative target-schema Map (SURVEY §1.1).
    "i_type_normalize" -> { (s, d) =>
      val target = Seq(          // (source col, target name, cast)
        ("event_id", "id_str", StringType: DataType),
        ("value", "value_dec", DecimalType(18, 2): DataType),
        ("user_id", "user_int", IntegerType: DataType))
      val e = eventsUs(s, d)
      // DECIMAL output columns hash as python Decimal on the driver side
      // vs DuckDB floats — exercise the cast, surface it back as double
      val casts = target.map { case (src, name, dt) =>
        val c = col(src).cast(dt)
        (if (dt.isInstanceOf[DecimalType]) c.cast(DoubleType) else c).as(name)
      }
      e.select(casts :+
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_iso") :+
        (col("value") > 100).as("is_high"): _*)
        .orderBy("id_str")
    },

    // fillna / dropna / sentinel repair pass.
    "i_null_clean" -> { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("disc_n",
          when(col("l_discount") === 0.0, lit(null).cast(DoubleType))
            .otherwise(col("l_discount")))
        .na.fill(Map("disc_n" -> 0.01))
        .filter(col("l_quantity").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("disc_n"))
        // (l_orderkey, l_linenumber) is not unique: include disc_n
        .orderBy("l_orderkey", "l_linenumber", "disc_n")
    },

    // Soft-delete propagation (Salesforce queryAll/IsDeleted): split
    // the extract into live upserts vs tombstones to DELETE downstream.
    // IsDeleted derived deterministically (fixtures carry no flag).
    "i_soft_delete" -> { (s, d) =>
      eventsUs(s, d)
        .withColumn("is_deleted", pmod(col("event_id"), lit(20)) === 0)
        .select(col("event_id"),
          when(col("is_deleted"), "tombstone").otherwise("upsert")
            .as("action"),
          col("is_deleted"))
        .orderBy("event_id")
    },

    // SCD Type-2 history build: per user, each event becomes a
    // [valid_from, valid_to) version row, closed by the next event's
    // timestamp (lead) — the dimension-history pattern a warehouse load
    // derives from a change stream. Open versions keep valid_to NULL.
    // Scale: one shuffle on the natural key; window is a linear pass.
    "i_scd2_intervals" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      eventsUs(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("event_id"),
          col("ts_us").as("valid_from"), col("valid_to"),
          col("event_type"))
        .orderBy("user_id", "valid_from", "event_id")
    },

    // Post-load reconciliation audit: per-table row count + key checksum.
    // Dataset snapshot diff (r10): the corpus-versioning op — compare
    // two corpus snapshots by content fingerprint and classify every
    // doc as added / removed / changed, the CDC shape for training
    // corpora (what changed between yesterday's crawl freeze and
    // today's). Snapshots are derived deterministically from the
    // fixture (v1 = buckets <90, v2 = buckets ≥10 with every 7th doc's
    // text edited) so both engines build identical inputs; the diff
    // itself is one full outer join on doc_id carrying md5 fingerprints
    // — never text — so the exchange is fingerprint-sized at any
    // corpus scale.
    // r20 opt round (guide §2.4 — remove shuffles outright): doc_id is
    // the PK, so the v1 ⟗ v2 full-outer join is a self-join on a
    // unique key — every joined row is one source doc with membership
    // decided by its split bucket. One scan now computes BOTH
    // fingerprints and classifies map-side: membership flags replace
    // the join's null probes (fp_a NULL ⟺ bucket ∉ v1, etc.), and
    // fp_b reuses fp_a unless the deterministic edit applies, so the
    // common row pays ONE md5 of the text instead of two text decodes
    // + two md5 passes + a FullOuter SortMergeJoin (2 scans, 2
    // exchanges, 2 sorts in the r19 plan). The only exchange left is
    // the output sort of the ~0.1 % changed rows. Values identical by
    // construction at any corpus (the diff relation is unchanged);
    // oracle-gated at sf0.01/sf0.1. At 100 TB this halves the corpus
    // I/O and removes the only full-size shuffle the op had.
    "i_dataset_diff" -> { (s, d) =>
      val bkt = TextOps.splitBucket(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          (bkt < 90).as("in1"), (bkt >= 10).as("in2"),
          md5(col("text")).as("fp_a"))
        .withColumn("fp_b",
          when(pmod(col("doc_id"), lit(7L)) === 0,
            md5(concat(col("text"), lit(" updated"))))
            .otherwise(col("fp_a")))
        .filter(col("in1") || col("in2"))
        .select(col("doc_id"),
          when(!col("in1"), "added")
            .when(!col("in2"), "removed")
            .when(col("fp_a") =!= col("fp_b"), "changed")
            .otherwise("unchanged").as("status"))
        .filter(col("status") =!= "unchanged")
        .orderBy("doc_id")
    },

    "i_validate_rowcounts" -> { (s, d) =>
      def audit(name: String, df: DataFrame, key: String) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(col(key)).as("key_sum"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("key_sum").cast(LongType).as("key_sum"))
      audit("customer", Tables.customer(s, d), "c_custkey")
        .unionByName(audit("lineitem", Tables.lineitem(s, d), "l_orderkey"))
        .unionByName(audit("nation", Tables.nation(s, d), "n_nationkey"))
        .unionByName(audit("orders", Tables.orders(s, d), "o_orderkey"))
        .unionByName(audit("region", Tables.region(s, d), "r_regionkey"))
        .unionByName(audit("supplier", Tables.supplier(s, d), "s_suppkey"))
        .orderBy("table_name")
    },

    // Keyed pseudonymization (r10): replace user ids with a salted
    // SHA-256 prefix — the GDPR-style export step that keeps joins and
    // group-bys working (the pseudonym is deterministic per id) while
    // the raw identifier never leaves the pipeline. The output audits
    // itself: n_ids = distinct source ids per pseudonym must be 1
    // everywhere (a 64-bit prefix collision across user ids would
    // surface here, not silently merge two users downstream). Pure
    // projection + one partial-aggregable groupBy on the pseudonym.
    "i_anonymize_hash" -> { (s, d) =>
      Tables.events(s, d)
        .select(substring(sha2(concat(lit("graft-salt-v1:"),
          col("user_id").cast(StringType)), 256), 1, 16).as("pseudo_id"),
          col("user_id"))
        .groupBy("pseudo_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_ids"))
        .orderBy("pseudo_id")
    },

    // Right-to-be-forgotten propagation (r10): purge every event of
    // the users on a forget list (deterministic stand-in: ids ≡ 0
    // mod 97) and audit the purge per event type. The kept set is a
    // LEFT ANTI join against the broadcast forget list — the shape a
    // GDPR delete takes at 100 TB (the forget list is always tiny
    // relative to the corpus; pair with Layout.overwritePartitions to
    // rewrite only the partitions containing a forgotten user). The
    // audit emits kept + dropped so downstream reconciliation can
    // assert kept + dropped = previous total.
    "i_forget_users" -> { (s, d) =>
      val events = Tables.events(s, d)
      val forget = events.select("user_id").distinct()
        .filter(pmod(col("user_id"), lit(97L)) === 0)
      val kept = events
        .join(broadcast(forget), Seq("user_id"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n_kept"))
      // LEFT join kept onto totals: an event_type whose events all
      // belong to forgotten users must still appear with n_kept = 0,
      // or the kept + dropped = total reconciliation silently skips it.
      events.groupBy("event_type").agg(count(lit(1)).as("n_total"))
        .join(kept, Seq("event_type"), "left")
        .select(col("event_type"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
        .orderBy("event_type")
    }
  )

  val oracles: Map[String, String] = Map(
    "i_incremental_extract" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "i_upsert_latest_wins" ->
      """WITH base AS (
        |  SELECT event_id, value, 0 AS version FROM events
        |  WHERE day(ts) <= 15),
        |delta AS (
        |  SELECT event_id, value * 2 AS value, 1 AS version FROM events
        |  WHERE day(ts) BETWEEN 14 AND 16),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
        |SELECT event_id, CAST(version AS INT) AS version, value FROM u
        |QUALIFY row_number() OVER (PARTITION BY event_id
        |  ORDER BY version DESC) = 1
        |ORDER BY event_id""".stripMargin,
    "i_cdc_snapshot_diff" ->
      """WITH a AS (SELECT event_id, value FROM events WHERE day(ts) <= 20),
        |b AS (SELECT event_id,
        |        CASE WHEN day(ts) <= 5 THEN value + 1 ELSE value END AS value
        |      FROM events WHERE day(ts) <= 25)
        |SELECT coalesce(a.event_id, b.event_id) AS event_id,
        |  CASE WHEN a.event_id IS NULL THEN 'inserted'
        |       WHEN b.event_id IS NULL THEN 'deleted'
        |       WHEN a.value <> b.value THEN 'changed'
        |       ELSE 'unchanged' END AS change_type
        |FROM a FULL JOIN b ON a.event_id = b.event_id
        |WHERE (CASE WHEN a.event_id IS NULL THEN 'inserted'
        |       WHEN b.event_id IS NULL THEN 'deleted'
        |       WHEN a.value <> b.value THEN 'changed'
        |       ELSE 'unchanged' END) <> 'unchanged'
        |ORDER BY event_id""".stripMargin,
    "i_dedupe_pk" ->
      """SELECT user_id, event_type, min(event_id) AS keep_id,
        |  count(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "i_type_normalize" ->
      """SELECT CAST(event_id AS VARCHAR) AS id_str,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
        |  CAST(user_id AS INT) AS user_int,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso,
        |  value > 100 AS is_high
        |FROM events ORDER BY id_str""".stripMargin,
    "i_null_clean" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount = 0.0 THEN 0.01 ELSE l_discount END AS disc_n
        |FROM lineitem WHERE l_quantity IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, disc_n""".stripMargin,
    "i_soft_delete" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 20 = 0 THEN 'tombstone' ELSE 'upsert' END
        |    AS action,
        |  event_id % 20 = 0 AS is_deleted
        |FROM events ORDER BY event_id""".stripMargin,
    "i_scd2_intervals" ->
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from,
        |  lead(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS valid_to,
        |  event_type
        |FROM events
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "i_dataset_diff" ->
      s"""WITH v1 AS (
         |  SELECT doc_id, md5(text) AS fp FROM documents
         |  WHERE ${TextOps.splitBucketSql("doc_id")} < 90),
         |v2 AS (
         |  SELECT doc_id,
         |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' updated'
         |        ELSE text END) AS fp
         |  FROM documents
         |  WHERE ${TextOps.splitBucketSql("doc_id")} >= 10)
         |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         |  CASE WHEN v1.fp IS NULL THEN 'added'
         |       WHEN v2.fp IS NULL THEN 'removed'
         |       ELSE 'changed' END AS status
         |FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id
         |WHERE v1.fp IS NULL OR v2.fp IS NULL OR v1.fp <> v2.fp
         |ORDER BY doc_id""".stripMargin,
    "i_validate_rowcounts" ->
      """SELECT 'customer' AS table_name, count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM customer
        |UNION ALL SELECT 'lineitem', count(*),
        |  CAST(sum(l_orderkey) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'nation', count(*),
        |  CAST(sum(n_nationkey) AS BIGINT) FROM nation
        |UNION ALL SELECT 'orders', count(*),
        |  CAST(sum(o_orderkey) AS BIGINT) FROM orders
        |UNION ALL SELECT 'region', count(*),
        |  CAST(sum(r_regionkey) AS BIGINT) FROM region
        |UNION ALL SELECT 'supplier', count(*),
        |  CAST(sum(s_suppkey) AS BIGINT) FROM supplier
        |ORDER BY table_name""".stripMargin,
    "i_anonymize_hash" ->
      """SELECT substring(sha256('graft-salt-v1:'
        |    || CAST(user_id AS VARCHAR)), 1, 16) AS pseudo_id,
        |  count(*) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_ids
        |FROM events GROUP BY pseudo_id ORDER BY pseudo_id""".stripMargin,
    "i_forget_users" ->
      """WITH kept AS (
        |  SELECT event_type, count(*) AS n_kept FROM events
        |  WHERE user_id % 97 <> 0 GROUP BY event_type),
        |tot AS (
        |  SELECT event_type, count(*) AS n_total FROM events
        |  GROUP BY event_type)
        |SELECT tot.event_type,
        |  coalesce(kept.n_kept, 0) AS n_kept,
        |  tot.n_total - coalesce(kept.n_kept, 0) AS n_dropped
        |FROM tot LEFT JOIN kept USING (event_type)
        |ORDER BY tot.event_type""".stripMargin
  )
}
