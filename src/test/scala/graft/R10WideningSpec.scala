package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Semantic invariants for the round-10 session-2 widenings (the
  * oracle pins exact values at sf0.01; these pin the algebra at
  * sf0.001 so refactors can't change meaning without tripping a spec).
  */
class R10WideningSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("j_doc_chunk tiles every document: stride-aligned, bounded, " +
    "covering") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("len"))
    val cov = q("j_doc_chunk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_idx") * 90 + col("chunk_len")).as("covered"),
        max("chunk_len").as("max_len"))
      .join(docs, "doc_id")
    assert(cov.filter(col("max_len") > 120).count() == 0,
      "chunk longer than the 120-char window")
    assert(cov.filter(col("covered") < col("len")).count() == 0,
      "tail of a document not covered by any chunk")
    // short docs yield exactly one chunk
    assert(cov.filter(col("len") <= 120 && col("n_chunks") =!= 1)
      .count() == 0)
    // chunking is in-scan work: no hash exchange anywhere (the only
    // exchange is the presentation sort's range partitioning)
    val p = q("j_doc_chunk").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("e_attribution_last_touch conserves purchases and only emits " +
    "known channels") {
    val out = q("e_attribution_last_touch").collect()
    val channels = out.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")), channels)
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_.getLong(1)).sum == purchases,
      "attribution dropped or duplicated purchases")
  }

  test("h_pivot cells partition the orders table") {
    val row = q("h_pivot")
      .agg(sum(col("f_n") + col("o_n") + col("p_n"))).head
    assert(row.getLong(0) == Tables.orders(spark, sfDir).count())
  }

  test("a_source_schema_merge: the pre-evolution snapshot surfaces " +
    "NULL source, the post-evolution one is fully populated") {
    val out = q("a_source_schema_merge")
    assert(out.filter(col("snap") === 1 && col("n_with_source") =!= 0)
      .count() == 0)
    assert(out.filter(col("snap") === 2 &&
      col("n_with_source") =!= col("n_docs")).count() == 0)
  }

  test("d_agg_mode_median: mode is the argmax count, median within " +
    "the value range") {
    val li = Tables.lineitem(spark, sfDir)
    val out = q("d_agg_mode_median").collect()
    val maxCounts = li.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("n"))
      .groupBy("l_returnflag").agg(max("n").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val range = li.groupBy("l_returnflag")
      .agg(min("l_quantity").as("lo"), max("l_quantity").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    out.foreach { r =>
      val flag = r.getString(0)
      assert(r.getLong(3) == maxCounts(flag), s"mode_n wrong for $flag")
      val (lo, hi) = range(flag)
      val med = r.getDouble(1)
      assert(med >= lo && med <= hi, s"median $med outside [$lo,$hi]")
    }
  }

  test("j_corpus_report accounts for every document exactly once") {
    val n = q("j_corpus_report").agg(sum("n_docs")).head.getLong(0)
    assert(n == Tables.documents(spark, sfDir).count())
  }

  test("e_anomaly_zscore only flags |z| > 2 with a warm window") {
    val out = q("e_anomaly_zscore").collect()
    assert(out.forall(r => math.abs(r.getDouble(3)) > 2))
    // an event inside its user's first 10 can never have n >= 10
    import org.apache.spark.sql.expressions.Window
    val rankW = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val early = Tables.eventsWithNanos(spark, sfDir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("pos", row_number().over(rankW))
      .filter(col("pos") <= 10)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !early.contains(r.getLong(0))),
      "an event with a cold window was scored")
  }

  test("j_dedup_lines segments every doc completely and bounds " +
    "removals") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = q("j_dedup_lines").collect()
    assert(out.length == toks.size, "a document lost its profile row")
    out.foreach { r =>
      val (id, nSeg, nRem) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = (toks(id) + 4) / 5 // ceil(n_tok / 5): disjoint tiling
      assert(nSeg == expect, s"doc $id: $nSeg segments, expected $expect")
      assert(nRem <= nSeg)
    }
  }

  test("e_retention_cohorts: week-0 retention is total, offsets never " +
    "exceed cohort size") {
    val out = q("e_retention_cohorts").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (k, active, size, bp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(active <= size, s"active $active > cohort $size")
      assert(bp == active * 10000 / size)
      if (k == 0) assert(active == size,
        "every cohort member is active in their first week by definition")
    }
    // cohort sizes sum to the distinct-user count
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val sizeSum = out.filter(_.getLong(1) == 0).map(_.getLong(3)).sum
    assert(sizeSum == users)
  }

  test("d_agg_histogram buckets partition the orders table") {
    val out = q("d_agg_histogram").collect()
    assert(out.map(_.getLong(1)).sum ==
      Tables.orders(spark, sfDir).count())
    out.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 19)
      assert(r.getLong(2) == r.getLong(0) * 25000L)
    }
  }

  test("e_window_gap_islands: islands tile the active days, are " +
    "separated by real gaps, and lengths are exact") {
    val out = q("e_window_gap_islands").collect()
    val activeDays = Tables.eventsWithNanos(spark, sfDir)
      .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000"))
      .distinct().count()
    // every active day is in exactly one island
    assert(out.map(_.getLong(3)).sum == activeDays)
    out.groupBy(_.getLong(0)).foreach { case (_, islands) =>
      val sorted = islands.sortBy(_.getLong(1))
      sorted.foreach { r =>
        assert(r.getLong(2) - r.getLong(1) + 1 == r.getLong(3),
          "island not consecutive")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) > a.getLong(2) + 1,
            "adjacent islands not separated by a gap")
        case _ =>
      }
    }
  }

  test("i_anonymize_hash: collision-free, event-conserving, id-free") {
    val out = q("i_anonymize_hash").collect()
    assert(out.forall(_.getLong(2) == 1), "pseudonym collision")
    assert(out.map(_.getLong(1)).sum ==
      Tables.events(spark, sfDir).count())
    assert(out.length ==
      Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("j_dedup_lines_apply agrees with the j_dedup_lines profile " +
    "and witnesses real content") {
    val profile = q("j_dedup_lines").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = q("j_dedup_lines_apply").collect()
    assert(out.length == profile.size)
    out.foreach { r =>
      val (nSeg, nRem) = profile(r.getLong(0))
      assert(r.getInt(1) == nSeg - nRem,
        s"doc ${r.getLong(0)}: kept ${r.getInt(1)} vs $nSeg-$nRem")
      assert(r.getString(2).length == 32)
    }
    // untouched docs witness their original (re-tiled) text
    val untouched = out.filter(r => profile(r.getLong(0))._2 == 0)
    assert(untouched.nonEmpty)
  }

  test("j_text_collocations: counts honest, PMI ordered, threshold " +
    "respected") {
    val out = q("j_text_collocations").collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getLong(2) >= 5), "min-count threshold leaked")
    val pmis = out.map(_.getDouble(3))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b },
      "PMI not descending")
  }

  test("d_agg_mad_robust: MAD is non-negative and at most the range") {
    val out = q("d_agg_mad_robust").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (med, mad) = (r.getDouble(1), r.getDouble(2))
      assert(mad >= 0 && med > 0)
      assert(mad <= med, "MAD of positive quantities exceeds median")
    }
  }

  test("d_agg_audience_overlap is bounded by user-day count and " +
    "symmetric in its construction") {
    val out = q("d_agg_audience_overlap").collect()
    assert(out.length == 3)
    val userDays = Tables.eventsWithNanos(spark, sfDir)
      .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000"))
      .distinct().count()
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= userDays))
  }

  test("i_forget_users: kept + dropped = total, forgotten ids fully " +
    "purged") {
    val out = q("i_forget_users").collect()
    val totals = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totals(r.getString(0)))
    }
    val forgotten = Tables.events(spark, sfDir)
      .filter(pmod(col("user_id"), lit(97L)) === 0).count()
    assert(out.map(_.getLong(2)).sum == forgotten,
      "dropped count does not equal the forget set's events")
  }

  test("c_join_asof_nearest picks the closer of the backward/forward " +
    "candidates and keeps every purchase") {
    val near = q("c_join_asof_nearest").collect()
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(near.length == purchases, "a purchase was dropped")
    val back = q("c_join_asof").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val fwd = q("c_join_asof_forward").collect()
      .filter(!_.isNullAt(4)).map(r => r.getLong(0) -> r.getLong(4)).toMap
    near.filter(!_.isNullAt(4)).foreach { r =>
      val (pId, pTs, cTs) = (r.getLong(0), r.getLong(2), r.getLong(4))
      val dt = math.abs(cTs - pTs)
      assert(dt <= 7200000000L, "outside the tolerance band")
      // nearest must be at least as close as either directional pick
      // that falls inside the band
      back.get(pId).filter(b => pTs - b <= 7200000000L)
        .foreach(b => assert(dt <= pTs - b))
      fwd.get(pId).foreach(f => assert(dt <= f - pTs))
    }
  }

  test("j_sample_class_balance: every class at the minority count, " +
    "selection deterministic") {
    val out = q("j_sample_class_balance").collect()
    val counts = Tables.embeddings(spark, sfDir)
      .groupBy("label").count().collect().map(_.getLong(1))
    val m = counts.min
    assert(out.length == counts.length)
    assert(out.forall(_.getLong(1) == m), "a class missed the floor")
    // re-derive the kept set independently and match the witness sum
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("label")
      .orderBy(graft.operators.TextOps.splitBucket(col("vec_id")),
        col("vec_id"))
    val expect = Tables.embeddings(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
      .groupBy("label").agg(sum("vec_id").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(2) == expect(r.getInt(0))))
  }

  test("j_dedup_containment dominates jaccard pairwise and catches " +
    "every exact-dup pair") {
    val cont = q("j_dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // containment >= jaccard always; any jac >= 0.8 pair must appear
    q("j_jaccard_shingle_pairs").collect().foreach { r =>
      val (key, jac) = ((r.getLong(0), r.getLong(1)), r.getDouble(3))
      cont.get(key).foreach(c => assert(c >= jac - 1e-9))
      if (jac >= 0.8) assert(cont.contains(key),
        s"jac-$jac pair $key missing from containment")
    }
    // identical-text docs (the fixture's exact dups) score 1.0
    val texts = Tables.documents(spark, sfDir)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id"), col("ids")).collect()
    val dupPairs = texts.flatMap { r =>
      val ids = r.getSeq[Long](1).sorted
      ids.combinations(2).map(p => (p(0), p(1)))
    }.toSet
    dupPairs.foreach { p =>
      assert(cont.get(p).contains(1.0), s"exact-dup pair $p not 1.0")
    }
    Caches.release(spark)
  }

  test("d_agg_gini lies in [0, 1) and counts every ordering customer") {
    val out = q("d_agg_gini").collect()
    assert(out.nonEmpty)
    val custs = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "c_custkey").distinct()
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0,
        s"gini out of range: ${r.getDouble(1)}")
      assert(r.getLong(2) == custs(r.getString(0)))
    }
  }

  test("e_window_pareto: the top-80% cohort is minimal and bounded") {
    val out = q("e_window_pareto").collect()
    out.foreach { r =>
      val (top, n, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(top >= 1 && top <= n)
      assert(bp == top * 10000 / n)
    }
  }

  test("j_corpus_drift: JS divergence within [0, ln 2] on a shared " +
    "vocabulary") {
    val r = q("j_corpus_drift").head
    val js = r.getDouble(0)
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"js $js")
    assert(r.getLong(1) >= 1)
    // the fixture's two halves share a template vocabulary → low drift
    assert(js < 0.1, s"unexpectedly high drift $js on the fixture")
  }

  test("j_sample_hard_negative crosses the label boundary with the " +
    "true argmax") {
    val out = q("j_sample_hard_negative").collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    assert(out.length == vecs.length)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    out.take(40).foreach { r =>
      val (id, lab, negId, negLab) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      assert(lab != negLab, s"$id mined a same-label negative")
      val (_, _, va) = byId(id)
      val best = vecs.filter(_._2 != lab)
        .map { case (bid, _, vb) => (cos(va, vb), bid) }
        .maxBy { case (c, bid) => (c, -bid) }
      assert(best._2 == negId,
        s"$id: picked $negId, exact argmax is ${best._2}")
    }
  }

  test("j_embed_dim_stats covers all 64 dimensions with consistent " +
    "bounds") {
    val out = q("j_embed_dim_stats").collect()
    assert(out.length == 64, s"expected 64 dims, got ${out.length}")
    out.foreach { r =>
      val (avg, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lo <= avg && avg <= hi, s"dim ${r.getInt(0)}: $lo/$avg/$hi")
    }
  }
}
