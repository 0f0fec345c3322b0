package graft

import org.apache.spark.sql.functions._

/** Invariants for the non-oracled TextOps (SimHash has no DuckDB
  * hash twin).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash: identical docs collide on all bands (hamming 0)") {
    val pairs = SparkEntry.queries("j_dedup_simhash")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    // invariant: every emitted pair respects the hamming cutoff
    assert(pairs.forall(_._3 <= 3))
    // planted exact duplicate check via the same signature pipeline on
    // a doctored corpus is covered below through self-similarity:
    // a doc's signature is deterministic, so rerunning yields the
    // identical pair set
    val again = SparkEntry.queries("j_dedup_simhash")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == again.toSeq)
  }

  test("simhash signatures of identical texts are equal (planted dup)") {
    graft.functions.VectorExprs.register(spark)
    val docs = Seq((1L, "spark table scan merge sort join filter"),
      (2L, "spark table scan merge sort join filter"),
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(array_distinct(
      split(col("text"), " "))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val sigs = tok.groupBy("doc_id").agg(expr("graft_simhash(h)").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L), "identical texts must share a signature")
    assert(sigs(1L) != sigs(3L), "different texts should differ")
  }

  test("native simhash aggregate equals the 64-sum-columns formulation") {
    graft.functions.VectorExprs.register(spark)
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(
        split(col("text"), " "))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val native = tok.groupBy("doc_id")
      .agg(expr("graft_simhash(h)").as("sig"))
      .as[(Long, Long)].collect().toMap
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b"))
    val votes = tok.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val simhash = (0 until 64).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val reference = votes.select(col("doc_id"), simhash.as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(native == reference)
  }

  test("langid heuristic beats chance on the labeled corpus") {
    val out = SparkEntry.queries("j_text_langid")(spark, sfDir)
    val acc = out.agg(avg(col("correct").cast("double"))).head().getDouble(0)
    // 5 classes -> chance is 0.2; the profile heuristic must do better
    // (the synthetic vocab overlaps across langs, so expect modest skill)
    assert(acc > 0.2, s"langid accuracy $acc not above chance")
  }

  test("j_langid_chargram: planted character distributions classify " +
    "perfectly, deterministically under repartitioning") {
    import graft.operators.TextOps
    // two synthetic "languages" with disjoint character inventories —
    // the rank-profile algorithm must classify every scoring doc; word
    // order rotates per doc so no two texts are identical
    val ka = Seq("kaki", "keko", "kuku", "kaka", "kiko")
    val zu = Seq("zuzu", "zazo", "zizi", "zozu", "zuza")
    val docs = (0L until 60L).map { id =>
      val words = if (id % 2 == 0) ka else zu
      val text = (0 until 12)
        .map(j => words(((id + j) % words.size).toInt)).mkString(" ")
      (id, if (id % 2 == 0) "ka" else "zu", text)
    }.toDF("doc_id", "lang", "text")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val score = docs.filter(col("doc_id") % 5 === 0)
    val profile = TextOps.chargramProfile(train, 40)
    val preds = TextOps.chargramPredictions(profile, score, 40)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(preds.length == 12)
    preds.foreach { case (id, lang, pred, dist) =>
      assert(pred == lang, s"doc $id: predicted $pred, labeled $lang")
      // 20 doc trigrams × max penalty 40 bounds the distance
      assert(dist >= 0L && dist <= 800L, s"doc $id: dist $dist")
    }
    // deterministic under physical layout: reshuffled input, same output
    val again = TextOps.chargramPredictions(
        TextOps.chargramProfile(train.repartition(7), 40),
        score.repartition(5), 40)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(preds.toSeq == again.toSeq)
  }

  test("j_langid_chargram fixture entry: full 20% split covered, " +
    "distances bounded") {
    val out = SparkEntry.queries("j_langid_chargram")(spark, sfDir)
      .as[(Long, String, String, Long)].collect()
    assert(out.nonEmpty)
    // exactly one prediction per scoring-split doc (argmin is unique)
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall { case (_, _, _, d) => d >= 0L && d <= 800L })
  }

  test("quality scores are in [0,10000] basis points, tiers consistent") {
    val rows = SparkEntry.queries("j_text_quality")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, q, _) => q >= 0L && q <= 10000L })
    rows.foreach { case (_, q4, t) =>
      val expect = if (q4 >= 8000) "high" else if (q4 >= 6000) "mid" else "low"
      // q4 floors the score, so only rows ON the floor boundary can
      // legitimately differ from the double-threshold tier
      if (q4 != 8000 && q4 != 6000 && (q4 - 7999).abs > 1 && (q4 - 5999).abs > 1)
        assert(t == expect, s"q4=$q4 tier=$t")
    }
  }

  test("j_text_repetition: bounds hold, ratios are internally " +
    "consistent, and the fixture corpus actually repeats") {
    val rows = SparkEntry.queries("j_text_repetition")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n2, nd, repBp, maxN) =>
      assert(nd >= 1L && nd <= n2, s"doc $id: nd=$nd out of [1,$n2]")
      assert(repBp >= 0L && repBp <= 10000L, s"doc $id: rep_bp=$repBp")
      assert(repBp == (n2 - nd) * 10000L / n2, s"doc $id: ratio mismatch")
      assert(maxN >= 1L && maxN <= n2 - nd + 1, s"doc $id: max_gram_n=$maxN")
      if (nd == n2) assert(repBp == 0L && maxN == 1L)
    }
    // word-soup fixtures repeat: the signal must fire somewhere
    assert(rows.exists(_._4 > 0L), "no doc shows any 2-gram repetition")
  }

  test("graft_mg: completeness and undercount bounds hold under " +
    "adversarial partitioning (hot + barely-heavy + unique noise)") {
    graft.functions.VectorExprs.register(spark)
    val m = 63
    val n = 100000L
    // "hot" = 5% of the stream; "warm" = 2% (just above n/(m+1) =
    // 1562.5); everything else unique — the worst case for MG since
    // noise constantly evicts counters; 50 partitions force merges
    val df = spark.range(0, n, 1, 50).select(
      when(col("id") % 20 === 0, lit("hot"))
        .when(col("id") % 50 === 1, lit("warm"))
        .otherwise(concat(lit("u"), col("id"))).as("token"))
    val sk = df.agg(expr(s"graft_mg(token, $m)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.size <= m)
    val bound = n / (m + 1) + 1 // n/(m+1) rounded up
    assert(sk.contains("hot"), s"hot missing from $sk")
    assert(sk.contains("warm"), s"warm (freq 2000 > n/(m+1)) missing")
    assert(sk("hot") <= 5000 && sk("hot") >= 5000 - bound, sk("hot").toString)
    assert(sk("warm") <= 2000 && sk("warm") >= 2000 - bound, sk("warm").toString)
  }

  test("j_sample_weighted: deterministic, correctly ranked, and " +
    "actually weighted (sample skews long)") {
    val a = SparkEntry.queries("j_sample_weighted")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val b = SparkEntry.queries("j_sample_weighted")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(a == b)
    assert(a.map(_._4) == (1 to 100))
    // the inclusion probability rises with weight: the weighted
    // sample's mean length must exceed the corpus mean
    val corpusMean = Tables.documents(spark, "/root/testdata/sf0.01")
      .agg(avg("n_chars")).first().getDouble(0)
    val sampleMean = a.map(_._2).sum.toDouble / a.size
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("j_pack_sequences equals a driver-side packing simulation and " +
    "conserves docs and tokens") {
    val budget = 512L
    val got = SparkEntry.queries("j_pack_sequences")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // independent sequential simulation of the same contract
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
    val expect = docs.flatMap { case (src, rows) =>
      var off = 0L
      rows.sortBy(_._2).map { case (_, id, nTok) =>
        val seq = off / budget; off += nTok; (src, seq, id, nTok)
      }.groupBy(_._2).toSeq.map { case (seq, members) =>
        (src, seq, members.size.toLong, members.map(_._4).sum,
          members.map(_._3).min, members.map(_._3).max)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got == expect)
    // conservation: every doc lands in exactly one sequence
    val totalDocs = docs.map(_._2.size).sum
    assert(got.map(_._3).sum == totalDocs.toLong)
    // multi-doc packing actually happens (budget isn't degenerate)
    assert(got.exists(_._3 > 1L))
  }

  test("epochShards lands as disjoint contiguous sorted ranges with " +
    "no global sort, deterministically") {
    import operators.TextOps
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val sharded = TextOps.epochShards(docs, seed = 7L, nShards = 16)
    // the plan must carry a RANGE exchange, never a global Sort
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // per-partition: sorted by (shard, ord); across partitions:
    // disjoint contiguous key ranges (so concatenating partition files
    // in partition order IS the epoch order)
    val parts = sharded
      .select(col("shard"), col("ord"), col("doc_id"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (rows.isEmpty) Iterator.empty
        else Iterator((i, rows.head, rows.last, rows == rows.sorted))
      }.collect().sortBy(_._1)
    assert(parts.nonEmpty && parts.forall(_._4))
    parts.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) =>
        assert(implicitly[Ordering[(Long, Long)]].lt(max1, min2),
          s"overlapping ranges: $max1 vs $min2")
      case _ =>
    }
    // same seed → identical order; new seed → a different permutation
    val order1 = SparkEntry.queries("j_shuffle_epoch")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSeq
    val order2 = SparkEntry.queries("j_shuffle_epoch")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSeq
    assert(order1 == order2)
    val reseeded = TextOps.epochShards(docs, seed = 8L, nShards = 16)
      .select(col("shard"), col("ord"), col("doc_id"))
      .orderBy("shard", "ord", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(reseeded != order1 && reseeded.sorted == order1.sorted)
  }

  test("pii scrub leaves no matchable PII and counts exactly what " +
    "was planted") {
    val got = SparkEntry.queries("j_pii_scrub")(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, scrubbed, nEmail, nPhone, nId) =>
      assert(nEmail == (if (id % 3 == 0) 1L else 0L))
      assert(nPhone == (if (id % 4 == 0) 1L else 0L))
      assert(nId == (if (id % 5 == 0) 1L else 0L))
      assert(!scrubbed.contains("@"), s"doc $id: $scrubbed")
      assert(!scrubbed.matches(".*[0-9]{3}-[0-9]{2,}.*"),
        s"doc $id: $scrubbed")
      if (id % 3 == 0) assert(scrubbed.contains("<EMAIL>"))
      if (id % 4 == 0) assert(scrubbed.contains("<PHONE>"))
      if (id % 5 == 0) assert(scrubbed.contains("<ID>"))
    }
  }

  test("unigram LM scores rank rare-token salad below common text " +
    "and the LM join broadcasts") {
    val q = SparkEntry.queries("j_text_unigram_lm")(spark, sfDir)
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val scores = q.as[(Long, Double)].collect().toMap
    Caches.release(spark)
    assert(scores.nonEmpty && scores.values.forall(v => v < 0 && !v.isNaN))
    // a doc made of the corpus's most common tokens must outscore one
    // made of its rarest: compare best vs worst doc spread
    assert(scores.values.max > scores.values.min)
  }

  test("bigram LM separates shuffled word salad from natural text " +
    "where the unigram score cannot") {
    import operators.TextOps
    val sent = "the cat sat on the mat and the dog ran to the cat"
    val train = (1L to 50L).map(i => (i, sent)).toDF("doc_id", "text")
    // same token MULTISET as sent, order destroyed — a unigram model
    // scores both identically by construction; a bigram model must not
    val salad = "cat the mat ran the to sat dog the on and cat the"
    val score = Seq((1000L, sent), (1001L, salad)).toDF("doc_id", "text")
    val bg = TextOps.bigramLmScore(train, score)
      .as[(Long, Double)].collect().toMap
    Caches.release(spark)
    // unigram mean log-prob (the unigram entry's arithmetic, inlined):
    // equal for both docs because the multisets are equal
    val tok = train.select(explode(split(col("text"), " ")).as("term"))
    val lm = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = tok.count().toDouble
    val uniScore = score
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(lm, "term")
      .groupBy("doc_id")
      .agg(round(Det.dsum(log(col("cnt") / total)) / count(lit(1)), 4)
        .as("s"))
      .as[(Long, Double)].collect().toMap
    assert(uniScore(1000L) == uniScore(1001L),
      s"unigram should not separate: $uniScore")
    assert(bg(1000L) > bg(1001L) + 0.5,
      s"bigram should separate natural from shuffled: $bg")
  }

  test("j_quality_classifier: array-HOF score equals an explode/groupBy " +
    "reformulation of the same linear model; keep gate matches sign") {
    graft.functions.VectorExprs.register(spark)
    val rows = SparkEntry.queries("j_quality_classifier")(spark, sfDir)
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nFeat, s, keep) =>
      assert(nFeat > 0, s"doc $id: empty feature set emitted")
      assert(keep == (if (s >= 0) 1 else 0), s"doc $id: keep/sign mismatch")
    }
    // both keep classes occur on the fixture (the gate actually gates)
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0),
      "surrogate weights should land docs on both sides of the gate")
    // the same model the shuffle-heavy way — explode to (doc, token),
    // per-token weight, groupBy sum — must agree row-for-row: pins the
    // HOF accumulation against an independent physical formulation
    val alt = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
      .withColumn("w", expr(
        """((pmod(graft_polyhash(t), 1024L) + 1L) * 48271L
          |  % 2147483647L) % 2001L - 1000L""".stripMargin))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"), sum("w").as("score_sum"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.map(_._1).toSet == alt.keySet)
    rows.foreach { case (id, nFeat, s, _) =>
      assert(alt(id) == ((nFeat, s)), s"doc $id: HOF vs groupBy mismatch")
    }
  }

  test("j_sample_temperature flattens: smaller sources keep a larger " +
    "fraction, quotas respect the target, selection is deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("j_sample_temperature")(spark, sfDir)
      .collect()
    val kept = out.groupBy(_.getString(1)).view.mapValues(_.length.toLong)
    // every source's quota was actually fillable and filled
    kept.foreach { case (src, k) =>
      val nk = out.find(_.getString(1) == src).get.getLong(2)
      assert(k == math.min(nk, n(src)), s"$src kept $k of quota $nk")
    }
    // flattening: keep fraction is non-increasing in source size for
    // sources whose quota did not exceed their inventory
    val fracs = kept.toSeq.filter { case (src, k) => k < n(src) }
      .map { case (src, k) => (n(src), k.toDouble / n(src)) }
      .sortBy(_._1)
    fracs.sliding(2).foreach {
      case Seq((n1, f1), (n2, f2)) if n1 < n2 =>
        assert(f1 >= f2 - 1e-9,
          s"larger source kept a larger fraction: ($n1,$f1) vs ($n2,$f2)")
      case _ =>
    }
    // total kept ≤ half the corpus (the target)
    assert(kept.values.sum <= n.values.sum / 2, kept.toMap.toString)
    // determinism: a second run returns the identical selection
    val out2 = SparkEntry.queries("j_sample_temperature")(spark, sfDir)
      .collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("j_quality_classifier plan: scoring is doc-local — the only " +
    "exchange is the output ordering's range partition") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("j_quality_classifier")(spark, sfDir)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size <= 1,
        s"per-doc scoring must not shuffle the corpus:\n${df.queryExecution.executedPlan}")
      exchanges.foreach { e =>
        assert(e.outputPartitioning.toString.toLowerCase.contains("range"),
          s"unexpected non-sort exchange: ${e.outputPartitioning}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
  test("scrub_runs collapses planted runs, conserves tokens, and is " +
    "idempotent") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "x y x y"),
      (3L, "solo"),
      (4L, "r r r r r r r r")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.scrubRuns(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a b c", 3L)))
    assert(out(1) == ((2L, "x y x y", 0L)), "non-consecutive repeats kept")
    assert(out(2) == ((3L, "solo", 0L)))
    assert(out(3) == ((4L, "r", 7L)))
    // conservation on the fixture: removed = orig - kept, and a second
    // pass removes nothing (idempotence)
    val first = SparkEntry.queries("j_text_scrub_runs")(spark, sfDir)
    val again = graft.operators.TextOps.scrubRuns(
      first.select(col("doc_id"), col("scrubbed").as("text")))
    assert(again.filter(col("n_removed") =!= 0).count() == 0,
      "scrub is not idempotent")
  }

  test("j_quality_centroid: planted separation — each test doc lands " +
    "on its class centroid; the equidistant tie predicts class 0") {
    import graft.operators.TextOps
    // explicit feature rows: class 1 trains big docs, class 0 small;
    // base flag carried as x-independent column. Features chosen so a
    // tie case exists: centroids at (100,...) and (300,...) put a
    // (200,...) doc exactly equidistant → pred 0 by contract.
    def row(id: Long, cls: Long, v: Long, base: Boolean) =
      (id, cls, v, v, v, v, v, base)
    val feats = Seq(
      row(1, 0, 90, base = true), row(2, 0, 110, base = true),
      row(3, 1, 290, base = true), row(4, 1, 310, base = true),
      row(10, 0, 120, base = false),  // nearer 100 → pred 0, correct
      row(11, 1, 280, base = false),  // nearer 300 → pred 1, correct
      row(12, 1, 140, base = false),  // nearer 100 → pred 0, wrong
      row(13, 0, 200, base = false))  // EXACT tie → pred 0 by contract
      .toDF("doc_id", "cls", "x1", "x2", "x3", "x4", "x5", "is_base")
    val out = TextOps.centroidClassify(feats, col("is_base"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (10L, 0L, 0L, 1L),
      (11L, 1L, 1L, 1L),
      (12L, 1L, 0L, 0L),
      (13L, 0L, 0L, 1L)), s"got ${out.toSeq}")
  }

  test("j_quality_centroid plan: the corpus never hash-shuffles — " +
    "the only exchanges are the 2-row centroid aggregation paths " +
    "(cls-keyed / single-partition) and the output sort; centroids " +
    "reach the docs via broadcast") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("j_quality_centroid")(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 3, s"unexpected exchanges:\n$plan")
      val parts = shuffles.map(_.outputPartitioning.toString.toLowerCase)
      assert(parts.count(_.contains("range")) == 1,
        s"exactly one sort exchange expected: $parts")
      parts.filterNot(_.contains("range")).foreach { p =>
        assert(p.contains("cls") || p.contains("singlepartition"),
          s"a corpus-wide hash exchange crept in: $p\n$plan")
      }
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        s"centroids must broadcast, not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("j_quality_centroid on the fixture: deterministic under " +
    "repartitioning; predictions are total and binary") {
    import graft.operators.TextOps
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val isBase = TextOps.splitBucket(col("doc_id")) < 80
    val a = TextOps.centroidClassify(
      TextOps.centroidFeatures(docs), isBase)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val b = TextOps.centroidClassify(
      TextOps.centroidFeatures(docs.repartition(13)), isBase)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "repartitioning changed predictions")
    assert(a.nonEmpty && a.forall(r => r._3 == 0L || r._3 == 1L))
    // the 20% split is fully covered: one prediction per test doc
    val nTest = docs.filter(!isBase).count()
    assert(a.length.toLong == nTest)
  }

  test("j_sample_token_budget (r19): per-source budgets hold, the " +
    "selection is a doc_id-ordered prefix, and a custom budget is " +
    "respected") {
    val out = SparkEntry.queries("j_sample_token_budget")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    // budget holds per source (inclusive prefix cumsum)
    assert(out.forall(_._4 <= 5000L), "a cum_tok exceeded the budget")
    // prefix property: for each source, the selected ids are exactly
    // the lowest ids of that source up to the cut — no back-fill
    val bySrc = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    for ((src, sel) <- out.groupBy(_._2)) {
      val selIds = sel.map(_._1).sorted.toSeq
      assert(bySrc(src).take(selIds.length).toSeq == selIds,
        s"$src selection is not a doc_id prefix")
    }
    // a custom budget selects a superset and still respects its cap
    spark.conf.set("spark.graft.sample.tokenBudget", "20000")
    try {
      val wide = SparkEntry.queries("j_sample_token_budget")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(wide.forall(_._2 <= 20000L))
      assert(wide.map(_._1).toSet.size >= out.length,
        "a larger budget selected fewer docs")
    } finally spark.conf.unset("spark.graft.sample.tokenBudget")
    // forced whale routing (the PlanSpec r17 pin, applied here): with
    // the threshold at 0 every sampled source takes the banded
    // bucket-cumsum branch; output must match the plain window
    // bit-for-bit (routing is performance-only)
    spark.conf.set("spark.graft.window.whaleRows", "0")
    try {
      val routed = SparkEntry.queries("j_sample_token_budget")(spark, sfDir)
      val rp = routed.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(rp.contains("Union"),
        s"whaleRows=0 did not force the banded branch:\n$rp")
      val got = routed.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(got.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq,
        "banded token cumsum diverged from the plain window")
    } finally {
      spark.conf.unset("spark.graft.window.whaleRows")
      Caches.release(spark)
    }
  }

}
