package graft

import org.apache.spark.sql.functions._

/** Invariants for the non-oracled LLM ops (SURVEY §2.J): MinHash-LSH
  * recall/precision floors and the HLL sketch error bound.
  */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsWithPlantedDups = {
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    // plant exact duplicates: copies of docs 0–9 under new ids 10000+
    val dups = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    base.unionByName(dups)
  }

  test("minhash-lsh: exact duplicates are always candidates (recall=1)") {
    // production pipeline on planted data: an exact dup shares every
    // shingle, hence every minhash value, hence every band signature —
    // recall=1 holds for ANY hash family, including the portable one
    graft.functions.VectorExprs.register(spark)
    val cands = operators.LlmOps.minhashCandidates(docsWithPlantedDups)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .as[(Long, Long)].collect().toSet
    (0L until 10L).foreach { id =>
      assert(cands.contains((id, id + 10000)),
        s"planted exact dup ($id, ${id + 10000}) not a candidate")
    }
  }

  test("minhash-lsh candidates on real corpus have nonzero jaccard") {
    val cands = SparkEntry.queries("j_dedup_near_minhash")(spark, sfDir)
    val jac = SparkEntry.queries("j_jaccard_shingle_pairs")(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    // every candidate pair that also appears in the exact-jaccard output
    // (threshold 0.2) is genuinely similar; candidates are a superset —
    // check the intersection is non-trivial when any exist
    val n = cands.count()
    if (n > 0) {
      val confirmed = cands.join(jac,
        cands("doc_a") === jac("doc_a") && cands("doc_b") === jac("doc_b"))
      assert(confirmed.count() > 0,
        "no LSH candidate confirmed by exact jaccard >= 0.2")
    }
  }

  test("rare-shingle blocking loses no qualifying pair: blocked jaccard " +
    "and cascade equal the all-pairs formulation at sf0.01") {
    val d = "/root/testdata/sf0.01"
    graft.functions.VectorExprs.register(spark)
    val ex = Tables.documents(spark, d)
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    // reference = all-pairs semantics via the candidate-driven verify
    // stage with EVERY sharing pair as a candidate (independent code
    // path from blockedPairStats, so this cross-validates the rare/hot
    // split too)
    def allPairs(tau: Double): Set[(Long, Long, Long)] =
      operators.LlmOps.exactPairStats(ex,
          operators.LlmOps.rareShingleCandidates(ex, Int.MaxValue))
        .filter(col("jac") >= tau)
        .select("doc_a", "doc_b", "n_common")
        .as[(Long, Long, Long)].collect().toSet
    def blocked(tau: Double): Set[(Long, Long, Long)] =
      operators.LlmOps.blockedPairStats(ex, operators.LlmOps.DfCutoff)
        .filter(col("jac") >= tau)
        .select("doc_a", "doc_b", "n_common")
        .as[(Long, Long, Long)].collect().toSet
    assert(blocked(0.2) == allPairs(0.2), "blocked τ=0.2 pair set differs")
    val cascBlocked = operators.LlmOps.dedupCascadeBlocked(
        ex, operators.LlmOps.DfCutoff, 0.6)
      .as[(Long, Long)].collect().toSet
    val cascAll = operators.LlmOps.dedupCascade(ex,
        operators.LlmOps.rareShingleCandidates(ex, Int.MaxValue), 0.6)
      .as[(Long, Long)].collect().toSet
    assert(cascBlocked == cascAll, "blocked cascade decision differs")
  }

  test("j_dedup_cascade_lsh is sound: every emitted dup pair has " +
    "exact jaccard >= tau") {
    val out = SparkEntry.queries("j_dedup_cascade_lsh")(spark, sfDir)
      .as[(Long, Long)].collect()
    if (out.nonEmpty) {
      graft.functions.VectorExprs.register(spark)
      val sh = Tables.documents(spark, sfDir)
        .select(col("doc_id"), expr("graft_shingles(text, 3)").as("s"))
        .as[(Long, Seq[String])].collect().toMap
      out.foreach { case (docId, dupOf) =>
        assert(dupOf < docId, "dup_of must be the smaller id")
        val (a, b) = (sh(dupOf).toSet, sh(docId).toSet)
        val jac = a.intersect(b).size.toDouble / a.union(b).size
        assert(jac >= 0.6, f"($dupOf,$docId) emitted with jaccard $jac%.3f")
      }
    }
  }

  test("LSH-driven cascade: planted dups flow candidates → exact " +
    "verify → dup decision") {
    graft.functions.VectorExprs.register(spark)
    val docs = docsWithPlantedDups
    val ex = docs
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dec = operators.LlmOps.dedupCascade(
        ex, operators.LlmOps.minhashCandidates(docs), tau = 0.99)
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { id =>
      assert(dec.get(id + 10000).exists(_ <= id),
        s"planted dup ${id + 10000} not routed to a smaller partner")
    }
  }

  test("substringPairs finds exactly the >=k-token planted overlaps, " +
       "counts distinct shared windows, and blocks boilerplate") {
    graft.functions.VectorExprs.register(spark)
    val k = 8
    // a/b share one exact 8-token run; a/c share only 7 tokens (below
    // k -> no window, no pair); d/e are disjoint texts sharing a hot
    // boilerplate window planted into >cutoff docs (blocked);
    // f repeats b's shared run twice (distinct windows count once)
    val run8 = "t1 t2 t3 t4 t5 t6 t7 t8"
    val run7 = "t1 t2 t3 t4 t5 t6 t7"
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, s"alpha $run8 omega"),
      (2L, s"beta gamma $run8 delta"),
      (3L, s"epsilon $run7 zeta eta"),
      (4L, s"$boiler unique4 text4 here4 now4 words4 more4 pad4"),
      (5L, s"$boiler unique5 text5 here5 now5 words5 more5 pad5"),
      (6L, s"$run8 middle6 $run8 end6")
    ) ++ (100L until 160L).map(i => (i, s"$boiler filler$i"))
    val ex = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(expr(s"graft_shingles(text, $k)")).as("w"))
    val pairs = operators.LlmOps.substringPairs(ex, cutoff = 50)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSeq
    // 1-2, 1-6, 2-6 via run8 (one distinct shared window each); the
    // 7-token overlap pairs nothing; the boilerplate window has df=62
    // > 50 so 4-5 and the filler docs never become candidates
    assert(pairs == Seq((1L, 2L, 1L), (1L, 6L, 1L), (2L, 6L, 1L)), pairs)
  }

  test("d_agg_approx_distinct (KMV) within its se bound of exact; " +
    "Datasketches HLL interop path tracks exact too") {
    val approx = SparkEntry.queries("d_agg_approx_distinct")(spark, sfDir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    // KMV se ≈ 1/√(k−2) ≈ 9% at k=128; 3σ bracket. (Measured on the
    // fixture: exact to the integer — the Lehmer permutation of the
    // dense id range is better-than-random equidistributed.)
    exact.foreach { case (t, n) =>
      val a = approx(t)
      assert(math.abs(a - n).toDouble / n <= 0.27,
        s"$t: approx $a vs exact $n exceeds the KMV 3σ bound")
    }
    // production-interop alternate (engine-locked, hence off the
    // oracle): Datasketches HLL stays exercised
    val hll = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("cast(hll_sketch_estimate(hll_sketch_agg(user_id, 12)) as bigint)")
        .as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(hll(t) - n).toDouble / n <= 0.05,
        s"$t: hll ${hll(t)} vs exact $n exceeds 5%")
    }
  }

  test("d_agg_sketch_union: union of daily KMV sketches equals the " +
    "one-shot sketch exactly; HLL daily-union interop merges losslessly") {
    graft.functions.VectorExprs.register(spark)
    val merged = SparkEntry.queries("d_agg_sketch_union")(spark, sfDir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    // merge correctness: union of per-day bottom-k must lose nothing
    // vs sketching the whole table in one pass (the KMV identity the
    // DuckDB oracle also pins)
    val k = graft.operators.Sketches.KmvK
    val h = graft.operators.Sketches.lehmerHash("user_id")
    val oneShot = Tables.events(spark, sfDir)
      .withColumn("hv", expr(h))
      .groupBy("event_type")
      .agg(expr(s"graft_kmv(hv, $k)").as("sk"))
      .select(col("event_type"),
        expr(graft.operators.Sketches.kmvEstimate("sk")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(merged == oneShot, s"daily-union $merged != one-shot $oneShot")
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(merged(t) - n).toDouble / n <= 0.27,
        s"$t: sketch ${merged(t)} vs exact $n exceeds the KMV 3σ bound")
    }
    // Datasketches HLL union interop: daily-union == one-shot estimate
    val hllMerged = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr(
        "cast(hll_sketch_estimate(hll_union_agg(sk, false)) as bigint)")
        .as("n"))
      .as[(String, Long)].collect().toMap
    val hllOneShot = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("cast(hll_sketch_estimate(hll_sketch_agg(user_id, 12)) as bigint)")
        .as("n"))
      .as[(String, Long)].collect().toMap
    assert(hllMerged == hllOneShot,
      s"hll daily-union $hllMerged != one-shot $hllOneShot")
  }

  test("d_agg_sketch_range: per-window estimates from stored day " +
    "sketches track the exact trailing-7-day distinct within the KMV " +
    "bound") {
    val got = SparkEntry.queries("d_agg_sketch_range")(spark, sfDir)
      .as[(String, java.sql.Date, Long)].collect()
    assert(got.nonEmpty)
    val exact = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .select("event_type", "day", "user_id").distinct().collect()
      .groupBy(r => r.getString(0))
      .view.mapValues(_.map(r => (r.getDate(1).toLocalDate, r.getLong(2))))
      .toMap
    got.foreach { case (t, day, est) =>
      val d0 = day.toLocalDate
      val n = exact(t).collect {
        case (d, u) if !d.isBefore(d0.minusDays(6)) && !d.isAfter(d0) => u
      }.distinct.size
      assert(math.abs(est - n).toDouble / math.max(n, 1) <= 0.27,
        s"$t $day: est $est vs exact $n exceeds the KMV 3σ bound")
    }
  }

  test("d_agg_quantile_sketch_range: per-window p50/p95 from stored " +
    "day samples stay within the sampling rank bracket of exact") {
    val got = SparkEntry.queries("d_agg_quantile_sketch_range")(spark, sfDir)
      .as[(String, java.sql.Date, Double, Double)].collect()
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .select("event_type", "day", "value").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getDate(1).toLocalDate, r.getDouble(2))))
      .toMap
    got.foreach { case (t, day, p50, p95) =>
      val d0 = day.toLocalDate
      val xs = raw(t).collect {
        case (d, v) if !d.isBefore(d0.minusDays(6)) && !d.isAfter(d0) => v
      }.sorted
      def rankOf(v: Double) = xs.count(_ <= v).toDouble / xs.length
      // discrete-rank granularity: the leading anchor days have
      // windows of only a handful of rows, where one value step moves
      // the rank by 1/n — widen the bracket accordingly
      val g = 1.0 / xs.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.05 + g,
        s"$t $day (n=${xs.length}) p50 rank ${rankOf(p50)}")
      assert(rankOf(p95) >= 0.95 - 0.03 - g && rankOf(p95) <= 1.0,
        s"$t $day (n=${xs.length}) p95 rank ${rankOf(p95)}")
    }
  }

  test("d_agg_quantile_sketch_union: day-sample unions track exact " +
    "percentiles within the sampling rank bound; GK digest interop " +
    "obeys its own bounds") {
    graft.functions.VectorExprs.register(spark)
    val merged = SparkEntry.queries("d_agg_quantile_sketch_union")(spark, sfDir)
      .select("event_type", "p50_approx", "p95_approx")
      .as[(String, Double, Double)].collect()
    assert(merged.nonEmpty)
    // rank-error bound for the k=1024 bottom-k row sample: se =
    // √(p(1−p)/k)·fpc ≈ 0.011 at p50 on the ~2k-row sf0.01 groups —
    // bracket at ±3% rank (the draw is deterministic; measured ≤ 2%)
    val eps = 0.03
    merged.foreach { case (t, p50, p95) =>
      val b = Tables.events(spark, sfDir)
        .filter(col("event_type") === t)
        .agg(
          expr(s"percentile(value, ${0.5 - eps})"),
          expr(s"percentile(value, ${0.5 + eps})"),
          expr(s"percentile(value, ${0.95 - eps})"),
          expr(s"percentile(value, ${0.95 + eps})")).head
      assert(p50 >= b.getDouble(0) && p50 <= b.getDouble(1),
        s"$t p50 $p50 outside [${b.getDouble(0)}, ${b.getDouble(1)}]")
      assert(p95 >= b.getDouble(2) && p95 <= b.getDouble(3),
        s"$t p95 $p95 outside [${b.getDouble(2)}, ${b.getDouble(3)}]")
    }
    // production-interop alternate (engine-locked, hence off the
    // oracle): the GK digest path (graft_qsketch) stays exercised —
    // the one-shot digest obeys its tighter single-digest bound
    val oneShot = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("graft_qsketch_q(graft_qsketch(cast(value as double), 1000), 0.5d)")
        .as("p50"))
      .as[(String, Double)].collect().toMap
    // single-digest error has no merge compounding — hold it to ±0.5%
    merged.foreach { case (t, _, _) =>
      val b = Tables.events(spark, sfDir)
        .filter(col("event_type") === t)
        .agg(expr(s"percentile(value, ${0.5 - 0.005})"),
          expr(s"percentile(value, ${0.5 + 0.005})")).head
      assert(oneShot(t) >= b.getDouble(0) && oneShot(t) <= b.getDouble(1),
        s"$t one-shot p50 ${oneShot(t)} outside " +
          s"[${b.getDouble(0)}, ${b.getDouble(1)}]")
    }
  }

  test("connectedComponents labels hand-built graphs correctly " +
    "(chain, cycle, isolates-in-pairs, long path for pointer jumping)") {
    import spark.implicits._
    // components: {1,2,3} (chain), {5,6,7} (cycle), {9,10} (pair),
    // {20..29} (10-node path — needs log-round convergence), {40,41}
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L),
      (9L, 10L), (40L, 41L)) ++ (20L until 29L).map(i => (i, i + 1))
    val got = operators.LlmOps.connectedComponents(
        edges.toDF("a", "b")).as[(Long, Long)].collect().toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L, 10L -> 9L,
      40L -> 40L, 41L -> 40L) ++ (20L to 29L).map(_ -> 20L)
    assert(got == expect)
    // determinism under partitioning: same labels from a 1-partition
    // and a 16-partition edge frame
    val again = operators.LlmOps.connectedComponents(
        edges.toDF("a", "b").repartition(16)).as[(Long, Long)]
      .collect().toMap
    assert(again == expect)
    // the distributed label-propagation path (forced by zeroing the
    // local-edge limit) produces the identical labels
    spark.conf.set(operators.LlmOps.CcLocalEdgeLimitKey, "0")
    try {
      val dist = operators.LlmOps.connectedComponents(
          edges.toDF("a", "b").repartition(16)).as[(Long, Long)]
        .collect().toMap
      assert(dist == expect)
    } finally spark.conf.unset(operators.LlmOps.CcLocalEdgeLimitKey)
  }

  test("j_dedup_clusters closes the cascade's pair relation: every " +
    "verified pair lands in one cluster, labels are component minima") {
    val clusters = SparkEntry.queries("j_dedup_clusters")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(clusters.nonEmpty)
    // soundness against the pair set the entry consumes
    graft.functions.VectorExprs.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val ex = docs
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val pairs = operators.LlmOps.blockedPairStats(ex, 50)
      .filter(col("jac") >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // every label is the minimum doc_id of its member set
    clusters.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl min is ${members.keys.min}")
    }
    // consistency with the pairwise cascade: the clustered doc set is
    // exactly the docs the verified pairs touch, and every cascade dup
    // is clustered with its dup_of target
    val cascade = SparkEntry.queries("j_dedup_cascade")(spark, sfDir)
      .as[(Long, Long)].collect()
    cascade.foreach { case (docId, dupOf) =>
      assert(clusters(docId) == clusters(dupOf))
    }
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("incrementalClusters: contracted components merge base clusters " +
    "bridged by a delta doc and label against standing minima") {
    import spark.implicits._
    // standing clusters: {1,2}→1 and {5,6}→5; base doc 9 is unclustered
    val baseLabels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    // delta 100 bridges BOTH base clusters (via members 2 and 6);
    // delta 101 pairs with the unclustered base 9; delta 103 pairs
    // with the earlier delta 102
    val deltaPairs = Seq((100L, 2L), (100L, 6L), (101L, 9L), (103L, 102L))
      .toDF("doc", "partner")
    val got = operators.LlmOps.incrementalClusters(baseLabels, deltaPairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 1L, 101L -> 9L, 103L -> 102L), got.toString)
  }

  test("cosine similarity is bounded and symmetric") {
    val top = SparkEntry.queries("j_sim_cosine_topk")(spark, sfDir)
      .select("cos").as[Double].collect()
    assert(top.nonEmpty)
    assert(top.forall(c => c >= -1.0001 && c <= 1.0001))
    // symmetry: cos(a,b) computed with operands swapped is identical
    val e = Tables.embeddings(spark, sfDir).limit(2)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].collect()
    val (a, b) = (e(0), e(1))
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    assert(math.abs(cos(a, b) - cos(b, a)) < 1e-12)
  }
  test("source-overlap matrix: canonical cells, and total pairs equal " +
    "the jaccard pair report") {
    val m = SparkEntry.queries("j_corpus_source_overlap")(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    assert(m.nonEmpty)
    m.foreach { case (x, y, n, avg) =>
      assert(x <= y, s"cell ($x,$y) not canonical")
      assert(n > 0 && avg >= 0.2, s"cell ($x,$y) n=$n avg=$avg")
    }
    val nPairs = SparkEntry.queries("j_jaccard_shingle_pairs")(spark, sfDir)
      .count()
    assert(m.map(_._3).sum == nPairs,
      "matrix cells must partition the tau=0.2 pair set")
  }

  test("tfidf similarity join is sound: emitted sims match an exact " +
    "driver recompute, and exact-duplicate docs score 1.0") {
    val out = SparkEntry.queries("j_sim_tfidf_pairs")(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, sim) =>
      assert(a < b && sim >= 0.8 && sim <= 1.0001, s"($a,$b,$sim)")
    }
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val n = texts.size.toDouble
    val tf = texts.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.length.toDouble }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, g) => w -> g.size.toDouble }
    def weights(id: Long): Map[String, Double] =
      tf(id).map { case (w, c) => w -> c * math.log(n / df(w)) }
    def cos(a: Long, b: Long): Double = {
      val (wa, wb) = (weights(a), weights(b))
      val num = wa.keysIterator.filter(wb.contains)
        .map(k => wa(k) * wb(k)).sum
      num / (math.sqrt(wa.values.map(v => v * v).sum) *
        math.sqrt(wb.values.map(v => v * v).sum))
    }
    out.take(25).foreach { case (a, b, sim) =>
      assert(math.abs(cos(a, b) - sim) < 1e-3,
        s"($a,$b): spark $sim vs driver ${cos(a, b)}")
    }
    // the fixture contains exact-duplicate texts; their pair must be
    // present at sim 1.0
    val dupPair = texts.groupBy(_._2).values.find(_.size >= 2)
      .map(_.keys.toSeq.sorted.take(2))
    dupPair.foreach { case Seq(a, b) =>
      assert(out.contains((a, b, 1.0)),
        s"exact dup pair ($a,$b) missing or not 1.0")
    }
  }

  test("graft_wdot_h over hash-sorted vectors equals graft_wdot over " +
    "term-sorted vectors on every fixture doc pair tested (r20 kernel)") {
    graft.functions.VectorExprs.register(spark)
    // both packings from the SAME (doc_id, term, w) derivation the
    // entry uses, so this pins exactly the representation swap
    val nDocs = Tables.rowCount(spark, sfDir, "documents")
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = tf.join(dfreq, "term")
      .withColumn("w", col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .filter(col("doc_id") < 40)
    val packed = w.groupBy("doc_id").agg(
      sort_array(collect_list(struct(col("term"), col("w")))).as("vs"),
      sort_array(collect_list(struct(xxhash64(col("term")).as("h"),
        col("w")))).as("vh"))
    val pairs = packed.select(col("doc_id").as("ia"), col("vs").as("sa"),
        col("vh").as("ha"))
      .crossJoin(packed.select(col("doc_id").as("ib"), col("vs").as("sb"),
        col("vh").as("hb")))
      .filter(col("ia") < col("ib"))
      .select(expr("graft_wdot(sa, sb)").as("ds"),
        expr("graft_wdot_h(ha, hb)").as("dh"))
      .collect()
    assert(pairs.length > 100, s"vacuous: ${pairs.length} pairs")
    pairs.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"hashed merge diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("wide-doc cap (r19, ADVICE r18): with the conf set low enough " +
    "to flag most docs, blockedPairStats routes flagged pairs through " +
    "the postings verify with IDENTICAL values") {
    import graft.operators.LlmOps
    val ex = LlmOps.shingleEx(spark, sfDir)
    val cutoff = LlmOps.oracledDfCutoff(spark)
    def collectStats() = LlmOps.blockedPairStats(ex, cutoff)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val plain = collectStats()
    Caches.release(spark)
    // cap below the fixture's median shingle count → a large share of
    // docs take the postings path; values must not move
    spark.conf.set(LlmOps.WideDocShinglesKey, "20")
    try {
      val capped = collectStats()
      assert(capped == plain,
        "wide-doc postings fallback diverged from the array kernel")
    } finally {
      spark.conf.unset(LlmOps.WideDocShinglesKey)
      Caches.release(spark)
    }
  }

  test("boundedPairExplode equals the key self-join on postings with " +
    "repeated (doc, key) rows and emits no self-pairs") {
    // the r19 in-cell pair generation replaced the postings self-join;
    // the edge it must preserve: a key occurring TWICE in one document
    // (substring windows can repeat) must not fabricate a (d, d) pair,
    // and duplicated postings must not change the distinct pair set
    import spark.implicits._
    val rare = Seq(
      (1L, "k1"), (2L, "k1"), (3L, "k1"),
      (4L, "k2"), (4L, "k2"), (5L, "k2"),   // doc 4 repeats k2
      (6L, "k3"), (6L, "k3"),               // doc 6 alone repeats k3
      (7L, "k4")                            // singleton key
    ).toDF("doc_id", "shingle")
    val got = operators.LlmOps.boundedPairExplode(rare, "shingle")
      .as[(Long, Long)].collect().toSet
    val ref = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(got == ref, s"pair sets differ: $got vs $ref")
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

}
