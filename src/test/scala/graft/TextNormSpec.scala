package graft

import org.apache.spark.sql.functions._
import graft.operators.LlmOps

/** graft_normtext semantics + the wire into the dedup family
  * (spark.graft.text.normalize). */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    graft.functions.TextNorm.normalize(s)

  test("normalize: casefold, digit mask, punctuation and ws collapse") {
    assert(norm("The Quick,  Brown FOX!!") == "the quick brown fox")
    assert(norm("version 13 beats version 99") ==
      "version 00 beats version 00")
    assert(norm("  tabs\tand\nnewlines  ") == "tabs and newlines")
    assert(norm("") == "")
    assert(norm("!!!...,,,") == "")
  }

  test("normalize: NFC composes combining marks before comparing") {
    val composed = "caf\u00e9"           // e-acute as one codepoint
    val decomposed = "cafe\u0301"        // e + combining acute
    assert(norm(composed) == norm(decomposed))
    assert(norm(decomposed) == composed)
  }

  test("graft_normtext expression matches the Scala twin on fixtures") {
    graft.functions.VectorExprs.register(spark)
    val rows = Tables.documents(spark, sfDir)
      .select(col("text"), expr("graft_normtext(text)").as("nt"))
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (raw, nt) => assert(nt == norm(raw)) }
  }

  test("mixed-case/punct/digit near-dup: raw shingling misses it, " +
    "normalized shingling catches it (the conf wires the dedup family)") {
    graft.functions.VectorExprs.register(spark)
    // Two documents that are the same sentence modulo case, punctuation
    // and a digit edit — a classic crawl near-dup. Raw 3-token shingles
    // share nothing (every token differs in case or trailing punct);
    // normalized shingles are identical.
    val a = "The Quick Brown Fox Jumps Over 13 Lazy Dogs Near The Old Riverbank Today"
    val b = "the quick brown fox jumps, over 99 lazy dogs near the old riverbank today"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")

    def bandPairs(d: org.apache.spark.sql.DataFrame): Long =
      LlmOps.minhashCandidates(d).count()

    val rawHits = bandPairs(docs)
    val normHits = bandPairs(
      docs.withColumn("text", expr("graft_normtext(text)")))
    assert(rawHits == 0L,
      s"raw shingling should miss the case/digit near-dup, got $rawHits")
    assert(normHits == 1L,
      s"normalized shingling must catch it, got $normHits")
  }

  test("j_text_normalize query entry is sane on fixtures") {
    val out = SparkEntry.queries("j_text_normalize")(spark, sfDir)
    val rows = out.as[(Long, String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nt, len, _) =>
      assert(len == nt.length.toLong)
      assert(!nt.exists(_.isUpper))
      assert(!nt.exists(c => c.isDigit && c != '0'))
      assert(nt == nt.trim)
      assert(!nt.contains("  "))
    }
  }

  test("dedup conf knobs: defaults unchanged, overrides honored; " +
    "oracled entries FAIL FAST on an override (r12, ADVICE r11) " +
    "instead of silently hash-diverging from their SQL twins") {
    assert(LlmOps.dedupDfCutoff(spark) == 50)
    assert(LlmOps.cascadeTau(spark) == 0.6)
    assert(LlmOps.oracledDfCutoff(spark) == 50)
    assert(LlmOps.oracledTau(spark) == 0.6)
    spark.conf.set("spark.graft.dedup.dfCutoff", "7")
    spark.conf.set("spark.graft.dedup.tau", "0.4")
    try {
      assert(LlmOps.dedupDfCutoff(spark) == 7)
      assert(LlmOps.cascadeTau(spark) == 0.4)
      intercept[IllegalArgumentException](LlmOps.oracledDfCutoff(spark))
      intercept[IllegalArgumentException](LlmOps.oracledTau(spark))
      // a whole oracled entry refuses to run under the override
      intercept[IllegalArgumentException](
        SparkEntry.queries("j_dedup_cascade")(spark, sfDir))
    } finally {
      spark.conf.unset("spark.graft.dedup.dfCutoff")
      spark.conf.unset("spark.graft.dedup.tau")
    }
  }
}
