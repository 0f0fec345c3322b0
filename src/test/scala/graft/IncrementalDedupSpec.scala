package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.operators.LlmOps
import graft.sources.Layout

/** Incremental new-vs-corpus dedup: the delta batch is judged against a
  * standing corpus represented ONLY by its stored artifacts — base text
  * is never re-shingled (structurally impossible: the artifacts carry
  * no text column).
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // 12-token sentences; editing the LAST token leaves 9 of 10 shingles
  // shared → jaccard 9/11 ≈ 0.818 ≥ τ=0.6 (a near-dup); disjoint
  // vocabularies share nothing.
  private val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
  private val s1b = s1.replaceAll("lima$", "mike")
  private val s1c = s1.replaceAll("lima$", "november")
  private val u1 = "one two three four five six seven eight nine ten eleven twelve"
  private val u2 = "red orange yellow green blue indigo violet cyan magenta umber teal maroon"

  private val baseDocs = Seq((1L, s1), (2L, s1b), (3L, u2)).toDF("doc_id", "text")
  private val deltaDocs = Seq((100L, s1c), (101L, u1), (102L, u1))
    .toDF("doc_id", "text")

  private def run(bp: org.apache.spark.sql.DataFrame,
                  bs: org.apache.spark.sql.DataFrame,
                  bd: org.apache.spark.sql.DataFrame) =
    LlmOps.incrementalDedup(bp, bs, bd, deltaDocs, cutoff = 50, tau = 0.6)

  test("in-flight: delta-vs-base and delta-vs-delta dups decided; " +
    "base never re-judged") {
    graft.functions.VectorExprs.register(spark)
    val (bp, bs, bd) = LlmOps.baseArtifacts(baseDocs)
    val out = run(bp, bs, bd).as[(Long, Long)].collect().toMap
    // 100 is a near-dup of base docs 1 and 2 → smallest partner 1;
    // 102 is an exact dup of delta doc 101 (delta-vs-delta, lower id
    // wins); 101 itself is the keeper and base ids never appear as dups
    assert(out == Map(100L -> 1L, 102L -> 101L), out.toString)
  }

  test("artifact-driven run (bucketed tables, no text column) equals " +
    "in-flight; plan scans the stored postings") {
    graft.functions.VectorExprs.register(spark)
    val (bp, bs, bd) = LlmOps.baseArtifacts(baseDocs)
    Layout.writeBucketed(bp, "inc_base_post", "shingle", 4)
    Layout.writeBucketed(bs, "inc_base_sizes", "doc_id", 4)
    Layout.writeBucketed(bd, "inc_base_df", "shingle", 4)
    try {
      val sp = spark.table("inc_base_post")
      val ss = spark.table("inc_base_sizes")
      val sd = spark.table("inc_base_df")
      // the artifacts carry no text — re-shingling base is impossible
      assert(sp.columns.toSeq == Seq("doc_id", "shingle"))
      val res = run(sp, ss, sd)
      val out = res.as[(Long, Long)].collect().toMap
      assert(out == Map(100L -> 1L, 102L -> 101L), out.toString)
      // and the plan reads the stored postings (bucketed scan), while
      // the only shingling expressions sit over the delta relation
      val plan = res.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("inc_base_post"), plan)
      // delta side is shingled (directly, or through the CacheManager
      // hit on the persisted delta postings from an earlier run)
      assert(plan.contains("graft_shingles") ||
        plan.contains("InMemoryTableScan"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_base_post")
      spark.sql("DROP TABLE IF EXISTS inc_base_sizes")
      spark.sql("DROP TABLE IF EXISTS inc_base_df")
    }
  }

  test("combined document frequency decides rarity exactly as the " +
    "batch cascade would over base∪delta") {
    graft.functions.VectorExprs.register(spark)
    // a shingle rare in the base alone but hot across base+delta must
    // be excluded from blocking: cutoff 2, shingle shared by 1 base +
    // 2 delta docs = df 3 > 2 → no candidates through it
    val b = Seq((1L, "x y z p q r")).toDF("doc_id", "text")
    val dd = Seq((10L, "x y z a b c"), (11L, "x y z d e f"))
      .toDF("doc_id", "text")
    val (bp, bs, bd) = LlmOps.baseArtifacts(b)
    val out = LlmOps.incrementalDedup(bp, bs, bd, dd, cutoff = 2, tau = 0.1)
    assert(out.count() == 0, "hot-combined shingle must not block")
    // with the cutoff admitting it, the candidates appear
    val out2 = LlmOps.incrementalDedup(bp, bs, bd, dd, cutoff = 3, tau = 0.1)
    assert(out2.count() > 0)
  }
}
