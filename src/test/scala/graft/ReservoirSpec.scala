package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** `j_sample_reservoir` (r12): the hash-ordered bottom-k sample is a
  * pure set function — exact size, partitioning-invariant, and
  * subset-STABLE: growing the corpus can only evict sampled docs by
  * hash rank, never reshuffle the survivors (the property that makes
  * the sample reusable across corpus snapshots).
  */
class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  test("exactly k docs, partitioning-invariant, uniform-ish across " +
    "the id range") {
    val got = SparkEntry.queries("j_sample_reservoir")(spark, sfDir)
      .as[(Long, String, String, Long)].collect()
    assert(got.length == 500)
    val again = Tables.documents(spark, sfDir).repartition(13)
      .withColumn("hv", expr(Sketches.lehmerHash("doc_id")))
      .orderBy("hv", "doc_id").limit(500)
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == again, "partitioning changed the sample")
    // uniformity sanity: both halves of the id range are represented
    // in roughly equal measure (Lehmer-permutation equidistribution)
    val n = Tables.documents(spark, sfDir).count()
    val lowHalf = got.count(_._1 < n / 2)
    assert(lowHalf > 150 && lowHalf < 350, s"skewed sample: $lowHalf/500")
  }

  test("subset-stability: every sampled doc of the larger corpus that " +
    "exists in the smaller corpus is in the smaller corpus's sample") {
    val docs = Tables.documents(spark, sfDir)
    def sample(of: org.apache.spark.sql.DataFrame): Set[Long] =
      of.withColumn("hv", expr(Sketches.lehmerHash("doc_id")))
        .orderBy("hv", "doc_id").limit(500)
        .select("doc_id").as[Long].collect().toSet
    val half = docs.filter(col("doc_id") % 2 === 0)
    val full = sample(docs)
    val sub = sample(half)
    val fullInHalf = full.filter(_ % 2 == 0)
    assert(fullInHalf.subsetOf(sub),
      "growing the corpus reshuffled survivors instead of evicting by rank")
  }
}
