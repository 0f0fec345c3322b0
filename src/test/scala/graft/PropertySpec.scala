package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants on generated micro-DataFrames (SURVEY §5.3).
  * Raw ScalaCheck Gen with a fixed seed (the scalatest-scalacheck
  * bridge isn't in the offline cache); 10 samples per property.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallInts = Gen.nonEmptyListOf(Gen.chooseNum(0, 9))

  test("splitBucket: range [0,100), overflow-free up to Long.MaxValue, " +
    "and equal to the reference Lehmer arithmetic") {
    val ids = samples(Gen.chooseNum(0L, Long.MaxValue), 40)
    val out = ids.toDF("id")
      .select(graft.operators.TextOps.splitBucket(col("id")).as("b"))
      .collect().map(_.getLong(0))
    out.zip(ids).foreach { case (b, id) =>
      assert(b >= 0 && b < 100, s"bucket $b out of range for id $id")
      val expect = ((id % 2147483647L) * 48271L) % 2147483647L % 100L
      assert(b == expect, s"id $id: spark $b vs reference $expect")
    }
    // stability: same ids through a different partitioning
    val out2 = ids.toDF("id").repartition(7)
      .select(col("id"), graft.operators.TextOps.splitBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.zip(out).foreach { case (id, b) => assert(out2(id) == b) }
  }

  test("dedup is idempotent") {
    samples(smallInts).foreach { xs =>
      val once = xs.toDF("x").distinct()
      assert(once.distinct().count() == once.count())
    }
  }

  test("union_distinct <= union_all; except/intersect partition left") {
    samples(Gen.zip(smallInts, smallInts)).foreach { case (a, b) =>
      val da = a.toDF("x"); val db = b.toDF("x")
      assert(da.union(db).distinct().count() <= da.union(db).count())
      val ex = da.except(db)
      val in = da.intersect(db)
      assert(ex.count() + in.count() == da.distinct().count())
      assert(ex.intersect(in).count() == 0)
    }
  }

  test("windowed running sum's last row equals the group total") {
    samples(smallInts).foreach { xs =>
      val df = xs.zipWithIndex.toDF("x", "i")
      val w = Window.orderBy("i").rowsBetween(Long.MinValue, 0)
      val last = df.withColumn("run", sum(col("x")).over(w))
        .orderBy(desc("i")).select("run").as[Long].head()
      assert(last == xs.map(_.toLong).sum)
    }
  }

  test("upsert latest-wins keeps exactly the highest version per key") {
    val kv = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 100)))
    samples(kv).foreach { kvs =>
      val result = kvs.zipWithIndex.map { case ((k, v), ord) => (k, v, ord) }
        .toDF("k", "v", "ord")
        .withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(desc("ord"))))
        .filter(col("rn") === 1).select("k", "v")
        .as[(Int, Int)].collect().toSet
      val expected = kvs.zipWithIndex
        .groupBy(_._1._1).map { case (k, g) => (k, g.maxBy(_._2)._1._2) }
        .toSet
      assert(result == expected)
    }
  }
}
