package graft

import org.apache.spark.sql.functions._

/** The native vector expressions agree with the composable-API
  * formulation (interpreted eval AND whole-stage codegen paths).
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofCosine = {
    val d = aggregate(zip_with(col("a"), col("b"),
      (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(zip_with(col("a"), col("a"),
      (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(zip_with(col("b"), col("b"),
      (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => x * y),
      lit(0.0), (acc, x) => acc + x))
    d / (na * nb)
  }

  test("graft_cosine and graft_dot match the HOF formulation on fixtures") {
    graft.functions.VectorExprs.register(spark)
    val pairs = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val joined = pairs.select(col("vec_id").as("ia"), col("v").as("a"))
      .crossJoin(pairs.select(col("vec_id").as("ib"), col("v").as("b")))
      .filter(col("ia") < col("ib"))
    val diff = joined
      .withColumn("native", expr("graft_cosine(a, b)"))
      .withColumn("hof", hofCosine)
      .withColumn("d", abs(col("native") - col("hof")))
      .agg(max("d")).as[Double].head()
    assert(diff < 1e-12, s"native vs HOF cosine diverged by $diff")
  }

  test("graft_dot works in WHERE (codegen) and on literals (eval)") {
    graft.functions.VectorExprs.register(spark)
    // interpreted path
    val one = spark.sql(
      "SELECT graft_cosine(array(1.0d,0.0d), array(1.0d,0.0d)) c").head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-15)
    val orth = spark.sql(
      "SELECT graft_dot(array(1.0d,0.0d), array(0.0d,2.0d)) c").head().getDouble(0)
    assert(orth == 0.0)
  }
}
