package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Stage-level profile of j_ann_lsh_topk at scale (r15 scratch):
  * times unit-normalize / dupGroups / signatures / pairing /
  * expansion+window separately so the superlinear term is
  * attributable. Usage: runMain graft.operators.LshProfile [dir] [planes]
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10z")
    val nPlanes = args.lift(1).map(_.toInt).getOrElse(14)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"lshprof $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val u = t("unit") {
      val d = graft.Par.spread(Tables.embeddings(spark, dir))
        .select(col("vec_id"),
          col("embedding").cast(ArrayType(DoubleType)).as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
        .select(col("vec_id"), expr("graft_vdiv(v, nrm)").as("u"))
        .localCheckpoint(true)
      println(s"lshprof n=${d.count()}")
      d
    }
    val (repU, mem) = t("dupGroups") {
      val (r, m) = AnnOps.dupGroups(u)
      val rc = r.localCheckpoint(true); val mc = m.localCheckpoint(true)
      println(s"lshprof reps=${rc.count()} mem=${mc.count()}")
      (rc, mc)
    }
    val planes = broadcast(repU.orderBy("vec_id").limit(nPlanes)
      .withColumn("plane_id",
        row_number().over(Window.orderBy("vec_id")).cast(LongType) - 1)
      .select(col("plane_id"), col("u").as("pu")))
    val asg = t("signature") {
      val s0 = repU.join(planes)
        .withColumn("pdot", expr("graft_dot(u, pu)"))
        .groupBy("vec_id")
        .agg(sum(when(col("pdot") >= 0,
          pow(lit(2.0), col("plane_id")).cast(LongType))
          .otherwise(0L)).as("bucket"))
      val a = repU.join(s0, "vec_id").localCheckpoint(true)
      println(s"lshprof asg=${a.count()}")
      a
    }
    val repPairs = t("pairing") {
      val p = AnnOps.pairAcrossBuckets(asg, asg, "bucket",
        Tables.rowCount(spark, dir, "embeddings"), keepSelf = true)
        .localCheckpoint(true)
      println(s"lshprof repPairs=${p.count()}")
      p
    }
    t("expand+win") {
      val candInd = repPairs
        .join(mem.select(col("rep").as("nn_id"), col("ind")), "nn_id")
        .select(col("vec_id"), col("ind").as("nn_ind"), col("cos"))
      val w4 = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("nn_ind"))
      val top4 = candInd.withColumn("r4", row_number().over(w4))
        .filter(col("r4") <= 4)
      val expanded = top4
        .join(mem.select(col("rep").as("vec_id"), col("ind").as("p_ind")),
          "vec_id")
        .filter(col("p_ind") =!= col("nn_ind"))
        .select(col("p_ind").as("vec_id"), col("nn_ind").as("nn_id"),
          col("cos"))
      val w3 = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("nn_id"))
      val n = expanded.withColumn("rk", row_number().over(w3))
        .filter(col("rk") <= 3).count()
      println(s"lshprof top3=$n")
    }
    spark.stop()
  }
}
