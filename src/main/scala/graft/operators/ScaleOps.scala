package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns for skew and co-location (SURVEY §4 obligations).
  * These are the techniques the 100 TB layout leans on where AQE's
  * runtime skew handling isn't enough or a shuffle can be designed
  * away entirely; ScaleOpsSpec proves result-equivalence and the
  * intended plan shapes.
  */
object ScaleOps {

  /** Two-phase salted aggregation for skewed group keys: partial
    * aggregate on (key, salt) spreads a hot key over `nSalts`
    * reducers, final aggregate merges the partials. Correct for any
    * commutative re-aggregable pair (partial, merge).
    *
    * At 100 TB: a single hot key (null ids, default enums) otherwise
    * pins one reducer; salting bounds per-task input at
    * hot_key_rows / nSalts.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], nSalts: Int,
                      partial: Seq[(Column, String)],
                      merge: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(keys.map(col) :+ spark_partition_id(): _*), lit(nSalts)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head._1.as(merge.head._2),
        merge.tail.map { case (c, n) => c.as(n) }: _*)
  }

  /** Broadcast-salt join for a skewed fact⋈dim with hot fact keys:
    * replicate the dim side `nSalts`× and spread the fact side's rows
    * across the replicas, so one hot key no longer lands on a single
    * task. Result-identical to the plain join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 nSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()),
        lit(nSalts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key)).drop("__salt")
  }
}
