package graft
/** Prints registry sizes (maintenance util for COVERAGE.md). */
object CountKeys {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracled=${o.size} no_oracle=${(q -- o).size}")
    println("no-oracle keys: " + (q -- o).toSeq.sorted.mkString(", "))
  }
}
