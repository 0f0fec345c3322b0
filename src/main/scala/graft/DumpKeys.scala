package graft

/** Prints the registry key set, one per line — the mechanical half of
  * the SURVEY §2 key-set audit (SURVEY keys == these ∪ the
  * design/test-only rows). */
object DumpKeys {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
