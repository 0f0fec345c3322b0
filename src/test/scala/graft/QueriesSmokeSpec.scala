package graft

/** Every SparkEntry.queries entry must execute and return rows on
  * sf0.001 — a throwing or empty query silently costs both correctness
  * and bench in the driver harness (SURVEY §0.1).
  */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      // Driver-compat guard (CORRECTNESS_r09: h_*_typed): the driver's
      // pandas compare lexsorts over ALL columns and raises on nested
      // python values, so an ORACLED query must never emit
      // ARRAY/MAP/STRUCT columns — serialize via to_json/array_join.
      if (SparkEntry.oracleSql.contains(name)) {
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
        val nested = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => f.name
        }
        assert(nested.isEmpty,
          s"$name is oracled but emits nested columns ${nested.toSeq} — " +
            "the driver's pandas all-column sort crashes on these")
      }
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
