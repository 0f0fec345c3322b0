package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the TYPED nested surface behind `h_array_agg_typed` and
  * `h_map_funcs_typed` (VERDICT r9 item 1). The oracled outputs of
  * those entries ship to_json strings — the driver's pandas compare
  * crashes on nested python values — so the genuine
  * ARRAY&lt;BIGINT&gt; / MAP&lt;STRING,BIGINT&gt; semantics are proven
  * here instead: schema, ordering, element_at lookups, and the
  * json-projection round-trip (from_json of the oracled column
  * reproduces the typed values exactly).
  */
class ScalarFuncsTypedSpec extends SparkSpec {

  test("h_array_agg_typed: order_keys is to_json of a real sorted " +
    "ARRAY<BIGINT>; first/last come from element_at on that array") {
    val out = SparkEntry.queries("h_array_agg_typed")(spark, sfDir)
    assert(out.schema("order_keys").dataType == StringType)
    // round-trip the json back to the typed array and re-derive every
    // scalar from it — proves the string is a faithful projection
    val typed = out.withColumn("arr",
      from_json(col("order_keys"), ArrayType(LongType)))
    assert(typed.schema("arr").dataType == ArrayType(LongType))
    val bad = typed.filter(
      to_json(col("arr")) =!= col("order_keys") ||
        element_at(col("arr"), 1) =!= col("first_key") ||
        element_at(col("arr"), -1) =!= col("last_key") ||
        size(col("arr")) =!= col("n_orders") ||
        to_json(sort_array(col("arr"))) =!= col("order_keys"))
    assert(bad.count() == 0, bad.head(3).mkString("\n"))
    assert(out.count() > 0)
  }

  test("h_map_funcs_typed: entries is to_json of sorted " +
    "ARRAY<STRUCT<key,value>> from a real in-plan MapType") {
    val out = SparkEntry.queries("h_map_funcs_typed")(spark, sfDir)
    assert(out.schema("entries").dataType == StringType)
    val entrySchema = ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", LongType))))
    val typed = out.withColumn("arr", from_json(col("entries"), entrySchema))
      .withColumn("m", map_from_entries(col("arr")))
    assert(typed.schema("m").dataType == MapType(StringType, LongType))
    val bad = typed.filter(
      to_json(col("arr")) =!= col("entries") ||
        size(col("m")) =!= col("n_types") ||
        coalesce(element_at(col("m"), "click"), lit(-1L)) =!=
          coalesce(col("click_cnt"), lit(-1L)))
    assert(bad.count() == 0, bad.head(3).mkString("\n"))
    // the sum over per-type counts must equal the user's event count
    val evTotal = Tables.events(spark, sfDir).count()
    val sumCnt = typed
      .select(explode(col("arr")).as("e"))
      .agg(sum(col("e.value"))).head.getLong(0)
    assert(sumCnt == evTotal, s"$sumCnt != $evTotal")
  }
}
