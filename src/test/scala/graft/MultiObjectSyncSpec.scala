package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import graft.sources.{JdbcExec}
import graft.sources.v2.{InMemoryEndpoint, SoqlEndpoint, SoqlEndpoints}

/** Multi-object dependency-ordered sync (r15, VERDICT r14 ask 8): a
  * 3-object lookup chain (account ← contact ← case) synced FK-first
  * through the executed Derby path, with the pull order observed at
  * the endpoints and referential integrity asserted on the target
  * after round 1.
  */
class MultiObjectSyncSpec extends SparkSpec {

  test("topoOrder: parents first, name-sorted among independents, " +
    "loud on cycles and unknown names") {
    assert(Pipeline.topoOrder(
      Seq("mo_case", "mo_account", "mo_contact"),
      Seq("mo_contact" -> "mo_account", "mo_case" -> "mo_contact")) ==
      Seq("mo_account", "mo_contact", "mo_case"))
    // deterministic among independents
    assert(Pipeline.topoOrder(Seq("b", "a", "c"), Nil) == Seq("a", "b", "c"))
    // diamond: one valid order, stable
    assert(Pipeline.topoOrder(Seq("d", "b", "c", "a"),
      Seq("b" -> "a", "c" -> "a", "d" -> "b", "d" -> "c")) ==
      Seq("a", "b", "c", "d"))
    val cyc = intercept[IllegalArgumentException] {
      Pipeline.topoOrder(Seq("a", "b"), Seq("a" -> "b", "b" -> "a"))
    }
    assert(cyc.getMessage.contains("cycle"))
    val unk = intercept[IllegalArgumentException] {
      Pipeline.topoOrder(Seq("a"), Seq("a" -> "ghost"))
    }
    assert(unk.getMessage.contains("undeclared"))
  }

  test("3-object lookup chain: parents pulled and committed before " +
    "children; every child FK resolves in the target after round 1") {
    val url = s"jdbc:derby:memory:graftmulti${System.nanoTime};create=true"

    def ep(name: String, schema: StructType,
           rows: Seq[Seq[Any]]): Unit =
      SoqlEndpoints.register(name, new InMemoryEndpoint(schema, rows) {
        override def query(cols: Seq[String], filters: Seq[Filter],
                           page: Int): Iterator[Seq[Any]] = {
          MultiObjectSyncSpec.pulls.add(name)
          super.query(cols, filters, page)
        }
      })

    val accountSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("cur", LongType),
      StructField("is_deleted", BooleanType)))
    val contactSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("account_id", LongType),
      StructField("cur", LongType),
      StructField("is_deleted", BooleanType)))
    val caseSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("contact_id", LongType),
      StructField("cur", LongType),
      StructField("is_deleted", BooleanType)))

    ep("mo_account", accountSchema, Seq(
      Seq(1L, "acme", 100L, false),
      Seq(2L, "globex", 110L, false)))
    ep("mo_contact", contactSchema, Seq(
      Seq(10L, 1L, 120L, false),
      Seq(11L, 2L, 130L, false),
      Seq(12L, 1L, 140L, false)))
    ep("mo_case", caseSchema, Seq(
      Seq(100L, 10L, 150L, false),
      Seq(101L, 12L, 160L, false)))

    MultiObjectSyncSpec.pulls.clear()
    // declarations deliberately SCRAMBLED: the scheduler must reorder
    val objs = Seq(
      Pipeline.V2Object("mo_case", Seq("id"), "cur", "is_deleted"),
      Pipeline.V2Object("mo_account", Seq("id"), "cur", "is_deleted"),
      Pipeline.V2Object("mo_contact", Seq("id"), "cur", "is_deleted"))
    val deps = Seq("mo_contact" -> "mo_account", "mo_case" -> "mo_contact")

    val cursors = Pipeline.syncAllOnceV2(spark, url, objs, deps,
      stateTable = "mo_state", batchSize = 2)
    assert(cursors == Seq(
      ("mo_account", 110L), ("mo_contact", 140L), ("mo_case", 160L)))

    // pull order at the ENDPOINTS is FK-safe: every account pull
    // precedes every contact pull precedes every case pull
    val order = {
      import scala.jdk.CollectionConverters._
      MultiObjectSyncSpec.pulls.asScala.toSeq
    }
    val lastAccount = order.lastIndexOf("mo_account")
    val firstContact = order.indexOf("mo_contact")
    val lastContact = order.lastIndexOf("mo_contact")
    val firstCase = order.indexOf("mo_case")
    assert(lastAccount >= 0 && firstContact > lastAccount &&
      firstCase > lastContact, s"pull order not FK-safe: $order")

    // referential integrity on the TARGET after round 1: every child
    // FK value exists in its parent's target table
    val accounts = JdbcExec.readTable(spark, url, "mo_account_tgt")
      .select("id").collect().map(_.getLong(0)).toSet
    val contacts = JdbcExec.readTable(spark, url, "mo_contact_tgt")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cases = JdbcExec.readTable(spark, url, "mo_case_tgt")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(contacts.nonEmpty && cases.nonEmpty)
    assert(contacts.forall { case (_, fk) => accounts(fk) },
      s"dangling contact FK: ${contacts.toSeq}")
    val contactIds = contacts.map(_._1).toSet
    assert(cases.forall { case (_, fk) => contactIds(fk) },
      s"dangling case FK: ${cases.toSeq}")

    // a second pass with nothing new holds every cursor
    MultiObjectSyncSpec.pulls.clear()
    assert(Pipeline.syncAllOnceV2(spark, url, objs, deps,
      stateTable = "mo_state", batchSize = 2).map(_._2) ==
      Seq(110L, 140L, 160L))
  }
}

object MultiObjectSyncSpec {
  // static: endpoint copies run executor-side (serialized into the
  // reader factory) — the V2LifecycleSpec.seenFilters convention
  val pulls = new ConcurrentLinkedQueue[String]()
}
