package graft.sources

import org.apache.spark.sql.types._

/** Schema-drift reconciliation — the re-describe step of the reference
  * lifecycle (SURVEY §1.1: "schema drift (new fields) is handled by
  * re-describe + ALTER TABLE ADD COLUMN or full re-create").
  *
  * Given the target table's current schema and the freshly described
  * source schema, classify every column into add / drop / retype and
  * emit the migration DDL. Policy mirrors what a conservative ETL does:
  * adds are applied, drops are NEVER applied automatically (data loss),
  * retypes are applied only when widening (int→bigint, float→double,
  * anything→text) and otherwise flagged for manual re-create.
  */
object SchemaDrift {

  final case class Drift(
      added: Seq[StructField],
      removed: Seq[StructField],
      retyped: Seq[(StructField, StructField)]) { // (current, incoming)
    def isEmpty: Boolean = added.isEmpty && removed.isEmpty && retyped.isEmpty
  }

  def diff(current: StructType, incoming: StructType): Drift = {
    val cur = current.fields.map(f => f.name -> f).toMap
    val inc = incoming.fields.map(f => f.name -> f).toMap
    Drift(
      added = incoming.fields.toSeq.filterNot(f => cur.contains(f.name)),
      removed = current.fields.toSeq.filterNot(f => inc.contains(f.name)),
      retyped = incoming.fields.toSeq.flatMap(f =>
        cur.get(f.name).filter(_.dataType != f.dataType).map(_ -> f)))
  }

  /** A retype is safely applicable only when it widens. */
  def isWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType | ShortType | IntegerType, LongType) => true
    case (ByteType | ShortType, IntegerType) => true
    case (FloatType, DoubleType) => true
    case (_, StringType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.precision >= a.precision && b.scale >= a.scale &&
        b.precision - b.scale >= a.precision - a.scale
    case _ => false
  }

  private def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Migration statements for a drift: ADD COLUMNs, widening ALTER
    * TYPEs, and comment-markers for what needs manual intervention. */
  def migrationSql(table: String, drift: Drift): Seq[String] = {
    val adds = JdbcUpsertSink.addColumnsSql(table, drift.added)
    val types = drift.retyped.map { case (cur, in) =>
      if (isWidening(cur.dataType, in.dataType))
        s"ALTER TABLE ${q(table)} ALTER COLUMN ${q(in.name)} TYPE " +
          JdbcUpsertSink.pgType(in.dataType)
      else
        s"-- MANUAL: ${q(table)}.${q(in.name)} ${cur.dataType.simpleString}" +
          s" -> ${in.dataType.simpleString} narrows; requires re-create"
    }
    val drops = drift.removed.map(f =>
      s"-- SKIPPED (no auto-drop): ${q(table)}.${q(f.name)} absent from source")
    adds ++ types ++ drops
  }
}
