package graft.model

import org.apache.spark.sql.types._

/** Canonical change-operation names carried in the normalized event stream.
  *
  * Mirrors the reference's `RowType {INSERT, UPDATE, DELETE}`
  * (reference: src/main/java/cn/hashdata/bireme/Row.java:15-25), kept as
  * strings so they live naturally in DataFrame columns.
  */
object CdcOp {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val all: Seq[String] = Seq(Insert, Update, Delete)
}

/** Target-table metadata: schema + primary key.
  *
  * The reference fetches this per target table via a zero-row JDBC probe and
  * a pg_index primary-key query, and fails fast when a mapped table has no PK
  * (reference: Table.java:30-88, GetPrimaryKeys.java:39-83). We declare it
  * (or load it from a catalog) instead, but keep the same invariant.
  *
  * @param name     fully qualified target name, e.g. "public.orders"
  * @param schema   column names and Catalyst types, in table order
  * @param pkCols   primary-key column names (must be non-empty, subset of schema)
  */
final case class TableSpec(name: String, schema: StructType, pkCols: Seq[String]) {
  require(pkCols.nonEmpty, s"table $name must have a primary key (reference: GetPrimaryKeys.java:71-83)")
  private val fieldNames = schema.fieldNames.map(_.toLowerCase).toSet
  require(
    pkCols.forall(c => fieldNames.contains(c.toLowerCase)),
    s"table $name: pk columns ${pkCols.mkString(",")} must exist in schema")

  def dataCols: Seq[String] = schema.fieldNames.toSeq
}

/** Source→target routing: which source tables are synced and where to.
  *
  * Mirrors the `tableMap` built from `<source>.properties`
  * (reference: Config.java:242-272): keys are "db.table" on the source,
  * values are target table names present in `specs`. Events whose source
  * table is not a key are dropped (operator F1,
  * reference: MaxwellPipeLine.java:63-71).
  */
final case class TableRegistry(tableMap: Map[String, String], specs: Map[String, TableSpec]) {
  require(
    tableMap.values.forall(specs.contains),
    s"every mapped target needs a TableSpec; missing: ${tableMap.values.filterNot(specs.contains).mkString(",")}")

  def specFor(target: String): TableSpec = specs(target)
  def targets: Seq[String] = tableMap.values.toSeq.distinct
}
