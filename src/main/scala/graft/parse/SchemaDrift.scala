package graft.parse

import graft.model.{TableRegistry, TableSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Mid-stream schema-drift detection — BEYOND reference parity: the
  * reference reads target metadata once at startup and fails fast
  * (Bireme.java:105-135, GetPrimaryKeys.java:71-83), so a mid-stream
  * `ALTER TABLE ADD COLUMN` on the source silently drops the new column at
  * parse time forever (the fixed-schema `from_json` keeps the key in the
  * data MAP, but [[Projection.typed]] projects only spec columns). This is
  * the first thing a real CDC user hits.
  *
  * [[detect]] finds the dropped keys per batch; [[evolved]] builds the
  * additively-widened spec. Auto-evolution works end-to-end on the Parquet
  * stores with zero store changes: [[graft.sources.ParquetTableStore]]
  * reads its bucket dirs with an EXPLICIT spec schema, so pre-evolution
  * files simply surface the new column as NULL (the q92 mergeSchema
  * semantics, without paying footer merging). The JDBC store cannot evolve
  * without warehouse DDL — a merge under an evolved spec fails loudly on
  * the warehouse's own column check, which is the correct behavior
  * (silently dropping data is the failure mode this module exists to
  * prevent).
  */
object SchemaDrift {

  /** Per-(table, column) counts of data-map keys the registry's specs do
    * NOT cover — one narrow projection over the batch plus a tiny
    * aggregate (output is bounded by tables × drifted columns, not rows).
    *
    * Scale: the explode streams map keys without materializing per-row
    * state, and the known-column lookup is a broadcast literal map — at a
    * 50k-row micro-batch this is noise next to the merges; at a bulk
    * replay it is one extra map-side-combined count.
    */
  def detect(events: DataFrame, registry: TableRegistry): DataFrame = {
    val lr = java.util.Locale.ROOT
    val known: Map[String, Seq[String]] = registry.specs.map { case (t, spec) =>
      t -> spec.schema.fieldNames.toSeq.map(_.toLowerCase(lr))
    }
    events
      .select(col("mappedTable"), explode(map_keys(col("data"))).as("column"))
      .filter(!array_contains(
        element_at(typedLit(known), col("mappedTable")), col("column")))
      .groupBy("mappedTable", "column")
      .agg(count(lit(1)).as("n_events"))
  }

  /** The spec widened by `columns`, appended as nullable STRING fields —
    * the CDC string decode model ([[Projection.typed]] casts per field
    * type, and a just-discovered column has no declared type until the
    * operator curates one; a later re-type is a normal spec change).
    * Primary keys can never arrive by drift (a PK add is a table rebuild
    * everywhere), so collisions with existing names fail loudly.
    */
  def evolved(spec: TableSpec, columns: Seq[String]): TableSpec = {
    val lr = java.util.Locale.ROOT
    val existing = spec.schema.fieldNames.map(_.toLowerCase(lr)).toSet
    val fresh = columns.map(_.toLowerCase(lr)).distinct
    require(fresh.forall(!existing.contains(_)),
      s"evolved: columns ${columns.filter(c => existing.contains(c.toLowerCase(lr)))} " +
        s"already exist in ${spec.name}")
    spec.copy(schema = StructType(
      spec.schema.fields ++ fresh.map(c => StructField(c, StringType))))
  }
}
