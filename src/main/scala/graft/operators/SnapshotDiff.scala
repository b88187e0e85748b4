package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-version delta report: classify every key as added / removed /
  * changed between two snapshots of the same table — the validation step a
  * training-data pipeline runs after every sync or curation pass ("what did
  * this release change?"), and the natural audit for a CDC-merged table
  * (reference semantics it checks: bireme's DELETE+COPY merge,
  * `ChangeLoader.java:211-242`, must leave the target equal to the source —
  * this operator IS that comparison, run inside the engine).
  *
  * Scale shape: ONE full-outer shuffle join on the key columns — both sides
  * hash-partition, no driver materialization, no row comparison beyond a
  * null-safe struct equality that rides the join output (codegen'd). At
  * 100 TB the join is the theoretical minimum work for an unordered diff;
  * AQE handles skewed keys. Unchanged rows are dropped BEFORE the result is
  * materialized, so the output is proportional to the delta, not the table.
  */
object SnapshotDiff {

  /** Rows whose key exists only in `oldDf` → `removed`; only in `newDf` →
    * `added`; in both with any non-key column differing (null-safe, column
    * order per `newDf`) → `changed`. Unchanged keys are not emitted. Both
    * inputs must share the key columns; non-key columns are compared by
    * name over the intersection of the two schemas, so an added/dropped
    * column never throws — it simply isn't compared. Shared columns whose
    * TYPE drifted between snapshots (ordinary schema widening: int →
    * bigint) are compared in the NEW snapshot's type — the old side casts
    * up, instead of the struct equality throwing an analysis error.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val shared = newDf.columns.filter(c => !keys.contains(c) && oldDf.columns.contains(c)).toSeq
    val newTypes = newDf.schema.fields.map(f => f.name -> f.dataType).toMap
    // Null-safe struct compare: <=> treats null==null as equal, so a null
    // field never misclassifies a row as changed.
    val o = oldDf.select(
      struct(keys.map(col): _*).as("_k"),
      struct(shared.map(c => col(c).cast(newTypes(c)).as(c)): _*).as("_vo"),
      lit(1).as("_po"))
    val n = newDf.select(
      struct(keys.map(col): _*).as("_k"),
      struct(shared.map(col): _*).as("_vn"),
      lit(1).as("_pn"))
    val joined = o.join(n, Seq("_k"), "full_outer")
    val change = when(col("_po").isNull, lit("added"))
      .when(col("_pn").isNull, lit("removed"))
      .when(!(col("_vo") <=> col("_vn")), lit("changed"))
    joined
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(keys.map(k => col(s"_k.$k").as(k)) :+ col("change"): _*)
  }
}
