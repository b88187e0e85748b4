package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Row-valued change feed between two snapshots — the CDF (change data
    * feed) rendering of [[diff]]: full pre/post images instead of key
    * classifications. Every emitted row carries the complete row values
    * plus `_change`:
    *
    *  - key only in `newDf`            → one `insert` row (post image)
    *  - key only in `oldDf`            → one `delete` row (pre image)
    *  - key in both, any value differs → `update_pre` (old values) AND
    *    `update_post` (new values)
    *  - key in both, values equal (null-safe) → nothing
    *
    * This output is exactly what downstream incremental consumers need —
    * [[graft.plans.MaterializedView.refreshFromFeed]] treats
    * insert/update_post as summary inserts and delete/update_pre as
    * summary deletes, so a summary table stays convergent without ever
    * seeing the base again.
    *
    * Both snapshots must carry the same column SET (this is one table at
    * two versions, not a schema migration); values compare and emit in
    * `newDf`'s types — the old side casts up under ordinary widening.
    * Scale shape matches [[diff]]: one full-outer shuffle join, unchanged
    * keys dropped in-plan, output proportional to the delta.
    */
  def changeFeed(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changeFeed needs at least one key column")
    require(oldDf.columns.toSet == newDf.columns.toSet,
      s"changeFeed needs identical column sets, got ${oldDf.columns.toSeq} " +
        s"vs ${newDf.columns.toSeq} — it diffs one table at two versions")
    val cols = newDf.columns.toSeq
    val newTypes = newDf.schema.fields.map(f => f.name -> f.dataType).toMap
    val o = oldDf.select(
      struct(keys.map(col): _*).as("_k"),
      struct(cols.map(c => col(c).cast(newTypes(c)).as(c)): _*).as("_vo"))
    val n = newDf.select(
      struct(keys.map(col): _*).as("_k"),
      struct(cols.map(col): _*).as("_vn"))
    val joined = o.join(n, Seq("_k"), "full_outer")
    def tagged(row: Column, tag: String) =
      struct(row.as("_row"), lit(tag).as("_change"))
    // an unchanged key emits an EMPTY array — typed explicitly, since a
    // bare array() would not unify with the tagged-struct branches
    val emptyArr = array().cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_row",
          newDf.select(cols.map(col): _*).schema),
        org.apache.spark.sql.types.StructField("_change",
          org.apache.spark.sql.types.StringType)))))
    val rows = when(col("_vo").isNull && col("_vn").isNotNull,
        array(tagged(col("_vn"), "insert")))
      .when(col("_vn").isNull && col("_vo").isNotNull,
        array(tagged(col("_vo"), "delete")))
      .when(!(col("_vo") <=> col("_vn")),
        array(tagged(col("_vo"), "update_pre"),
          tagged(col("_vn"), "update_post")))
      .otherwise(emptyArr)
    joined
      .select(explode(rows).as("_e"))
      .select(cols.map(c => col(s"_e._row.$c").as(c)) :+
        col("_e._change").as("_change"): _*)
  }
}
