package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left (probe) row, attach the most recent right
  * (anchor) value whose event time is at or before the probe's time,
  * matching on equality keys — the standard "latest state as of t" lookup a
  * feature/training pipeline needs (price as of trade, last purchase as of
  * click).
  *
  * Spark-first shape: tag-and-union both sides, then ONE carry-forward
  * window (`last(..., ignoreNulls)` over rows unbounded-preceding..current)
  * per key. That is a single shuffle on the key with the per-key sort done
  * by the window operator — no range-join explosion (O(|L|·|R|) per key) and
  * no driver-side lookups, so the plan holds when both sides are huge and
  * skewed. Anchors sort BEFORE probes at equal timestamps, so the join is
  * inclusive (anchor.t == probe.t matches); ties among equal-time anchors
  * resolve to the max value, making the result deterministic.
  *
  * Interior column names `_t`/`_tag`/`_v` are reserved; inputs must not use
  * them.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightValue: String,
           asName: String): DataFrame = {
    val valueType = right.schema(rightValue).dataType
    val probes = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_v", lit(null).cast(valueType))
    // a NULL event time has no place on a timeline: an unfiltered null-time
    // anchor would sort NULLS FIRST — "before all time" — and fabricate a
    // match for probes that should have none
    val anchors = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("_t"), lit(0).as("_tag"),
        col(rightValue).cast(valueType).as("_v")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_tag").asc, col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(anchors, allowMissingColumns = true)
      .withColumn(asName, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_t", "_tag", "_v")
  }

  /** [[asOf]] with a staleness bound — the `merge_asof(..., tolerance=...)`
    * semantic: the carried anchor value is kept only when the probe lies
    * within `toleranceSeconds` of the anchor's time, else the probe gets
    * NULL ("no recent enough state"). A feature pipeline needs this form
    * whenever stale state is worse than no state (a price from last week
    * is not "the price as of now").
    *
    * Same single-shuffle tag-and-union shape as [[asOf]]: the anchor TIME
    * rides a second `last(..., ignoreNulls)` carry over the SAME window
    * spec (one Window operator — both carries resolve to the same final
    * anchor row because anchor rows are exactly the non-null rows of both
    * carried columns, under the same (time, tag, value) order). The age
    * test is exact integer microseconds.
    */
  def asOfTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightValue: String,
      asName: String, toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds > 0,
      s"toleranceSeconds must be positive, got $toleranceSeconds")
    val valueType = right.schema(rightValue).dataType
    val probes = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_v", lit(null).cast(valueType))
    val anchors = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("_t"), lit(0).as("_tag"),
        col(rightValue).cast(valueType).as("_v")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_tag").asc, col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(anchors, allowMissingColumns = true)
      // both carries in ONE projection so they land in a single Window
      // operator (chained withColumns leave a Project between the two
      // Window nodes that defeats CollapseWindow)
      .select(col("*"),
        last(col("_v"), ignoreNulls = true).over(w).as("_av"),
        last(when(col("_tag") === 0, unix_micros(col("_t"))),
          ignoreNulls = true).over(w).as("_at"))
      .filter(col("_tag") === 1)
      .withColumn(asName,
        when(unix_micros(col("_t")) - col("_at")
          <= toleranceSeconds * 1000000L, col("_av")))
      .drop("_t", "_tag", "_v", "_av", "_at")
  }

  /** FORWARD as-of join — [[asOf]] mirrored in time: every probe gets the
    * EARLIEST anchor at or after its timestamp (`merge_asof(direction=
    * 'forward')`), the time-to-event / next-state lookup a labeling
    * pipeline needs (next purchase after a click, next failure after a
    * warning). Same single-shuffle tag-and-union shape; the window simply
    * traverses time DESCENDING, so "last non-null seen" is the nearest
    * anchor at-or-after the probe. Inclusive like the backward form
    * (anchor.t == probe.t matches — anchors still sort before probes at
    * equal time under `_tag` asc); equal-time anchor ties resolve to the
    * max value, the same determinism rule as [[asOf]].
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightValue: String,
      asName: String): DataFrame = {
    val valueType = right.schema(rightValue).dataType
    val probes = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_v", lit(null).cast(valueType))
    val anchors = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("_t"), lit(0).as("_tag"),
        col(rightValue).cast(valueType).as("_v")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_tag").asc, col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(anchors, allowMissingColumns = true)
      .withColumn(asName, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_t", "_tag", "_v")
  }
}
