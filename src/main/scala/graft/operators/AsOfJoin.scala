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
}
