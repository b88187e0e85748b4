package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles for DISCRETE measures — the distributed
  * quantile pattern that stays EXACT at any scale, sized by the measure's
  * distinct-value count instead of its row count.
  *
  * The classic options both fail a 100 TB engine somewhere:
  * `approx_percentile` is mergeable but approximate (and its error bound
  * is per-group opaque), while rank-based exact selection (global sort +
  * row_number) shuffles every ROW and cannot short-circuit. For discrete
  * measures — integer quantities, star ratings, token counts, bucketed
  * scores, ppm ranks — the (group, value) frequency profile is tiny even
  * when the table is not: one combiner-friendly shuffle on (group, value)
  * builds it, the per-group cumulative window then runs over DISTINCT
  * VALUES ONLY (50 rows per group for `l_quantity`, regardless of whether
  * the fact has 6 million or 60 billion lines), and every requested
  * quantile reads off the same profile with integer ppm arithmetic — no
  * second scan per quantile, no approximation, no row-count sort.
  *
  * Definition (the "lower quantile" / type-1 discrete quantile): for
  * quantile q (in ppm), the smallest value v whose cumulative count
  * satisfies `cum(v) · 10⁶ ≥ n · q`. Pure integer comparisons — any
  * engine reproduces the choice bit-for-bit, which is what makes the
  * DuckDB oracle exact. The cum·10⁶ product is carried in decimal(38,0):
  * a long would overflow once a group passes ~9.2×10¹² rows.
  */
object Quantiles {

  /** One row per group: `n_rows` + one column per requested quantile,
    * named `p<ppm/10000>` when the ppm is a whole percent (`p50`, `p99`)
    * and `p_<ppm>ppm` otherwise.
    */
  def groupedDiscrete(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L)): DataFrame = {
    require(groupCols.nonEmpty, "groupedDiscrete needs ≥1 group column")
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1000000] ppm: $qsPpm")
    val gs: Seq[Column] = groupCols.map(col)
    val vc = df.groupBy((gs :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("c"))
    val cum = vc
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(gs: _*).orderBy(col(valueCol))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(gs: _*)))
    val picks = qsPpm.map { q =>
      min(when(col("cum").cast("decimal(38,0)") * 1000000L >=
        col("n").cast("decimal(38,0)") * q, col(valueCol))).as(colName(q))
    }
    cum.groupBy(gs: _*)
      .agg(max(col("n")).as("n_rows"), picks: _*)
  }

  private[operators] def colName(ppm: Long): String =
    if (ppm % 10000L == 0) s"p${ppm / 10000L}" else s"p_${ppm}ppm"
}
