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

  /** The (group…, value, c) frequency profile `groupedDiscrete` reads its
    * quantiles from — exposed because it is EXACTLY MERGEABLE: profiles
    * of disjoint row sets union and re-sum into the profile of the whole
    * (the quantile family's analogue of the repo's HLL-register / CMS
    * sketch algebra, except nothing here is approximate). A 100 TB
    * pipeline stores yesterday's profile (distinct-value-count-sized, not
    * row-count-sized) and folds in each day's delta profile instead of
    * re-scanning history — [[mergeProfiles]] + [[fromProfile]] then
    * answer any quantile, exactly, as if the full corpus were scanned.
    *
    * `weightCol`: optional row weight (token counts, byte sizes) — `c`
    * becomes Σweight and quantiles turn volume-weighted ("the value at
    * which half the corpus BYTES sit", the packing planner's statistic),
    * with the same exact arithmetic. Weights must be non-negative; long
    * (integer) by contract so the mergeable sums stay exact.
    */
  def valueProfile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "valueProfile needs ≥1 group column")
    val gs: Seq[Column] = groupCols.map(col)
    val w = weightCol.fold(lit(1L))(c => col(c).cast("long"))
    df.groupBy((gs :+ col(valueCol)): _*).agg(sum(w).as("c"))
  }

  /** Union profiles of disjoint row sets into the profile of the union —
    * same schema in, same schema out, exact by construction.
    */
  def mergeProfiles(profiles: Seq[DataFrame], groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(profiles.nonEmpty, "mergeProfiles needs ≥1 profile")
    val gs: Seq[Column] = groupCols.map(col)
    profiles.reduce(_ unionByName _)
      .groupBy((gs :+ col(valueCol)): _*).agg(sum(col("c")).as("c"))
  }

  /** Quantiles off a [[valueProfile]]: the per-group cumulative window
    * runs over DISTINCT values only; every requested quantile reads the
    * same profile. One row per group: `n_rows` (Σc — row count, or total
    * weight under a weighted profile) + one column per quantile, named
    * `p<ppm/10000>` when the ppm is a whole percent (`p50`, `p99`) and
    * `p_<ppm>ppm` otherwise.
    */
  def fromProfile(
      profile: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L)): DataFrame = {
    require(groupCols.nonEmpty, "fromProfile needs ≥1 group column")
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1000000] ppm: $qsPpm")
    val gs: Seq[Column] = groupCols.map(col)
    val cum = profile
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

  /** One-shot form: profile + read-off in a single plan. */
  def groupedDiscrete(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L),
      weightCol: Option[String] = None): DataFrame =
    fromProfile(valueProfile(df, groupCols, valueCol, weightCol),
      groupCols, valueCol, qsPpm)

  private[operators] def colName(ppm: Long): String =
    if (ppm % 10000L == 0) s"p${ppm / 10000L}" else s"p_${ppm}ppm"

  /** Binned quantiles for CONTINUOUS measures — the bounded-state path
    * where [[valueProfile]]'s distinct-value sizing breaks down (a double
    * measure at 100 TB has ~row-count distinct values; its exact profile
    * IS the table). Fixed caller-supplied bounds [lo, hi) and `bins`
    * equal-width buckets: state is EXACTLY `bins` counters per group —
    * mergeable by addition like the HLL/CMS registers — and the quantile
    * read-off returns the LOWER EDGE of the bucket where the cumulative
    * count crosses, so the answer is within one bin width of the true
    * quantile by construction.
    *
    * Determinism contract (what makes the DuckDB oracle exact): the bin
    * index is the single IEEE sequence `floor((v − lo) · bins / (hi −
    * lo))` clamped to [0, bins−1] — same fixed op order every engine
    * rounds alike (the q108 histogram convention); the read-off is pure
    * integer ppm arithmetic in decimal(38,0). Values outside [lo, hi)
    * clamp into the edge bins (min/max capture is the bounds-discovery
    * pass's job, or a domain the caller knows a priori).
    */
  def binnedContinuous(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      qsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L)): DataFrame = {
    require(groupCols.nonEmpty, "binnedContinuous needs ≥1 group column")
    require(bins >= 2 && bins <= 1000000, s"bins must be in [2, 1e6]: $bins")
    require(hi > lo, s"bounds must satisfy hi > lo: [$lo, $hi)")
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1000000] ppm: $qsPpm")
    val gs: Seq[Column] = groupCols.map(col)
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lit(lo)) * lit(bins.toDouble)
        / lit(hi - lo)).cast("int"))).as("bin")
    val counts = df.groupBy((gs :+ bin): _*).agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(gs: _*).orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(gs: _*)))
    // lower edge of the crossing bucket — same fixed IEEE sequence as the
    // binning expression, so the oracle reproduces the exact double
    val edge = lit(lo) + col("bin").cast("double") * lit(hi - lo) / lit(bins.toDouble)
    val picks = qsPpm.map { q =>
      min(when(col("cum").cast("decimal(38,0)") * 1000000L >=
        col("n").cast("decimal(38,0)") * q, edge)).as(colName(q))
    }
    cum.groupBy(gs: _*)
      .agg(max(col("n")).as("n_rows"), picks: _*)
  }
}
