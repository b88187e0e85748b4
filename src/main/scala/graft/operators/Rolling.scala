package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-window analytics: exact trailing-window distinct actors
  * and an exact-decimal truncated EWMA. Both are Greenplum-window-SQL
  * shapes the reference's users run over CDC-synced event tables
  * (reference: README.md:9,15), re-planned here in the forms that survive
  * 100 TB:
  *
  *   - Rolling distinct cannot use `COUNT(DISTINCT) OVER (RANGE ...)`
  *     (Spark doesn't plan it, and engines that do funnel every window
  *     through a per-frame re-scan). The linear form: distinct (actor,
  *     day) → per-actor coverage-interval union (each active day covers
  *     the next `windowDays` days; overlapping runs merge via one lag +
  *     running-sum window) → bounded day explode (≤ windowDays × active
  *     days, and a merged run pays its length once, not per active day) →
  *     one count per day. Three exchanges, all carrying (actor, day)
  *     pairs — the naive grid ⋈ events range join is O(days × events).
  *   - The EWMA is the trailing-`terms` truncation of s_t = x_t/2 +
  *     s_{t-1}/2: weights 2^-(j+1) are exact decimals, inputs quantize to
  *     DECIMAL(18,2), so the sum is exact decimal arithmetic — any engine
  *     replays it bit-for-bit (an IEEE-double recursive fold would pin
  *     the verifier to accumulation order). One window shuffle on the
  *     actor key shared by all `terms` lags.
  */
object Rolling {

  /** Per-day distinct actors over a trailing window of `windowDays` days
    * (current day inclusive). Output: (day, n_active) for every day with
    * at least one active-in-window actor, clipped to the data's [min, max]
    * event day. Null actors/timestamps are dropped by contract.
    */
  def rollingDistinct(df: DataFrame, actorCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val active = df
      .select(col(actorCol).as("actor"), to_date(col(tsCol)).as("day"))
      .where(col("actor").isNotNull && col("day").isNotNull)
      .distinct()
    val byActor = Window.partitionBy("actor").orderBy("day")
    // a new coverage run starts when the previous active day's window
    // cannot touch this one: gap > windowDays means a ≥1-day hole between
    // [prev, prev+w-1] and [d, d+w-1]; gap == windowDays is adjacent —
    // merge it too (same union, fewer exploded rows)
    val runs = active
      .withColumn("newRun",
        when(datediff(col("day"), lag(col("day"), 1).over(byActor)) <= windowDays, 0L)
          .otherwise(1L))
      .withColumn("run",
        sum(col("newRun")).over(byActor.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("actor", "run")
      .agg(min(col("day")).as("start"),
        date_add(max(col("day")), windowDays - 1).as("end"))
    // bound from the SAME null-filtered population as `active` (a null-actor
    // row must not extend the grid past the last contract-valid event day)
    val bounds = df
      .where(col(actorCol).isNotNull && col(tsCol).isNotNull)
      .agg(max(to_date(col(tsCol))).as("maxDay"))
    runs
      .join(broadcast(bounds))
      .select(col("actor"),
        explode(sequence(col("start"),
          least(col("end"), col("maxDay")),
          expr("interval 1 day"))).as("day"))
      .groupBy("day")
      // runs of one actor are disjoint, so each (actor, day) appears once
      .agg(count(lit(1)).as("n_active"))
  }

  /** Truncated EWMA over the trailing `terms` rows per actor: weight
    * 2^-(j+1) on the j-th most recent value, missing leading terms
    * contribute 0. Returns the input plus `outCol` (DOUBLE — the exact
    * decimal sum converted once at the end). Rows order by (`tsCol`,
    * `tieCol`) within an actor; inputs are quantized to DECIMAL(18,2).
    */
  def ewma(df: DataFrame, actorCol: String, tsCol: String, tieCol: String,
      valCol: String, terms: Int = 8, outCol: String = "ewma"): DataFrame = {
    require(terms >= 1 && terms <= 30, s"terms must be in [1, 30], got $terms")
    val w = Window.partitionBy(actorCol).orderBy(col(tsCol), col(tieCol))
    val x = col(valCol).cast("decimal(18,2)")
    val sum = (0 until terms).map { j =>
      val weight = BigDecimal(1) / BigDecimal(2).pow(j + 1) // exact: scale j+1
      val term = if (j == 0) x else lag(x, j).over(w)
      coalesce(term, lit(BigDecimal(0))) * lit(weight)
    }.reduce(_ + _)
    df.withColumn(outCol, sum.cast("double"))
  }
}
