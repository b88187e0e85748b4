package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern that
  * makes 100 TB daily rollups affordable: keep a persisted per-key STATE
  * (count + exact decimal sums), fold each new delta batch into it with a
  * state-sized merge, and render the final aggregate from state alone.
  * Re-aggregating state is correct because count and sum are commutative
  * monoids; avg and friends derive from them at `finish` time, never live
  * in state. Exact decimals in state keep the merge order-independent —
  * a double-sum state would drift per merge order and could never be
  * hash-verified against a one-shot recompute.
  *
  * Scale: building state over a delta scans ONLY the delta; `merge` is one
  * hash aggregate over (|state| + |delta keys|) rows — data volume never
  * re-enters the plan. Partition the persisted state by its key for
  * shuffle-free merges of repeated cadences (the q93 bucketing surface).
  */
object IncrementalAgg {

  private val CntCol = "_agg_cnt"
  private def sumCol(v: String) = s"_agg_sum_$v"

  /** Aggregate state of `df`: keys…, `_agg_cnt`, one exact decimal(28,2)
    * running sum per value column. decimal(28,2): room for ~1e26 in
    * accumulated sums, so repeated merges cannot overflow what a
    * decimal(18,2) per-batch sum tolerates.
    */
  def state(df: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val aggs = count(lit(1)).as(CntCol) +:
      values.map(v => sum(col(v).cast("decimal(28,2)")).as(sumCol(v)))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold any number of states (same schema) into one — re-aggregate the
    * monoid columns by key. Keys present in only some states are kept.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "states must be non-empty")
    val all = states.reduce(_ unionByName _)
    val measureCols = all.columns.toSeq.filterNot(keys.contains)
    require(measureCols.contains(CntCol),
      s"not an IncrementalAgg state: missing $CntCol in ${all.columns.toSeq}")
    val aggs = measureCols.map(m => sum(col(m)).as(m))
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Render final aggregates from state: count, per-value sum (double) and
    * mean (double, exact-decimal quotient). Extend here — every derivable
    * aggregate must come from state columns only.
    */
  def finish(state: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    // avg as a DOUBLE quotient of the rendered sum — not decimal division,
    // whose intermediate scale is engine-specific and would un-verify the
    // last bit; double ÷ double is one IEEE op every engine rounds alike
    val rendered: Seq[Column] = col(CntCol).as("cnt") +:
      values.flatMap(v => Seq(
        col(sumCol(v)).cast("double").as(s"sum_$v"),
        (col(sumCol(v)).cast("double") / col(CntCol).cast("double")).as(s"avg_$v")))
    state.select(keys.map(col) ++ rendered: _*)
  }
}
