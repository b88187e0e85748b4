package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for a stage sequence s1 → s2 → … → sN, find per
  * actor the earliest time each stage was reached STRICTLY AFTER the
  * previous stage (so out-of-order events never count), then report how
  * many actors reached each stage. The classic product-analytics query the
  * reference's users run in Greenplum over synced event tables.
  *
  * Scale: one filtered aggregate per stage, every one keyed on the actor —
  * each stage's frame is at most one row per actor and shrinks
  * monotonically down the funnel, and all joins are equi-joins on that same
  * key (AQE broadcasts the later, smaller frames on its own). Stage count
  * is the (small, fixed) iteration bound; nothing iterates over data on
  * the driver.
  */
object Funnel {

  /** One row per actor that completed stage 1, with nullable columns
    * `t1 … tN` = epoch-micros of the earliest strictly-ordered hit of each
    * stage. `tK` is null when the actor never reached stage K after tK-1.
    */
  def stageTimes(df: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(stages.distinct == stages, s"duplicate stage in $stages")
    val us = unix_micros(col(tsCol))
    val first = df.filter(col(typeCol) === stages.head)
      .groupBy(col(actorCol)).agg(min(us).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      // left join keeps every actor that entered the funnel; the min is
      // over this stage's events later than the actor's previous stage.
      val hits = df.filter(col(typeCol) === stage)
        .select(col(actorCol), us.as("hit_us"))
        .join(acc.select(col(actorCol), col(prev)), actorCol)
        .filter(col("hit_us") > col(prev))
        .groupBy(col(actorCol)).agg(min(col("hit_us")).as(cur))
      acc.join(hits.select(col(actorCol), col(cur)), Seq(actorCol), "left")
    }
  }

  /** Funnel summary: (stage_idx, stage, actors) — how many actors reached
    * each stage in order. Counts are non-increasing by construction.
    */
  def counts(df: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val times = stageTimes(df, actorCol, tsCol, typeCol, stages)
    val perStage = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
        count(col(s"t${i + 1}")).as("actors"))
    }
    // one aggregate row carrying all N counts, exploded to N rows — a
    // single job instead of N count() actions
    times.agg(array(perStage: _*).as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.actors"))
  }

  /** MATCH_RECOGNIZE-style contiguous pattern `start mid* end` per actor:
    * every `end`-typed event whose nearest preceding `start`-typed event
    * (same actor, time order) is separated from it ONLY by events whose
    * type is in `mid`, with end − start ≤ `maxSpanUs`. The contiguity
    * requirement is what [[stageTimes]] cannot express — a funnel ignores
    * interleaved noise; a pattern match rejects it.
    *
    * Mechanics (one shuffle on the actor key, shared by every window):
    * over the (ts, id)-ordered per-actor stream, carry three running
    * values — a row number, the running count of non-`mid` rows (`ncu`),
    * and the most recent `start` row's (rn, us, ncu) via ignore-nulls
    * last(). An `end` row matches iff its nearest start exists and
    * `ncu(end) − 1 = ncu(start)`: the only non-mid row in (start, end] is
    * the end itself, so everything strictly between is mid-typed. All
    * integer µs arithmetic — the oracle restates the chain verbatim.
    *
    * Output: (actorCol, match_id = the end event's `idCol`, start_us,
    * end_us, n_mid = rows strictly between). At 100 TB this is the
    * sessionize shape: one hash exchange on the actor, windows ride the
    * same sort, no self-join of the event table against itself.
    */
  def matchPattern(df: DataFrame, actorCol: String, tsCol: String,
      idCol: String, typeCol: String, startType: String, midTypes: Seq[String],
      endType: String, maxSpanUs: Long): DataFrame = {
    require(maxSpanUs >= 0, s"maxSpanUs must be >= 0, got $maxSpanUs")
    require(startType != endType,
      "startType == endType would shadow every true match with the end row itself")
    require(!midTypes.contains(startType) && !midTypes.contains(endType),
      s"midTypes $midTypes must not contain the start/end types")
    import org.apache.spark.sql.expressions.Window
    val ev = df.select(col(actorCol), col(idCol),
      col(typeCol).as("_ty"), unix_micros(col(tsCol)).as("_us"))
    val ord = Window.partitionBy(actorCol).orderBy(col("_us"), col(idCol))
    // explicit ROWS frame: the default RANGE frame is illegal under a
    // two-column ordering
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isStart = col("_ty") === startType
    val marked = ev
      .withColumn("_rn", row_number().over(ord))
      .withColumn("_ncu",
        sum(when(col("_ty").isInCollection(midTypes), 0).otherwise(1)).over(run))
      .withColumn("_sv_rn", last(when(isStart, col("_rn")), ignoreNulls = true).over(run))
      .withColumn("_sv_us", last(when(isStart, col("_us")), ignoreNulls = true).over(run))
      .withColumn("_sv_ncu", last(when(isStart, col("_ncu")), ignoreNulls = true).over(run))
    marked
      .where(col("_ty") === endType && col("_sv_rn").isNotNull &&
        col("_ncu") - 1 === col("_sv_ncu") &&
        col("_us") - col("_sv_us") <= maxSpanUs)
      .select(col(actorCol), col(idCol).as("match_id"),
        col("_sv_us").as("start_us"), col("_us").as("end_us"),
        (col("_rn") - col("_sv_rn") - 1).cast("long").as("n_mid"))
  }
}
