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
}
