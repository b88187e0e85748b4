package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline PROVENANCE: auditable per-row drop attribution for a filter
  * cascade — the governance layer a training-data pipeline needs before
  * anyone will sign off on "we filtered 100 TB down to 40". A curation
  * run is a sequence of named keep-predicates (length gate, language
  * whitelist, dedup rank, quality score, decontamination...); the
  * questions auditors actually ask are "why was THIS document dropped"
  * (row-level) and "where did the volume go" (funnel-level), and both
  * must RECONCILE exactly: every input row appears in exactly one
  * disposition class, stage counts telescope (entering − dropped =
  * surviving = next stage's entering), and re-running attribution yields
  * identical numbers on any engine — which is why attribution is a
  * deterministic first-failing-stage rule over a declared order, not a
  * set of independent per-filter counts (those double-count rows failing
  * several filters and reconcile with nothing).
  *
  * Execution shape: [[disposition]] is ONE projection — a `when` chain
  * evaluating the declared predicates in order, no shuffle, fully
  * codegen'd, O(rows) at any scale. [[funnel]] adds one COUNT aggregate
  * over the (≤ #stages+1)-value disposition column and assembles the
  * telescoping report driver-side — constant driver state, one job.
  * NULL predicate results count as FAIL (SQL filters drop NULL rows) and
  * are attributed to the stage that produced them, not silently kept.
  *
  * Predicates may reference any column of the input, including columns
  * precomputed by heavier operators (a dedup rank from
  * [[Dedup]]'s posting joins, an LM score) — the cascade audits the
  * DECISION layer; the evidence columns are upstream's concern.
  */
object Provenance {

  /** One named cascade stage: rows where `keep` is not TRUE are dropped
    * here (if they survived every earlier stage).
    */
  final case class Stage(name: String, keep: Column)

  val DispositionCol = "_dropped_at"
  val Kept = "kept"

  /** Input + a `_dropped_at` column: the name of the FIRST stage (in
    * declared order) whose predicate the row fails, or `"kept"`.
    */
  def disposition(df: DataFrame, stages: Seq[Stage]): DataFrame = {
    require(stages.nonEmpty, "provenance needs at least one stage")
    require(stages.map(_.name).distinct.size == stages.size,
      s"stage names must be unique, got ${stages.map(_.name).mkString(",")}")
    require(!stages.exists(_.name == Kept),
      s"stage name '$Kept' collides with the kept marker")
    val attributed = stages.foldLeft(when(lit(false), lit(""))) { (acc, st) =>
      acc.when(!coalesce(st.keep, lit(false)), lit(st.name))
    }
    df.withColumn(DispositionCol, attributed.otherwise(lit(Kept)))
  }

  /** Telescoping funnel report: one row per stage with
    * `(stage_idx, stage, entering, dropped, surviving)` where
    * `surviving(i) == entering(i+1)` and the last `surviving` equals the
    * kept count — conservation holds by construction (the counts come
    * from ONE disposition aggregate, not per-stage re-counts that could
    * drift under concurrent mutation).
    */
  def funnel(df: DataFrame, stages: Seq[Stage]): DataFrame = {
    val spark = df.sparkSession
    val counts = disposition(df, stages)
      .groupBy(DispositionCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val rows = stages.zipWithIndex.scanLeft(
      ("", -1, 0L, 0L, total)) { case ((_, _, _, _, entering), (st, i)) =>
      val dropped = counts.getOrElse(st.name, 0L)
      (st.name, i, entering, dropped, entering - dropped)
    }.drop(1).map { case (name, i, entering, dropped, surviving) =>
      (i.toLong, name, entering, dropped, surviving)
    }
    import spark.implicits._
    rows.toSeq.toDF("stage_idx", "stage", "entering", "dropped", "surviving")
  }
}
