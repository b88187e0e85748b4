package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: group each actor's event stream into
  * sessions separated by `gapSeconds` of inactivity, then reduce each
  * session to one stats row. The batch twin of the streaming
  * `session_window` surface (q18) — the reference delegates this exact
  * shape to Greenplum window SQL (reference: README.md:9,15); here it is
  * two Catalyst window functions plus one aggregate.
  *
  * Scale: ONE shuffle, on the actor key. Both windows and the final
  * session aggregate share that partitioning, so Catalyst plans a single
  * Exchange and runs lag + running-sum + group-by without re-shuffling.
  * Per-actor data is processed sequentially inside its partition — the
  * standard sessionization contract; an actor's history must fit a task
  * (true for any real user stream, not true for a firehose keyed to one
  * synthetic actor — cap upstream if that can happen).
  */
object Sessionize {

  /** `df` plus a dense per-actor `session_id` (1-based, in time order).
    * A new session starts when the gap since the previous event is
    * `>= gapSeconds` (the first event of an actor always starts one).
    * Exact integer arithmetic on microseconds — no interval/float math,
    * so any engine replays the same session boundaries bit-for-bit.
    */
  def assign(df: DataFrame, actorCol: String, tsCol: String,
      gapSeconds: Long, sessionCol: String = "session_id"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val byActor = Window.partitionBy(actorCol).orderBy(col(tsCol))
    val gapUs = gapSeconds * 1000000L
    // a null ts would both fabricate a phantom session per null row (null
    // lag looks like a first event) and sort differently across engines
    // (Spark NULLS FIRST, pg/DuckDB NULLS LAST) — fail the job loudly
    val us = when(col(tsCol).isNull,
      raise_error(lit(s"Sessionize: timestamp column $tsCol is null")))
      .otherwise(unix_micros(col(tsCol)))
    val prevUs = lag(us, 1).over(byActor)
    val newSession = when(prevUs.isNull || us - prevUs >= gapUs, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(newSession).over(byActor.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** One row per (actor, session): start/end in epoch micros, event count,
    * duration, plus caller-supplied extra aggregates (e.g. per-type counts).
    * Column contract: actor, session_id, start_us, end_us, n_events,
    * dur_us, <extras>.
    */
  def sessions(df: DataFrame, actorCol: String, tsCol: String,
      gapSeconds: Long, extras: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(unix_micros(col(tsCol))).as("start_us"),
      max(unix_micros(col(tsCol))).as("end_us"),
      count(lit(1)).as("n_events"),
      (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("dur_us"))
    assign(df, actorCol, tsCol, gapSeconds)
      .groupBy(col(actorCol), col("session_id"))
      .agg(base.head, (base.tail ++ extras): _*)
  }
}
