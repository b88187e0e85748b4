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

  /** Interval union (gaps-and-islands coalescing): give each event a
    * half-open coverage interval [ts, ts + lengthSeconds) and merge each
    * actor's overlapping-or-adjacent intervals into maximal spans — the
    * "total time covered" primitive (ad exposure, machine uptime, lease
    * coverage) that sessionization's gap rule cannot express (a session
    * breaks on inactivity ≥ gap measured START-to-start; a span breaks only
    * when coverage actually lapses).
    *
    * Algorithm: per actor in time order, an interval starts a new span iff
    * its start lies strictly after the running max of all PREVIOUS interval
    * ends (equality = adjacency = merge, the half-open convention); span id
    * = running sum of those starts. Exact integer microseconds throughout.
    *
    * Scale: ONE shuffle on the actor key — the two windows and the span
    * aggregate share the partitioning, same single-Exchange plan shape as
    * [[assign]], with the same per-actor-fits-a-task contract.
    *
    * Output: one row per (actor, span_id): span_start_us, span_end_us,
    * n_intervals, span_us.
    */
  def intervalUnion(df: DataFrame, actorCol: String, tsCol: String,
      lengthSeconds: Long): DataFrame = {
    require(lengthSeconds > 0, s"lengthSeconds must be positive, got $lengthSeconds")
    val byActor = Window.partitionBy(actorCol).orderBy(col("_us"))
    val lenUs = lengthSeconds * 1000000L
    val us = when(col(tsCol).isNull,
      raise_error(lit(s"intervalUnion: timestamp column $tsCol is null")))
      .otherwise(unix_micros(col(tsCol)))
    val prevMaxEnd = max(col("_e"))
      .over(byActor.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(actorCol), us.as("_us"))
      .withColumn("_e", col("_us") + lenUs)
      .withColumn("_new", when(prevMaxEnd.isNull || col("_us") > prevMaxEnd, 1L)
        .otherwise(0L))
      .withColumn("span_id",
        sum(col("_new")).over(byActor.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(actorCol), col("span_id"))
      .agg(
        min(col("_us")).as("span_start_us"),
        max(col("_e")).as("span_end_us"),
        count(lit(1)).as("n_intervals"),
        (max(col("_e")) - min(col("_us"))).as("span_us"))
  }

  /** INCREMENTAL sessionization: fold a batch of new events into an
    * existing [[sessions]] table without rescanning history — the session-
    * store maintenance path (at 100 TB the history is years of events; a
    * micro-batch must cost O(batch + touched sessions), not O(history)).
    *
    * Stored sessions become blocks (start_us, end_us, n_events, sums);
    * each delta event is a single-event block. Per actor, blocks sorted by
    * start merge under the SAME gap rule as [[assign]] (new session iff
    * start − running-max-end ≥ gap): inside a stored block every gap is
    * < gap by construction and stays merged, and every cross-block gap is
    * between KNOWN event times (a stored end/start or a delta event), so
    * the block chain reproduces the full event-level recompute exactly —
    * including a late event bridging two stored sessions into one, or
    * landing inside a stored interval. Adding events can only merge
    * sessions, never split them, which is why block granularity loses
    * nothing.
    *
    * `sumCols` maps a stored sum column name → the per-event expression
    * over the delta (e.g. `"sum_value" -> col("value").cast("decimal(18,2)")`).
    * Sums must be EXACT-typed (integer/decimal) in the stored table:
    * re-merging double partials would make the result depend on merge
    * order. Session ids are re-densified per actor in time order, matching
    * a from-scratch [[sessions]] run.
    *
    * Scale: the delta's actors are the only ones whose blocks re-chain —
    * stored sessions of untouched actors pass through unchanged via an
    * anti join; one window shuffle on the touched subset's actor key.
    */
  def mergeSessions(stored: DataFrame, deltaEvents: DataFrame,
      actorCol: String, tsCol: String, gapSeconds: Long,
      sumCols: Map[String, Column] = Map.empty): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    val sumNames = sumCols.keys.toSeq.sorted
    val us = when(col(tsCol).isNull,
      raise_error(lit(s"mergeSessions: timestamp column $tsCol is null")))
      .otherwise(unix_micros(col(tsCol)))
    val deltaBlocks = deltaEvents.select(
      (col(actorCol) +: (us.as("start_us") +: us.as("end_us") +:
        lit(1L).as("n_events") +:
        sumNames.map(n => sumCols(n).as(n)))): _*)
    val touchedActors = deltaBlocks.select(col(actorCol)).distinct()
    val storedBlocks = stored.select(
      (col(actorCol) +: col("start_us") +: col("end_us") +:
        col("n_events") +: sumNames.map(col)): _*)
    // untouched actors: sessions pass through, no re-chaining work
    val untouched = stored.join(touchedActors, Seq(actorCol), "left_anti")
    val byActor = Window.partitionBy(col(actorCol))
      .orderBy(col("start_us"), col("end_us"))
    val prevMaxEnd = max(col("end_us"))
      .over(byActor.rowsBetween(Window.unboundedPreceding, -1))
    val rechained = storedBlocks
      .join(touchedActors, Seq(actorCol), "left_semi")
      .unionByName(deltaBlocks)
      .withColumn("_new",
        when(prevMaxEnd.isNull || col("start_us") - prevMaxEnd >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(byActor.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(actorCol), col("session_id"))
      .agg(
        min(col("start_us")).as("start_us"),
        (max(col("end_us")).as("end_us") +:
          sum(col("n_events")).as("n_events") +:
          sumNames.map(n => sum(col(n)).as(n))): _*)
      .withColumn("dur_us", col("end_us") - col("start_us"))
      .select((col(actorCol) +: col("session_id") +: col("start_us") +:
        col("end_us") +: col("n_events") +: col("dur_us") +:
        sumNames.map(col)): _*)
    untouched.select((col(actorCol) +: col("session_id") +:
        col("start_us") +: col("end_us") +: col("n_events") +:
        col("dur_us") +: sumNames.map(col)): _*)
      .unionByName(rechained)
  }
}
