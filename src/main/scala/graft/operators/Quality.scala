package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality validation — the post-merge integrity check a CDC
  * sink wants after every load (is the PK still unique? did a decode land
  * NULLs or out-of-range values?), and the pre-training gate a corpus
  * pipeline runs before shipping a dataset. In the reference deployment
  * this role is played by ad-hoc SQL against Greenplum after bireme syncs
  * (reference: README.md:9,15 — the warehouse owns all querying); here it
  * is a first-class operator over any DataFrame.
  *
  * ALL rules evaluate in ONE aggregate job: each rule contributes a
  * violation-count expression to a single `agg`, and the per-rule report
  * rows are exploded from that single aggregated row. Adding rules never
  * adds passes over the data. Cost note: sum-based rules are pure map-side
  * partials (one row per task crosses), but any [[Unique]] rule makes the
  * aggregate a mixed-distinct plan — the first shuffle carries one row per
  * DISTINCT key (up to table cardinality for a PK check), the standard
  * price of an exact distinct count.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Violations: rows where `column` IS NULL. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null($column)"
  }

  /** Violations: surplus duplicate rows = total − distinct key count.
    * NULL keys are skipped by the distinct count (SQL semantics), so rows
    * with a NULL key all count as violations — pair with [[NotNull]].
    */
  final case class Unique(columns: Seq[String]) extends Rule {
    require(columns.nonEmpty, "Unique needs at least one column")
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Violations: non-NULL values outside [lo, hi] (NULLs are [[NotNull]]'s
    * business, not a range violation).
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    require(lo <= hi, s"lo=$lo must be <= hi=$hi")
    def name = s"in_range($column)"
  }

  /** Violations: non-NULL values outside the accepted set. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    require(values.nonEmpty, "InSet needs at least one accepted value")
    def name = s"in_set($column)"
  }

  private def violations(r: Rule): Column = r match {
    // sums coalesce to 0 so an EMPTY table reports 0/pass, not NULL/NULL
    case NotNull(c) => coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
    case Unique(cs) =>
      // bare columns, NOT struct(...): SQL's count(DISTINCT a, b) skips
      // rows with any NULL key, so NULL-key rows all count as violations
      // (a struct would wrap NULL into one distinct value and undercount)
      count(lit(1)) - countDistinct(col(cs.head), cs.tail.map(col): _*)
    case InRange(c, lo, hi) =>
      coalesce(sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L)), lit(0L))
    case InSet(c, vs) =>
      coalesce(sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L)
        .otherwise(0L)), lit(0L))
  }

  /** ENFORCEMENT twin of [[check]]: per-ROW rule evaluation — every input
    * row annotated with the sorted array of rule names it violates
    * (`violated`) and a `pass` flag, so a pipeline can split clean rows
    * from a quarantine stream instead of only counting. Semantics match
    * [[check]] with one deliberate difference: [[Unique]] flags EVERY row
    * of a duplicated (or NULL) key, not just the surplus copies — row
    * enforcement cannot pick the innocent duplicate, so none of them may
    * pass.
    *
    * Scale: scalar rules ride the scan; each [[Unique]] rule adds one
    * window count on its key columns (a shuffle on that key). The flag
    * array is tiny (≤ |rules| names).
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val flags = rules.map { r =>
      val hit: Column = r match {
        case NotNull(c) => col(c).isNull
        case InRange(c, lo, hi) =>
          col(c).isNotNull && (col(c) < lo || col(c) > hi)
        case InSet(c, vs) => col(c).isNotNull && !col(c).isin(vs: _*)
        case Unique(cs) =>
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(cs.map(col): _*)) > 1 ||
            cs.map(col(_).isNull).reduce(_ || _)
      }
      when(hit, lit(r.name))
    }
    df.withColumn("violated",
        sort_array(filter(array(flags: _*), x => x.isNotNull)))
      .withColumn("pass", size(col("violated")) === 0)
  }

  /** One profiled suggestion: the typed [[Rule]] ready for [[check]] /
    * [[quarantine]], plus the evidence it was derived from.
    */
  final case class Suggestion(column: String, rule: Rule, nRows: Long,
      metric: Long, lo: Option[Double], hi: Option[Double],
      vals: Option[Seq[String]])

  /** PROFILE → suggest constraints — the step before [[check]] when a
    * pipeline inherits a table without a contract: derive the rules the
    * data currently satisfies, review, then enforce. Suggested per
    * column, from ONE exact stats aggregate (plus one bounded pass
    * collecting the value sets of low-cardinality string columns):
    *
    *  - `not_null` when every row is non-null;
    *  - `unique` when the column is non-null AND all-distinct (exact
    *    `count(distinct)`, not the HLL estimate — a suggested PK
    *    constraint must not be approximately true);
    *  - `in_range` for every numeric column with data (observed bounds);
    *  - `in_set` for string columns with 2..`inSetMaxNdv` distinct values
    *    (sorted, so the suggestion is deterministic at any parallelism).
    *
    * By construction [[check]] over the suggestions passes on the
    * profiled data itself (spec-pinned) — they are a CONTRACT of the
    * present, to be tightened or relaxed by a human before enforcement.
    * Scale: the exact-distinct aggregate is the standard mixed-distinct
    * price ([[Unique]] note above); output is O(cols).
    */
  def suggestRules(df: DataFrame, cols: Seq[String],
      inSetMaxNdv: Int = 8): Seq[Suggestion] = {
    require(cols.nonEmpty, "suggestRules needs at least one column")
    require(inSetMaxNdv >= 2, s"inSetMaxNdv must be >= 2: $inSetMaxNdv")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(byName.contains(c), s"no such column: $c"))
    def numeric(c: String) =
      byName(c).isInstanceOf[org.apache.spark.sql.types.NumericType]
    def stringy(c: String) =
      byName(c) == org.apache.spark.sql.types.StringType

    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"lo_$c"),
            max(col(c)).cast("double").as(s"hi_$c"))
        else Nil)
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*).head()
    val n = row.getLong(0)
    var idx = 1
    val stats = cols.map { c =>
      val nn = row.getLong(idx); val nd = row.getLong(idx + 1)
      val (lo, hi) =
        if (numeric(c))
          (if (row.isNullAt(idx + 2)) None else Some(row.getDouble(idx + 2)),
            if (row.isNullAt(idx + 3)) None else Some(row.getDouble(idx + 3)))
        else (None, None)
      idx += (if (numeric(c)) 4 else 2)
      (c, nn, nd, lo, hi)
    }

    // bounded second pass: the accepted-value sets of low-card string cols
    val setCols = stats.collect {
      case (c, _, nd, _, _) if stringy(c) && nd >= 2 && nd <= inSetMaxNdv => c
    }
    val sets: Map[String, Seq[String]] =
      if (setCols.isEmpty) Map.empty
      else {
        val r = df.agg(
          array_sort(collect_set(col(setCols.head))).as(setCols.head),
          setCols.tail.map(c => array_sort(collect_set(col(c))).as(c)): _*).head()
        setCols.zipWithIndex.map { case (c, i) => c -> r.getSeq[String](i).toList }.toMap
      }

    stats.flatMap { case (c, nn, nd, lo, hi) =>
      val notNull = if (n > 0 && nn == n)
        Seq(Suggestion(c, NotNull(c), n, nn, None, None, None)) else Nil
      val uniq = if (n > 0 && nn == n && nd == n)
        Seq(Suggestion(c, Unique(Seq(c)), n, nd, None, None, None)) else Nil
      val range = (lo, hi) match {
        case (Some(l), Some(h)) =>
          Seq(Suggestion(c, InRange(c, l, h), n, nd, Some(l), Some(h), None))
        case _ => Nil
      }
      val inSet = sets.get(c).map(vs =>
        Suggestion(c, InSet(c, vs), n, nd, None, None, Some(vs))).toSeq
      notNull ++ uniq ++ range ++ inSet
    }
  }

  /** Suggestions as a DataFrame: (column, rule, n_rows, metric, lo, hi,
    * vals) — `rule` is the kind slug, `vals` the sorted comma-joined
    * accepted set (null unless in_set).
    */
  def renderSuggestions(spark: org.apache.spark.sql.SparkSession,
      suggestions: Seq[Suggestion]): DataFrame = {
    import spark.implicits._
    suggestions.map { s =>
      val kind = s.rule match {
        case _: NotNull => "not_null"
        case _: Unique => "unique"
        case _: InRange => "in_range"
        case _: InSet => "in_set"
      }
      (s.column, kind, s.nRows, s.metric, s.lo, s.hi, s.vals.map(_.mkString(",")))
    }.toDF("column", "rule", "n_rows", "metric", "lo", "hi", "vals")
  }

  /** @return one row per rule: (rule, violations, n_rows, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      violations(r).cast("long").as(s"_v$i")
    }
    val one = df.agg(count(lit(1)).cast("long").as("_total"), aggs: _*)
    one.select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"_v$i").as("violations"),
          col("_total").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.violations"), col("r.n_rows"),
        (col("r.violations") === 0L).as("pass"))
  }
}
