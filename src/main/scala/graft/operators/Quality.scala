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
