package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Generate, Join, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE from the analyzed Catalyst plan — which base-table
  * columns each output column derives from. The governance question every
  * regulated deployment asks of a 100-TB pipeline ("which outputs touch
  * PII column X", "what breaks if we drop/retype this column") answered
  * statically: a driver-side walk of the resolved plan tree, zero data
  * touched, O(plan size).
  *
  * Resolution is by ExprId (Catalyst's stable attribute identity), so
  * renames, self-joins and repeated column names trace correctly where a
  * name-based walk would conflate them. The walk propagates a map
  * ExprId → {(source table, source column)} bottom-up:
  *
  *  - file scans seed each output attribute with its relation root;
  *  - Project / Aggregate / Window / Generate aliases map to the union of
  *    their child expressions' base references (an expression over k
  *    columns yields k lineage edges — `revenue = price * (1 - discount)`
  *    traces to both);
  *  - Union maps each output position to the union of every child's
  *    lineage at that position;
  *  - everything else (joins, filters, sorts, limits, subquery aliases)
  *    passes attributes through untouched.
  *
  * Two edge KINDS answer the two governance questions:
  *
  *  - `data` (the default walk): the output's VALUE derives from the
  *    source column — "which outputs carry PII column X";
  *  - `control` (`edges(df, includeControl = true)`): the source column
  *    is referenced in a Filter or Join condition anywhere in the plan,
  *    so it GATES which rows reach every output — "which outputs BREAK
  *    if column X is dropped/retyped" needs these too, because a query
  *    whose filter reads the column fails at analysis even when no
  *    output value derives from it. Control references resolve through
  *    the same ExprId map (a filter on a derived alias traces to the
  *    alias's base columns), and TRAVERSE scalar/IN/EXISTS subqueries
  *    found in conditions: the subquery's gating columns anchor to its
  *    own base relations (see controlSources).
  */
object Lineage {

  /** One lineage edge: output column ← (source table, source column),
    * `kind` ∈ data|control. `table` is the relation's root path basename
    * (stable across environments; pass-through of the full path is
    * available via [[edgesFull]]).
    */
  final case class Edge(output: String, table: String, column: String,
      kind: String = "data")

  private type Refs = Map[Long, Set[(String, String)]]

  private def baseName(p: String): String = {
    val last = p.stripSuffix("/").split('/').last
    last.stripSuffix(".parquet").stripSuffix(".orc").stripSuffix(".avro")
  }

  private def refsOf(plan: LogicalPlan): Refs = plan match {
    case r: LogicalRelation =>
      val root = r.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(_.toString).getOrElse("?")
        case other => other.toString.take(64)
      }
      r.output.map(a => a.exprId.id -> Set((root, a.name))).toMap
    case u: Union =>
      val childMaps = u.children.map(refsOf)
      val positional = u.output.zipWithIndex.map { case (out, i) =>
        val merged = u.children.zip(childMaps).flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId.id, Set.empty[(String, String)])
        }.toSet
        out.exprId.id -> merged
      }.toMap
      childMaps.fold(Map.empty: Refs)(_ ++ _) ++ positional
    case _ =>
      val childMap: Refs =
        plan.children.map(refsOf).fold(Map.empty: Refs)(_ ++ _)
      def ofAliases(exprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Refs =
        exprs.collect { case a: Alias =>
          a.exprId.id -> a.child.references.toSeq.flatMap(ref =>
            childMap.getOrElse(ref.exprId.id, Set.empty[(String, String)])).toSet
        }.toMap
      val local: Refs = plan match {
        case p: Project => ofAliases(p.projectList)
        case a: Aggregate => ofAliases(a.aggregateExpressions)
        case w: Window => ofAliases(w.windowExpressions)
        case g: Generate =>
          val srcs = g.generator.references.toSeq.flatMap(ref =>
            childMap.getOrElse(ref.exprId.id, Set.empty[(String, String)])).toSet
          g.generatorOutput.map(a => a.exprId.id -> srcs).toMap
        case e: Expand =>
          e.output.zipWithIndex.map { case (out, i) =>
            out.exprId.id -> e.projections.flatMap(row =>
              row(i).references.toSeq.flatMap(ref =>
                childMap.getOrElse(ref.exprId.id, Set.empty[(String, String)]))).toSet
          }.toMap
        case _ => Map.empty: Refs
      }
      childMap ++ local
  }

  /** Lineage edges with FULL source root paths. */
  def edgesFull(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val refs = refsOf(plan)
    plan.output.flatMap { a: Attribute =>
      refs.getOrElse(a.exprId.id, Set.empty[(String, String)]).toSeq
        .map { case (t, c) => (a.name, t, c) }
    }.sorted
  }

  /** Lineage edges with source tables reduced to root-path basenames. */
  def edges(df: DataFrame): Seq[Edge] =
    edgesFull(df).map { case (o, t, c) => Edge(o, baseName(t), c) }
      .distinct.sortBy(e => (e.output, e.table, e.column))

  /** Base columns referenced by Filter/Join conditions anywhere in the
    * plan, resolved through the same ExprId map (so a condition over a
    * derived alias traces to the alias's base columns).
    *
    * SUBQUERY conditions traverse too (r14 — the r13-documented
    * boundary): `WHERE x IN (SELECT k FROM d WHERE d.flag = 1)` gates
    * every output on `x`, on `d.k` (the compared subquery output) and on
    * `d.flag` (the inner filter) — dropping ANY of them breaks the query
    * at analysis. Each [[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]]
    * found in a condition recurses with the SUBQUERY's own ref map
    * (anchoring its columns to its own base relations), and the
    * subquery's output columns join the control set (the values the
    * IN/scalar comparison consumes). Nested subqueries recurse naturally.
    */
  private def controlSources(plan: LogicalPlan, refs: Refs): Set[(String, String)] = {
    val conds = plan.collect {
      case f: Filter => Seq(f.condition)
      case j: Join => j.condition.toSeq
    }.flatten
    val direct = conds.flatMap(_.references.toSeq.flatMap(r =>
      refs.getOrElse(r.exprId.id, Set.empty[(String, String)])))
    val fromSubqueries = conds
      .flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s
      })
      .flatMap { s =>
        val subRefs = refsOf(s.plan)
        val outputRefs = s.plan.output.flatMap(a =>
          subRefs.getOrElse(a.exprId.id, Set.empty[(String, String)]))
        controlSources(s.plan, subRefs) ++ outputRefs
      }
    (direct ++ fromSubqueries).toSet
  }

  /** Data edges plus, when `includeControl`, one `control` edge per
    * (output, gating source column): every output is row-gated by every
    * Filter/Join condition in its plan, so "drop column X" breaks
    * exactly the outputs carrying a control (or data) edge from X. A
    * column can legitimately carry both kinds (joined AND projected).
    */
  def edges(df: DataFrame, includeControl: Boolean): Seq[Edge] = {
    val data = edges(df)
    if (!includeControl) return data
    val plan = df.queryExecution.analyzed
    val ctrl = controlSources(plan, refsOf(plan))
    val ctrlEdges = for {
      a <- plan.output
      (t, c) <- ctrl.toSeq
    } yield Edge(a.name, baseName(t), c, "control")
    (data ++ ctrlEdges.distinct)
      .sortBy(e => (e.output, e.table, e.column, e.kind))
  }

  /** The edges as a DataFrame (output_col, src_table, src_column) — for
    * catalogs and the driver's oracle gate.
    */
  def render(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    edges(df).map(e => (e.output, e.table, e.column))
      .toDF("output_col", "src_table", "src_column")
  }

  /** Data + control edges as a DataFrame (output_col, src_table,
    * src_column, kind).
    */
  def renderWithControl(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    edges(df, includeControl = true)
      .map(e => (e.output, e.table, e.column, e.kind))
      .toDF("output_col", "src_table", "src_column", "kind")
  }
}
