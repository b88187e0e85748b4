package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Generate, LogicalPlan, Project, Union, Window}
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
  * DATA lineage only: columns referenced exclusively in filters/join
  * conditions do not appear as sources of an output (they gate rows, not
  * values) — impact analysis for those reads the plan's predicates, a
  * different question.
  */
object Lineage {

  /** One lineage edge: output column ← (source table, source column).
    * `table` is the relation's root path basename (stable across
    * environments; pass-through of the full path is available via
    * [[edgesFull]]).
    */
  final case class Edge(output: String, table: String, column: String)

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

  /** The edges as a DataFrame (output_col, src_table, src_column) — for
    * catalogs and the driver's oracle gate.
    */
  def render(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    edges(df).map(e => (e.output, e.table, e.column))
      .toDF("output_col", "src_table", "src_column")
  }
}
