package graft.plans

import graft.plans.StarMv.StarMvDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Workload-driven star-MV recommendation — the "engine recommends"
  * counterpart to [[StarMv.fromQuery]]'s "user declares": feed it a log
  * of the rollup queries a deployment actually runs and it proposes the
  * few summary definitions that would serve them, ranked by estimated
  * scan savings × hit frequency. The classic warehouse-advisor feature
  * the reference's Greenplum users get from external tooling.
  *
  * Method:
  *
  *  1. ANALYZE each query with [[StarMv.deriveDef]] (the exact extraction
  *     `CREATE MV … AS <query>` uses). Shapes an MV cannot serve — outer
  *     joins, residual filters, distinct aggregates — are skipped, not
  *     fatal: a workload log is allowed to contain unservable queries.
  *  2. MERGE by join tree: queries over the same table set + equi-join
  *     edges collapse into ONE candidate whose group columns, derived
  *     groups, and measures are the UNIONS of the members' — the rewrite
  *     serves any member's coarser grain from the union-grain summary by
  *     re-aggregation (grain subsumption), so one summary per join tree
  *     covers the whole family.
  *  3. ESTIMATE: candidate summary rows via one `approx_count_distinct`
  *     over the union group key on the candidate's own join (paid once,
  *     offline, next to where the build itself would run); base rows via
  *     [[MvCost]]'s tiers (registered stats, then parquet footers).
  *  4. RANK by (baseRows − estRows) × hits — scan rows saved per serve,
  *     times how often the workload serves — and drop candidates whose
  *     estimated summary is not materially smaller than the base
  *     ([[shrinkGate]]; a near-fact-grain summary is the advisor's
  *     version of [[MvCost]]'s serve-time refusal).
  *
  * The advisor only RECOMMENDS — [[Recommendation.buildAs]] turns one
  * into a registered, served summary when the caller accepts it.
  *
  * Scale: per candidate one aggregate of constant output (the ACD probe)
  * — never a materialized build; driver state is the definitions and a
  * few longs per candidate.
  */
object MvAdvisor {

  /** Minimum base/summary row ratio a recommendation must clear (the
    * probe is approximate, so demand real shrink, not rounding noise).
    */
  private val minShrink = 2.0

  final case class Recommendation(
      definition: StarMvDef,           // summaryPath left empty
      hits: Int,                       // workload queries it serves
      queryIdx: Seq[Int],              // which ones (workload indices)
      estSummaryRows: Long,            // approx_count_distinct probe
      baseRows: Option[Long],          // MvCost tiers (None = unknown)
      score: Double) {                 // (baseRows − est) × hits

    /** Accept the recommendation: build + register the summary at
      * `summaryPath` (one fact-sized aggregate, the same cost as a
      * hand-declared [[StarMv.build]]).
      */
    def buildAs(spark: SparkSession, summaryPath: String,
        losslessTables: Seq[String] = Nil): StarMvDef =
      StarMv.build(spark, definition.copy(summaryPath = summaryPath,
        losslessTables = losslessTables))
  }

  /** [[advise]] over an SQL-text query log — the form a deployment's
    * statement history actually arrives in. Each statement is PARSED
    * first (`sqlParser.parsePlan`) and only query-shaped plans proceed
    * to `spark.sql` (tables must be resolvable: registered temp views
    * or `parquet.`path`` references). The parse-first order matters:
    * `spark.sql` EXECUTES commands eagerly, and a real statement history
    * contains INSERT/CREATE/DROP — an analysis-only advisor must never
    * mutate state as a side effect of reading the log. Command and DDL/
    * DML statement plans are skipped, as are statements that fail to
    * parse — both like statements that refuse analysis.
    */
  def adviseSql(spark: SparkSession, workload: Seq[String],
      k: Int = 2): Seq[Recommendation] =
    adviseIndexed(spark, workload.zipWithIndex.flatMap { case (q, i) =>
      // a parse failure/skip drops the statement but keeps every other
      // statement's ORIGINAL index — queryIdx must point into the log
      scala.util.Try(spark.sessionState.sqlParser.parsePlan(q)).toOption
        .filter {
          // Command covers v2 DDL + runnable commands (DROP/SET/…);
          // ParsedStatement covers the v1 statement shapes (INSERT …)
          case _: org.apache.spark.sql.catalyst.plans.logical.Command => false
          case _: org.apache.spark.sql.catalyst.plans.logical.ParsedStatement => false
          case _ => true
        }
        .map(_ => i -> spark.sql(q))
    }, k)

  /** Analyze `workload`, return at most `k` recommendations, best first.
    * Queries that refuse analysis are skipped silently (pass them to
    * [[StarMv.fromQuery]] directly to see the refusal reason).
    */
  def advise(spark: SparkSession, workload: Seq[DataFrame],
      k: Int = 2): Seq[Recommendation] =
    adviseIndexed(spark, workload.zipWithIndex.map(_.swap), k)

  private def adviseIndexed(spark: SparkSession,
      workload: Seq[(Int, DataFrame)], k: Int): Seq[Recommendation] = {
    val analyzed = workload.flatMap { case (i, q) =>
      scala.util.Try(StarMv.deriveDef(q, summaryPath = "")).toOption
        .map(d => (i, d))
    }
    if (analyzed.isEmpty) return Nil
    // one candidate per (table set, join edge set)
    val grouped = analyzed.groupBy { case (_, d) =>
      (d.tables.map(MaterializedView.normalize).toSet, d.joinPairSet) }
    val cands = grouped.values.toSeq.map { members =>
      val defs = members.map(_._2)
      val merged = mergeDefs(defs)
      val est = estimateSummaryRows(spark, merged)
      val base = defs.head.tables
        .map(t => MvCost.leafSize(spark, t, Seq(t)).rows)
        .foldLeft(Option(0L)) { (acc, r) =>
          for (a <- acc; v <- r) yield a + v }
      val hits = members.size
      val saved = base.map(b => (b - est).max(0L).toDouble).getOrElse(0.0)
      Recommendation(merged, hits, members.map(_._1).sorted, est, base,
        saved * hits)
    }
    cands
      .filter(r => shrinkGate(r.estSummaryRows, r.baseRows))
      .sortBy(r => (-r.score, -r.hits))
      .take(k)
  }

  private def shrinkGate(est: Long, base: Option[Long]): Boolean =
    base.forall(b => b == 0L || (est.max(1L).toDouble * minShrink) <= b)

  /** Union-grain merge of same-join-tree definitions. Derived groups and
    * measures dedupe by their SQL form (the serve-time matcher's own
    * identity); a NAME collision between different forms gets a numeric
    * suffix so the summary schema stays unambiguous.
    */
  private def mergeDefs(defs: Seq[StarMvDef]): StarMvDef = {
    val head = defs.head
    val groupCols = defs.flatMap(_.groupCols).distinct
    val measures = defs.flatMap(_.measureCols).distinct
    // the collision set covers EVERY summary column — group AND measure
    // names: a derived-group alias colliding with a measure column (or a
    // renamed dmN landing on a user's own "dm0" alias) would yield a
    // duplicate-column summary schema and a failed build
    val taken = scala.collection.mutable.Set[String]()
    taken ++= groupCols.map(_.name)
    taken ++= measures.map(_.name)
    def claim(name: String): String = {
      var n = name; var i = 2
      while (taken.contains(n)) { n = s"${name}_$i"; i += 1 }
      taken += n
      n
    }
    val derivedGroups = scala.collection.mutable.LinkedHashMap[String, String]()
    defs.flatMap(_.derivedGroups).foreach { case (name, sql) =>
      if (!derivedGroups.contains(sql)) { derivedGroups += sql -> claim(name); () }
    }
    val derivedMeasures = scala.collection.mutable.LinkedHashMap[String, String]()
    defs.flatMap(_.derivedMeasures).foreach { case (_, sql) =>
      if (!derivedMeasures.contains(sql)) {
        derivedMeasures += sql -> claim(s"dm${derivedMeasures.size}"); ()
      }
    }
    head.copy(
      groupCols = groupCols,
      measureCols = measures,
      derivedGroups = derivedGroups.toSeq.map { case (sql, n) => (n, sql) },
      derivedMeasures = derivedMeasures.toSeq.map { case (sql, n) => (n, sql) })
  }

  /** Approximate distinct count of the union group key over the
    * candidate's own join — one aggregate with constant-size output, the
    * advisor's only data touch. Group expressions evaluate in the joined
    * frame exactly as the build would evaluate them.
    */
  private def estimateSummaryRows(spark: SparkSession,
      d: StarMvDef): Long = {
    val base = StarMv.joinTables(spark, d) // the build's own join shape
    val keyCols = d.groupCols.map(q => col(q.name)) ++
      d.derivedGroups.map { case (n, sql) => expr(sql).as(n) }
    if (keyCols.isEmpty) 1L
    else base.agg(approx_count_distinct(struct(keyCols: _*)).as("n"))
      .head().getLong(0)
  }
}
