package graft.plans

import java.util.concurrent.CopyOnWriteArrayList

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Coalesce, EqualTo, EvalMode, Expression, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, sum}

/** Star-schema materialized views: a summary table pre-joining a fact with
  * its dimensions and pre-aggregating per group, plus a Catalyst rewrite
  * that reroutes a matching aggregate-over-join query to the summary — the
  * classic warehouse accelerator the reference's users get from Greenplum
  * summary tables over CDC-synced star schemas (reference: README.md:9,15).
  * [[MaterializedView]] covers single-table rollups; this covers the
  * fact⋈dimension shape (q73-style) where the join itself is the cost.
  *
  * Matching is EXACT on the relational algebra, not the plan shape: the
  * query's inner-equi-join tree is flattened to (leaf set, join-pair set)
  * and must equal the registered definition's — inner joins are associative
  * and commutative, so any join order the optimizer picks still matches,
  * while a missing table, an extra table, an outer join, or a different
  * join key refuses. Because the summary IS `groupBy(groupCols)` over that
  * exact join, matching queries re-aggregate it with the same decomposable
  * algebra as the single-table rule (sum→sum, min/max→min/max of partials,
  * count→sum of counts, avg→sum of sums over sum of counts at Average's
  * own internal types) — no PK/FK or multiplicity reasoning needed.
  *
  * Filter conjuncts must be deterministic and reference only group columns
  * (replayed on the summary — a group column's value survives the groupBy,
  * so filtering summary rows ≡ filtering join rows ≡ filtering the dim
  * before the join), with one carve-out: `IsNotNull(<join key>)` conjuncts
  * are DROPPED, because the optimizer infers them from the very equi-joins
  * the summary already materialized — an inner join's output has no null
  * keys, so the predicate is vacuous on the summary.
  *
  * Measures are plain fact/dimension columns or registered DERIVED
  * expressions over the join (`revenue = price * (1 - discount)`), matched
  * against the query's analyzed form exactly as
  * [[MaterializedView.MvDef.derivedGroups]] matches derived groups.
  *
  * Maintenance: [[rebuild]] (Greenplum's non-incremental `REFRESH` posture)
  * or real join-delta IVM — [[refreshTableDelta]] applies one table's CDC
  * batch via delta joins against the other tables (version-pinnable
  * through `tableOverrides` for multi-table batches), and
  * [[StarMvMaintainer]] runs that loop durably over versioned stores'
  * change feeds.
  *
  * Scale: the build pays the big shuffle join ONCE; every rollup after
  * reads |groups| summary rows instead of re-joining the fact. At 100 TB
  * the summary (nations × days, say) is MBs — the reroute turns a
  * multi-minute shuffle join into a broadcast-scale scan.
  *
  * Column names across the registered tables' REGISTERED columns (join
  * keys, groups, measures) must be globally unique — the TPC-H prefix
  * convention; rename-before-register if a schema reuses names.
  */
object StarMv {

  /** A column qualified by its source table's path (or store identity).
    * Matching happens on the [[normalized]] form: normalized path AND
    * lower-cased name — Spark resolves columns case-insensitively, and a
    * warehouse snapshot surfaces the catalog's casing (Derby/Greenplum
    * upper-case folding), so a definition registered as `f_cust` must
    * match a scan emitting `F_CUST`.
    */
  final case class QCol(path: String, name: String) {
    private[plans] def normalized: QCol =
      QCol(MaterializedView.normalize(path),
        name.toLowerCase(java.util.Locale.ROOT))
  }

  /** `joins` are unordered equi-join pairs — (QCol, QCol) with either side
    * listed first; a pair whose tables are already connected through other
    * pairs is applied as a post-join equality filter (the q73
    * supplier-nation shape, joined on both l_suppkey and c_nationkey).
    * `derivedMeasures` are (name, SQL over the joined relation).
    *
    * `losslessTables` declares tables whose join is a LOSSLESS 1:1
    * extension of the rest — their join key is unique and every partner
    * row matches exactly one of their rows (the dimension-key/FK contract
    * of a star schema). [[build]] VERIFIES the declaration against the
    * data (peeling outside-in: a declared table must touch exactly one
    * other table once tables behind it are peeled) and refuses a build
    * that can't prove it. A verified declaration widens the rewrite to
    * SUB-JOINS: a query joining any peelable subset of the tables — down
    * to the bare fact — is served from the same summary, because each
    * peeled extension contributed exactly one row per retained join row
    * (aggregate navigation / join elimination). [[refreshTableDelta]]
    * re-checks the contract delta-sized on every refresh and fails
    * loudly rather than silently serving wrong sub-join answers.
    */
  final case class StarMvDef(tables: Seq[String], joins: Seq[(QCol, QCol)],
      groupCols: Seq[QCol], measureCols: Seq[QCol], summaryPath: String,
      derivedMeasures: Seq[(String, String)] = Nil,
      losslessTables: Seq[String] = Nil,
      derivedGroups: Seq[(String, String)] = Nil) {
    private[plans] lazy val leafSet: Set[String] =
      tables.map(MaterializedView.normalize).toSet
    private[plans] lazy val joinPairSet: Set[Set[QCol]] =
      joins.map { case (a, b) => Set(a.normalized, b.normalized) }.toSet
    private[plans] lazy val joinKeySet: Set[QCol] =
      joinPairSet.flatten
    private[plans] lazy val groupByQ: Map[QCol, String] =
      groupCols.map(q => q.normalized -> q.name).toMap
    private[plans] lazy val measureByQ: Map[QCol, String] =
      measureCols.map(q => q.normalized -> q.name).toMap
    private[plans] lazy val losslessSet: Set[String] =
      losslessTables.map(MaterializedView.normalize).toSet
    /** summary group-key column names: plain group columns then derived
      * groups (`day -> "cast(o_orderdate as date)"` time hierarchies, the
      * shape that keeps a star summary at day grain instead of
      * per-timestamp — i.e. MBs instead of fact-sized).
      */
    private[plans] lazy val groupNames: Seq[String] =
      groupCols.map(_.name) ++ derivedGroups.map(_._1)
  }

  /** Scoped like [[MaterializedView]]'s registries: keyed by the active
    * session's `spark.graft.mv.scope` tag, default `"global"`.
    */
  private val registries = new java.util.concurrent.ConcurrentHashMap[
    String, CopyOnWriteArrayList[StarMvDef]]()

  private def registry: CopyOnWriteArrayList[StarMvDef] =
    registries.computeIfAbsent(MaterializedView.scopeTag,
      _ => new CopyOnWriteArrayList[StarMvDef]())

  def register(d: StarMvDef): Unit = {
    MvCost.evict(d.summaryPath) // a (re)written summary voids cached counts
    val r = registry
    // idempotent by summary path: build() registers, and a maintainer
    // created over that build registers again — a duplicate entry would
    // make candidatesFor evaluate the same definition twice per query
    r.removeIf(_.summaryPath == d.summaryPath)
    r.add(d); ()
  }
  def unregister(summaryPath: String): Unit = {
    MvCost.evict(summaryPath)
    registry.removeIf(_.summaryPath == summaryPath); ()
  }

  /** Test hygiene: wipes EVERY scope, including serving pauses. */
  def clear(): Unit = { registries.clear(); pausedServing.clear() }
  private[plans] def isEmpty: Boolean = registry.isEmpty
  private[plans] def registered: Seq[StarMvDef] = registry.asScala.toSeq

  /** Serving PAUSE set, keyed by the summary's base path (stable across
    * per-refresh `_v<n>` advances): a [[JdbcStarMaintainer]] mid-sequence
    * has merged some tables but not refreshed their deltas, and a JDBC
    * leaf has no snapshot identity to guard freshness on structurally (no
    * dir set) — so the maintainer pauses serving for the span of the
    * sequence instead. Paused definitions stay REGISTERED (the refresh
    * path requires that); they are just never candidates.
    */
  // keyed by (scope tag, summary base) like the registries themselves:
  // a pause in one tenant's scope must not suppress (or a resume unpause)
  // an identically-named summary in another scope
  private val pausedServing =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  private[plans] def summaryBase(summaryPath: String): String =
    summaryPath.replaceAll("_v\\d+$", "")

  private def pauseKey(summaryPath: String): (String, String) =
    (MaterializedView.scopeTag, summaryBase(summaryPath))

  private[plans] def pauseServing(summaryPath: String): Unit = {
    pausedServing.add(pauseKey(summaryPath)); ()
  }
  private[plans] def resumeServing(summaryPath: String): Unit = {
    pausedServing.remove(pauseKey(summaryPath)); ()
  }

  /** Definitions servable for a query over exactly `leaves`: exact
    * leaf-set matches first (no multiplicity reasoning needed), then
    * SUB-JOIN matches — defs whose extra tables are all declared lossless
    * and peel outside-in down to `leaves` ([[peelsTo]]). Paused summaries
    * are never candidates.
    */
  private[plans] def candidatesFor(leaves: Set[String]): Seq[StarMvDef] = {
    val all = registry.asScala.toSeq
      .filterNot(d => pausedServing.contains(pauseKey(d.summaryPath)))
    val exact = all.filter(_.leafSet == leaves)
    val sub = all.filter(d => d.losslessSet.nonEmpty &&
      d.leafSet != leaves && leaves.subsetOf(d.leafSet) && peelsTo(d, leaves))
    exact ++ sub
  }

  /** One outside-in peel step: a declared-lossless table whose remaining
    * edges all reach ONE other table. Peeling it removes those edges —
    * exactly the order [[verifyLossless]] proved 1:1 on the data.
    */
  private def peelsTo(d: StarMvDef, retained: Set[String]): Boolean = {
    var removed = d.leafSet -- retained
    if (!removed.subsetOf(d.losslessSet)) return false
    var edges = d.joins.map { case (a, b) => (a.normalized, b.normalized) }
    var progressed = true
    while (removed.nonEmpty && progressed) {
      progressed = false
      removed.find { e =>
        val touching = edges.filter { case (a, b) =>
          a.path == e || b.path == e }
        touching.nonEmpty && touching.map { case (a, b) =>
          if (a.path == e) b.path else a.path }.distinct.size == 1
      } match {
        case Some(e) =>
          edges = edges.filterNot { case (a, b) => a.path == e || b.path == e }
          removed -= e; progressed = true
        case None => ()
      }
    }
    removed.isEmpty
  }

  /** The verification/guard plan behind `losslessTables`: peel every
    * declared table outside-in over the FULL join graph, yielding
    * (table, partner, (partnerCol, tableCol) pairs) per step. None if a
    * declared table never reaches a single partner — e.g. a bridge table
    * two retained tables both join (removing it would silently drop the
    * transitive equality it enforces), or a member of a join cycle.
    */
  private[plans] def peelPlan(
      d: StarMvDef): Option[Seq[(String, String, Seq[(QCol, QCol)])]] = {
    var edges = d.joins.map { case (a, b) => (a.normalized, b.normalized) }
    var toPeel = d.losslessSet
    val plan = Seq.newBuilder[(String, String, Seq[(QCol, QCol)])]
    var progressed = true
    while (toPeel.nonEmpty && progressed) {
      progressed = false
      toPeel.find { e =>
        val touching = edges.filter { case (a, b) =>
          a.path == e || b.path == e }
        touching.nonEmpty && touching.map { case (a, b) =>
          if (a.path == e) b.path else a.path }.distinct.size == 1
      } match {
        case Some(e) =>
          val touching = edges.filter { case (a, b) =>
            a.path == e || b.path == e }
          val partner = touching.map { case (a, b) =>
            if (a.path == e) b.path else a.path }.head
          plan += ((e, partner, touching.map { case (a, b) =>
            if (a.path == e) (b, a) else (a, b) }))
          edges = edges.filterNot { case (a, b) => a.path == e || b.path == e }
          toPeel -= e; progressed = true
        case None => ()
      }
    }
    if (toPeel.isEmpty) Some(plan.result()) else None
  }

  /** render-form of each derived measure, analyzed against the joined
    * relation once per (summaryPath) and cached — the same
    * exprId-insensitive matching [[MvRewriteRule]] uses for derived groups.
    */
  private val derivedFormCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private[plans] def derivedForms(spark: SparkSession, d: StarMvDef): Map[String, String] =
    derivedFormCache.computeIfAbsent(d.summaryPath, { _ =>
      renderedForms(spark, d, d.derivedMeasures) })

  /** render-form → derived-GROUP name, same mechanism as [[derivedForms]]
    * but for the grouping side — a query expression whose optimized form
    * matches binds to the summary's derived group column.
    */
  private val derivedGroupFormCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private[plans] def derivedGroupForms(spark: SparkSession, d: StarMvDef): Map[String, String] =
    derivedGroupFormCache.computeIfAbsent(d.summaryPath, { _ =>
      renderedForms(spark, d, d.derivedGroups) })

  private def renderedForms(spark: SparkSession, d: StarMvDef,
      defs: Seq[(String, String)]): Map[String, String] =
    if (defs.isEmpty) Map.empty
    else {
      val joined = joinTables(spark, d)
      defs.flatMap { case (name, sql) =>
        scala.util.Try {
          // OPTIMIZED form, not merely analyzed: the query-side
          // expression this must match has already been through constant
          // folding / decimal canonicalization when our rule runs, so
          // the registered form must take the same trip
          val opt = joined.select(expr(sql).as("__dm"))
            .queryExecution.optimizedPlan
          val e = opt match {
            case Project(pl, _) => pl.head
            case other => other.expressions.head
          }
          MvRewriteRule.renderForm(e)
        }.toOption.flatten.map(_ -> name)
      }.toMap
    }

  /** derived groups that are exactly `cast(<ts> as date)`: ts column name
    * → day group name, feeding the shared day-range filter recovery.
    */
  private val derivedTsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private[plans] def derivedTsCols(spark: SparkSession, d: StarMvDef): Map[String, String] =
    derivedTsCache.computeIfAbsent(d.summaryPath, { _ =>
      if (d.derivedGroups.isEmpty) Map.empty
      else {
        val joined = joinTables(spark, d)
        d.derivedGroups.flatMap { case (name, sql) =>
          scala.util.Try {
            val analyzed = joined.select(expr(sql).as("__dg"))
              .queryExecution.analyzed.expressions.head
            val stripped = analyzed match {
              case a: Alias => a.child; case x => x }
            stripped match {
              case Cast(a: AttributeReference,
                org.apache.spark.sql.types.DateType, _, _) => Some(a.name)
              case _ => None
            }
          }.toOption.flatten.map(_ -> name)
        }.toMap
      }
    })

  /** Fold the registered tables into one joined DataFrame, connecting one
    * new table per step; pairs whose tables are both already connected
    * become post-join equality filters. `replaced` substitutes a table's
    * DataFrame (the join-delta maintenance path: inner joins distribute
    * over bag union/difference table-by-table, so joining a DELTA of one
    * table against the others' current states IS the summary's delta).
    */
  private[plans] def joinTables(spark: SparkSession, d: StarMvDef,
      replaced: Map[String, DataFrame] = Map.empty): DataFrame = {
    val byPath = d.tables.map { p =>
      val n = MaterializedView.normalize(p)
      n -> replaced.getOrElse(n, spark.read.parquet(p))
    }.toMap
    var joined = byPath(MaterializedView.normalize(d.tables.head))
    var in = Set(MaterializedView.normalize(d.tables.head))
    var pending = d.joins.map { case (a, b) => (a.normalized, b.normalized) }
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      val (connectable, rest) = pending.partition { case (a, b) =>
        in.contains(a.path) || in.contains(b.path) }
      val (applied, deferred) = connectable.partition { case (a, b) =>
        in.contains(a.path) != in.contains(b.path) }
      applied.groupBy { case (a, b) =>
        if (in.contains(a.path)) b.path else a.path
      }.foreach { case (newPath, pairs) =>
        val cond = pairs.map { case (a, b) =>
          col(a.name) === col(b.name): Column }.reduce(_ && _)
        joined = joined.join(byPath(newPath), cond, "inner")
        in += newPath
      }
      // both-sides-connected pairs (cycles) become equality filters
      val (cycles, stillPending) = deferred.partition { case (a, b) =>
        in.contains(a.path) && in.contains(b.path) }
      cycles.foreach { case (a, b) =>
        joined = joined.filter(col(a.name) === col(b.name)) }
      pending = rest ++ stillPending
      progressed = applied.nonEmpty || cycles.nonEmpty
    }
    require(pending.isEmpty && in == d.leafSet,
      s"join graph does not connect all tables: joined=$in pending=$pending")
    joined
  }

  /** Recompute the summary from the CURRENT base tables and swap the
    * registration to a fresh versioned path (`<path>_v<n>`) — the
    * post-CDC-merge refresh. The OLD registration is removed BEFORE the
    * recompute (a rebuild must never be satisfied from its own stale
    * summary — the same posture as [[MaterializedView.build]]), and the
    * old summary files are never overwritten, so a query planned against
    * them keeps evaluating; queries planned mid-rebuild fall back to the
    * base join — correct, just unaccelerated for that window.
    */
  def rebuild(spark: SparkSession, d: StarMvDef): StarMvDef = {
    val base = d.summaryPath.replaceAll("_v\\d+$", "")
    val next =
      if (d.summaryPath == base) s"${base}_v1"
      else base + "_v" + (d.summaryPath.substring(
        d.summaryPath.lastIndexOf("_v") + 2).toInt + 1)
    unregister(d.summaryPath)
    MvUsage.recordMaintenance(next) // a rebuild is a (full) maintenance wave
    build(spark, d.copy(summaryPath = next))
  }

  /** INCREMENTAL refresh for a CDC batch on ONE of the registered tables
    * (`tablePath`), the others unchanged — real join-delta IVM, not a
    * rebuild: inner joins distribute over bag union/difference per table,
    * so `J(T₁ … Tᵢ±Δ … Tₙ) = J(old) + (T₁…Δ⁺…Tₙ) − (T₁…Δ⁻…Tₙ)` and the
    * summary folds DELTA-JOIN-sized partials instead of re-joining the
    * fact. `inserts`/`deletes` carry the changed table's columns (a delete
    * row restates the deleted row's values — the CDC delete image); call
    * AFTER the batch landed in that table (the min/max repair reads the
    * CURRENT join).
    *
    * Maintenance algebra = [[MaterializedView.refreshDelta]]'s, lifted to
    * the join: sum/count/cnt partials merge by signed addition; min/max
    * are unmaintainable under deletes, so groups whose stored extreme a
    * deleted value touches are recomputed from the post-batch join in one
    * pruned pass (broadcast semi join on the batch-bounded affected key
    * set; per-column IN pushdown under `recomputeKeyCap`). All
    * maintenance joins are null-safe — NULL dimension values are legal
    * group keys. A group whose cnt reaches 0 leaves the summary; negative
    * cnt (deleting join rows that never existed) fails loudly in-plan.
    * Same versioned-path swap and crash posture as [[rebuild]].
    *
    * Changing a DIMENSION's join-key or group columns mid-stream is the
    * one shape this cannot maintain cheaply (it re-keys history) — batch
    * deltas on such a table still work through this path (the delta join
    * computes exactly the affected join rows), but the deletes must
    * restate the OLD dimension rows, and a simpler operational answer is
    * [[rebuild]].
    *
    * Cost: two delta joins (delta × bounded dims — broadcast-sized in the
    * star shape) + a groups-sized merge + a pruned recompute ∝ affected
    * groups. Never a full re-join.
    */
  def refreshTableDelta(spark: SparkSession, d: StarMvDef, tablePath: String,
      inserts: DataFrame, deletes: DataFrame,
      recomputeKeyCap: Int = 1000,
      tableOverrides: Map[String, DataFrame] = Map.empty): StarMvDef = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, concat, concat_ws, raise_error, when}
    val path = MaterializedView.normalize(tablePath)
    require(d.tables.map(MaterializedView.normalize).contains(path),
      s"$tablePath is not one of the MV's tables")
    // `tableOverrides` substitutes table CONTENT without touching the
    // definition (keys are table paths; values typically versioned-store
    // snapshots). This is what makes MULTI-table batches sequence
    // correctly: J(T₁",T₂") − J(T₁,T₂) = Δ₁⋈T₂ + T₁"⋈Δ₂ — each table's
    // delta must join the PREVIOUS tables at their NEW state and the
    // REMAINING tables at their OLD state, which only a caller holding
    // both versions (StarMvMaintainer over versioned stores) can supply.
    // Applying deltas sequentially with every path already merged on disk
    // would instead double-count Δ₁⋈Δ₂. The overrides also feed the
    // min/max repair join, which must see exactly the state the summary
    // represents AFTER this delta.
    val overrides = tableOverrides.map { case (p, df) =>
      MaterializedView.normalize(p) -> df }
    overrides.keys.foreach { p =>
      require(d.tables.map(MaterializedView.normalize).contains(p),
        s"override $p is not one of the MV's tables") }
    require(registry.contains(d), "refreshTableDelta needs the CURRENTLY " +
      "registered definition (register/build first)")
    // Lossless-integrity guards: the sub-join serving contract was proved
    // at build; a delta can break it two ways, both checked here at delta
    // cost and failing LOUDLY (rebuild, or drop the declaration) rather
    // than letting the summary silently serve wrong sub-join answers.
    if (d.losslessSet.nonEmpty) {
      def cur(p: String): DataFrame =
        overrides.getOrElse(p, spark.read.parquet(
          d.tables.find(t => MaterializedView.normalize(t) == p).get))
      peelPlan(d).toSeq.flatten.foreach { case (e, partner, pairs) =>
        val eKeys = pairs.map(_._2.name)
        val pKeys = pairs.map(_._1.name)
        if (partner == path && !inserts.isEmpty) {
          // new partner rows must still match the extension exactly once
          val orphan = inserts.select(pKeys.map(col): _*).join(
            cur(e).select(eKeys.map(col): _*),
            pKeys.zip(eKeys).map { case (p2, k) => col(p2) === col(k) }
              .reduce(_ && _), "left_anti").limit(1)
          require(orphan.isEmpty, s"refreshTableDelta: inserted $partner " +
            s"rows have no match in lossless table $e — rebuild or drop " +
            "the losslessTables declaration")
        }
        if (e == path) {
          if (!inserts.isEmpty) {
            // the extension must stay unique — checked DELTA-SIZED: only
            // the inserted key combinations can newly violate uniqueness
            // (the rest was proved at build / the previous refresh), so
            // restrict the aggregate to them via a semi join first
            val insKeys = inserts.select(eKeys.map(col): _*).distinct()
            val dup = cur(e).join(insKeys, eKeys, "left_semi")
              .groupBy(eKeys.map(col): _*)
              .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1)
            require(dup.isEmpty, s"refreshTableDelta: $e is no longer " +
              s"unique on (${eKeys.mkString(", ")}) — rebuild or drop the " +
              "losslessTables declaration")
          }
          if (!deletes.isEmpty) { // deleted keys must not orphan partners
            val goneKeys = deletes.select(eKeys.map(col): _*).distinct()
              .exceptAll(cur(e).select(eKeys.map(col): _*).distinct())
            val pDf = cur(partner)
            val orphaned = pDf.join(goneKeys,
              pKeys.zip(eKeys).map { case (p2, k) => pDf(p2) === goneKeys(k) }
                .reduce(_ && _), "left_semi").limit(1)
            require(orphaned.isEmpty, s"refreshTableDelta: deleting keys " +
              s"from lossless table $e orphans $partner rows — rebuild or " +
              "drop the losslessTables declaration")
          }
        }
      }
    }
    val g = d.groupNames.map(col)
    val gNames = d.groupNames
    val allMeasures = d.measureCols.map(_.name) ++ d.derivedMeasures.map(_._1)
    val old = spark.read.parquet(d.summaryPath)
    val oldTypes = old.schema.map(f => f.name -> f.dataType).toMap
    def deltaJoin(delta: DataFrame): DataFrame = {
      val joined = joinTables(spark, d, overrides + (path -> delta))
      (d.derivedMeasures ++ d.derivedGroups).foldLeft(joined) {
        case (acc, (n, sql)) => acc.withColumn(n, expr(sql)) }
    }
    // ONE delta join for BOTH sides (r15, guide §1.2/§2.3): the insert and
    // delete partials used to be two separate deltaJoin passes — and delP
    // was consumed twice (affected detection + the merged write), so the
    // delete-side join ran twice more. On a DIMENSION wave each of those
    // passes joins the delta against the FULL fact snapshot (Δdim ⋈ fact is
    // the expensive, unavoidable half of the IVM algebra) — three
    // fact-sized passes where one suffices. Rows are tagged ±1, joined
    // once, and ONE conditional aggregate produces both partial sets;
    // `when(_sgn = ...)` yields NULL for the other side's rows, which
    // sum/count/min/max skip, so each column equals its old
    // inserts-only/deletes-only aggregate exactly. Groups present on only
    // one side now emit an all-null/zero row for the other — the
    // union+re-aggregate merge below is invariant to those (sum/min/max
    // ignore NULL, cnt adds 0). The groups-sized result is
    // localCheckpointed so its three consumers (affected probe, key
    // collect, merged write) never re-run the join.
    val sgn = col("_graft_sgn")
    val both = inserts.withColumn("_graft_sgn", lit(1))
      .unionByName(deletes.withColumn("_graft_sgn", lit(-1)))
    def side(m: String, s: Int) = when(sgn === s, col(m))
    val bothAggs = allMeasures.flatMap(m => Seq(
      sum(side(m, 1)).as(s"s_$m"), count(side(m, 1)).as(s"c_$m"),
      min(side(m, 1)).as(s"mn_$m"), max(side(m, 1)).as(s"mx_$m"),
      sum(side(m, -1)).as(s"ds_$m"), count(side(m, -1)).as(s"dc_$m"),
      min(side(m, -1)).as(s"dmn_$m"), max(side(m, -1)).as(s"dmx_$m"))) ++ Seq(
      sum(when(sgn === 1, 1L).otherwise(0L)).as("cnt"),
      sum(when(sgn === -1, 1L).otherwise(0L)).as("dcnt"))
    val combined = deltaJoin(both).groupBy(g: _*)
      .agg(bothAggs.head, bothAggs.tail: _*)
      .localCheckpoint()
    val insP = combined.select(gNames.map(col) ++ allMeasures.flatMap(m => Seq(
      col(s"s_$m"), col(s"c_$m"), col(s"mn_$m"), col(s"mx_$m"))) :+
      col("cnt"): _*)
    val delP = combined.select(gNames.map(col) ++ allMeasures.flatMap(m => Seq(
      col(s"ds_$m"), col(s"dc_$m"), col(s"dmn_$m"), col(s"dmx_$m"))) :+
      col("dcnt"): _*)
    val delSigned = delP.select(g ++ allMeasures.flatMap(m => Seq(
      (-col(s"ds_$m")).cast(oldTypes(s"s_$m")).as(s"s_$m"),
      (-col(s"dc_$m")).as(s"c_$m"),
      lit(null).cast(oldTypes(s"mn_$m")).as(s"mn_$m"),
      lit(null).cast(oldTypes(s"mx_$m")).as(s"mx_$m"))) :+
      (-col("dcnt")).as("cnt"): _*)
    val mergeAggs = allMeasures.flatMap(m => Seq(
      sum(col(s"s_$m")).as(s"s_$m"), sum(col(s"c_$m")).as(s"c_$m"),
      min(col(s"mn_$m")).as(s"mn_$m"), max(col(s"mx_$m")).as(s"mx_$m"))) :+
      sum(col("cnt")).as("cnt")
    val merged = old.unionByName(insP.selectExpr(old.columns.map(c => s"`$c`"): _*))
      .unionByName(delSigned.selectExpr(old.columns.map(c => s"`$c`"): _*))
      .groupBy(g: _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .withColumn("cnt", when(col("cnt") < 0, raise_error(concat(
        lit("refreshTableDelta: negative count for group ("),
        concat_ws(",", g.map(_.cast("string")): _*),
        lit(") — deletes reference join rows that never existed"))))
        .otherwise(col("cnt")))
      .filter(col("cnt") > 0)

    val affectedOpt = if (allMeasures.isEmpty) None else {
      val touched = allMeasures.map(m =>
        coalesce(col(s"dmn_$m") <= col(s"mn_$m"), lit(false)) ||
          coalesce(col(s"dmx_$m") >= col(s"mx_$m"), lit(false)))
        .reduce(_ || _)
      Some(delP.join(old,
          gNames.map(n => delP(n) <=> old(n)).reduce(_ && _), "inner")
        .filter(touched).select(gNames.map(delP(_)): _*).distinct().cache())
    }
    // ONE limited collect instead of count-then-collect (two actions → one,
    // r15): ≤ cap rows decide both the emptiness check and the IN pushdown
    // below; cap+1 rows mean "over cap", where the exact count was never
    // used anyway.
    val keyRowsOpt = affectedOpt.map(_.limit(recomputeKeyCap + 1).collect())
    val nAffected = keyRowsOpt.map(_.length.toLong).getOrElse(0L)

    val repaired = if (nAffected == 0) {
      merged.select(merged.columns.map(col) ++
        (lit(null).cast("int").as("_aff") +:
          allMeasures.flatMap(m => Seq(
            lit(null).cast(oldTypes(s"mn_$m")).as(s"r_mn_$m"),
            lit(null).cast(oldTypes(s"mx_$m")).as(s"r_mx_$m")))): _*)
    } else {
      val affected = affectedOpt.get
      var scan = joinTables(spark, d, overrides)
      scan = (d.derivedMeasures ++ d.derivedGroups).foldLeft(scan) {
        case (acc, (n, sql)) => acc.withColumn(n, expr(sql)) }
      scan = scan.select((gNames ++ allMeasures).map(col): _*)
      if (nAffected <= recomputeKeyCap) {
        val keyRows = keyRowsOpt.get
        gNames.zipWithIndex.foreach { case (gc, i) =>
          val vals = keyRows.map(_.get(i)).distinct.toSeq
          if (!vals.contains(null)) scan = scan.filter(col(gc).isin(vals: _*))
        }
      }
      // rename the probe keys before joining: `affected`'s group attrs can
      // be the VERY SAME attribute instances as the repair scan's (both
      // sides derive from the caller's override DataFrames), and a
      // same-attribute <=> only works through dataset-id disambiguation —
      // with a "trivially true predicate" warning. Distinct names make the
      // join unambiguous by construction.
      val affK = gNames.foldLeft(affected)(
        (df, gc) => df.withColumnRenamed(gc, s"_ck_$gc"))
      val scanF = scan
      val recomputed = scanF.join(broadcast(affK),
          gNames.map(n => col(n) <=> col(s"_ck_$n")).reduce(_ && _),
          "left_semi")
        .groupBy(g: _*)
        .agg(allMeasures.flatMap(m => Seq(
          min(col(m)).as(s"r_mn_$m"), max(col(m)).as(s"r_mx_$m"))).head,
          allMeasures.flatMap(m => Seq(
            min(col(m)).as(s"r_mn_$m"), max(col(m)).as(s"r_mx_$m"))).tail: _*)
      val affT = gNames.foldLeft(affected.withColumn("_aff", lit(1)))(
        (df, gc) => df.withColumnRenamed(gc, s"_ak_$gc"))
      val recT = gNames.foldLeft(recomputed)(
        (df, gc) => df.withColumnRenamed(gc, s"_rk_$gc"))
      merged
        .join(broadcast(affT),
          gNames.map(gc => col(gc) <=> col(s"_ak_$gc")).reduce(_ && _), "left")
        .join(broadcast(recT),
          gNames.map(gc => col(gc) <=> col(s"_rk_$gc")).reduce(_ && _), "left")
    }
    val finalCols = g ++ allMeasures.flatMap(m => Seq(
      when(col(s"c_$m") === 0, lit(null).cast(oldTypes(s"s_$m")))
        .otherwise(col(s"s_$m")).as(s"s_$m"),
      col(s"c_$m"),
      when(col("_aff") === 1, col(s"r_mn_$m"))
        .otherwise(when(col(s"c_$m") === 0,
          lit(null).cast(oldTypes(s"mn_$m"))).otherwise(col(s"mn_$m")))
        .as(s"mn_$m"),
      when(col("_aff") === 1, col(s"r_mx_$m"))
        .otherwise(when(col(s"c_$m") === 0,
          lit(null).cast(oldTypes(s"mx_$m"))).otherwise(col(s"mx_$m")))
        .as(s"mx_$m"))) :+ col("cnt")
    val next = {
      val b = d.summaryPath.replaceAll("_v\\d+$", "")
      if (d.summaryPath == b) s"${b}_v1"
      else b + "_v" + (d.summaryPath.substring(
        d.summaryPath.lastIndexOf("_v") + 2).toInt + 1)
    }
    repaired.select(finalCols: _*).write.mode("overwrite").parquet(next)
    affectedOpt.foreach(_.unpersist())
    val nd = d.copy(summaryPath = next)
    unregister(d.summaryPath)
    // drop the RETIRED path's cached forms (the new path has none yet) —
    // a per-micro-batch maintainer would otherwise leak one dead entry
    // per sync in each cache for the session's lifetime
    derivedFormCache.remove(d.summaryPath)
    derivedGroupFormCache.remove(d.summaryPath)
    derivedTsCache.remove(d.summaryPath)
    register(nd)
    MvUsage.recordMaintenance(nd.summaryPath)
    nd
  }

  /** Apply a row-valued change feed on ONE registered table (the
    * [[graft.operators.SnapshotDiff.changeFeed]] schema) as one
    * incremental refresh: insert/update_post rows are the table's delta
    * inserts, delete/update_pre its delta deletes — the star lift of
    * [[MaterializedView.refreshFromFeed]]. The feed is persisted for the
    * span of the call (both delta joins consume it).
    */
  def refreshTableFromFeed(spark: SparkSession, d: StarMvDef,
      tablePath: String, feed: DataFrame, recomputeKeyCap: Int = 1000,
      tableOverrides: Map[String, DataFrame] = Map.empty): StarMvDef = {
    require(feed.columns.contains("_change"),
      s"feed must carry a _change column (got ${feed.columns.toSeq}) — " +
        "produce it with SnapshotDiff.changeFeed / changeFeedBetween")
    val f = feed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ins = f.filter(col("_change").isin("insert", "update_post"))
        .drop("_change")
      val del = f.filter(col("_change").isin("delete", "update_pre"))
        .drop("_change")
      refreshTableDelta(spark, d, tablePath, ins, del, recomputeKeyCap,
        tableOverrides)
    } finally { f.unpersist(blocking = false); () }
  }

  /** Compute and write the pre-joined summary, register the definition.
    * One fact-sized shuffle join + map-side-combined aggregate — the cost
    * every later rollup amortizes. First build only: refreshing an
    * existing registration goes through [[rebuild]], which never
    * overwrites a summary path a planned reader may still evaluate.
    *
    * Note: the build's own aggregate can be captured by a DIFFERENT
    * registered definition over the same leaf set — correct iff that
    * sibling is fresh, which is already the staleness contract every MV
    * query lives under; unregister stale siblings before building.
    */
  def build(spark: SparkSession, d: StarMvDef,
      tableOverrides: Map[String, DataFrame] = Map.empty): StarMvDef = {
    require(d.groupCols.nonEmpty || d.derivedGroups.nonEmpty,
      "star MV needs at least one group column")
    val names = d.groupCols.map(_.name) ++ d.measureCols.map(_.name) ++
      d.derivedMeasures.map(_._1) ++ d.derivedGroups.map(_._1)
    require(names.distinct.size == names.size,
      s"group/measure/derived names must be globally unique: $names")
    require(d.tables.map(MaterializedView.normalize).distinct.size ==
      d.tables.size, "duplicate table paths in star MV definition")
    verifyLossless(spark, d, tableOverrides.map { case (p, df) =>
      MaterializedView.normalize(p) -> df })
    unregister(d.summaryPath) // a stale twin must not satisfy the build scan
    derivedFormCache.remove(d.summaryPath)
    derivedGroupFormCache.remove(d.summaryPath)
    derivedTsCache.remove(d.summaryPath)
    derivedForms(spark, d) // analyze derived measures before the build scan
    derivedGroupForms(spark, d)
    derivedTsCols(spark, d)
    // `tableOverrides` substitutes table content (versioned-store
    // snapshots) so the table paths can be pure registry keys — same
    // contract as refreshTableDelta. Derived-measure form analysis above
    // still reads the paths (it needs only schemas); pass real paths or
    // no derivedMeasures when tables are stores.
    val joined0 = joinTables(spark, d,
      tableOverrides.map { case (pth, df) =>
        MaterializedView.normalize(pth) -> df })
    val joined = (d.derivedMeasures ++ d.derivedGroups)
      .foldLeft(joined0) { case (acc, (n, sql)) => acc.withColumn(n, expr(sql)) }
    val allMeasures = d.measureCols.map(_.name) ++ d.derivedMeasures.map(_._1)
    val partials = allMeasures.flatMap(m => Seq(
      sum(col(m)).as(s"s_$m"), count(col(m)).as(s"c_$m"),
      min(col(m)).as(s"mn_$m"), max(col(m)).as(s"mx_$m"))) :+
      count(lit(1)).as("cnt")
    joined.groupBy(d.groupNames.map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .write.mode("overwrite").parquet(d.summaryPath)
    register(d)
    d
  }

  /** `CREATE MATERIALIZED VIEW … AS <query>`: derive the definition FROM
    * the aggregate-over-join query the caller wants accelerated — the UX
    * the reference's users have in Greenplum — then [[build]] it. The
    * query must be one `Aggregate` over an inner-equi-join tree of
    * parquet relations with no residual filters (an MV built over a
    * filtered base would silently under-serve unfiltered queries, so
    * filters refuse). Extraction rules:
    *
    *   - plain grouping attributes → `groupCols`;
    *   - grouping EXPRESSIONS (e.g. `cast(ts as date)`) → `derivedGroups`
    *     named by the query's own output alias;
    *   - sum/min/max/avg/count over a plain column → `measureCols`;
    *   - over a deterministic expression → `derivedMeasures` named
    *     `dm<i>` in first-seen order (dedup by rendered form);
    *   - `count(*)` and aggregates over group expressions ride `cnt`.
    *
    * Anything else — outer joins, non-equi conjuncts, distinct
    * aggregates over measures, FILTER clauses — refuses with the reason.
    * The def's tables/joins/groups are exactly what the rewrite will
    * match, so the registered query (and every sibling it implies) is
    * served from the summary immediately after this returns.
    */
  /** The maximal set of tables PROVABLY lossless for the given join
    * graph: peel greedily outside-in, keeping each candidate only when
    * its single-partner shape holds and the data checks pass (unique
    * join keys; every partner row matched). The same checks
    * [[verifyLossless]] runs on declarations — here used to DISCOVER the
    * declaration, so `fromQuery(..., autoLossless = true)` gets sub-join
    * serving with zero schema knowledge from the caller. Cost: one
    * dim-sized aggregate + one partner anti-join per candidate, paid once
    * next to the build's fact-sized join itself.
    */
  private def detectLossless(spark: SparkSession, tables: Seq[String],
      joins: Seq[(QCol, QCol)]): Seq[String] = {
    var edges = joins.map { case (a, b) => (a.normalized, b.normalized) }
    val normToOrig = tables.map(t => MaterializedView.normalize(t) -> t).toMap
    var candidates = tables.map(MaterializedView.normalize).toSet
    val detected = Seq.newBuilder[String]
    var progressed = true
    while (progressed) {
      progressed = false
      candidates.find { e =>
        val touching = edges.filter { case (a, b) =>
          a.path == e || b.path == e }
        touching.nonEmpty && touching.map { case (a, b) =>
          if (a.path == e) b.path else a.path }.distinct.size == 1 && {
          val pairs = touching.map { case (a, b) =>
            if (a.path == e) (b, a) else (a, b) }
          val partner = pairs.head._1.path
          val eDf = spark.read.parquet(e)
          val pDf = spark.read.parquet(partner)
          val eKeys = pairs.map(_._2.name)
          val pKeys = pairs.map(_._1.name)
          eDf.groupBy(eKeys.map(col): _*)
            .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
            .limit(1).isEmpty &&
          pDf.select(pKeys.map(col): _*).join(
            eDf.select(eKeys.map(col): _*),
            pKeys.zip(eKeys).map { case (p, k) => col(p) === col(k) }
              .reduce(_ && _), "left_anti").limit(1).isEmpty
        }
      } match {
        case Some(e) =>
          detected += normToOrig(e)
          edges = edges.filterNot { case (a, b) => a.path == e || b.path == e }
          candidates -= e; progressed = true
        case None => ()
      }
    }
    detected.result()
  }

  def fromQuery(spark: SparkSession, query: DataFrame, summaryPath: String,
      losslessTables: Seq[String] = Nil,
      autoLossless: Boolean = false): StarMvDef = {
    val d0 = deriveDef(query, summaryPath)
    val lossless =
      if (autoLossless) {
        require(losslessTables.isEmpty,
          "pass either losslessTables or autoLossless, not both")
        detectLossless(spark, d0.tables, d0.joins)
      } else losslessTables
    build(spark, d0.copy(losslessTables = lossless))
  }

  /** The ANALYSIS half of [[fromQuery]]: derive the definition a query
    * implies without building it — what [[MvAdvisor]] runs over a whole
    * workload log before deciding which definitions are worth the build.
    * Throws with the refusal reason on shapes an MV cannot serve.
    */
  private[plans] def deriveDef(query: DataFrame,
      summaryPath: String): StarMvDef = {
    val plan = query.queryExecution.optimizedPlan
    val agg = plan match {
      case a: Aggregate => a
      case Project(_, a: Aggregate) => a
      case other => throw new IllegalArgumentException(
        s"fromQuery needs one Aggregate at the root, got ${other.nodeName}")
    }
    val flat = flatten(agg.child).getOrElse(throw new IllegalArgumentException(
      "fromQuery needs an inner-equi-join tree of parquet relations under " +
        "the Aggregate (outer joins / other operators refuse)"))
    // fromQuery derives a definition to BUILD from — store-resolution
    // leaves (MOR snapshots) refuse here: the build scan reads paths, and
    // a maintained MOR star is created explicitly over its stores
    val pathed = flat.leaves
      .collect { case r: RelLeaf => r }
      .flatMap(l => l.pathKey.map(l -> _))
    require(pathed.size == flat.leaves.size,
      "every leaf must be a single-root parquet relation")
    val paths = pathed.map(_._2)
    require(paths.distinct.size == paths.size, "self-joins refuse")
    val qcolOf: Map[org.apache.spark.sql.catalyst.expressions.ExprId, QCol] =
      pathed.flatMap { case (rel, path) =>
        // lower-cased like QCol.normalized: a warehouse leaf surfaces
        // the catalog's case folding, definitions carry the user's
        rel.output.map(a => a.exprId ->
          QCol(path, a.name.toLowerCase(java.util.Locale.ROOT))) }.toMap
    def inline(e: Expression): Expression = {
      var cur = e; var i = 0
      while (i < 10) {
        val next = cur.transformUp {
          case a: AttributeReference if flat.aliases.contains(a.exprId) =>
            flat.aliases(a.exprId) }
        if (next.fastEquals(cur)) return cur
        cur = next; i += 1
      }
      cur
    }
    def asPair(e: Expression): Option[(QCol, QCol)] = inline(e) match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if qcolOf.contains(a.exprId) && qcolOf.contains(b.exprId) &&
            qcolOf(a.exprId).path != qcolOf(b.exprId).path =>
        Some((qcolOf(a.exprId), qcolOf(b.exprId)))
      case _ => None
    }
    val joinPairs = (flat.joinConds ++ flat.filters).flatMap(asPair)
    val joinKeyIds = joinPairs.flatMap { case (a, b) => Seq(a, b) }.toSet
    // residual filters: inferred IsNotNull on join keys is vacuous noise;
    // anything else means the query is NOT the whole join — refuse
    val residual = (flat.joinConds ++ flat.filters).filter { c =>
      asPair(c).isEmpty && (inline(c) match {
        case IsNotNull(a: AttributeReference) =>
          !qcolOf.get(a.exprId).exists(joinKeyIds.contains)
        case _ => true
      })
    }
    require(residual.isEmpty,
      s"fromQuery refuses residual filters/conjuncts (an MV over a filtered " +
        s"base would under-serve): ${residual.map(_.sql)}")
    def stripped(e: Expression): Expression = e.transform {
      case a: AttributeReference => a.withQualifier(Nil) }
    // groupings: attrs → groupCols; expressions → derivedGroups named by
    // the query's own output aliases
    val outAliasByForm: Map[String, String] = agg.aggregateExpressions.collect {
      case al @ Alias(child, name)
          if !child.exists(_.isInstanceOf[AggregateExpression]) =>
        MvRewriteRule.renderForm(stripped(inline(child))).map(_ -> name)
    }.flatten.toMap
    val groupCols = Seq.newBuilder[QCol]
    val derivedGroups = Seq.newBuilder[(String, String)]
    agg.groupingExpressions.zipWithIndex.foreach { case (g0, i) =>
      inline(g0) match {
        case a: AttributeReference if qcolOf.contains(a.exprId) =>
          groupCols += qcolOf(a.exprId)
        case e if e.deterministic =>
          val form = MvRewriteRule.renderForm(stripped(e)).getOrElse(
            throw new IllegalArgumentException(
              s"unrenderable grouping expression: ${e.sql}"))
          derivedGroups += ((outAliasByForm.getOrElse(form, s"dg$i"),
            stripped(e).sql))
        case e => throw new IllegalArgumentException(
          s"non-deterministic grouping expression refuses: ${e.sql}")
      }
    }
    // aggregate children: plain columns → measures; deterministic
    // expressions over non-group leaves → derived measures (dedup by form)
    val groupIdSet = agg.groupingExpressions.flatMap {
      case a: AttributeReference => Some(a.exprId); case _ => None }.toSet
    val measures = scala.collection.mutable.LinkedHashSet[QCol]()
    val derivedMeasures = scala.collection.mutable.LinkedHashMap[String, String]()
    def groupOnly(e: Expression): Boolean = e.references.forall(a =>
      groupIdSet.contains(a.exprId) ||
        inline(a).references.forall(r => groupIdSet.contains(r.exprId)))
    agg.aggregateExpressions.foreach { ne =>
      ne.foreach {
        case ae: AggregateExpression =>
          require(!ae.isDistinct && ae.filter.isEmpty,
            s"distinct/FILTER aggregates refuse: ${ae.sql}")
          ae.aggregateFunction match {
            case f @ (_: Sum | _: Min | _: Max | _: Average) =>
              inline(f.children.head) match {
                case a: AttributeReference if qcolOf.contains(a.exprId) =>
                  measures += qcolOf(a.exprId); ()
                case e if groupOnly(e) => () // rides cnt at serve time
                case e if e.deterministic =>
                  val form = MvRewriteRule.renderForm(stripped(e)).getOrElse(
                    throw new IllegalArgumentException(
                      s"unrenderable measure expression: ${e.sql}"))
                  if (!derivedMeasures.contains(form)) {
                    derivedMeasures += form -> stripped(e).sql; ()
                  }
                case e => throw new IllegalArgumentException(
                  s"non-deterministic measure refuses: ${e.sql}")
              }
            case c: Count => c.children.map(inline) match {
              case Seq(_: Literal) => () // count(*) rides cnt
              case Seq(a: AttributeReference) if qcolOf.contains(a.exprId) =>
                measures += qcolOf(a.exprId); ()
              case Seq(e) if groupOnly(e) => ()
              case other => throw new IllegalArgumentException(
                s"count over ${other.map(_.sql)} refuses")
            }
            case other => throw new IllegalArgumentException(
              s"unsupported aggregate for an MV: ${other.prettyName}")
          }
        case _ => ()
      }
    }
    val dms = derivedMeasures.values.toSeq.zipWithIndex.map {
      case (sql, i) => (s"dm$i", sql) }
    StarMvDef(
      tables = paths,
      joins = joinPairs.distinct,
      groupCols = groupCols.result().distinct,
      measureCols = measures.toSeq,
      summaryPath = summaryPath,
      derivedMeasures = dms,
      losslessTables = Nil,
      derivedGroups = derivedGroups.result().distinct)
  }

  /** Prove every `losslessTables` declaration against the data, in peel
    * order: per peeled table its join key combination must be UNIQUE, and
    * every partner row must MATCH (non-null keys included — a null key
    * falls out of the anti-join as an orphan). Each check is one
    * dimension-sized aggregate plus one partner-scan anti-join, paid once
    * at build next to the fact-sized summary join itself. A failed check
    * refuses the whole build: a summary registered with an unprovable
    * declaration would silently serve wrong sub-join answers.
    */
  private def verifyLossless(spark: SparkSession, d: StarMvDef,
      overrides: Map[String, DataFrame]): Unit = {
    if (d.losslessTables.isEmpty) return
    require(d.losslessSet.subsetOf(d.leafSet),
      s"losslessTables not all registered tables: ${d.losslessTables}")
    val plan = peelPlan(d).getOrElse(throw new IllegalArgumentException(
      "losslessTables must peel outside-in to a single partner each — a " +
        s"bridge or cycle member cannot be lossless: ${d.losslessTables}"))
    def tableDf(p: String): DataFrame =
      overrides.getOrElse(p, spark.read.parquet(p))
    plan.foreach { case (e, partner, pairs) =>
      val eDf = tableDf(e)
      val pDf = tableDf(partner)
      val eKeys = pairs.map(_._2.name)
      val pKeys = pairs.map(_._1.name)
      val dup = eDf.groupBy(eKeys.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1)
      require(dup.isEmpty, s"losslessTables: $e is not unique on " +
        s"(${eKeys.mkString(", ")}) — the extension can duplicate join rows")
      val orphan = pDf.select(pKeys.map(col): _*).join(
        eDf.select(eKeys.map(col): _*),
        pKeys.zip(eKeys).map { case (p, k) => col(p) === col(k) }
          .reduce(_ && _), "left_anti").limit(1)
      require(orphan.isEmpty, s"losslessTables: $partner has rows with no " +
        s"match in $e on (${pKeys.mkString(", ")}) — the extension drops " +
        "join rows (null or dangling keys)")
    }
  }

  // ───────────────────────── rewrite machinery ─────────────────────────

  /** A table leaf of the flattened join tree: a plain (possibly
    * dir-set-registered) parquet relation, or a whole store-resolution
    * subplan matched as one unit (a MOR snapshot — see
    * [[StoreResolvePlan]]). Both expose the output attributes the plan
    * above references and the table KEY they stand for.
    */
  private[plans] sealed trait LeafRel {
    def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]
    def pathKey: Option[String]
    /** the leaf's physical scan roots — [[MvCost]] footer-counts them */
    def scanRoots: Seq[String]
  }
  private[plans] final case class RelLeaf(rel: LogicalRelation) extends LeafRel {
    def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      rel.output
    def pathKey: Option[String] = relationPath(rel)
    def scanRoots: Seq[String] = MaterializedView.fsRoots(rel.relation)
  }
  private[plans] final case class StoreLeaf(
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      key: String, scanRoots: Seq[String]) extends LeafRel {
    def pathKey: Option[String] = Some(key)
  }

  /** Flattened query shape under the Aggregate: Project alias bindings,
    * filter conjuncts, join equi-pairs, and the leaf relations.
    */
  private final case class Flat(
      aliases: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
      filters: Seq[Expression],
      joinConds: Seq[Expression],
      leaves: Seq[LeafRel])

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  private def flatten(p: LogicalPlan): Option[Flat] = p match {
    case rel: LogicalRelation => Some(Flat(Map.empty, Nil, Nil, Seq(RelLeaf(rel))))
    // a whole MOR-resolution subplan is ONE leaf — matched before the
    // generic Project/Filter walk would descend into its internals. Its
    // inferred-not-null residue re-emits as ordinary leaf filters.
    case StoreResolvePlan(leaf) =>
      Some(Flat(Map.empty, leaf.extraFilters, Nil,
        Seq(StoreLeaf(leaf.output, leaf.key, leaf.roots.toSeq))))
    case Project(pl, c) if pl.forall(e =>
        e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
      flatten(c).map(f => f.copy(aliases = f.aliases ++ pl.collect {
        case a @ Alias(child, _) => a.exprId -> child }))
    case Filter(cond, c) =>
      flatten(c).map(f => f.copy(filters = splitConj(cond) ++ f.filters))
    case Join(l, r, Inner, cond, _) =>
      for (fl <- flatten(l); fr <- flatten(r)) yield Flat(
        fl.aliases ++ fr.aliases,
        fl.filters ++ fr.filters,
        cond.toSeq.flatMap(splitConj) ++ fl.joinConds ++ fr.joinConds,
        fl.leaves ++ fr.leaves)
    case _ => None
  }

  /** The table KEY a leaf relation stands for: its single root path, or —
    * for a versioned store's snapshot (many roots, no stable path) — the
    * table path its exact dir set is registered under
    * ([[MaterializedView.registerDirs]], maintained per sync by
    * [[StarMvMaintainer]]). The exact-set match is the per-table
    * staleness guard: a leaf merged past its last sync matches nothing
    * and the whole star falls back to the live join.
    */
  private def relationPath(rel: LogicalRelation): Option[String] = {
    val roots = MaterializedView.fsRoots(rel.relation)
    if (roots.nonEmpty)
      // explicit dir-set registration wins (a one-bucket snapshot has a
      // single root that is a data dir, not the table's key)
      MaterializedView.lookupDirKey(roots.toSet)
        .orElse(if (roots.size == 1) Some(roots.head) else None)
    else jdbcKeyOf(rel.relation)
  }

  /** A warehouse snapshot's leaf identity: the (url, table) pair rendered
    * exactly as [[graft.sources.JdbcTableStore.servingKey]] renders it —
    * a [[JdbcStarMaintainer]] registers its definition under those keys,
    * so rollups joining live `store.snapshot()` reads reroute. Accessed
    * reflectively: `JDBCRelation` is `private[sql]`, so the type cannot
    * be named here; method handles are cached per relation class.
    * Freshness note: a JDBC table has no snapshot identity to guard on
    * (unlike the dir-set match) — the maintainer instead PAUSES serving
    * ([[pauseServing]]) for the span of each sync, so serving only ever
    * sees fully-synced summaries (see [[JdbcStarMaintainer.sync]]).
    */
  private val jdbcAccessors = new java.util.concurrent.ConcurrentHashMap[
    Class[_], Option[(java.lang.reflect.Method, java.lang.reflect.Method,
      java.lang.reflect.Method)]]()

  private def jdbcKeyOf(rel: Any): Option[String] = {
    val ms = jdbcAccessors.computeIfAbsent(rel.getClass, { c =>
      if (c.getName != "org.apache.spark.sql.execution.datasources.jdbc.JDBCRelation") None
      else scala.util.Try {
        val optsM = c.getMethod("jdbcOptions")
        val optsC = optsM.getReturnType
        (optsM, optsC.getMethod("url"), optsC.getMethod("tableOrQuery"))
      }.toOption
    })
    ms.flatMap { case (optsM, urlM, tblM) =>
      scala.util.Try {
        val opts = optsM.invoke(rel)
        s"jdbc::${urlM.invoke(opts)}::${tblM.invoke(opts)}"
      }.toOption
    }
  }

  private[plans] def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      flat <- flatten(agg.child)
      // single-leaf shapes are MvRewriteRule's job first (it runs before
      // us in the orElse chain) — but a bare-fact query can still be a
      // lossless SUB-JOIN of a registered star, so they are matched here
      if flat.leaves.nonEmpty
      pathed <- Some(flat.leaves.flatMap(l => l.pathKey.map(l -> _)))
      if pathed.size == flat.leaves.size
      paths = pathed.map(_._2)
      if paths.distinct.size == paths.size // self-joins refuse
      dp <- servable(pathed).view
        .flatMap(d => rewriteWith(agg, flat, pathed, d).map(p => (d, p)))
        .headOption
    } yield { MvUsage.recordServe(dp._1.summaryPath); dp._2 }

  /** Candidates for the query's leaf set, cheapest summary first, with
    * the [[MvCost]] gate applied: a summary no smaller than the leaves'
    * total scan rows refuses (re-aggregating it reads no less than the
    * join it replaces — e.g. an MV grouped by a near-unique key). Ties
    * and unknown counts keep registration order and serve.
    */
  private def servable(pathed: Seq[(LeafRel, String)]): Seq[StarMvDef] = {
    val cands = candidatesFor(
      pathed.map(p => MaterializedView.normalize(p._2)).toSet)
    if (cands.isEmpty) return cands
    val spark = SparkSession.active
    val baseSize = pathed.map { case (l, key) =>
      MvCost.leafSize(spark, key, l.scanRoots) }
      .foldLeft(MvCost.SizeEst(Some(0L), Some(0L)))(_ + _)
    MvCost.orderAndGate(spark, cands, baseSize)
  }

  /** ROLLUP / CUBE / GROUPING SETS over a registered star: the analyzer
    * plants an [[org.apache.spark.sql.catalyst.plans.logical.Expand]]
    * between the Aggregate and the JOIN TREE, so neither the flat star
    * path above nor [[MvRewriteRule]]'s single-table Expand path reaches
    * it. This is the star lift of `MvRewriteRule.tryRewriteExpand`: match
    * the join tree below the Expand against a registered definition, then
    * rebuild the SAME Expand over the summary — each summary row
    * replicates once per grouping set exactly as each join row did, so
    * the per-set partial re-aggregation algebra is unchanged.
    */
  private[plans] def tryRewriteExpand(agg: Aggregate): Option[LogicalPlan] =
    agg.child match {
      case ex: org.apache.spark.sql.catalyst.plans.logical.Expand =>
        for {
          flat <- flatten(ex.child)
          if flat.leaves.nonEmpty // single leaf = lossless sub-join rollup
          pathed <- Some(flat.leaves.flatMap(l => l.pathKey.map(l -> _)))
          if pathed.size == flat.leaves.size
          paths = pathed.map(_._2)
          if paths.distinct.size == paths.size
          dp <- servable(pathed).view
            .flatMap(d => rewriteExpandStar(agg, ex, flat, pathed, d)
              .map(p => (d, p)))
            .headOption
        } yield { MvUsage.recordServe(dp._1.summaryPath); dp._2 }
      case _ => None
    }

  /** The Expand twin of [[rewriteWith]] — the join-matching prelude is
    * deliberately duplicated from there (same canonicalization contract;
    * see the comments in [[rewriteWith]]) and the Expand machinery mirrors
    * `MvRewriteRule.rewriteExpandWith` with name-set lookups replaced by
    * qualified-column lookups.
    */
  private def rewriteExpandStar(agg: Aggregate,
      ex: org.apache.spark.sql.catalyst.plans.logical.Expand,
      flat: Flat, pathed: Seq[(LeafRel, String)],
      d: StarMvDef): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.ExprId
    val spark = SparkSession.active
    val qcolOf: Map[ExprId, QCol] =
      pathed.flatMap { case (rel, path) =>
        // lower-cased like QCol.normalized: a warehouse leaf surfaces
        // the catalog's case folding, definitions carry the user's
        rel.output.map(a => a.exprId ->
          QCol(path, a.name.toLowerCase(java.util.Locale.ROOT))) }.toMap

    def inline(e: Expression): Expression = {
      var cur = e
      var i = 0
      while (i < 10) {
        val next = cur.transformUp {
          case a: AttributeReference if flat.aliases.contains(a.exprId) =>
            flat.aliases(a.exprId)
        }
        if (next.fastEquals(cur)) return cur
        cur = next; i += 1
      }
      cur
    }

    def asPair(e: Expression): Option[(QCol, QCol)] = e match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        for (qa <- qcolOf.get(a.exprId); qb <- qcolOf.get(b.exprId))
          yield (qa, qb)
      case _ => None
    }
    final class UnionFind {
      private val parent = scala.collection.mutable.Map[QCol, QCol]()
      def find(x: QCol): QCol = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: QCol, b: QCol): Unit = {
        val (ra, rb) = (find(a), find(b)); if (ra != rb) { parent(ra) = rb; () }
      }
      def connected(a: QCol, b: QCol): Boolean = find(a) == find(b)
    }
    val joinConjs = flat.joinConds.map(inline)
    val joinPairs = joinConjs.map(asPair)
    if (joinPairs.exists(_.isEmpty)) return None
    val filterInl = flat.filters.map(inline)
    val qc = new UnionFind
    (joinPairs.flatten ++ filterInl.flatMap(asPair))
      .foreach { case (a, b) => qc.union(a, b) }
    val dc = new UnionFind
    d.joins.foreach { case (a, b) => dc.union(a.normalized, b.normalized) }
    // retained-only coverage — see the comment in rewriteWith
    val retained = pathed.map(p => MaterializedView.normalize(p._2)).toSet
    if (!d.joins.forall { case (a, b) =>
      !(retained.contains(a.normalized.path) &&
        retained.contains(b.normalized.path)) ||
        qc.connected(a.normalized, b.normalized) }) return None
    def impliedEq(e: Expression): Boolean =
      asPair(e).exists { case (a, b) => dc.connected(a, b) }
    val extraJoinConjs = joinConjs.filterNot(impliedEq)

    val sumPlan = spark.read.parquet(d.summaryPath).queryExecution.analyzed
    val byName = sumPlan.output.map(a => a.name -> a).toMap
    def attrOf(name: String): Option[AttributeReference] =
      byName.get(name).collect { case a: AttributeReference => a }
    val dForms = derivedForms(spark, d)
    val dgForms = derivedGroupForms(spark, d)
    val dayOfTs = derivedTsCols(spark, d)

    def derivedGroupMatch(e: Expression): Option[AttributeReference] =
      if (dgForms.isEmpty) None
      else MvRewriteRule.renderForm(e.transform {
        case a: AttributeReference => a.withQualifier(Nil)
      }).flatMap(dgForms.get).flatMap(attrOf)
    def substituteDerivedGroups(e: Expression): Expression =
      if (dgForms.isEmpty) e
      else e.transformDown {
        case x if derivedGroupMatch(x).isDefined => derivedGroupMatch(x).get
      }

    def rewriteGroupExpr(e0: Expression): Option[Expression] = {
      val e1 = inline(e0)
      if (!e1.deterministic || e1.exists(_.isInstanceOf[AggregateExpression]))
        None
      else {
        val e = substituteDerivedGroups(e1)
        var ok = true
        val bound = e.transform {
          case a: AttributeReference if !sumPlan.outputSet.contains(a) =>
            qcolOf.get(a.exprId).flatMap(d.groupByQ.get).flatMap(attrOf)
              .getOrElse { ok = false; a }
        }
        if (ok) Some(bound) else None
      }
    }

    def measureName(child: Expression): Option[String] = inline(child) match {
      case a: AttributeReference =>
        qcolOf.get(a.exprId).flatMap(d.measureByQ.get)
      case e =>
        if (dForms.isEmpty) None
        else MvRewriteRule.renderForm(e.transform {
          case a: AttributeReference => a.withQualifier(Nil)
        }).flatMap(dForms.get)
    }

    // classify the Expand's projection matrix and bind every position:
    // measure passthroughs drop out (their partials ride along), grouping
    // entries rebind to the summary's attribute space, and OTHER
    // passthroughs (e.g. the factors of a derived measure the analyzer
    // passes through separately — `f_price` for `sum(f_qty * f_price)`)
    // stay UNBOUND: they also drop from the new Expand, and an aggregate
    // child built from them must match a registered derived measure at
    // the aggregate level below (or the rewrite refuses via refsOk).
    val cols = MvRewriteRule.classifyExpand(ex.projections, ex.output)
      .getOrElse(return None)
    val measureByOutId = scala.collection.mutable.Map[ExprId, String]()
    val boundByIdx = scala.collection.mutable.Map[Int, Expression]()
    val baseExprByOutId = scala.collection.mutable.Map[ExprId, Expression]()
    cols.zipWithIndex.foreach {
      case (MvRewriteRule.ExGid, _) => ()
      case (MvRewriteRule.ExPass(e), j) =>
        baseExprByOutId(ex.output(j).exprId) = e
        measureName(e) match {
          case Some(m) => measureByOutId(ex.output(j).exprId) = m
          case None => rewriteGroupExpr(e) match {
            case Some(se) if se.dataType == ex.output(j).dataType =>
              boundByIdx(j) = se
            case _ => () // unbound passthrough — see above
          }
        }
      case (MvRewriteRule.ExGrouped(e), j) =>
        baseExprByOutId(ex.output(j).exprId) = e
        rewriteGroupExpr(e) match {
          case Some(se) if se.dataType == ex.output(j).dataType =>
            boundByIdx(j) = se
          case _ => return None // a grouping-set key MUST rebind
        }
    }
    val keepIdx = ex.output.indices.filter(j =>
      cols(j) == MvRewriteRule.ExGid || boundByIdx.contains(j))
    val expandableIds: Set[ExprId] = keepIdx.map(ex.output(_).exprId).toSet

    /** an aggregate child rendered back in BASE attribute space (Expand
      * outputs replaced by the base-side expressions they pass through),
      * so whole-child derived-measure matching can run */
    def baseForm(child: Expression): Option[Expression] = {
      var ok = true
      val subbed = child.transform {
        case a: AttributeReference if !qcolOf.contains(a.exprId) =>
          baseExprByOutId.getOrElse(a.exprId, { ok = false; a })
      }
      if (ok) Some(subbed) else None
    }

    /** measure name for an aggregate child: a measure passthrough attr,
      * or a whole expression matching a plain/derived measure in base
      * space */
    def measureOf(child: Expression): Option[String] = child match {
      case a: AttributeReference if measureByOutId.contains(a.exprId) =>
        Some(measureByOutId(a.exprId))
      case _ => baseForm(child).flatMap(measureName)
    }
    def refsOk(e: Expression): Boolean =
      e.deterministic && !e.exists(_.isInstanceOf[AggregateExpression]) &&
        e.references.forall(a => expandableIds.contains(a.exprId))
    if (!agg.groupingExpressions.forall(refsOk)) return None

    // filters below the Expand (plus extra-constraint join conjuncts):
    // implied equalities and join-key IsNotNulls drop, everything else
    // replays as a group filter on the summary BEFORE it expands
    val conj = (filterInl ++ extraJoinConjs).map { c =>
      c match {
        case _ if impliedEq(c) => Some(None)
        case IsNotNull(a: AttributeReference)
            if qcolOf.get(a.exprId).exists(d.joinKeySet.contains) =>
          Some(None)
        case _ => rewriteGroupExpr(c)
          .orElse(MvRewriteRule.tsBoundToDayShared(inline(c), dayOfTs,
            attrOf, spark.sessionState.conf.sessionLocalTimeZone))
          .map(Some(_))
      }
    }
    if (conj.exists(_.isEmpty)) return None
    val keptConds = conj.flatten.flatten

    def rewriteAggFunc(e: AggregateExpression): Option[Expression] =
      e.aggregateFunction match {
        case s: Sum if s.evalContext.evalMode == EvalMode.TRY => None
        case s: Sum => measureOf(s.child)
          .flatMap(m => attrOf(s"s_$m"))
          .map(p => Sum(p).toAggregateExpression())
          .orElse(s.child match {
            case ge if refsOk(ge) => for {
              cnt <- attrOf("cnt")
              r <- MvRewriteRule.sumOfGroupExpr(ge, cnt)
            } yield r
            case _ => None
          })
        case a: Average => measureOf(a.child).flatMap { m =>
          for {
            s <- attrOf(s"s_$m")
            c <- attrOf(s"c_$m")
            r <- MvRewriteRule.avgFromPartials(a,
              Sum(s).toAggregateExpression(), Sum(c).toAggregateExpression())
          } yield r
        }.orElse(a.child match {
          case ge if refsOk(ge) => for {
            cnt <- attrOf("cnt")
            r <- MvRewriteRule.avgOfGroupExpr(a, ge, cnt)
          } yield r
          case _ => None
        })
        case m: Min => measureOf(m.child)
          .flatMap(n => attrOf(s"mn_$n"))
          .map(p => Min(p).toAggregateExpression())
          .orElse(m.child match {
            case ge if refsOk(ge) => Some(e)
            case _ => None
          })
        case m: Max => measureOf(m.child)
          .flatMap(n => attrOf(s"mx_$n"))
          .map(p => Max(p).toAggregateExpression())
          .orElse(m.child match {
            case ge if refsOk(ge) => Some(e)
            case _ => None
          })
        case c: Count => c.children match {
          case Seq(l: Literal) if l.value != null =>
            attrOf("cnt").map(p => Coalesce(Seq(
              Sum(p).toAggregateExpression(), Literal(0L))))
          case Seq(one) => measureOf(one).flatMap(n => attrOf(s"c_$n"))
            .map(p => Coalesce(Seq(Sum(p).toAggregateExpression(), Literal(0L))))
            .orElse(one match {
              case _ if refsOk(one) => for {
                cnt <- attrOf("cnt")
              } yield MvRewriteRule.countOfGroupExpr(one, cnt)
              case _ => None
            })
          case _ => None
        }
        case _ => None
      }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae @ AggregateExpression(_, _, false, None, _) => rewriteAggFunc(ae)
      case ae @ AggregateExpression(c: Count, _, true, None, _)
          if c.children.nonEmpty && c.children.forall(refsOk) => Some(ae)
      case _: AggregateExpression => None
      case a: AttributeReference if expandableIds.contains(a.exprId) => Some(a)
      case l: Literal => Some(l)
      case _ if e.children.nonEmpty =>
        val rewritten = e.children.map(rewriteExpr)
        if (rewritten.forall(_.isDefined))
          Some(e.withNewChildren(rewritten.map(_.get)))
        else None
      case _ => None
    }

    def rewriteNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference if expandableIds.contains(a.exprId) => Some(a)
      case al @ Alias(child, name) =>
        rewriteExpr(child).map { c =>
          val typed = if (c.dataType == al.dataType) c else Cast(c, al.dataType)
          Alias(typed, name)(exprId = al.exprId)
        }
      case _ => None
    }

    val newResults = agg.aggregateExpressions.map(rewriteNamed)
    if (newResults.exists(_.isEmpty)) return None

    val sumOutIds = sumPlan.outputSet
    val usedPartials = newResults.flatMap(_.get.references)
      .filter(sumOutIds.contains).distinct
      .collect { case a: AttributeReference => a }

    val filtered = keptConds.foldLeft(sumPlan)((p, c) => Filter(c, p))
    val newOut = keepIdx.map(ex.output) ++ usedPartials
    val newProjs = ex.projections.map { proj =>
      keepIdx.map { j =>
        cols(j) match {
          case MvRewriteRule.ExGid => proj(j)
          case MvRewriteRule.ExGrouped(_) => proj(j) match {
            case Literal(null, dt) => Literal(null, dt)
            case _ => boundByIdx(j)
          }
          case MvRewriteRule.ExPass(_) => boundByIdx(j)
        }
      } ++ usedPartials
    }
    Some(Aggregate(agg.groupingExpressions, newResults.map(_.get),
      org.apache.spark.sql.catalyst.plans.logical.Expand(
        newProjs, newOut, filtered)))
  }

  private def rewriteWith(agg: Aggregate, flat: Flat,
      pathed: Seq[(LeafRel, String)], d: StarMvDef): Option[LogicalPlan] = {
    val spark = SparkSession.active
    // query attribute (exprId) → qualified column
    val qcolOf: Map[org.apache.spark.sql.catalyst.expressions.ExprId, QCol] =
      pathed.flatMap { case (rel, path) =>
        // lower-cased like QCol.normalized: a warehouse leaf surfaces
        // the catalog's case folding, definitions carry the user's
        rel.output.map(a => a.exprId ->
          QCol(path, a.name.toLowerCase(java.util.Locale.ROOT))) }.toMap

    def inline(e: Expression): Expression = {
      var cur = e
      var i = 0
      while (i < 10) {
        val next = cur.transformUp {
          case a: AttributeReference if flat.aliases.contains(a.exprId) =>
            flat.aliases(a.exprId)
        }
        if (next.fastEquals(cur)) return cur
        cur = next; i += 1
      }
      cur
    }

    // Join canonicalization by EQUIVALENCE CLASSES, not literal pair sets:
    // the optimizer freely infers transitive equalities, reorders joins,
    // and migrates equality conjuncts between join conditions and filters,
    // so the invariant that survives is the equivalence relation the
    // equalities generate. Match = the query's equality constraints imply
    // every registered join pair (coverage), and every query equality is
    // either implied by the registered pairs (vacuous on the summary) or
    // replayable as a group-column filter.
    def asPair(e: Expression): Option[(QCol, QCol)] = e match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        for (qa <- qcolOf.get(a.exprId); qb <- qcolOf.get(b.exprId))
          yield (qa, qb)
      case _ => None
    }
    final class UnionFind {
      private val parent = scala.collection.mutable.Map[QCol, QCol]()
      def find(x: QCol): QCol = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: QCol, b: QCol): Unit = {
        val (ra, rb) = (find(a), find(b)); if (ra != rb) { parent(ra) = rb; () }
      }
      def connected(a: QCol, b: QCol): Boolean = find(a) == find(b)
    }
    val joinConjs = flat.joinConds.map(inline)
    val joinPairs = joinConjs.map(asPair)
    if (joinPairs.exists(_.isEmpty)) return None // non-equi join conjunct
    val filterInl = flat.filters.map(inline)
    val qc = new UnionFind // everything the QUERY constrains equal
    (joinPairs.flatten ++ filterInl.flatMap(asPair))
      .foreach { case (a, b) => qc.union(a, b) }
    val dc = new UnionFind // everything the DEFINITION constrains equal
    d.joins.foreach { case (a, b) => dc.union(a.normalized, b.normalized) }
    // coverage: the query must enforce the registered join graph AMONG THE
    // TABLES IT RETAINS — a sub-join match already proved (candidatesFor)
    // that the absent tables peel losslessly, and their edges exist on the
    // summary by construction. dc keeps ALL definition joins: an equality
    // the definition implies only THROUGH a peeled table still held on
    // every row the summary aggregated.
    val retained = pathed.map(p => MaterializedView.normalize(p._2)).toSet
    if (!d.joins.forall { case (a, b) =>
      !(retained.contains(a.normalized.path) &&
        retained.contains(b.normalized.path)) ||
        qc.connected(a.normalized, b.normalized) }) return None
    // a query equality implied by the definition is vacuous on the summary;
    // one that adds a constraint beyond the definition's must be replayable
    // as a group filter — route it through the filter gate below
    def impliedEq(e: Expression): Boolean =
      asPair(e).exists { case (a, b) => dc.connected(a, b) }
    val extraJoinConjs = joinConjs.filterNot(impliedEq)

    // summary relation, attributes by name
    val sumPlan = spark.read.parquet(d.summaryPath).queryExecution.analyzed
    val byName = sumPlan.output.map(a => a.name -> a).toMap
    def attrOf(name: String): Option[AttributeReference] =
      byName.get(name).collect { case a: AttributeReference => a }

    val dForms = derivedForms(spark, d)
    val dgForms = derivedGroupForms(spark, d)
    val dayOfTs = derivedTsCols(spark, d)

    // derived-group matcher: a query subtree whose optimized render-form
    // matches a registered derived group binds to its summary column
    def derivedGroupMatch(e: Expression): Option[AttributeReference] =
      if (dgForms.isEmpty) None
      else MvRewriteRule.renderForm(e.transform {
        case a: AttributeReference => a.withQualifier(Nil)
      }).flatMap(dgForms.get).flatMap(attrOf)
    def substituteDerivedGroups(e: Expression): Expression =
      if (dgForms.isEmpty) e
      else e.transformDown {
        case x if derivedGroupMatch(x).isDefined => derivedGroupMatch(x).get
      }

    // rewrite an expression tree whose leaves are group columns (plain or
    // derived) into the summary's attribute space; None = not expressible
    def rewriteGroupExpr(e0: Expression): Option[Expression] = {
      val e1 = inline(e0)
      if (!e1.deterministic || e1.exists(_.isInstanceOf[AggregateExpression]))
        None
      else {
        val e = substituteDerivedGroups(e1)
        var ok = true
        val bound = e.transform {
          case a: AttributeReference if !sumPlan.outputSet.contains(a) =>
            qcolOf.get(a.exprId).flatMap(d.groupByQ.get).flatMap(attrOf)
              .getOrElse { ok = false; a }
        }
        if (ok) Some(bound) else None
      }
    }

    // filter conjuncts (plus any extra-constraint join conjuncts):
    // implied equalities and join-key IsNotNulls are vacuous on the
    // summary and drop; everything else must replay as a group filter —
    // including raw-ts bounds the optimizer rewrote a day filter into,
    // recovered to day bounds by the shared midnight conversion
    val conj = (filterInl ++ extraJoinConjs).map { c =>
      c match {
        case _ if impliedEq(c) => Some(None) // the join itself — drop
        case IsNotNull(a: AttributeReference)
            if qcolOf.get(a.exprId).exists(d.joinKeySet.contains) =>
          Some(None) // inner join output has no null keys — drop
        case _ => rewriteGroupExpr(c)
          .orElse(MvRewriteRule.tsBoundToDayShared(inline(c), dayOfTs,
            attrOf, spark.sessionState.conf.sessionLocalTimeZone))
          .map(Some(_))
      }
    }
    if (conj.exists(_.isEmpty)) return None
    val keptConds = conj.flatten.flatten

    val newGroupings = agg.groupingExpressions.map(rewriteGroupExpr)
    if (newGroupings.exists(_.isEmpty)) return None

    def measureName(child: Expression): Option[String] = inline(child) match {
      case a: AttributeReference =>
        qcolOf.get(a.exprId).flatMap(d.measureByQ.get)
      case e =>
        if (dForms.isEmpty) None
        else MvRewriteRule.renderForm(e.transform {
          // render against base names so the form matches the build-side
          // analysis of the derived-measure SQL
          case a: AttributeReference => a.withQualifier(Nil)
        }).flatMap(dForms.get)
    }

    def rewriteAggFunc(e: AggregateExpression): Option[Expression] =
      e.aggregateFunction match {
        case s: Sum if s.evalContext.evalMode == EvalMode.TRY => None // see MvRewriteRule
        case s: Sum => measureName(s.child)
          .flatMap(m => attrOf(s"s_$m"))
          .map(p => Sum(p).toAggregateExpression())
          // sum over an expression of group columns, cnt-weighted
          .orElse(for {
            b <- rewriteGroupExpr(s.child)
            cnt <- attrOf("cnt")
            r <- MvRewriteRule.sumOfGroupExpr(b, cnt)
          } yield r)
        case a: Average => measureName(a.child).flatMap { m =>
          for {
            s <- attrOf(s"s_$m")
            c <- attrOf(s"c_$m")
            r <- MvRewriteRule.avgFromPartials(a,
              Sum(s).toAggregateExpression(), Sum(c).toAggregateExpression())
          } yield r
        }.orElse(for {
          b <- rewriteGroupExpr(a.child)
          cnt <- attrOf("cnt")
          r <- MvRewriteRule.avgOfGroupExpr(a, b, cnt)
        } yield r)
        case m: Min => measureName(m.child).flatMap(n => attrOf(s"mn_$n"))
          .map(p => Min(p).toAggregateExpression())
          .orElse(rewriteGroupExpr(m.child)
            .map(b => Min(b).toAggregateExpression()))
        case m: Max => measureName(m.child).flatMap(n => attrOf(s"mx_$n"))
          .map(p => Max(p).toAggregateExpression())
          .orElse(rewriteGroupExpr(m.child)
            .map(b => Max(b).toAggregateExpression()))
        case c: Count => c.children match {
          case Seq(l: Literal) if l.value != null =>
            attrOf("cnt").map(p => Coalesce(Seq(
              Sum(p).toAggregateExpression(), Literal(0L))))
          case Seq(one) => measureName(one).flatMap(n => attrOf(s"c_$n"))
            .map(p => Coalesce(Seq(Sum(p).toAggregateExpression(), Literal(0L))))
            // count over an expression of group columns, cnt-weighted
            .orElse(for {
              b <- rewriteGroupExpr(one)
              cnt <- attrOf("cnt")
            } yield MvRewriteRule.countOfGroupExpr(b, cnt))
          case _ => None
        }
        case _ => None
      }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae @ AggregateExpression(_, _, false, None, _) => rewriteAggFunc(ae)
      case AggregateExpression(c: Count, _, true, None, _)
          if c.children.nonEmpty =>
        // COUNT(DISTINCT group expressions) — exact on the summary, which
        // holds every distinct group combination
        val kids = c.children.map(rewriteGroupExpr)
        if (kids.forall(_.isDefined))
          Some(Count(kids.map(_.get)).toAggregateExpression(isDistinct = true))
        else None
      case _: AggregateExpression => None
      case a: AttributeReference => rewriteGroupExpr(a)
      case l: Literal => Some(l)
      case _ if e.children.nonEmpty =>
        // whole-subtree first: a derived group (`cast(ts as date)`) binds
        // as a unit — its LEAF (raw ts) is not a group column
        rewriteGroupExpr(e).orElse {
          val rewritten = e.children.map(rewriteExpr)
          if (rewritten.forall(_.isDefined))
            Some(e.withNewChildren(rewritten.map(_.get)))
          else None
        }
      case _ => None
    }

    def rewriteNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference =>
        rewriteExpr(inline(a)).map { c =>
          val typed = if (c.dataType == a.dataType) c else Cast(c, a.dataType)
          Alias(typed, a.name)(exprId = a.exprId)
        }
      case al @ Alias(child, name) =>
        rewriteExpr(inline(child)).map { c =>
          val typed = if (c.dataType == al.dataType) c else Cast(c, al.dataType)
          Alias(typed, name)(exprId = al.exprId)
        }
      case _ => None
    }

    val newResults = agg.aggregateExpressions.map(rewriteNamed)
    if (newResults.exists(_.isEmpty)) None
    else {
      val child = keptConds.foldLeft(sumPlan)((p, c) => Filter(c, p))
      Some(Aggregate(newGroupings.map(_.get), newResults.map(_.get), child))
    }
  }
}
