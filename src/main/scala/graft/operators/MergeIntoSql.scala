package graft.operators

import graft.sources.TableStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

/** The SQL face of [[MergeInto]]: `spark.sql("MERGE INTO t USING s ON …
  * WHEN MATCHED … ")` against any registered graft store family. The
  * reference's real users drive the warehouse with SQL (bireme's whole
  * load cycle is SQL against Greenplum, reference: README.md:15,
  * ChangeLoader.java:340-468); this closes the gap between the Scala
  * clause machine (done since q244) and the statement a warehouse user
  * actually types.
  *
  * Design: Spark's OWN parser already parses MERGE INTO into
  * [[MergeIntoTable]] — no grammar is re-implemented. A thin
  * [[GraftSqlParser]] (installed via `GraftExtensions.injectParser`)
  * intercepts the PARSED plan: when the target table name matches a
  * [[MergeIntoSql.register]]ed store, the statement compiles to a
  * [[GraftMergeCommand]] — a leaf command that executes the existing
  * [[MergeInto]] machinery (keyed pre-image, one classification join,
  * one compacted-batch commit; cost O(source), never O(table)). Any
  * other MERGE passes through untouched to Spark's v2 path, so the
  * extension never captures statements it does not own.
  *
  * Supported statement shape (everything else fails with a [GRAFT_MERGE]
  * error naming the restriction — never a silent semantic drift):
  *
  *  - `ON` must be the key equality: a conjunction of `t.pk = s.pk`
  *    covering exactly the store's primary key (the machinery joins on
  *    the key; an arbitrary ON would be a different operator);
  *  - at most one WHEN MATCHED DELETE and one WHEN MATCHED UPDATE; if
  *    both are present the DELETE clause must be written first (the
  *    engine evaluates delete-then-update; accepting the other order
  *    would silently change which clause wins on overlap);
  *  - `UPDATE SET *`, or explicit SET on non-key columns;
  *  - `INSERT *`, or an explicit column list with arbitrary SOURCE-side
  *    VALUES expressions (`INSERT (pk, bal) VALUES (s.pk, s.bal * 1.1)`)
  *    that covers every target column; `t.` references are refused (a
  *    NOT MATCHED row has no target image);
  *  - no WHEN NOT MATCHED BY SOURCE (target-only maintenance is
  *    [[graft.sources.TableStore.deleteWhere]]'s job — it never needs
  *    the source scan MERGE would pay).
  *
  * Sessions built without extensions call [[MergeIntoSql.sql]] — the
  * same parse → compile → run path, mirroring `MaterializedView.install`
  * as the no-extensions twin.
  */
object MergeIntoSql {

  /** A store under its SQL name, with its keyed read (the same explicit
    * pre-image contract as [[MergeInto.apply]]).
    */
  final case class Registration(store: TableStore,
      preImage: DataFrame => DataFrame)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  private def norm(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  /** Expose `store` to SQL MERGE under `name` (match is exact on the
    * dotted lowercase name — `MERGE INTO public.customer` needs
    * `register("public.customer", …)`).
    */
  def register(name: String, store: TableStore,
      preImage: DataFrame => DataFrame): Unit = {
    registry.put(norm(name), Registration(store, preImage)); ()
  }
  def unregister(name: String): Unit = { registry.remove(norm(name)); () }
  def clear(): Unit = registry.clear()

  private[operators] def lookup(name: String): Option[Registration] =
    Option(registry.get(norm(name)))

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"[GRAFT_MERGE] $msg")

  // ── graft-catalog resolution: durable names, zero register calls ─────
  // A dotted name whose FIRST part names a configured GraftCatalog
  // (`spark.sql.catalog.<name> = graft.sources.GraftCatalog`) resolves
  // through the catalog's on-disk `_spec` records — the session-
  // independent twin of the registries above. Stateless per statement
  // (a _spec read is one tiny driver-side file), so nothing leaks across
  // shared sessions.

  private def graftCatalogOf(spark: SparkSession,
      catName: String): Option[graft.sources.GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(catName) match {
      case g: graft.sources.GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  private[operators] def catalogLoaded(
      table: String): Option[graft.sources.GraftStoreLoader.Loaded] = {
    val parts = table.split('.')
    if (parts.length < 2) return None
    graftCatalogOf(SparkSession.active, parts.head)
      .flatMap(_.loadRaw(parts.tail.mkString(".")))
  }

  /** Registry first (session-local names win within their session), then
    * the graft catalog (durable names). Catalog stores get the family's
    * keyed read as the MERGE pre-image — the same contract every
    * registration supplies by hand.
    */
  private[operators] def resolveStore(table: String): Option[Registration] =
    lookup(table).orElse(catalogLoaded(table).collect {
      case graft.sources.GraftStoreLoader.LoadedCow(_, s) =>
        Registration(s, s.snapshotForKeys(_))
      case graft.sources.GraftStoreLoader.LoadedMor(_, s) =>
        Registration(s, s.snapshotForKeys(_))
    })

  private[operators] def resolveLog(
      table: String): Option[graft.sources.AppendLog] =
    lookupLog(table).orElse(catalogLoaded(table).collect {
      case graft.sources.GraftStoreLoader.LoadedLog(_, l) => l
    })

  /** Unwrap `SubqueryAlias*(UnresolvedRelation)` into (dotted table
    * name, the qualifier spellings that may prefix its columns).
    */
  private def relationOf(plan: LogicalPlan): Option[(String, Set[String])] =
    plan match {
      case SubqueryAlias(id, child) =>
        relationOf(child).map { case (n, q) => (n, q + norm(id.name)) }
      case r: UnresolvedRelation =>
        val parts = r.multipartIdentifier.map(norm)
        Some((parts.mkString("."),
          Set(parts.last, parts.mkString("."))))
      case _ => None
    }

  /** Qualifier spellings for the source side: its alias if aliased, its
    * table-name spellings if it is a plain relation, nothing for a bare
    * subquery (whose columns must then be referenced unqualified or not
    * at all on the source side of conditions).
    */
  private def sourceQuals(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) => sourceQuals(child) + norm(id.name)
    case r: UnresolvedRelation =>
      val parts = r.multipartIdentifier.map(norm)
      Set(parts.last, parts.mkString("."))
    case _ => Set.empty
  }

  /** Re-qualify every `alias.col` reference onto the `s`/`t` aliases the
    * classification join in [[MergeInto]] exposes. Unqualified names are
    * left for analysis to resolve (ambiguous ones fail there, loudly).
    */
  private def requalify(e: Expression, tq: Set[String],
      sq: Set[String]): Expression = e.transformUp {
    case a: UnresolvedAttribute if a.nameParts.length >= 2 =>
      val q = a.nameParts.init.map(norm).mkString(".")
      if (tq.contains(q)) UnresolvedAttribute(Seq("t", a.nameParts.last))
      else if (sq.contains(q)) UnresolvedAttribute(Seq("s", a.nameParts.last))
      else a
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** DML-capture precedence guard: SELECT resolution gives an existing
    * catalog table / temp view of the same name precedence over the
    * registry (resolveRelation), so a DML capture of that name would
    * split the statement surface — SELECT reading the view while
    * DELETE/UPDATE/MERGE mutate the graft store. There is no right guess
    * on a collision, so it fails loudly instead (rename the view or
    * unregister the store).
    */
  private def guardCatalogCollision(table: String, stmt: String): Unit =
    if (catalogHas(SparkSession.active, table))
      fail(s"$stmt target $table resolves through BOTH the Spark catalog " +
        "(table/temp view — which SELECT over this name reads) and the " +
        "graft registry; refusing to capture the statement — rename the " +
        "catalog object or unregister the graft store")

  /** Compile a parsed MERGE whose target is a registered store; None =
    * not ours (pass through to Spark untouched).
    */
  def compile(m: MergeIntoTable): Option[LogicalPlan] = {
    val (table, tq) = relationOf(m.targetTable).getOrElse(return None)
    if (lookup(table).nonEmpty) guardCatalogCollision(table, "MERGE")
    val reg = resolveStore(table).getOrElse {
      if (resolveLog(table).nonEmpty)
        fail(s"MERGE INTO append log $table — an event log is not keyed; " +
          "INSERT/DELETE are the log's statements")
      return None
    }
    val sq = sourceQuals(m.sourceTable)
    if ((tq & sq).nonEmpty)
      fail(s"target and source share a qualifier spelling ${(tq & sq).mkString(",")} — alias one side")
    if (m.withSchemaEvolution)
      fail("WITH SCHEMA EVOLUTION is not supported; evolve the store spec explicitly")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported — target-only maintenance is deleteWhere's job and never needs the source scan")

    val spec = reg.store.spec
    val pk = spec.pkCols.map(norm)
    val dataCols = spec.dataCols

    // ON must be exactly the key equality, one conjunct per key column
    val covered = conjuncts(m.mergeCondition).map { c =>
      requalify(c, tq, sq) match {
        case EqualTo(UnresolvedAttribute(Seq("t", a)), UnresolvedAttribute(Seq("s", b)))
          if norm(a) == norm(b) && pk.contains(norm(a)) => norm(a)
        case EqualTo(UnresolvedAttribute(Seq("s", b)), UnresolvedAttribute(Seq("t", a)))
          if norm(a) == norm(b) && pk.contains(norm(a)) => norm(a)
        case other => fail(s"ON must be the key equality on (${spec.pkCols.mkString(",")}) " +
          s"with matching column names; got conjunct: ${other.sql}")
      }
    }.toSet
    if (covered != pk.toSet)
      fail(s"ON covers (${covered.mkString(",")}) but the key of $table is (${spec.pkCols.mkString(",")})")

    def targetColOf(key: Expression): String = key match {
      case a: UnresolvedAttribute =>
        if (a.nameParts.length >= 2 &&
          !tq.contains(a.nameParts.init.map(norm).mkString(".")))
          fail(s"SET/INSERT column ${a.sql} is not a target column")
        val n = a.nameParts.last
        dataCols.find(_.equalsIgnoreCase(n)).getOrElse(
          fail(s"column $n is not a column of $table"))
      case other => fail(s"assignment key must be a column, got ${other.sql}")
    }

    var delete: Option[Expression] = None
    var update: Option[(Expression, Seq[(String, Expression)])] = None
    m.matchedActions.foreach {
      case DeleteAction(c) =>
        if (delete.nonEmpty) fail("at most one WHEN MATCHED … DELETE clause")
        if (update.nonEmpty)
          fail("write the DELETE clause before UPDATE: the engine evaluates delete-then-update, and accepting UPDATE-first would silently change which clause wins on overlap")
        delete = Some(requalify(c.getOrElse(Literal.TrueLiteral), tq, sq))
      case UpdateAction(c, assigns, _) =>
        if (update.nonEmpty) fail("at most one WHEN MATCHED … UPDATE clause")
        val sets = assigns.map { a =>
          val n = targetColOf(a.key)
          if (pk.contains(norm(n)))
            fail(s"UPDATE SET on key column $n — a key change is a delete+insert, not an update")
          n -> requalify(a.value, tq, sq)
        }
        update = Some((requalify(c.getOrElse(Literal.TrueLiteral), tq, sq), sets))
      case UpdateStarAction(c) =>
        if (update.nonEmpty) fail("at most one WHEN MATCHED … UPDATE clause")
        val sets = dataCols.filterNot(dc => pk.contains(norm(dc)))
          .map(dc => dc -> (UnresolvedAttribute(Seq("s", dc)): Expression))
        update = Some((requalify(c.getOrElse(Literal.TrueLiteral), tq, sq), sets))
      case other => fail(s"unsupported WHEN MATCHED action: $other")
    }

    var insert: Option[Expression] = None
    var insertSets: Seq[(String, Expression)] = Nil
    m.notMatchedActions.foreach {
      case InsertStarAction(c) =>
        if (insert.nonEmpty) fail("at most one WHEN NOT MATCHED … INSERT clause")
        insert = Some(requalify(c.getOrElse(Literal.TrueLiteral), tq, sq))
      case InsertAction(c, assigns) =>
        if (insert.nonEmpty) fail("at most one WHEN NOT MATCHED … INSERT clause")
        // arbitrary source-side expressions per target column (the same
        // requalify path UPDATE SET compiles through); `t.` references
        // are refused — a NOT MATCHED pair has no target row to read.
        // Identity entries (col ← same-named source col) compile away to
        // the machinery's default so the plain shape stays the plain plan.
        val names = assigns.map { a =>
          val n = targetColOf(a.key)
          val v = requalify(a.value, tq, sq)
          v.foreach {
            case UnresolvedAttribute(Seq("t", cName)) =>
              fail(s"INSERT value for $n reads target column t.$cName — " +
                "a NOT MATCHED row has no target image")
            case _ => ()
          }
          val identity = v match {
            case UnresolvedAttribute(parts)
              if parts.last.equalsIgnoreCase(n) &&
                (parts.length == 1 || parts.head == "s") => true
            case _ => false
          }
          if (!identity) insertSets :+= (n -> v)
          n
        }
        if (names.map(norm).distinct.size != names.size)
          fail(s"INSERT column list assigns a column twice: ${names.mkString(",")}")
        val missing = dataCols.filterNot(dc => names.exists(_.equalsIgnoreCase(dc)))
        if (missing.nonEmpty)
          fail(s"INSERT column list must cover every column of $table; missing: ${missing.mkString(",")}")
        insert = Some(requalify(c.getOrElse(Literal.TrueLiteral), tq, sq))
      case other => fail(s"unsupported WHEN NOT MATCHED action: $other")
    }
    if (delete.isEmpty && update.isEmpty && insert.isEmpty)
      fail("MERGE with no actionable clause")

    Some(GraftMergeCommand(table,
      MergeProgram(m.sourceTable, delete, update, insert, insertSets)))
  }

  // ── the rest of the DML face: DELETE FROM / UPDATE / INSERT INTO ────
  // Same design as MERGE: Spark's grammar parses, the parser hook
  // reroutes statements whose target is registered, everything else
  // passes through. Append-only LOGS register separately (they are not
  // keyed TableStores): DELETE routes to AppendLog.deleteWhere (zone-
  // pruned dir surgery), INSERT to append; UPDATE on a log is refused —
  // an event log is immutable by contract.

  private val logRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, graft.sources.AppendLog]()

  /** Expose an append log to SQL DELETE/INSERT under `name`. */
  def registerLog(name: String, log: graft.sources.AppendLog): Unit = {
    logRegistry.put(norm(name), log); ()
  }
  def unregisterLog(name: String): Unit = { logRegistry.remove(norm(name)); () }

  private[operators] def lookupLog(name: String): Option[graft.sources.AppendLog] =
    Option(logRegistry.get(norm(name)))

  /** Re-qualify a single-table condition/SET expression: references
    * qualified by the target's spellings drop to bare names (they
    * resolve against the snapshot); any OTHER qualifier is a user error
    * (there is no second relation in a DELETE/UPDATE scope).
    */
  private def bare(e: Expression, tq: Set[String]): Expression = e.transformUp {
    case a: UnresolvedAttribute if a.nameParts.length >= 2 =>
      val q = a.nameParts.init.map(norm).mkString(".")
      if (tq.contains(q)) UnresolvedAttribute(Seq(a.nameParts.last))
      else fail(s"unknown qualifier in ${a.sql} — only the target table is in scope")
  }

  /** DELETE FROM a registered store (keyed delete through the family's
    * own path — bucket-pruned rewrite on the CoW store, generic
    * keys-probe + compacted-batch delete elsewhere) or log (zone-pruned
    * directory surgery). None = target not registered.
    */
  def compileDelete(d: DeleteFromTable): Option[LogicalPlan] = {
    val (table, tq) = relationOf(d.table).getOrElse(return None)
    if (lookup(table).nonEmpty || lookupLog(table).nonEmpty)
      guardCatalogCollision(table, "DELETE")
    else if (catalogLoaded(table).isEmpty) return None
    Some(GraftDeleteCommand(table, DmlProgram(bare(d.condition, tq))))
  }

  /** UPDATE a registered store: one snapshot filter for the affected
    * rows, SET expressions applied (non-key columns only), one
    * compacted-batch upsert — O(scan probe + affected buckets).
    */
  def compileUpdate(u: UpdateTable): Option[LogicalPlan] = {
    val (table, tq) = relationOf(u.table).getOrElse(return None)
    if (lookupLog(table).nonEmpty)
      fail(s"UPDATE on append log $table — an event log is immutable; MERGE/UPDATE belong to the keyed stores")
    if (lookup(table).nonEmpty) guardCatalogCollision(table, "UPDATE")
    val reg = resolveStore(table).getOrElse {
      if (resolveLog(table).nonEmpty)
        fail(s"UPDATE on append log $table — an event log is immutable; " +
          "MERGE/UPDATE belong to the keyed stores")
      return None
    }
    val spec = reg.store.spec
    val pk = spec.pkCols.map(norm)
    val sets = u.assignments.map { a =>
      val n = a.key match {
        case attr: UnresolvedAttribute =>
          spec.dataCols.find(_.equalsIgnoreCase(attr.nameParts.last)).getOrElse(
            fail(s"SET column ${attr.sql} is not a column of $table"))
        case other => fail(s"SET key must be a column, got ${other.sql}")
      }
      if (pk.contains(norm(n)))
        fail(s"UPDATE SET on key column $n — a key change is a delete+insert, not an update")
      n -> bare(a.value, tq)
    }
    Some(GraftUpdateCommand(table,
      DmlProgram(bare(u.condition.getOrElse(Literal.TrueLiteral), tq)), sets.map(_._1),
      sets.map(s => DmlProgram(s._2))))
  }

  /** INSERT INTO a registered store (UPSERT-on-key semantics — the same
    * contract every CDC apply path and the reference's loader enforce;
    * duplicate keys WITHIN the batch are refused) or log (one appended
    * batch). Positional column mapping with a cast to the declared
    * schema, SQL-style; `byName = true` (INSERT ... BY NAME) maps by
    * name. OVERWRITE/partition clauses are refused.
    */
  def compileInsert(i: InsertIntoStatement): Option[LogicalPlan] = {
    val (table, _) = relationOf(i.table).getOrElse(return None)
    if (lookup(table).nonEmpty || lookupLog(table).nonEmpty)
      guardCatalogCollision(table, "INSERT")
    else if (catalogLoaded(table).isEmpty) return None
    if (i.overwrite)
      fail("INSERT OVERWRITE is not supported — rebuild the store/log explicitly")
    if (i.partitionSpec.nonEmpty || i.ifPartitionNotExists)
      fail("partitioned INSERT clauses are not supported on graft stores")
    Some(GraftInsertCommand(table, i.query, i.userSpecifiedCols, i.byName))
  }

  // ── SELECT face: registered names resolve as relations ──────────────
  // `SELECT … FROM <registered store>` reads the live snapshot,
  // `FROM <name> VERSION AS OF n` time-travels a versioned store, and a
  // registered log's name scans the log. Resolution happens at parse
  // time by splicing the ANALYZED snapshot plan in place of the
  // unresolved relation; an existing catalog table or temp view of the
  // same name WINS (the hook must never shadow what Spark can already
  // resolve).

  private def catalogHas(spark: SparkSession, name: String): Boolean =
    try spark.catalog.tableExists(name)
    catch { case _: Exception => false }

  private[operators] def resolveRelation(r: UnresolvedRelation): Option[LogicalPlan] = {
    if (r.isStreaming) return None
    val spark = SparkSession.active
    val name = r.multipartIdentifier.map(norm).mkString(".")
    // graft-CATALOG names splice here too: the parse-time splice is the
    // same native snapshot plan the extensions resolution rule produces,
    // and it cannot shadow anything (a configured GraftCatalog owns its
    // whole name prefix). Sessions that bypass this parser still resolve
    // through Spark's own catalog machinery (V1Scan fallback / rule).
    if (lookup(name).isEmpty && lookupLog(name).isEmpty) {
      return catalogLoaded(name).map {
        case graft.sources.GraftStoreLoader.LoadedCow(_, st) => st.snapshot()
        case graft.sources.GraftStoreLoader.LoadedMor(_, st) => st.snapshot()
        case graft.sources.GraftStoreLoader.LoadedLog(_, lg) => lg.scan()
      }.map(_.queryExecution.analyzed)
    }
    if (catalogHas(spark, r.multipartIdentifier.mkString("."))) return None
    lookup(name).map(_.store.snapshot())
      .orElse(lookupLog(name).map(_.scan()))
      .map(_.queryExecution.analyzed)
  }

  /** Fold a `TIMESTAMP AS OF` expression to epoch micros (session time
    * zone, Spark's own cast semantics). Only literal/foldable expressions
    * qualify — `current_timestamp()`-style travel would re-resolve per
    * analysis and is refused loudly.
    */
  private def tsMicrosOf(e: Expression): Long = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    val c = Cast(e, org.apache.spark.sql.types.TimestampType, Option(zone))
    if (!e.resolved || !c.foldable)
      fail(s"TIMESTAMP AS OF must be a literal timestamp, got ${e.sql}")
    (try c.eval(null) catch { case ex: Exception =>
      fail(s"TIMESTAMP AS OF could not evaluate ${e.sql}: ${ex.getMessage}")
    }) match {
      case l: java.lang.Long => l.longValue
      case _ => fail(s"TIMESTAMP AS OF evaluated to NULL: ${e.sql}")
    }
  }

  private[operators] def resolveTimeTravel(
      tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel): Option[LogicalPlan] = {
    val ur = tt.relation match {
      case u: UnresolvedRelation => u
      case _ => return None
    }
    val name = ur.multipartIdentifier.map(norm).mkString(".")
    // catalog names pass through: Spark's own analyzer resolves their
    // time travel via GraftCatalog.loadTable(ident, version/timestamp)
    val reg = lookup(name).getOrElse(return None)
    reg.store match {
      case v: graft.sources.ParquetTableStore if tt.timestamp.nonEmpty =>
        Some(v.snapshotAt(v.versionAtTimestamp(tsMicrosOf(tt.timestamp.get)))
          .queryExecution.analyzed)
      case _: graft.sources.VersionedTableStore if tt.timestamp.nonEmpty =>
        fail("TIMESTAMP AS OF needs commit wall-clock records — this store " +
          "family does not keep them; use VERSION AS OF <n>")
      case v: graft.sources.VersionedTableStore =>
        val ver = tt.version.getOrElse(fail("VERSION AS OF requires a version"))
        val vl = try ver.toLong catch { case _: NumberFormatException =>
          fail(s"VERSION AS OF must be a number for graft stores, got '$ver'") }
        Some(v.snapshotAt(vl).queryExecution.analyzed)
      case _ => fail(s"$name is not a versioned store — time travel unavailable")
    }
  }

  /** Registered-name resolution over a whole (sub)plan — applied to
    * plain queries and to DML source subtrees, never to DML targets.
    */
  private[operators] def routeRels(p: LogicalPlan): LogicalPlan = p.transformUp {
    case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
      resolveTimeTravel(tt).getOrElse(tt)
    case r: UnresolvedRelation => resolveRelation(r).getOrElse(r)
  }

  /** Parse → compile → execute for sessions built WITHOUT the
    * extensions hook (the `install`-style twin). Accepts every
    * statement the parser hook owns — MERGE / DELETE / UPDATE / INSERT
    * (one-row stats frame back) — plus plain queries over registered
    * names (the SELECT face).
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    // pin THIS session active for the whole parse→compile→run span:
    // catalog resolution (catalogLoaded / resolveRelation) reads the
    // active session's catalog manager, and a caller driving a sibling
    // session (spark.newSession with its own catalog conf) must resolve
    // against THAT session, not whichever was active before
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try sqlImpl(spark, sqlText)
    finally prev match {
      case Some(p) => SparkSession.setActiveSession(p)
      case None => SparkSession.clearActiveSession()
    }
  }

  private def sqlImpl(spark: SparkSession, sqlText: String): DataFrame = {
    def req(p: Option[LogicalPlan]): LogicalPlan = p.getOrElse(fail(
      "statement target is not a registered graft store/log — " +
        "MergeIntoSql.register / registerLog first"))
    spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case m: MergeIntoTable =>
        ColumnBridge.ofRows(spark, req(compile(
          m.copy(sourceTable = routeRels(m.sourceTable)))))
      case d: DeleteFromTable => ColumnBridge.ofRows(spark, req(compileDelete(d)))
      case u: UpdateTable => ColumnBridge.ofRows(spark, req(compileUpdate(u)))
      case i: InsertIntoStatement =>
        ColumnBridge.ofRows(spark, req(compileInsert(
          i.copy(query = routeRels(i.query)))))
      case q => ColumnBridge.ofRows(spark, routeRels(q))
    }
  }
}

/** One hidden unresolved expression (same QueryPlan-shielding rationale
  * as [[MergeProgram]]).
  */
final case class DmlProgram(expr: Expression)

final case class GraftDeleteCommand(table: String, cond: DmlProgram)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val c = ColumnBridge.column(cond.expr)
    val n = MergeIntoSql.resolveLog(table) match {
      case Some(log) => log.deleteWhere(c)
      case None =>
        val reg = MergeIntoSql.resolveStore(table).getOrElse(throw new IllegalStateException(
          s"[GRAFT_DML] $table was unregistered between parse and execution"))
        reg.store match {
          case p: graft.sources.ParquetTableStore => p.deleteWhere(c)
          case s => // generic family path: keys probe + compacted delete
            import org.apache.spark.sql.functions.{coalesce, lit}
            val keys = s.snapshot().filter(coalesce(c, lit(false)))
              .select(s.spec.pkCols.map(org.apache.spark.sql.functions.col): _*)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val n0 = keys.count()
              if (n0 > 0L) s.merge(CompactedBatch(deletes = keys,
                upserts = s.snapshot().limit(0)))
              n0
            } finally { keys.unpersist(blocking = false); () }
        }
    }
    Seq(Row(n))
  }
}

/** SQL UPDATE: one snapshot filter for the affected rows (the probe), SET
  * applied, one compacted-batch upsert. COST NOTE (r13 verdict #4): the
  * probe FILTERS THE WHOLE SNAPSHOT — standard for SQL UPDATE, and the
  * write side stays O(affected buckets) — but where the predicate names
  * key or zone columns the probe could ride the store's bucket pruning /
  * a log-style zone cut instead of a full scan; bucketed stores have no
  * zone manifests (hash buckets span the value range), so that
  * optimization waits on clustered-store zone sidecars.
  */
final case class GraftUpdateCommand(table: String, cond: DmlProgram,
    setCols: Seq[String], setExprs: Seq[DmlProgram])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("updated", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val reg = MergeIntoSql.resolveStore(table).getOrElse(throw new IllegalStateException(
      s"[GRAFT_DML] $table was unregistered between parse and execution"))
    val sets = setCols.zip(setExprs.map(p => ColumnBridge.column(p.expr))).toMap
    val affected = reg.store.snapshot()
      .filter(coalesce(ColumnBridge.column(cond.expr), lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = affected.count()
      if (n > 0L) {
        val upserts = affected.select(reg.store.spec.dataCols.map { c =>
          sets.collectFirst { case (k, e) if k.equalsIgnoreCase(c) => e.as(c) }
            .getOrElse(col(c))
        }: _*)
        reg.store.merge(CompactedBatch(
          deletes = affected.select(reg.store.spec.pkCols.map(col): _*).limit(0),
          upserts = upserts))
      }
      Seq(Row(n))
    } finally { affected.unpersist(blocking = false); () }
  }
}

final case class GraftInsertCommand(table: String, query: LogicalPlan,
    userCols: Seq[String], byName: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("inserted", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val src = ColumnBridge.ofRows(sparkSession, query)
    val (schema, dataCols, pk) = MergeIntoSql.resolveLog(table) match {
      case Some(log) => (log.schema, log.schema.fieldNames.toSeq, Nil)
      case None =>
        val reg = MergeIntoSql.resolveStore(table).getOrElse(throw new IllegalStateException(
          s"[GRAFT_DML] $table was unregistered between parse and execution"))
        (reg.store.spec.schema, reg.store.spec.dataCols, reg.store.spec.pkCols)
    }
    // column mapping: explicit list > BY NAME > positional (SQL default)
    val targets: Seq[String] =
      if (userCols.nonEmpty) {
        val missing = dataCols.filterNot(c => userCols.exists(_.equalsIgnoreCase(c)))
        if (missing.nonEmpty)
          throw new IllegalArgumentException(s"[GRAFT_DML] INSERT column list " +
            s"must cover every column of $table; missing: ${missing.mkString(",")}")
        userCols
      } else if (byName) dataCols
      else {
        if (src.columns.length != dataCols.size)
          throw new IllegalArgumentException(s"[GRAFT_DML] INSERT arity " +
            s"${src.columns.length} != ${dataCols.size} columns of $table")
        dataCols
      }
    val renamed =
      if (byName) src.select(dataCols.map(c => col(c).cast(schema(
        schema.fieldNames.find(_.equalsIgnoreCase(c)).get).dataType).as(c)): _*)
      else {
        // positional under the target order in `targets`
        val byPos = src.toDF(targets: _*)
        byPos.select(dataCols.map(c => col(c).cast(schema(
          schema.fieldNames.find(_.equalsIgnoreCase(c)).get).dataType).as(c)): _*)
      }
    val batch = renamed
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = batch.count()
      MergeIntoSql.resolveLog(table) match {
        case Some(log) => if (n > 0L) log.append(batch)
        case None =>
          val reg = MergeIntoSql.resolveStore(table).get
          val dups = batch.groupBy(pk.map(col): _*).count()
            .filter(col("count") > 1).limit(1).count()
          if (dups > 0L)
            throw new IllegalArgumentException(s"[GRAFT_DML] INSERT batch has " +
              s"duplicate keys on (${pk.mkString(",")}) — the upsert result " +
              "would depend on row order")
          if (n > 0L) reg.store.merge(CompactedBatch(
            deletes = batch.select(pk.map(col): _*).limit(0),
            upserts = batch))
      }
      Seq(Row(n))
    } finally { batch.unpersist(blocking = false); () }
  }
}

/** The compiled clause program. Deliberately a plain holder (NOT an
  * Iterable/Option product element of the command): the expressions are
  * unresolved `s.`/`t.` references that only make sense against the
  * classification join [[MergeInto]] builds at run time — exposing them
  * through `QueryPlan.expressions` would make the analyzer reject the
  * command as unresolved.
  */
final case class MergeProgram(
    source: LogicalPlan,
    delete: Option[Expression],
    update: Option[(Expression, Seq[(String, Expression)])],
    insert: Option[Expression],
    insertSet: Seq[(String, Expression)] = Nil)

/** Leaf command: `spark.sql("MERGE INTO …")` executes this eagerly (the
  * standard command contract) and yields the per-clause stats row —
  * observable effect on the registered store, auditable counts back.
  */
final case class GraftMergeCommand(table: String, program: MergeProgram)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("matched", LongType, nullable = false)(),
    AttributeReference("deleted", LongType, nullable = false)(),
    AttributeReference("updated", LongType, nullable = false)(),
    AttributeReference("inserted", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    // re-resolved at run time: the registry is driver-lifecycle state
    // (resolveStore also re-reads a catalog name's on-disk _spec)
    val reg = MergeIntoSql.resolveStore(table).getOrElse(throw new IllegalStateException(
      s"[GRAFT_MERGE] store $table was unregistered between parse and execution"))
    val col = (e: Expression) => ColumnBridge.column(e)
    val stats = MergeInto(reg.store, reg.preImage,
      ColumnBridge.ofRows(sparkSession, program.source),
      whenMatchedDelete = program.delete.map(col),
      whenMatchedUpdate = program.update.map { case (c, sets) =>
        MergeInto.Update(col(c), sets.map { case (n, e) => n -> col(e) }.toMap)
      },
      whenNotMatchedInsert = program.insert.map(col),
      insertSet = program.insertSet.map { case (n, e) => n -> col(e) }.toMap)
    Seq(Row(stats.matched, stats.deleted, stats.updated, stats.inserted))
  }
}

/** Delegating parser: everything is the session's own parser except that
  * a parsed MERGE whose target is a registered graft store compiles to
  * [[GraftMergeCommand]]. Installed by `GraftExtensions.injectParser`.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private def post(plan: LogicalPlan): LogicalPlan = plan match {
    // pass-through statements keep their ROUTED source/query subtree: a
    // MERGE/INSERT into a non-registered target whose source reads a
    // registered name still needs that name resolved, exactly like the
    // plain-query branch below
    case m: MergeIntoTable =>
      val routed = m.copy(sourceTable = MergeIntoSql.routeRels(m.sourceTable))
      MergeIntoSql.compile(routed).getOrElse(routed)
    case d: DeleteFromTable => MergeIntoSql.compileDelete(d).getOrElse(d)
    case u: UpdateTable => MergeIntoSql.compileUpdate(u).getOrElse(u)
    case i: InsertIntoStatement =>
      val routed = i.copy(query = MergeIntoSql.routeRels(i.query))
      MergeIntoSql.compileInsert(routed).getOrElse(routed)
    case p => MergeIntoSql.routeRels(p)
  }
  override def parsePlan(sqlText: String): LogicalPlan =
    post(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    post(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): org.apache.spark.sql.catalyst.TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}
