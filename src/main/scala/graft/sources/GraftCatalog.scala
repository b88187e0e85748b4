package graft.sources

import graft.model.TableSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** On-disk TABLE IDENTITY record (`_spec`, one per store/log directory) —
  * what makes a graft table a DURABLE WAREHOUSE NAME instead of session
  * state. The reference's users address `public.orders` as a name that
  * exists independently of any process (bireme's table map names live in
  * config and resolve against the warehouse's own metadata,
  * reference: Config.java:242-272, Table.java:30-88); before this record,
  * every SQL-face name here had to be re-`register`ed per session because
  * nothing on disk said what the directory WAS (schema, key, bucket
  * count). The record is written once at the first commit (atomic rename,
  * like every other control file) and never changes — evolution that
  * changes identity (AppendLog widening) overwrites it with the widened
  * schema on its next commit.
  *
  * Format: one `key<TAB>url-encoded-value` line per field; unknown keys
  * are ignored (forward compatibility), absent keys take constructor
  * defaults. The schema rides Spark's own DDL rendering
  * (`StructType.toDDL`/`fromDDL`) — no custom type codec to drift.
  */
object StoreSpecIO {

  /** `kind` ∈ cow | mor | log. Constructor-tuning fields that do NOT
    * affect on-disk identity (broadcast limits, auto-compaction policy)
    * are deliberately not recorded — a reopening session chooses its own.
    * `buckets`/`cluster` ARE identity: reopening with different values
    * corrupts merges (the store's own manifest guard) or silently changes
    * layout.
    */
  final case class Rec(
      kind: String,
      name: String,
      schema: StructType,
      pk: Seq[String] = Nil,
      buckets: Int = 64,
      retained: Int = 1,
      cluster: Seq[String] = Nil,
      compactThreshold: Int = 8,
      zones: Seq[String] = Nil)

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  def render(r: Rec): Array[Byte] = {
    val fields = Seq(
      "kind" -> r.kind,
      "name" -> r.name,
      "schema" -> r.schema.toDDL,
      "pk" -> r.pk.mkString(","),
      "buckets" -> r.buckets.toString,
      "retained" -> r.retained.toString,
      "cluster" -> r.cluster.mkString(","),
      "compact" -> r.compactThreshold.toString,
      "zones" -> r.zones.mkString(","))
    fields.map { case (k, v) => s"$k\t${enc(v)}" }
      .mkString("\n").getBytes("UTF-8")
  }

  def parse(body: String): Rec = {
    val kv = body.split('\n').filter(_.contains('\t')).map { l =>
      val i = l.indexOf('\t')
      l.substring(0, i) -> dec(l.substring(i + 1))
    }.toMap
    def csv(k: String) = kv.get(k).filter(_.nonEmpty)
      .map(_.split(',').toSeq).getOrElse(Nil)
    Rec(
      kind = kv("kind"),
      name = kv("name"),
      schema = StructType.fromDDL(kv("schema")),
      pk = csv("pk"),
      buckets = kv.get("buckets").map(_.toInt).getOrElse(64),
      retained = kv.get("retained").map(_.toInt).getOrElse(1),
      cluster = csv("cluster"),
      compactThreshold = kv.get("compact").map(_.toInt).getOrElse(8),
      zones = csv("zones"))
  }

  /** The `_spec` path inside a table directory. */
  def specPath(tableDir: Path): Path = new Path(tableDir, "_spec")

  /** Write the record if absent (first commit) or if its schema/zones
    * changed (AppendLog additive evolution re-declares the widened
    * schema). Atomic rename; a concurrent reader sees old or new, never
    * a torn record.
    */
  def ensure(conf: org.apache.hadoop.conf.Configuration, tableDir: Path,
      rec: Rec): Unit = {
    val p = specPath(tableDir)
    val fs = p.getFileSystem(conf)
    val current = read(conf, tableDir)
    if (!current.contains(rec)) {
      fs.mkdirs(tableDir)
      AtomicFiles.write(conf, p, render(rec))
    }
  }

  def read(conf: org.apache.hadoop.conf.Configuration,
      tableDir: Path): Option[Rec] = {
    val p = specPath(tableDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    try Some(parse(body)) catch { case _: Exception => None }
  }
}

/** Open a store/log purely from its on-disk `_spec` — the loader both the
  * [[GraftCatalog]] and the SQL face's catalog fallback share. Stateless:
  * constructing a store object reads nothing; manifests resolve at first
  * snapshot/merge, so a load is driver-side-cheap and never stale.
  */
object GraftStoreLoader {
  sealed trait Loaded { def rec: StoreSpecIO.Rec }
  final case class LoadedCow(rec: StoreSpecIO.Rec,
      store: ParquetTableStore) extends Loaded
  final case class LoadedMor(rec: StoreSpecIO.Rec,
      store: MorTableStore) extends Loaded
  final case class LoadedLog(rec: StoreSpecIO.Rec,
      log: AppendLog) extends Loaded

  /** Table directory for a dotted name under `root` (the same `.`→`_`
    * mapping every store constructor applies).
    */
  def tableDir(root: String, dotted: String): Path =
    new Path(root, dotted.replace('.', '_'))

  def load(spark: SparkSession, root: String,
      dotted: String): Option[Loaded] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rec = StoreSpecIO.read(conf, tableDir(root, dotted))
      .getOrElse(return None)
    val spec = TableSpec(rec.name, rec.schema,
      if (rec.pk.nonEmpty) rec.pk else rec.schema.fieldNames.toSeq)
    Some(rec.kind match {
      case "cow" => LoadedCow(rec, new ParquetTableStore(spark, root, spec,
        numBuckets = rec.buckets, retainedVersions = rec.retained,
        clusterCols = rec.cluster))
      case "mor" => LoadedMor(rec, new MorTableStore(spark, root, spec,
        numBuckets = rec.buckets, compactThreshold = rec.compactThreshold))
      case "log" => LoadedLog(rec, new AppendLog(spark, root, rec.name,
        rec.schema, zoneCols = rec.zones))
      case other => throw new IllegalStateException(
        s"[GRAFT_CATALOG] unknown table kind '$other' in ${tableDir(root, dotted)}/_spec")
    })
  }
}

/** `graft` CATALOG PLUGIN (DataSourceV2 [[TableCatalog]]): stores and logs
  * resolve as durable names in ANY session —
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse/graft
  *   spark.sql("SELECT * FROM graft.public.orders")            // live snapshot
  *   spark.sql("... FROM graft.public.orders VERSION AS OF 3") // time travel
  *   spark.sql("... TIMESTAMP AS OF '2026-08-01 00:00:00'")    // wall-clock travel
  * }}}
  *
  * — with ZERO `register` calls: identifiers load from each table
  * directory's on-disk [[StoreSpecIO]] record. This retires the
  * shared-session registry-leak bug class the per-session `register`
  * hooks carried (every query had to `finally unregister`); the hooks
  * remain as the no-catalog twin.
  *
  * Read path, two tiers:
  *  - with [[graft.GraftExtensions]] installed, [[GraftTableResolveRule]]
  *    replaces the catalog relation at ANALYSIS time with the store's own
  *    snapshot plan — the native bucketed parquet scan, so predicate
  *    pushdown, column pruning, zone rules and join planning all see the
  *    real relation (the deployment path);
  *  - without extensions, the table's [[V1Scan]] fallback executes the
  *    same snapshot as an RDD scan — correct everywhere Spark can load
  *    the catalog, at reduced pushdown (documented trade; sessions that
  *    care install the extensions).
  *
  * DML (MERGE/DELETE/UPDATE/INSERT) routes through the graft SQL face
  * ([[graft.operators.MergeIntoSql]]), which resolves `graft.*` targets
  * through this catalog with the same zero-register contract — Spark's
  * own v2 row-level-operation path would demand a full DSv2 write stack
  * for semantics the store families already implement bucket-pruned.
  *
  * Namespaces are IMPLICIT — the dotted prefix of each table's durable
  * name ("public.orders" lives in namespace ["public"]). They spring into
  * existence with their first table and vanish with their last;
  * `CREATE NAMESPACE` is accepted as a no-op for tool compatibility.
  *
  * Concurrency: the catalog holds NO table state (every load re-reads the
  * tiny `_spec`; snapshots resolve manifests at call time), so staleness
  * is impossible and the single-writer-per-table contract is unchanged.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var rootDir: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    rootDir = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"[GRAFT_CATALOG] catalog '$name' needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catName

  /** Warehouse root this catalog serves (for the SQL face's loader). */
  def root: String = rootDir

  private def spark = SparkSession.active
  private def hconf = spark.sparkContext.hadoopConfiguration

  private def dotted(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(".").toLowerCase(java.util.Locale.ROOT)

  /** Every `_spec` under the root — one directory listing plus one tiny
    * file read per table; bounded by the warehouse's table count.
    */
  private def allSpecs(): Seq[StoreSpecIO.Rec] = {
    val rp = new Path(rootDir)
    val fs = rp.getFileSystem(hconf)
    if (!fs.exists(rp)) return Nil
    fs.listStatus(rp).filter(_.isDirectory).toSeq
      .flatMap(st => StoreSpecIO.read(hconf, st.getPath))
  }

  private def nsOf(rec: StoreSpecIO.Rec): Seq[String] = {
    val parts = rec.name.split('.').toSeq
    parts.init
  }

  /** Raw load for the SQL face: the store/log object behind a dotted
    * name, or None when the name has no `_spec`.
    */
  def loadRaw(dottedName: String): Option[GraftStoreLoader.Loaded] =
    GraftStoreLoader.load(spark, rootDir,
      dottedName.toLowerCase(java.util.Locale.ROOT))

  // ── TableCatalog ────────────────────────────────────────────────────

  override def listTables(namespace: Array[String]): Array[Identifier] =
    allSpecs()
      .filter(r => nsOf(r).map(_.toLowerCase) ==
        namespace.toSeq.map(_.toLowerCase))
      .map { r =>
        val parts = r.name.split('.')
        Identifier.of(parts.init, parts.last)
      }.toArray

  override def loadTable(ident: Identifier): Table = {
    val d = dotted(ident)
    val rec = StoreSpecIO.read(hconf, GraftStoreLoader.tableDir(rootDir, d))
      .getOrElse(throw new NoSuchTableException(ident.namespace :+ ident.name))
    new GraftTable(catName, d, rootDir, rec, pinnedVersion = None)
  }

  /** `VERSION AS OF <v>` — the CoW store's retained `_v` manifests and
    * the MOR store's readable delta floor both answer it; logs have no
    * version notion and refuse.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val base = loadTable(ident).asInstanceOf[GraftTable]
    val v = try version.toLong catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"[GRAFT_CATALOG] VERSION AS OF must be a number for graft tables, got '$version'")
    }
    base.rec.kind match {
      case "log" => throw new IllegalArgumentException(
        s"[GRAFT_CATALOG] ${ident} is an append log — time travel is a " +
          "versioned-store feature (use batch cursors: scanFrom/scanRange)")
      case _ => new GraftTable(catName, dotted(ident), rootDir, base.rec,
        pinnedVersion = Some(v))
    }
  }

  /** `TIMESTAMP AS OF <ts>` (micros since epoch, per the DSv2 contract):
    * resolved against the commit wall-clock each CoW manifest records to
    * the newest version committed at-or-before the timestamp.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val base = loadTable(ident).asInstanceOf[GraftTable]
    base.rec.kind match {
      case "cow" =>
        val v = GraftStoreLoader.load(spark, rootDir, dotted(ident)) match {
          case Some(GraftStoreLoader.LoadedCow(_, store)) =>
            store.versionAtTimestamp(timestampMicros)
          case _ => throw new NoSuchTableException(ident.namespace :+ ident.name)
        }
        new GraftTable(catName, dotted(ident), rootDir, base.rec,
          pinnedVersion = Some(v))
      case k => throw new IllegalArgumentException(
        s"[GRAFT_CATALOG] TIMESTAMP AS OF needs commit wall-clock records — " +
          s"a '$k' table does not keep them; use VERSION AS OF where available")
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    StoreSpecIO.read(hconf,
      GraftStoreLoader.tableDir(rootDir, dotted(ident))).nonEmpty

  /** `CREATE TABLE graft.<ns>.<t> (...) TBLPROPERTIES(...)`:
    * `kind` = cow (default) | mor | log; stores need `pk` (csv);
    * optional `buckets`, `retained`, `cluster`, `compact`, `zones`.
    * Partition transforms are refused — graft stores hash-bucket by key
    * (identity recorded in `_spec`), logs order by append.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new IllegalArgumentException("[GRAFT_CATALOG] PARTITIONED BY is " +
        "not supported — stores hash-bucket by primary key ('buckets' " +
        "property), logs order by append")
    val props = {
      import scala.jdk.CollectionConverters._
      properties.asScala.toMap
    }
    def csv(k: String) = props.get(k).filter(_.nonEmpty)
      .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
    val d = dotted(ident)
    val dir = GraftStoreLoader.tableDir(rootDir, d)
    if (StoreSpecIO.read(hconf, dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.namespace :+ ident.name)
    val kind = props.getOrElse("kind", "cow")
    val rec = kind match {
      case "cow" | "mor" =>
        val pk = csv("pk")
        if (pk.isEmpty) throw new IllegalArgumentException(
          s"[GRAFT_CATALOG] a '$kind' store needs TBLPROPERTIES('pk'='k1,k2') " +
            "(reference: all tables must have primary keys, GetPrimaryKeys.java:71-83)")
        StoreSpecIO.Rec(kind, d, schema, pk = pk,
          buckets = props.get("buckets").map(_.toInt).getOrElse(64),
          retained = props.get("retained").map(_.toInt).getOrElse(1),
          cluster = csv("cluster"),
          compactThreshold = props.get("compact").map(_.toInt).getOrElse(8))
      case "log" =>
        StoreSpecIO.Rec("log", d, schema, zones = csv("zones"))
      case other => throw new IllegalArgumentException(
        s"[GRAFT_CATALOG] unknown kind '$other' — cow | mor | log")
    }
    // materialize the empty table: spec + an empty first commit, so the
    // name resolves (and scans empty) immediately after CREATE
    StoreSpecIO.ensure(hconf, dir, rec)
    GraftStoreLoader.load(spark, rootDir, d).foreach {
      case GraftStoreLoader.LoadedCow(_, s) if !s.exists =>
        s.init(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], rec.schema))
      case GraftStoreLoader.LoadedMor(_, s) if !s.exists =>
        s.init(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], rec.schema))
      case GraftStoreLoader.LoadedLog(_, l) if !l.exists => l.create()
      case _ => ()
    }
    new GraftTable(catName, d, rootDir, rec, pinnedVersion = None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("[GRAFT_CATALOG] ALTER TABLE is " +
      "not supported — store identity is immutable; append-log widening is " +
      "declared by committing through an instance with the widened schema")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = GraftStoreLoader.tableDir(rootDir, dotted(ident))
    val fs = dir.getFileSystem(hconf)
    if (StoreSpecIO.read(hconf, dir).isEmpty) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("[GRAFT_CATALOG] RENAME is not " +
      "supported — the durable name is the directory identity")

  // ── SupportsNamespaces (implicit: the dotted prefixes of the tables) ──

  override def listNamespaces(): Array[Array[String]] =
    allSpecs().map(nsOf).distinct.map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Array.empty // single-level namespaces only
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || listNamespaces().exists(
      _.toSeq.map(_.toLowerCase) == namespace.toSeq.map(_.toLowerCase))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  /** Accepted as a no-op: namespaces are implicit prefixes. */
  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = ()

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "[GRAFT_CATALOG] namespaces are implicit and carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val tables = listTables(namespace)
    if (tables.nonEmpty && !cascade)
      throw new IllegalStateException(s"[GRAFT_CATALOG] namespace " +
        s"${namespace.mkString(".")} holds ${tables.length} tables")
    tables.foreach(dropTable)
    true
  }
}

/** A graft store/log surfaced through the DSv2 [[Table]] contract.
  * `pinnedVersion` = a time-traveled read ([[GraftCatalog.loadTable]]
  * version/timestamp overloads). The table object is identity + plan
  * FACTORY only — every [[planDf]] re-opens the store so the manifest
  * resolves at read time (no cached staleness, same contract as
  * `snapshot()` everywhere else).
  */
final class GraftTable(
    catalogName: String,
    dottedName: String,
    root: String,
    val rec: StoreSpecIO.Rec,
    val pinnedVersion: Option[Long]) extends Table with SupportsRead {

  override def name(): String = s"$catalogName.$dottedName"
  override def schema(): StructType = rec.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("kind", rec.kind)
    if (rec.pk.nonEmpty) m.put("pk", rec.pk.mkString(","))
    if (rec.kind != "log") m.put("buckets", rec.buckets.toString)
    if (rec.zones.nonEmpty) m.put("zones", rec.zones.mkString(","))
    pinnedVersion.foreach(v => m.put("version", v.toString))
    m
  }

  /** The table's read plan: live snapshot, pinned version, or log scan. */
  def planDf(spark: SparkSession): DataFrame =
    GraftStoreLoader.load(spark, root, dottedName) match {
      case Some(GraftStoreLoader.LoadedCow(_, s)) =>
        pinnedVersion.fold(s.snapshot())(s.snapshotAt)
      case Some(GraftStoreLoader.LoadedMor(_, s)) =>
        pinnedVersion.fold(s.snapshot())(s.snapshotAt)
      case Some(GraftStoreLoader.LoadedLog(_, l)) => l.scan()
      case None => throw new IllegalStateException(
        s"[GRAFT_CATALOG] table $dottedName vanished between load and read")
    }

  /** No-extensions fallback: a [[V1Scan]] executing the snapshot as an
    * RDD scan — correct in any session that can load the catalog, at
    * reduced pushdown. Sessions with [[graft.GraftExtensions]] never
    * reach this: [[GraftTableResolveRule]] replaces the relation with
    * the native parquet plan at analysis time.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = rec.schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new GraftV1Relation(context, GraftTable.this).asInstanceOf[T]
      }
    }
}

private[sources] class GraftV1Relation(ctx: SQLContext, table: GraftTable)
  extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = table.schema()
  override def buildScan(): RDD[Row] = table.planDf(ctx.sparkSession).rdd
}

/** ANALYSIS-time replacement of a [[GraftTable]] catalog relation with
  * the store's own snapshot plan — the rule that makes
  * `SELECT … FROM graft.public.orders` plan as the native bucketed
  * parquet scan (pushed filters, pruned columns, zone rules, broadcast
  * decisions) instead of the V1Scan fallback's RDD boundary. Output
  * attributes keep the relation's ExprIds via an aliasing Project, so
  * every reference above resolves unchanged. Installed by
  * [[graft.GraftExtensions]] (`injectResolutionRule`).
  */
class GraftTableResolveRule(spark: SparkSession)
  extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val t = r.table.asInstanceOf[GraftTable]
      val snap = t.planDf(spark).queryExecution.analyzed
      require(snap.output.length == r.output.length,
        s"[GRAFT_CATALOG] ${t.name()} plan arity ${snap.output.length} != " +
          s"relation arity ${r.output.length}")
      Project(r.output.zip(snap.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
          explicitMetadata = Some(o.metadata))
      }, snap)
  }
}
