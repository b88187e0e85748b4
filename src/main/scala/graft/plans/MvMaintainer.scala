package graft.plans

import graft.plans.MaterializedView.MvDef
import graft.sources.VersionedTableStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Durable, crash-safe maintenance of one materialized view over one
  * CDC-synced [[ParquetTableStore]] — the streaming half of the
  * summary-table story: the store merges micro-batches, [[sync]] applies
  * each merge's row-valued change feed to the summary
  * ([[MaterializedView.refreshFromFeed]]), and a tiny state file records
  * (MV definition, synced store version) so a restarted pipeline resumes
  * maintenance exactly where it stopped.
  *
  * Why a state file: the signed-partial algebra of incremental refresh is
  * NOT idempotent — applying one batch's feed twice double-subtracts its
  * deletes — so "which store version has the summary absorbed" must
  * survive the process. The protocol makes every crash window safe:
  *
  *  1. refresh writes the NEXT summary version dir (`<stem>_v<k+1>`,
  *     `mode=overwrite`) — the state file still points at `_v<k>`;
  *  2. the state file is atomically renamed to (def@`_v<k+1>`,
  *     storeVersion) — THE commit point;
  *  3. summary dirs two generations behind are gc'd.
  *
  * Crash before 2 re-runs the refresh from `_v<k>` on restart and
  * overwrites the orphan `_v<k+1>` with identical content; crash after 2
  * resumes cleanly. The store must retain enough versions to cover the
  * sync gap (`retainedVersions >= 2` for per-batch syncing; more if syncs
  * are less frequent than merges — [[ParquetTableStore.changeFeedBetween]]
  * fails loudly when a version aged out).
  *
  * Scale: per sync, one delta-proportional full-outer join (the feed),
  * delta-sized refresh partials, and at most one pruned repair scan —
  * never a summary or base rebuild. Driver state is the MvDef and two
  * longs.
  *
  * Single maintainer per MV, same writer contract as the store itself.
  */
final class MvMaintainer private (
    spark: SparkSession,
    store: VersionedTableStore,
    statePath: String,
    // @volatile: attachMetrics' freshness probe reads these from the
    // metrics server thread while sync() mutates them under `synchronized`
    @volatile private var d: MvDef,
    @volatile private var synced: Long) {

  /** Surface this summary's synced-vs-current version lag in the state
    * endpoint — see [[StarMvMaintainer.attachMetrics]].
    */
  def attachMetrics(metrics: graft.obs.PipelineMetrics): Unit = {
    val name = d.summaryPath.replaceAll("_v\\d+$", "")
    metrics.registerMvFreshness(name, () =>
      Map(MaterializedView.normalize(d.basePath) ->
        (synced, store.currentVersion)))
  }

  /** The store version the summary currently reflects. */
  def syncedVersion: Long = synced

  /** The current MV definition (summary path advances per sync). */
  def definition: MvDef = d

  /** Absorb every store version committed since the last sync into the
    * summary, commit the state file, gc summary dirs older than
    * `keepSummaries` generations. No-op when already current. Returns the
    * post-sync definition.
    */
  def sync(recomputeKeyCap: Int = 1000, keepSummaries: Int = 2): MvDef =
    syncTo(store.currentVersion, recomputeKeyCap, keepSummaries)

  /** Sync to the version a [[graft.sources.SnapshotCatalog]] last
    * COMMITTED for this table instead of the store's current version —
    * the single-table face of [[StarMvMaintainer.syncToBoundary]]: the
    * summary then always reflects a catalog boundary, so rollups over
    * `catalog.snapshot(table)` reroute while reads of versions past the
    * boundary structurally fall back.
    */
  def syncToBoundary(catalog: graft.sources.SnapshotCatalog,
      recomputeKeyCap: Int = 1000, keepSummaries: Int = 2): MvDef =
    syncTo(catalog.current().getOrElse(store.spec.name,
      throw new IllegalArgumentException(
        s"catalog has no entry for table ${store.spec.name} — commit() " +
          "the catalog at least once")),
      recomputeKeyCap, keepSummaries)

  private def syncTo(v: Long, recomputeKeyCap: Int,
      keepSummaries: Int): MvDef =
    synchronized {
      if (v == synced) return d
      require(v > synced,
        s"store ${store.spec.name} is at version $v but the maintainer " +
          s"already synced $synced — state file $statePath belongs to a " +
          "different store lineage")
      val feed = store.changeFeedBetween(synced, v)
      // the signed algebra is NOT idempotent, so a refresh must start
      // from the summary this maintainer COMMITTED — refuse if some other
      // actor moved the registration (refreshing from an uncommitted
      // summary would re-apply this feed on the already-refreshed state,
      // double-subtracting its deletes)
      val reg = MaterializedView.lookup(MaterializedView.normalize(d.basePath))
      require(reg.contains(d),
        s"registry for ${d.basePath} holds ${reg.map(_.summaryPath)} but " +
          s"the maintainer committed ${d.summaryPath} — state file " +
          s"$statePath is not the owner of this MV")
      val nd = try {
        val nd0 = MaterializedView.refreshFromFeed(spark, d.basePath, feed,
          recomputeKeyCap, base = Some(store.snapshotAt(v)))
        // serving first (in-process consistency: the refresh just
        // registered the new definition, so the dir sets must move with
        // it — queries over the NEW version's set reroute to the
        // refreshed summary, every superseded set is dropped, and a
        // time-travel read of an old version is never served the new
        // summary), then the durable state commit; a crash between the
        // two re-runs this sync idempotently.
        MaterializedView.replaceDirs(nd0.basePath, store.dataDirsAt(v),
            store.stackedDirsAt(v))
        MvMaintainer.writeState(spark, statePath, nd0, v)
        nd0
      } catch {
        // refreshFromFeed registers the refreshed def as it runs; if
        // anything up to and including the state commit fails, restore
        // the COMMITTED registration (and its serving dirs, best-effort)
        // so the documented batch re-run re-applies the same feed against
        // the state the state file actually points at — instead of
        // double-applying it on the uncommitted summary
        case t: Throwable =>
          MaterializedView.register(d)
          scala.util.Try(
            MaterializedView.replaceDirs(d.basePath, store.dataDirsAt(synced),
              store.stackedDirsAt(synced)))
          throw t
      }
      val stale = MvMaintainer.olderSummaries(nd.summaryPath, keepSummaries)
      d = nd
      synced = v
      val fs = new Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      stale.foreach(p => fs.delete(new Path(p), true))
      d
    }
}

object MvMaintainer {

  /** Start maintaining `d` (already built — its summary reflects the
    * store's CURRENT version) and write the initial state file.
    */
  def create(spark: SparkSession, store: VersionedTableStore, d: MvDef,
      statePath: String): MvMaintainer = {
    MaterializedView.register(d)
    val v = store.currentVersion
    writeState(spark, statePath, d, v)
    MaterializedView.replaceDirs(d.basePath, store.dataDirsAt(v),
            store.stackedDirsAt(v))
    new MvMaintainer(spark, store, statePath, d, v)
  }

  /** Resume from a state file after a restart: re-registers the recorded
    * MvDef (the rewrite rule serves queries again immediately) and
    * continues syncing from the recorded store version.
    */
  def open(spark: SparkSession, store: VersionedTableStore,
      statePath: String): MvMaintainer = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no maintainer state at $statePath — create() first")
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = body.linesIterator.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t'); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    def list(s: String) = if (s.isEmpty) Nil else s.split(",", -1).toSeq.map(dec)
    val d = MvDef(
      basePath = dec(kv("base")),
      groupCols = list(kv("group")),
      measureCols = list(kv("measure")),
      summaryPath = dec(kv("summary")),
      derivedGroups = if (kv("derived").isEmpty) Nil
        else kv("derived").split(",", -1).toSeq.map { pair =>
          val Array(n, sql) = pair.split("=", 2); (dec(n), dec(sql))
        })
    MaterializedView.register(d)
    val synced = kv("storeVersion").toLong
    // re-arm snapshot serving when the synced version is still retained;
    // if it aged out, serving stays off and the next sync() fails loudly
    // (the feed needs that version too) — the rebuild signal.
    scala.util.Try(
      MaterializedView.replaceDirs(d.basePath, store.dataDirsAt(synced),
        store.stackedDirsAt(synced)))
    new MvMaintainer(spark, store, statePath, d, synced)
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  private[plans] def writeState(spark: SparkSession, statePath: String,
      d: MvDef, storeVersion: Long): Unit = {
    val body = Seq(
      "base" -> enc(d.basePath),
      "group" -> d.groupCols.map(enc).mkString(","),
      "measure" -> d.measureCols.map(enc).mkString(","),
      "summary" -> enc(d.summaryPath),
      "derived" -> d.derivedGroups
        .map { case (n, sql) => s"${enc(n)}=${enc(sql)}" }.mkString(","),
      "storeVersion" -> storeVersion.toString)
      .map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes("UTF-8")
    graft.sources.AtomicFiles.write(
      spark.sparkContext.hadoopConfiguration, new Path(statePath), body)
  }

  /** Summary dirs of the same stem at least `keep` generations behind
    * `current` (`<stem>_v<k>`; the original build path counts as `_v0`).
    */
  private[plans] def olderSummaries(current: String, keep: Int): Seq[String] = {
    val stemRe = "_v(\\d+)$".r
    val (stem, cur) = stemRe.findFirstMatchIn(current) match {
      case Some(m) => (current.substring(0, m.start), m.group(1).toInt)
      case None => (current, 0)
    }
    (0 until (cur - keep + 1).max(0)).map { k =>
      if (k == 0) stem else s"${stem}_v$k"
    }
  }
}
