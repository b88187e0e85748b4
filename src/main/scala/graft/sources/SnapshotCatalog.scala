package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-level consistent snapshots across CDC-synced tables.
  *
  * Each [[ParquetTableStore]] commits its own per-table manifest, so a query
  * joining two synced tables mid-batch can see table A post-merge and table
  * B pre-merge — a torn cross-table read. The reference never hits this
  * only because Greenplum applies each table's batch in its own DB
  * transaction and its users accept per-table consistency
  * (ChangeLoader.java:211-344 is strictly per-table); this catalog EXCEEDS
  * that: one atomically-committed file records every table's version at a
  * micro-batch boundary, and [[snapshotAll]] resolves all tables from that
  * single record — every reader sees one batch boundary across the whole
  * schema.
  *
  * Protocol per micro-batch (single catalog writer, same contract as the
  * stores):
  *
  *  1. merge every table's batch (each store commits `_vN` per table);
  *  2. [[commit]] — write `"<table>\t<version>"` lines to a temp file and
  *     atomically rename over `_catalog/_current`. The rename is THE
  *     cross-table commit point.
  *
  * A crash after some table merges but before [[commit]] leaves the catalog
  * on the previous record: [[snapshotAll]] still serves the last CONSISTENT
  * boundary (the crashed batch's versions exist but are unreferenced), and
  * the streaming replay re-merges the batch — per-key delete+upsert is
  * idempotent — after which [[commit]] advances every table together.
  *
  * Stores must retain ≥ 2 versions: between a store's merge and the
  * catalog commit, readers resolve the PREVIOUS version, which
  * `retainedVersions = 1` would let the merge's gc delete.
  *
  * Scale: the catalog file is |tables| lines — trivially atomic on any
  * filesystem with atomic rename; reads cost one small-file read plus the
  * per-table manifest resolution [[ParquetTableStore.snapshotAt]] already
  * does. Nothing here touches data files.
  */
final class SnapshotCatalog(
    spark: SparkSession,
    root: String,
    stores: Map[String, VersionedTableStore],
    retainedBoundaries: Int = 1,
    writerId: String = "") {
  require(stores.nonEmpty, "SnapshotCatalog needs at least one store")
  require(retainedBoundaries >= 1,
    s"retainedBoundaries must be >= 1, got $retainedBoundaries")
  require(stores.values.forall(_.versionWindow >= 2),
    "SnapshotCatalog requires every store to retain >= 2 versions: between " +
      "a table's merge and the catalog commit, catalog readers resolve the " +
      "previous version, which retainedVersions = 1 would gc mid-batch")

  private val catDir = new Path(root, "_catalog")
  private val curPath = new Path(catDir, "_current")
  private val writerPath = new Path(catDir, "_writer")
  private def boundaryPath(b: Long) = new Path(catDir, s"_b$b")
  private def hadoopConf = spark.sparkContext.hadoopConfiguration
  private def fs = catDir.getFileSystem(hadoopConf)

  // ── single-writer enforcement ────────────────────────────────────────────
  //
  // The single-writer contract used to be documentation only; a second
  // committer on the same root would silently interleave boundaries. Now
  // the first commit claims a `_writer` token file (atomic rename, then
  // re-read), and every commit re-validates ownership first. A writer
  // restarted under the SAME `writerId` reclaims silently (pass a stable
  // deployment identity); a dead writer's token is fenced out explicitly
  // with [[takeover]]. BEST-EFFORT by construction: neither
  // claim-then-re-read nor validate-then-commit is one atomic step on a
  // generic filesystem, so two claimants (or a takeover racing a commit)
  // interleaving within the same instant can both pass once — the token
  // turns every STEADY-state violation loud (the contract deployments
  // actually break), not the sub-second race, which needs a fencing
  // primitive the filesystem does not offer.

  private val token =
    if (writerId.nonEmpty) writerId
    else java.util.UUID.randomUUID().toString

  private def currentWriter(): Option[String] =
    if (!fs.exists(writerPath)) None else Some(readFile(writerPath).trim)

  private def ensureWriter(): Unit = currentWriter() match {
    case Some(t) if t == token => ()
    case Some(other) => throw new IllegalStateException(
      s"catalog at $root is owned by writer '$other' (this instance is " +
        s"'$token') — the catalog is single-writer; reuse that writerId " +
        "for a restart, or takeover() to fence out a dead writer")
    case None =>
      fs.mkdirs(catDir)
      AtomicFiles.write(hadoopConf, writerPath, token.getBytes("UTF-8"))
      val now = currentWriter()
      require(now.contains(token),
        s"another catalog writer (${now.getOrElse("?")}) claimed $root " +
          "concurrently — exactly one first-committer wins")
  }

  /** Fence out the recorded writer and claim this instance as THE writer
    * (operator action after a writer died without releasing). The fenced
    * instance's next [[commit]] fails loudly.
    */
  def takeover(): Unit = {
    fs.mkdirs(catDir)
    AtomicFiles.write(hadoopConf, writerPath, token.getBytes("UTF-8"))
  }

  /** Record every store's CURRENT version as the new consistent boundary
    * (atomic rename — all tables move together or none do). Call after all
    * of the batch's merges have committed. Returns what was recorded.
    *
    * Boundary history: the record is also kept as `_b<seq>` (same
    * best-effort posture as the stores' `_v<seq>` — `_current` is THE
    * commit point; a crash between the rename and the history write loses
    * the `_b` entry, never the boundary), and entries beyond
    * `retainedBoundaries` are pruned. Cross-table TIME TRAVEL
    * ([[snapshotAllAt]]) and consistent incremental reads
    * ([[changeFeedsBetween]]) only reach as far as BOTH the boundary
    * window and every store's own version retention — size
    * `retainedVersions` to cover the boundary window plus the in-flight
    * batch.
    */
  def commit(): Map[String, Long] = {
    ensureWriter()
    val versions = stores.map { case (t, st) => t -> st.currentVersion }
    val body = versions.toSeq.sorted.map { case (t, v) => s"$t\t$v" }
      .mkString("\n").getBytes("UTF-8")
    fs.mkdirs(catDir)
    val nextB = boundaries().lastOption.getOrElse(0L) + 1
    AtomicFiles.write(hadoopConf, curPath, body)
    // the history entry gets the SAME atomic treatment: at()/
    // snapshotAllAt()/changeFeedsBetween() read these concurrently with
    // commits, and a direct create would let them observe a half-flushed
    // record — a torn 'consistent' snapshot, the exact failure this
    // class exists to prevent
    AtomicFiles.write(hadoopConf, boundaryPath(nextB), body)
    val bs = boundaries()
    bs.dropRight(retainedBoundaries).foreach(b =>
      fs.delete(boundaryPath(b), false))
    versions
  }

  /** Committed boundary ids currently retained, ascending. */
  def boundaries(): Seq[Long] =
    if (!fs.exists(catDir)) Seq.empty
    else fs.listStatus(catDir).map(_.getPath.getName)
      .filter(n => n.startsWith("_b") && n.drop(2).forall(_.isDigit))
      .map(_.drop(2).toLong).toSeq.sorted

  /** The (table → version) record of one retained boundary. */
  def at(boundary: Long): Map[String, Long] = {
    val p = boundaryPath(boundary)
    require(fs.exists(p),
      s"catalog has no retained boundary $boundary " +
        s"(retained: ${boundaries().mkString(",")}) — raise " +
        "retainedBoundaries to keep more history")
    parseRecord(readFile(p))
  }

  /** EVERY table as of one retained boundary — cross-table time travel.
    * Each table's version must additionally still be inside its store's
    * own retention ([[ParquetTableStore.snapshotAt]] fails loudly if
    * not).
    */
  def snapshotAllAt(boundary: Long): Map[String, DataFrame] =
    at(boundary).map { case (t, v) => t -> stores(t).snapshotAt(v) }

  /** Consistent cross-table incremental read: each table's row-valued
    * change feed ([[ParquetTableStore.changeFeedBetween]]) across the
    * SAME two committed boundaries — what a downstream consumer applies
    * to advance a multi-table replica (or a star summary through
    * [[graft.plans.StarMvMaintainer]]) from one batch boundary to
    * another without tearing. Tables whose version did not move between
    * the boundaries are omitted. Scan input per table is bucket-pruned to
    * the dirs that differ between its two versions.
    */
  def changeFeedsBetween(fromBoundary: Long,
      toBoundary: Long): Map[String, DataFrame] = {
    require(fromBoundary < toBoundary,
      s"changeFeedsBetween needs fromBoundary < toBoundary, got " +
        s"$fromBoundary >= $toBoundary")
    val a = at(fromBoundary)
    val b = at(toBoundary)
    require(a.keySet == b.keySet,
      s"boundaries cover different table sets: ${a.keySet} vs ${b.keySet}")
    b.collect { case (t, vTo) if vTo != a(t) =>
      t -> stores(t).changeFeedBetween(a(t), vTo)
    }
  }

  private def readFile(p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def parseRecord(body: String): Map[String, Long] =
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(t, v) = line.split('\t')
      t -> v.toLong
    }.toMap

  /** The last committed (table → version) record; empty before the first
    * [[commit]].
    */
  def current(): Map[String, Long] =
    if (!fs.exists(curPath)) Map.empty else parseRecord(readFile(curPath))

  /** One table at the last committed boundary. */
  def snapshot(table: String): DataFrame = {
    val versions = current()
    require(versions.nonEmpty, "catalog has no committed boundary yet")
    require(versions.contains(table), s"catalog has no table $table " +
      s"(has: ${versions.keys.toSeq.sorted.mkString(",")})")
    stores(table).snapshotAt(versions(table))
  }

  /** EVERY table at the same committed boundary — the consistent
    * cross-table read. All snapshots resolve from one catalog record read
    * once, so no concurrent merge/commit can tear the set.
    */
  def snapshotAll(): Map[String, DataFrame] = {
    val versions = current()
    require(versions.nonEmpty, "catalog has no committed boundary yet")
    versions.map { case (t, v) => t -> stores(t).snapshotAt(v) }
  }
}
