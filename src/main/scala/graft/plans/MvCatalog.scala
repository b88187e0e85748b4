package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Durable MV catalog: persist every registered [[MaterializedView.MvDef]]
  * and [[StarMv.StarMvDef]] to ONE atomically-renamed file, and re-register
  * them in a fresh session. The in-process registries are session state;
  * without this, a restart silently loses every ad-hoc MV and every query
  * quietly pays the base scan again — the failure mode is a PERFORMANCE
  * cliff, not an error, which is exactly the kind users don't notice.
  * (MVs owned by a [[MvMaintainer]]/[[StarMvMaintainer]] already persist
  * through their own state files and resume via `open()` — this catalog
  * is for standalone definitions.)
  *
  * [[load]] is additive (no clear) and SKIPS definitions whose summary
  * files no longer exist (a crash mid-rebuild leaves the registry's last
  * consistent version elsewhere) — skipped defs are returned so a caller
  * can rebuild them. Snapshot dir-set registrations are deliberately NOT
  * persisted: they pin live store versions, which a restart must
  * re-derive from the stores (the maintainers do exactly that).
  *
  * Format: one URL-encoded k/v line per definition, same codec family as
  * the maintainer state files; unknown keys ignore forward-compatibly.
  */
object MvCatalog {

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
  private def split(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(",", -1).toSeq
  private def qenc(q: StarMv.QCol) = s"${enc(q.path)}|${enc(q.name)}"
  private def qdec(s: String): StarMv.QCol = {
    val Array(p, n) = s.split("\\|", 2); StarMv.QCol(dec(p), dec(n))
  }
  private def pairsEnc(ps: Seq[(String, String)]) =
    ps.map { case (n, v) => s"${enc(n)}=${enc(v)}" }.mkString(",")
  private def pairsDec(s: String): Seq[(String, String)] =
    split(s).map { p => val Array(n, v) = p.split("=", 2); (dec(n), dec(v)) }

  private def kv(line: String): Map[String, String] =
    line.split("\u0001", -1).map { f =>
      val i = f.indexOf('\t'); f.substring(0, i) -> f.substring(i + 1)
    }.toMap

  /** Write the current registries to `path` (atomic rename). */
  def save(spark: SparkSession, path: String): Unit = {
    val lines =
      MaterializedView.registered.map { d =>
        Seq("kind" -> "mv",
          "base" -> enc(d.basePath),
          "groups" -> d.groupCols.map(enc).mkString(","),
          "measures" -> d.measureCols.map(enc).mkString(","),
          "summary" -> enc(d.summaryPath),
          "derivedGroups" -> pairsEnc(d.derivedGroups))
      } ++ StarMv.registered.map { d =>
        Seq("kind" -> "star",
          "tables" -> d.tables.map(enc).mkString(","),
          "joins" -> d.joins.map { case (a, b) => s"${qenc(a)}~${qenc(b)}" }
            .mkString(","),
          "groups" -> d.groupCols.map(qenc).mkString(","),
          "measures" -> d.measureCols.map(qenc).mkString(","),
          "summary" -> enc(d.summaryPath),
          "derivedMeasures" -> pairsEnc(d.derivedMeasures),
          "lossless" -> d.losslessTables.map(enc).mkString(","),
          "derivedGroups" -> pairsEnc(d.derivedGroups))
      }
    val body = lines
      .map(_.map { case (k, v) => s"$k\t$v" }.mkString("\u0001"))
      .mkString("\n").getBytes("UTF-8")
    graft.sources.AtomicFiles.write(
      spark.sparkContext.hadoopConfiguration, new Path(path), body)
  }

  /** Re-register every definition recorded at `path` whose summary still
    * exists AND whose base (mv) / leaf set (star) has no live
    * registration — live wins, so loading next to a maintainer's `open()`
    * never shadows a newer generation with the catalog's stale copy.
    * Returns (loaded, skipped-summary-paths).
    */
  def load(spark: SparkSession, path: String): (Int, Seq[String]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no MV catalog at $path")
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    var loaded = 0
    val skipped = Seq.newBuilder[String]
    body.linesIterator.filter(_.nonEmpty).foreach { line =>
      val m = kv(line)
      val summary = dec(m("summary"))
      val sPath = new Path(summary)
      if (!sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(sPath)) {
        skipped += summary; ()
      } else {
        // LIVE registrations win: a maintainer's open() may already have
        // re-registered a NEWER generation of the same MV — overwriting
        // (mv) or shadowing (star, where insertion order decides) it with
        // the catalog's stale copy would serve superseded summaries whose
        // files the maintainer's gc may delete
        m("kind") match {
          case "mv" =>
            val base = dec(m("base"))
            if (MaterializedView.lookup(
                MaterializedView.normalize(base)).isDefined) {
              skipped += summary; ()
            } else {
              MaterializedView.register(MaterializedView.MvDef(
                basePath = base,
                groupCols = split(m("groups")).map(dec),
                measureCols = split(m("measures")).map(dec),
                summaryPath = summary,
                derivedGroups = pairsDec(m.getOrElse("derivedGroups", ""))))
              loaded += 1
            }
          case "star" =>
            val d = StarMv.StarMvDef(
              tables = split(m("tables")).map(dec),
              joins = split(m("joins")).map { pr =>
                val Array(a, b) = pr.split("~", 2); (qdec(a), qdec(b)) },
              groupCols = split(m("groups")).map(qdec),
              measureCols = split(m("measures")).map(qdec),
              summaryPath = summary,
              derivedMeasures = pairsDec(m.getOrElse("derivedMeasures", "")),
              losslessTables = split(m.getOrElse("lossless", "")).map(dec),
              derivedGroups = pairsDec(m.getOrElse("derivedGroups", "")))
            if (StarMv.registered.exists(_.leafSet == d.leafSet)) {
              skipped += summary; ()
            } else {
              StarMv.register(d)
              loaded += 1
            }
          case other =>
            throw new IllegalArgumentException(s"unknown catalog kind $other")
        }
      }
    }
    (loaded, skipped.result())
  }
}
