package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.functions._

/** Workload-driven physical-LAYOUT recommendation — the storage-side
  * sibling of [[MvAdvisor]]: feed it the queries a deployment actually
  * runs over a table and it proposes how that table should be laid out on
  * disk — the partition column, the z-order/sort columns, the bucketing
  * key — ranked by how many rows each choice lets those queries SKIP.
  * At 100 TB layout is the difference between a query that lists three
  * directories and one that scans the lake; the reference delegates this
  * to its warehouse's DBA tooling — here the engine advises.
  *
  * Method:
  *
  *  1. PROFILE the workload's analyzed logical plans (resolved Catalyst
  *     trees, not SQL text — and pre-optimization, so a predicate the
  *     optimizer would fold into a small relation still votes): every
  *     `Filter` conjunct
  *     classifies as an equality hit (`col = lit`, `col IN (…)` — the
  *     shapes partition PRUNING can use) or a range hit (`col < lit`
  *     etc. — the shapes min/max SKIPPING and z-order clustering serve);
  *     every equi-`Join` key over a base column is a bucketing hit. Hits
  *     de-duplicate per (query, column, kind) so one BETWEEN doesn't
  *     double-vote its column.
  *  2. MEASURE per-column NDV + table rows in ONE aggregate pass over the
  *     base (exact `count(distinct)` or `approx_count_distinct`, caller's
  *     choice — approx for a 100 TB advise, exact when the answer must be
  *     reproducible bit-for-bit).
  *  3. SCORE every (column, role) as `hits × (rows − rows div ndv)` —
  *     the expected rows a perfectly-pruned scan skips per query, times
  *     how often the workload benefits. Integer arithmetic only, so any
  *     engine reproduces the ranking exactly.
  *  4. PICK: partition = best-scoring equality column whose NDV lies in
  *     [2, maxPartitions] (a high-NDV partition key explodes the lake
  *     into millions of directories — the classic self-inflicted small-
  *     files wound, refused here by construction); z-order = top two
  *     range columns excluding the partition pick (two dimensions is
  *     where z-curves earn their keep; more dilutes all of them); bucket
  *     = best join column excluding the partition pick, with the bucket
  *     COUNT the smallest power of two giving ~1 M rows per bucket,
  *     clamped to [8, 4096].
  *
  * Scale: profiling walks driver-side plan trees (no data touch); the
  * only data touch is the single stats aggregate, whose output is one
  * row. Nothing here materializes a candidate layout.
  */
object LayoutAdvisor {

  /** Per-column workload hit counts (each query votes at most once per
    * column per kind).
    */
  final case class Profile(
      eqHits: Map[String, Long],
      rangeHits: Map[String, Long],
      joinHits: Map[String, Long])

  final case class Pick(role: String, column: String, hits: Long, ndv: Long,
      score: Long, buckets: Long)

  final case class Recommendation(
      rows: Long,
      partitionBy: Option[Pick],
      zorderBy: Seq[Pick],
      bucketBy: Option[Pick]) {
    def picks: Seq[Pick] = partitionBy.toSeq ++ zorderBy ++ bucketBy.toSeq
  }

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def attrLit(a: Expression, b: Expression): Option[String] =
    (stripCast(a), stripCast(b)) match {
      case (at: Attribute, _: Literal) => Some(at.name)
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Classify one workload member's plan into per-column (eq, range, join)
    * column-name sets restricted to `baseCols`.
    */
  private[plans] def classify(plan: LogicalPlan, baseCols: Set[String])
      : (Set[String], Set[String], Set[String]) = {
    var eq = Set.empty[String]; var rg = Set.empty[String]; var jn = Set.empty[String]
    plan.foreach {
      case Filter(cond, _) =>
        conjuncts(cond).foreach {
          case EqualTo(a, b) =>
            attrLit(a, b).orElse(attrLit(b, a)).filter(baseCols).foreach(eq += _)
          case EqualNullSafe(a, b) =>
            attrLit(a, b).orElse(attrLit(b, a)).filter(baseCols).foreach(eq += _)
          case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
            stripCast(a) match {
              case at: Attribute if baseCols(at.name) => eq += at.name
              case _ => ()
            }
          case GreaterThan(a, b) =>
            attrLit(a, b).orElse(attrLit(b, a)).filter(baseCols).foreach(rg += _)
          case GreaterThanOrEqual(a, b) =>
            attrLit(a, b).orElse(attrLit(b, a)).filter(baseCols).foreach(rg += _)
          case LessThan(a, b) =>
            attrLit(a, b).orElse(attrLit(b, a)).filter(baseCols).foreach(rg += _)
          case LessThanOrEqual(a, b) =>
            attrLit(a, b).orElse(attrLit(b, a)).filter(baseCols).foreach(rg += _)
          case _ => ()
        }
      case j: Join =>
        j.condition.toSeq.flatMap(conjuncts).foreach {
          case EqualTo(a, b) =>
            (stripCast(a), stripCast(b)) match {
              case (x: Attribute, y: Attribute) =>
                Seq(x.name, y.name).filter(baseCols).foreach(jn += _)
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    (eq, rg, jn)
  }

  /** Aggregate the workload into per-column hit counts. */
  def profile(workload: Seq[DataFrame], baseCols: Set[String]): Profile = {
    // the ANALYZED plan, not the optimized one: optimization can evaluate
    // a Filter over a small relation away entirely (ConvertToLocalRelation)
    // — the advisor must see the predicate the USER wrote either way
    val perQuery = workload.map(df => classify(df.queryExecution.analyzed, baseCols))
    def tally(sets: Seq[Set[String]]): Map[String, Long] =
      sets.flatten.groupBy(identity).map { case (c, occ) => c -> occ.size.toLong }
    Profile(tally(perQuery.map(_._1)), tally(perQuery.map(_._2)), tally(perQuery.map(_._3)))
  }

  /** Smallest power of two ≥ (rows / ~1M), clamped to [8, 4096] — the
    * bucket-count rule of thumb (stable as the table grows ×2).
    */
  private[plans] def bucketCount(rows: Long): Long = {
    val cells = (rows + 999999L) / 1000000L
    var b = 8L
    while (b < 4096L && b < cells) b *= 2
    b
  }

  /** Advise a layout for `base` given the workload. With `stats`
    * (a registered ANALYZE record from a [[graft.sources.VersionedTableStore]]),
    * the advise touches NO data — rows and NDVs come from the record, the
    * same stats-first tiering [[MvAdvisor.estimateSummaryRows]] uses.
    * Otherwise one stats aggregate over the base; everything else is
    * driver-side plan analysis either way.
    */
  def advise(
      base: DataFrame,
      workload: Seq[DataFrame],
      maxPartitions: Long = 100000L,
      exactNdv: Boolean = false,
      stats: Option[graft.sources.TableStats] = None): Recommendation = {
    val baseCols = base.schema.fieldNames.toSet
    val p = profile(workload, baseCols)
    val hitCols = (p.eqHits.keySet ++ p.rangeHits.keySet ++ p.joinHits.keySet).toSeq.sorted
    require(hitCols.nonEmpty,
      "layout advise: the workload references no base column in a filter or join")

    val (rows, ndv) = stats match {
      case Some(ts) =>
        val byName = ts.columns.map(cs => cs.name -> cs.ndvEst).toMap
        val missing = hitCols.filterNot(byName.contains)
        require(missing.isEmpty,
          s"layout advise: registered stats carry no NDV for ${missing.mkString(", ")} — " +
            "re-run ANALYZE with these columns or advise without stats")
        (ts.nRows, hitCols.map(c => c -> byName(c)).toMap)
      case None =>
        val ndvAggs = hitCols.map { c =>
          (if (exactNdv) countDistinct(col(c)) else approx_count_distinct(col(c)))
            .cast("long").as(s"ndv_$c")
        }
        val statsRow = base.agg(count(lit(1L)).as("rows"), ndvAggs: _*).head()
        (statsRow.getLong(0),
          hitCols.zipWithIndex.map { case (c, i) => c -> statsRow.getLong(i + 1) }.toMap)
    }

    // rows saved per perfectly-pruned query, times workload frequency —
    // integer div keeps every engine's ranking identical
    def score(hits: Long, n: Long): Long = hits * (rows - rows / math.max(n, 1L))
    def pick(role: String, hits: Map[String, Long], keep: String => Boolean,
        buckets: Long = 0L): Seq[Pick] =
      hits.toSeq
        .filter { case (c, _) => keep(c) }
        .map { case (c, h) => Pick(role, c, h, ndv(c), score(h, ndv(c)), buckets) }
        .sortBy(pk => (-pk.score, pk.column))

    val part = pick("partition", p.eqHits,
      c => ndv(c) >= 2L && ndv(c) <= maxPartitions).headOption
    val partCol = part.map(_.column).toSet
    val zs = pick("zorder", p.rangeHits, c => !partCol(c)).take(2)
      .zipWithIndex.map { case (pk, i) => pk.copy(role = s"zorder${i + 1}") }
    val bkt = pick("bucket", p.joinHits, c => !partCol(c), bucketCount(rows)).headOption
    Recommendation(rows, part, zs, bkt)
  }

  /** EXECUTE a recommendation: rewrite `base` at `outPath` in the advised
    * layout — Hive-style directories on the partition pick, and the
    * cluster (z-order) picks as the file-level sort so every parquet file
    * carries a tight min/max envelope on them:
    *
    *  - with a partition pick: one shuffle hash-grouping rows by the
    *    partition value, each task sorting its run by the cluster columns
    *    before the `partitionBy` write — equality queries prune whole
    *    directories, range queries prune row groups inside them;
    *  - without: a range repartition on the cluster columns, so files are
    *    GLOBALLY disjoint on the leading cluster column (the single-table
    *    zone-map layout).
    *
    * Bucketing is advisory-only here: `bucketBy` requires a catalog table
    * write (`saveAsTable`), not a path write — a deployment applies the
    * bucket pick through its metastore (the q64 bucketed-join pattern).
    *
    * Lossless by construction — same rows, different file arrangement;
    * q238 runs the advised workload against the rewrite and its oracle
    * reads the original.
    */
  def applyTo(base: DataFrame, rec: Recommendation, outPath: String,
      clusterPartitions: Int = 32): Unit = {
    val cluster = rec.zorderBy.map(p => col(p.column))
    rec.partitionBy match {
      case Some(part) =>
        val grouped = base.repartition(col(part.column))
        val sorted =
          if (cluster.nonEmpty) grouped.sortWithinPartitions(cluster: _*) else grouped
        sorted.write.mode("overwrite").partitionBy(part.column).parquet(outPath)
      case None =>
        val arranged =
          if (cluster.nonEmpty)
            base.repartitionByRange(clusterPartitions, cluster: _*)
              .sortWithinPartitions(cluster: _*)
          else base
        arranged.write.mode("overwrite").parquet(outPath)
    }
  }

  /** The recommendation as a DataFrame — one row per pick. */
  def render(spark: SparkSession, rec: Recommendation): DataFrame = {
    import spark.implicits._
    rec.picks.map(p => (p.role, p.column, p.hits, p.ndv, p.score, p.buckets))
      .toDF("role", "column", "hits", "ndv", "score", "buckets")
  }
}
