package graft.queries

import graft.SparkTestBase
import graft.SparkEntry

/** Plan contracts: the scale properties the per-query scaladocs claim,
  * locked as assertions over the optimized/executed plans at sf0.001 so a
  * refactor that silently un-broadcasts a dimension, drops a pushed
  * filter, or adds an exchange fails HERE rather than in a 100 TB run.
  * String-level checks on `explain` output are deliberate: they assert
  * the same artifact a human plan review reads.
  */
class PlanContractSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  // the star-MV queries register defs the query surface (by design) never
  // unregisters — Verify's session ends, this suite's JVM doesn't. Clear
  // them so later suites' registry-state assertions see only their own.
  override def afterAll(): Unit = {
    try graft.plans.StarMv.clear() finally super.afterAll()
  }

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    // FormattedMode: the simple toString truncates PushedFilters/ReadSchema
    // at the metadata length cap, which would make the assertions below
    // vacuous
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  // formatted explain prints every node once in the tree and once as a
  // "(n) NodeName" detail header — count the headers, which are unique
  private def countNodes(p: String, node: String): Int =
    s"""\\(\\d+\\) $node\\b""".r.findAllIn(p).length

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters: ["), "no pushdown section in the scan")
    assert(p.contains("GreaterThan(l_discount"), "discount predicate not pushed")
    // pruned read schema: the scan must not read all 16 lineitem columns
    assert(!p.contains("l_comment"), "projection pruning lost — scan reads l_comment")
  }

  test("q03: dimension joins broadcast, the fact side never shuffles for them") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), "dimension join must broadcast")
    assert(!p.contains("SortMergeJoin"), "a dimension SMJ shuffles the fact side")
  }

  test("q132: global weighted sample is scan → TakeOrdered, zero exchanges") {
    val p = plan("q132_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), "top-k must plan as TakeOrdered")
    assert(!p.contains("Exchange"), s"zero-exchange contract broken:\n$p")
  }

  test("q134: interval union runs both windows and the aggregate on ONE exchange") {
    val p = plan("q134_interval_union")
    assert(countNodes(p, "Exchange") == 1,
      s"one-shuffle contract broken (${countNodes(p, "Exchange")} exchanges)")
  }

  test("q210: star-MV reroute — join tree GONE, one summary scan, one exchange") {
    val p = plan("q210_star_mv")
    assert(countNodes(p, "BroadcastHashJoin") + countNodes(p, "SortMergeJoin") +
      countNodes(p, "ShuffledHashJoin") == 0,
      s"the six-table join must be gone from the served plan:\n$p")
    assert(p.contains("/summary"), "scan must read the summary")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "group filter must push into the summary's parquet footer")
    assert(countNodes(p, "Exchange") == 1,
      s"one-exchange contract broken (${countNodes(p, "Exchange")})")
  }

  test("q219: star ROLLUP — the Expand rebuilt over the summary, no joins") {
    val p = plan("q219_star_mv_rollup")
    assert(countNodes(p, "Expand") == 1, "the rollup Expand must survive")
    assert(countNodes(p, "BroadcastHashJoin") + countNodes(p, "SortMergeJoin") +
      countNodes(p, "ShuffledHashJoin") == 0, s"join tree must be gone:\n$p")
    assert(p.contains("/summary"), "scan must read the summary")
  }

  test("q220: lossless sub-join — served joinless from the 3-table summary") {
    val p = plan("q220_star_mv_subjoin")
    assert(countNodes(p, "BroadcastHashJoin") + countNodes(p, "SortMergeJoin") +
      countNodes(p, "ShuffledHashJoin") == 0, s"join tree must be gone:\n$p")
    assert(p.contains("/summary"), "scan must read the summary")
  }

  test("q221: day-grain star MV — recovered day bounds push into the summary") {
    val p = plan("q221_star_mv_day")
    assert(p.contains("/summary"), "scan must read the summary")
    assert(p.contains("GreaterThanOrEqual(day,") && p.contains("LessThan(day,"),
      s"recovered day-range bounds must reach the summary footer:\n$p")
    assert(countNodes(p, "BroadcastHashJoin") + countNodes(p, "SortMergeJoin") +
      countNodes(p, "ShuffledHashJoin") == 0, s"join tree must be gone:\n$p")
  }

  test("q142: per-group sample rank plans as WindowGroupLimit") {
    val p = plan("q142_weighted_sample_grouped")
    assert(p.contains("WindowGroupLimit"),
      "rank filter must push the per-group limit below the shuffle")
  }

  test("q131: HLL is exactly two exchanges (registers, then groups)") {
    val p = plan("q131_hll_distinct")
    assert(countNodes(p, "Exchange") == 2,
      s"two-shuffle contract broken:\n$p")
  }

  test("q144: bloom probe is a single scan with no join or exchange") {
    val p = plan("q144_bloom_membership")
    assert(!p.contains("Join"), "the bit test must not plan a join")
    assert(!p.contains("Exchange"), "the probe must ride the scan")
  }

  test("q148: min/max/count answered from parquet statistics, v1 path restored") {
    val p = plan("q148_agg_pushdown")
    assert(p.contains("PushedAggregation: ["),
      s"aggregation not pushed into the parquet scan:\n$p")
    assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_quantity)"),
      "pushed aggregate list lost a member")
    // the conf dance must not leak: a fresh read right after plans v1
    // (bucketed joins and the rest of the inventory depend on the v1 path)
    val fresh = spark.read.parquet(s"$sf/lineitem.parquet")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(fresh.contains("Scan parquet") && !fresh.contains("BatchScan"),
      "useV1SourceList was not restored after the pushdown query")
  }

  test("q146: the CM counter matrix broadcast-joins the probes (no corpus shuffle to probes)") {
    val p = plan("q146_cms_freq")
    assert(p.contains("BroadcastHashJoin"),
      "the constant-size counter table must broadcast")
  }

  test("q147: no full-width vector crosses the coarse exchange") {
    val p = plan("q147_ann_rerank")
    // the stage-1 window input must be the id/score triple, not embeddings:
    // every Exchange hashpartitioning(query_id ...) row set stays narrow
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges >= 1, "expected the coarse top-k exchange")
    assert(p.contains("BroadcastHashJoin"),
      "candidate id list and queries must broadcast-join back to the corpus")
  }

  test("q150: both window sorts and the bar aggregate ride ONE exchange") {
    val p = plan("q150_ohlc_bars")
    assert(countNodes(p, "Exchange") == 1,
      s"one-shuffle OHLC contract broken (${countNodes(p, "Exchange")} exchanges)")
  }

  test("q94: partition pruning reaches the scan") {
    val p = plan("q94_partition_pruning")
    assert(p.contains("PartitionFilters: [") || p.contains("PartitionCount: 1"),
      "partition filter lost")
  }

  test("q153: posting build is ONE group-key exchange over the corpus") {
    val p = plan("q153_inverted_index")
    assert(countNodes(p, "Exchange") == 1,
      s"one-shuffle posting contract broken (${countNodes(p, "Exchange")} exchanges)")
    assert(countNodes(p, "Scan parquet") == 1, "corpus must scan once")
  }

  test("q155: drift runs one corpus scan; totals broadcast back to cells") {
    val p = plan("q155_corpus_drift")
    assert(countNodes(p, "Scan parquet") == 1,
      "split-total aggregate re-scans the corpus — cells cache lost")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the single-row totals must broadcast, not shuffle")
  }

  test("q158: the spine explode joins the daily table without rescanning events") {
    val p = plan("q158_date_spine")
    assert(countNodes(p, "Scan parquet") == 1,
      "bounds aggregate re-scans events — daily cache lost")
  }

  test("q159: tolerance as-of plans ONE window (both carries share the spec)") {
    val p = plan("q159_asof_tolerance")
    assert(countNodes(p, "Window") == 1,
      s"the two carries split into ${countNodes(p, "Window")} Window operators")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "as-of must not plan a join")
  }

  test("q160: every delta join term broadcasts its small side") {
    val p = plan("q160_incremental_join")
    assert(countNodes(p, "BroadcastHashJoin") >= 3,
      s"delta terms must broadcast (${countNodes(p, "BroadcastHashJoin")} broadcast joins)")
  }

  test("q166: lateral top-n decorrelates to a rank window, never a per-row rescan") {
    val p = plan("q166_lateral_topn")
    assert(p.contains("WindowGroupLimit"),
      "the correlated LIMIT must become a group limit below the shuffle")
    assert(p.contains("BroadcastHashJoin"), "the 25-row nation side must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral join decorrelation failed — nested-loop re-execution planned")
    // exactly one exchange moves customer rows (on the correlation key);
    // nation's broadcast is the only other data movement
    assert(countNodes(p, "Exchange") == 1,
      s"one-shuffle contract broken (${countNodes(p, "Exchange")} exchanges)")
  }

  test("q167: observed metrics ride the scan and match a direct aggregate") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q167_observe_metrics")(spark, sf)
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .agg(count(lit(1)), sum(col("n_chars")), max(col("n_chars")))
      .head()
    val m = df.head()
    assert(m.getAs[Long]("n_rows") == direct.getLong(0))
    assert(m.getAs[Long]("sum_chars") == direct.getLong(1))
    assert(m.getAs[Long]("max_chars") == direct.getLong(2))
  }

  test("q192: KMV bottom-k plans as a WindowGroupLimit pair around one rank exchange") {
    val p = plan("q192_kmv_distinct")
    // partial limit before the shuffle, final after — each partition ships
    // at most k rows per group to the rank exchange
    assert(countNodes(p, "WindowGroupLimit") == 2,
      s"pre+post-shuffle group limits expected:\n$p")
    assert(countNodes(p, "Scan parquet") == 1,
      "the corpus must be scanned exactly once")
  }

  test("q195: MAD medians broadcast back; row data shuffles only on the group key") {
    val p = plan("q195_mad_outliers")
    // med and mad tables are groups-sized and must broadcast; the dev
    // branch is evaluated twice (feeding mad AND the final filter), so
    // the med join appears twice — 3 broadcasts total, zero SMJs
    assert(countNodes(p, "BroadcastHashJoin") == 3,
      s"median/mad joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "an SMJ here re-shuffles the event rows for a groups-sized table")
  }

  test("q191: the derived-day rollup never scans the MV base") {
    val df = SparkEntry.queries("q191_mv_derived_day")(spark, sf)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten
    assert(scans.nonEmpty && scans.forall(_.contains("summary")),
      s"rollup must read ONLY the summary, got: $scans")
  }

  test("q196: untouched actors anti-join; only delta actors re-chain through a window") {
    val p = plan("q196_session_incremental")
    assert(p.contains("LeftAnti"), "untouched sessions must pass through an anti join")
    assert(p.contains("LeftSemi"), "touched stored sessions must arrive via a semi join")
  }
}
