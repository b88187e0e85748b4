package graft.queries

import graft.SparkTestBase

/** Plan-shape pin for q93: writing both join sides `bucketBy` the join key
  * must let the SortMergeJoin read bucket files directly — the join itself
  * consumes ZERO Exchange; the only shuffle left in the plan is the final
  * group-by aggregate. If bucketing regressed (schema drift, a bucketing
  * config off, a missed hint), the extra pre-join exchanges appear here.
  */
class BucketedJoinPlanSpec extends SparkTestBase {

  private lazy val qe =
    RelationalQueries.queries("q93_bucketed_join")(spark, "/root/testdata/sf0.001")
      .queryExecution

  test("join is sort-merge over bucket files, not broadcast/shuffled") {
    val plan = qe.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"merge hint failed — broadcast join planned:\n$plan")
  }

  test("only the final aggregate shuffles; the join reads buckets directly") {
    // executedPlan: EnsureRequirements has inserted exchanges (sparkPlan is
    // the pre-placement plan and would trivially count zero)
    val plan = qe.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 Exchange (final agg), got $exchanges in:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"join inputs are not bucket scans:\n$plan")
  }
}
