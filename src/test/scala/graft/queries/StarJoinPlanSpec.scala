package graft.queries

import graft.SparkTestBase

/** Plan-shape pins for q73: the star join must broadcast the dimension
  * chain (only the fact⋈orders edge may shuffle at scale) and push the
  * region filter into the parquet scan.
  */
class StarJoinPlanSpec extends SparkTestBase {

  private lazy val plan =
    RelationalQueries.queries("q73_star_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString

  test("dimension chain joins are broadcast") {
    val n = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(n >= 3, s"expected >=3 broadcast joins, got $n in:\n$plan")
  }

  test("region predicate is pushed to the scan") {
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      s"r_name filter not pushed to the parquet reader:\n$plan")
  }
}
