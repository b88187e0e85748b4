package graft.queries

import graft.SparkTestBase

/** Plan pin for q94: `lang = 'en'` over a `partitionBy(lang)` layout must be
  * a PARTITION filter (directory-level pruning — other languages' files are
  * never opened), not a row-level parquet filter.
  */
class PartitionPruneSpec extends SparkTestBase {

  test("single-language filter prunes at the directory level") {
    val plan = PipelineQueries
      .queries("q94_partition_pruning")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(plan.contains("= en)"), s"lang=en not a partition filter:\n$plan")
    // lang is a directory key, not a column the parquet reader filters
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang leaked into the row-level pushed filters:\n$plan")
  }
}
