package graft

import graft.queries.{CdcQueries, EventQueries, GraphQueries, PipelineQueries, RelationalQueries, StreamingQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a runnable
  * DataFrame query over a testdata sf directory; `oracleSql` carries the
  * equivalent DuckDB SQL the driver hash-compares against. Query packs live
  * in [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q04_join_large")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CdcQueries.queries ++ PipelineQueries.queries ++
      StreamingQueries.queries ++ EventQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CdcQueries.oracles ++ PipelineQueries.oracles ++
      StreamingQueries.oracles ++ EventQueries.oracles ++ GraphQueries.oracles
}
