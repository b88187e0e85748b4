package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** `SparkSessionExtensions` entry point: build sessions with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` to get graft's
  * native SQL functions (`graft_dot`, ...) plus the materialized-view
  * rollup rewrite ([[graft.plans.MvRewriteRule]]) in every new session —
  * the standard deployment path for Catalyst extension libraries. The MV
  * rule is the one case where an optimizer hook earns its keep (SURVEY
  * §7.4: operators themselves stay on built-in plan shapes): rerouting a
  * registered aggregate to its summary is an optimizer SERVICE spanning
  * all queries, not an operator. The rule is a no-op until
  * [[graft.plans.MaterializedView.build]]/`register` populate the
  * registry; `MaterializedView.install` offers the same rule to sessions
  * built without extensions via `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.expressions.foreach(extensions.injectFunction)
    extensions.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    // data skipping is the same optimizer-service class as the MV
    // reroute: no-op until a log registers (ZonePrune.register)
    extensions.injectOptimizerRule(_ => graft.sources.ZonePruneRule)
    // …and its dynamic (join-key, DPP-style) half: prunes a registered
    // log's directories from the key domain of a small joined dimension
    extensions.injectOptimizerRule(_ => graft.sources.ZoneJoinPruneRule)
    // SQL MERGE INTO over registered stores: Spark's own grammar parses
    // the statement; this hook only reroutes a parsed MergeIntoTable
    // whose target is MergeIntoSql.register'ed — all other SQL (and all
    // other MERGEs) pass through the delegate untouched
    extensions.injectParser((_, delegate) =>
      new graft.operators.GraftSqlParser(delegate))
    // `graft` catalog fast path: replace a GraftTable catalog relation
    // with the store's native snapshot plan at ANALYSIS time, so pushdown
    // and join planning see the real bucketed parquet relation (sessions
    // without extensions fall back to the table's V1Scan — correct,
    // reduced pushdown)
    extensions.injectResolutionRule(session =>
      new graft.sources.GraftTableResolveRule(session))
  }
}
