package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** `SparkSessionExtensions` entry point: build sessions with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` to get graft's
  * native SQL functions (`graft_dot`, ...) in every new session — the
  * standard deployment path for Catalyst extension libraries. No custom
  * rules or strategies are injected: SURVEY §7.4 concluded every graft
  * operator is expressible through built-in plan shapes, so functions are
  * the only extension surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.expressions.foreach(extensions.injectFunction)
}
