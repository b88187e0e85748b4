package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native Catalyst expressions, so a
  * `spark.sql(...)` user gets the same codegen'd kernels the DataFrame
  * facade ([[graft.functions.VectorExpressions]]) uses. Lives in this
  * subpackage for the same reason as [[ColumnBridge]]: `sessionState` is
  * `private[sql]`.
  *
  * Two entry points, mirroring how Spark libraries ship functions:
  *  - config-driven: `spark.sql.extensions=graft.GraftExtensions` at session
  *    build time (the deployment path);
  *  - programmatic: `GraftFunctions.register(session)` on a live session.
  */
object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val expressions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot takes exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("graft_md5h60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "graft_md5h60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_md5h60 takes exactly 1 argument, got ${children.length}")
        Md5Hash60(children.head)
      }))

  /** Register every graft function into a live session's registry. */
  def register(session: SparkSession): Unit =
    expressions.foreach { case (ident, info, builder) =>
      session.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
