package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, DotProduct}

/** Public facade over graft's native Catalyst vector expressions (which
  * live in org.apache.spark.sql.graft for access to `private[sql]` types).
  */
object VectorExpressions {
  /** Σ aᵢ·bᵢ as a codegen'd primitive loop (left-to-right, deterministic). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
