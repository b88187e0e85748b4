package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Spark 4's Column no longer wraps a Catalyst Expression directly; the
  * classic-mode converter (and supporting types like AbstractDataType) live
  * behind `private[sql]`. This subpackage of org.apache.spark.sql — the
  * standard extension-library pattern — hosts graft's native expressions
  * and the Expression↔Column bridge.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a logical plan (classic `Dataset.ofRows`, which is
    * `private[sql]`): how graft's SQL-face commands turn a parsed source
    * plan into the DataFrame the operator machinery consumes. A command
    * plan executes eagerly here — the same contract `spark.sql` applies.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Native codegen'd dot product over two double arrays (SURVEY.md §7.4's
  * escalation ladder: built-in functions → native `Expression` with codegen
  * → UDF, in that order).
  *
  * The `zip_with`/`aggregate` higher-order-function formulation is
  * interpreted — per pair it allocates a products array and walks a lambda
  * evaluator per element. This expression generates a primitive
  * multiply-add loop inside whole-stage codegen; the summation order
  * (index 0 → n-1, multiply then add) is IDENTICAL to the HOF fold it
  * replaces, so results are bit-for-bit unchanged and the DuckDB oracles
  * keep matching — for EQUAL-LENGTH inputs, the only shape this library
  * produces (callers guard dimensions: kmeans raise_errors on ragged
  * vectors, lshBucket on over-wide ones). CONTRACT for ragged inputs: the
  * product truncates to the shorter array (DuckDB's list_dot_product
  * errors, the zip_with HOF yields NULL) — never feed mismatched
  * dimensions expecting cross-engine agreement.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Array elements are assumed non-null (embedding vectors); a null element
  // reads as 0.0.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native 60-bit md5 hash — the determinism workhorse behind every
  * oracle-matched hash column (signatures, band keys, sampling decisions,
  * checksums). Value-identical to the
  * `conv(substring(md5(c), 1, 15), 16, 10) :: long` chain the library used
  * before (the first 15 hex chars ARE the top 60 bits of the first 8
  * digest bytes — pinned by `TextHashSpec`'s differential rows), but
  * evaluated as digest → long directly: the 3-op chain allocates and
  * parses a 32-char hex UTF8String per row, this generates one static
  * call. The kernel lives in [[graft.functions.TextHash.md5Hash60Bytes]]
  * (thread-local digest) so interpreted eval and generated code share one
  * implementation.
  */
case class Md5Hash60(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5h60"

  override protected def nullSafeEval(b: Any): Any =
    graft.functions.TextHash.md5Hash60Bytes(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.md5Hash60Bytes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
