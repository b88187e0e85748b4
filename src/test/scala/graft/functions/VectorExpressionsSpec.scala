package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DotProduct
import org.apache.spark.sql.types._

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("DotProduct: codegen path computes the left-to-right sum") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5), Array(2.0, 2.0, 99.0)), // min-length semantics
      (Array.empty[Double], Array(1.0)))
      .toDF("a", "b")
    val got = df.select(VectorExpressions.dot(col("a"), col("b")).as("d"))
      .as[Double].collect().toSeq
    assert(got == Seq(32.0, 0.0, 0.0))
  }

  test("DotProduct: float arrays are implicitly cast, null input → null") {
    val f = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    assert(f.select(VectorExpressions.dot(col("a"), col("b"))).as[Double].head() == 11.0)
    val n = Seq((Option.empty[Array[Double]], Array(1.0))).toDF("a", "b")
    assert(n.select(VectorExpressions.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("DotProduct: interpreted eval agrees with codegen") {
    val e = DotProduct(
      Literal.create(Array(1.5, 2.5, -1.0), ArrayType(DoubleType)),
      Literal.create(Array(2.0, 4.0, 8.0), ArrayType(DoubleType)))
    assert(e.eval(null) == (1.5 * 2.0 + 2.5 * 4.0 + -1.0 * 8.0))
  }

  test("DotProduct agrees with the HOF fold it replaced (bit-for-bit)") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 50).map { _ =>
      (Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("a", "b")
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)).as[Double].collect()
    val native = df.select(VectorExpressions.dot(col("a"), col("b"))).as[Double].collect()
    assert(hof.toSeq == native.toSeq) // exact equality, not approx
  }
}
