package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  private def topkCol(k: Int) =
    udaf(new TopKAggregator(k), ExpressionEncoder[ScoredId]())

  test("keeps top-k by (score desc, id asc) across partitions") {
    val df = (0L until 1000L).map(i => (i % 4, i, (i % 97).toDouble))
      .toDF("g", "id", "score").repartition(7)
    val got = df.groupBy(col("g")).agg(topkCol(3)(col("id"), col("score")).as("top"))
      .select(col("g"), col("top"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    // Oracle: full sort per group.
    val rows = (0L until 1000L).map(i => (i % 4, i, (i % 97).toDouble))
    for (g <- 0L until 4L) {
      val want = rows.filter(_._1 == g)
        .sortBy { case (_, id, s) => (-s, id) }.take(3).map(r => (r._2, r._3))
      assert(got(g) == want, s"group $g")
    }
  }

  test("groups smaller than k return all rows, ordered") {
    val df = Seq((1L, 10L, 5.0), (1L, 7L, 5.0)).toDF("g", "id", "score")
    val got = df.groupBy(col("g")).agg(topkCol(5)(col("id"), col("score")).as("top"))
      .select(col("top")).as[Seq[(Long, Double)]].head()
    assert(got == Seq((7L, 5.0), (10L, 5.0))) // tie → lower id first
  }

  test("merge is order-insensitive: results stable across partition counts") {
    val rows = (0L until 500L).map(i => (0L, i, ((i * 31) % 13).toDouble))
    val expected = rows.sortBy { case (_, id, s) => (-s, id) }.take(4)
      .map(r => (r._2, r._3))
    for (parts <- Seq(1, 3, 16)) {
      val got = rows.toDF("g", "id", "score").repartition(parts)
        .groupBy(col("g")).agg(topkCol(4)(col("id"), col("score")).as("top"))
        .select(col("top")).as[Seq[(Long, Double)]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("k must be positive") {
    intercept[IllegalArgumentException](new TopKAggregator(0))
  }

  test("NaN scores are dropped, not allowed to evict real entries") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, Double.NaN), (1L, 3L, 7.0),
      (1L, 4L, Double.NaN)).toDF("g", "id", "score").repartition(3)
    val got = df.groupBy(col("g")).agg(topkCol(2)(col("id"), col("score")).as("top"))
      .select(col("top")).as[Seq[(Long, Double)]].head()
    assert(got == Seq((3L, 7.0), (1L, 5.0)))
  }
}
