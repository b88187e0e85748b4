package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoundedDistinctAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  private val agg = new BoundedDistinctAggregator(3)

  test("reduce keeps a sorted distinct buffer and stops growing past cap+1") {
    val buf = Seq(5L, 1L, 3L, 3L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(buf == List(1L, 3L, 5L))
    val over = Seq(7L, 2L, 9L).foldLeft(buf)(agg.reduce)
    assert(over.size == 4, "one extra element proves overflow; no more kept")
    assert(agg.reduce(over, 100L).size == 4)
  }

  test("merge dedupes across buffers and caps; finish empties oversized groups") {
    val m = agg.merge(List(1L, 3L, 5L), List(3L, 4L))
    assert(m == List(1L, 3L, 4L, 5L), "merged to cap+1 evidence")
    assert(agg.finish(m) == Nil, "over-cap group reports empty")
    assert(agg.finish(List(1L, 3L, 5L)) == Seq(1L, 3L, 5L))
  }

  test("via udaf: partition invariance and per-group capping") {
    val bounded = udaf(new BoundedDistinctAggregator(3),
      org.apache.spark.sql.Encoders.scalaLong)
    // group 1: 3 distinct (kept); group 2: 4 distinct (dropped); dups everywhere
    val rows = Seq((1L, 10L), (1L, 30L), (1L, 20L), (1L, 10L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L), (2L, 2L))
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("g", "n").repartition(parts)
        .groupBy("g").agg(bounded(col("n")).as("ns"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got(1L) == Seq(10L, 20L, 30L), s"parts=$parts")
      assert(got(2L) == Seq.empty, s"parts=$parts")
    }
  }
}
