package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: known bit interleaves, range guards, and the pruning
  * payoff — z-cells give tight envelopes in BOTH dimensions where a
  * single-dimension sort leaves the other dimension unbounded.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue: known interleaves") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
    val out = df.select(Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
      .as[Long].collect().toSeq
    // x=3 (011), y=5 (101): bits → x0@0, y0@1, x1@2, y1@3, x2@4, y2@5
    // = 1 + 2(1) + 4(1) + 8(0) + 16(0) + 32(1) = 39
    assert(out === Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("zValue: out-of-range and null inputs fail loudly") {
    val neg = intercept[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"), bits = 4)).collect()
    }
    assert(neg.getMessage.contains("out of [0, 16)"))
    val big = intercept[Exception] {
      Seq((0L, 16L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"), bits = 4)).collect()
    }
    assert(big.getMessage.contains("out of [0, 16)"))
    val nul = intercept[Exception] {
      Seq((Option.empty[Long], Option(1L))).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"), bits = 4)).collect()
    }
    assert(nul.getMessage.contains("out of [0, 16)"))
  }

  test("zorderReport: cells partition rows and envelopes nest the domain") {
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val rep = Layout.zorderReport(rows.toDF("x", "y"), "x", "y",
      bits = 5, cellShift = 4).collect()
    assert(rep.map(_.getAs[Long]("n_rows")).sum === 32L * 32L)
    // cellShift 4 on a 10-bit z: each cell holds 16 z-codes = a 4x4 tile
    rep.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 3)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 3)
    }
  }

  test("z-order beats single-dimension sort for 2-D box pruning") {
    // uniform 64x64 grid; query box: x in [8,15], y in [8,15].
    // z-cells of 64 codes are 8x8 tiles → the box hits exactly 1 of 64
    // cells. The y-sorted layout chunked into 64 equal files keeps y tight
    // but spans ALL x per chunk → every chunk overlapping y [8,15] matches.
    val rows = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
    val df = rows.toDF("x", "y")
    val zRep = Layout.zorderReport(df, "x", "y", bits = 6, cellShift = 6)
    val zHits = zRep.filter(
      col("max_x") >= 8 && col("min_x") <= 15 &&
        col("max_y") >= 8 && col("min_y") <= 15).count()

    val linRep = df
      .withColumn("cell", floor((col("y") * 64 + col("x")) / lit(64L)))
      .groupBy("cell")
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
    val linHits = linRep.filter(
      col("max_x") >= 8 && col("min_x") <= 15 &&
        col("max_y") >= 8 && col("min_y") <= 15).count()

    assert(zHits === 1L)
    assert(linHits === 8L) // all 8 y-rows of the box, each a full-x chunk
    assert(zHits < linHits)
  }

  test("hilbertIndex: first-quadrant order on the 2x2 grid") {
    val df = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val out = Layout.hilbertIndex(df, "x", "y", bits = 1)
      .select("h").as[Long].collect().toSeq
    assert(out === Seq(0L, 1L, 2L, 3L))
  }

  test("hilbertIndex: a true space-filling curve on the 32x32 grid") {
    // THE Hilbert property: d is a bijection onto [0, 1024) and every
    // consecutive pair of indexes is a Manhattan-adjacent cell pair —
    // Morton order fails the adjacency half at every power-of-two seam
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val cells = Layout.hilbertIndex(grid.toDF("x", "y"), "x", "y", bits = 5)
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq === (0L until 1024L))
    cells.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("hilbertIndex: out-of-range input fails loudly, original columns kept") {
    val bad = intercept[Exception] {
      Layout.hilbertIndex(Seq((4L, 0L)).toDF("x", "y"), "x", "y", bits = 2)
        .collect()
    }
    assert(bad.getMessage.contains("out of"))
    val cols = Layout.hilbertIndex(Seq((1L, 2L)).toDF("x", "y"), "x", "y", bits = 2)
      .columns.toSeq
    assert(cols === Seq("x", "y", "h"))
  }
}
