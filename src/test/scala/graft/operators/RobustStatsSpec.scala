package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RobustStats on enumerable fixtures: exact rank-based winsorize bounds
  * and the segmented equi-depth histogram (segmentation invariance,
  * partition invariance, null drops).
  */
class RobustStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("winsorizedSummary: hand-computed p5/p95 bounds and clamped sum") {
    // 20 values 1..20: kLo = (50*20+999)//1000 = 1 -> v_lo = 1;
    // kHi = (950*20+999)//1000 = 19 -> v_hi = 19; only 20 clamps -> 19.
    val df = (1 to 20).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = RobustStats.winsorizedSummary(df, "g", "v", "id")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(("a", 20L, 1.0, 19.0, 209.0)))
  }

  test("winsorizedSummary: outliers clamp both ways, groups isolated") {
    // group b: 100 values = one -1000, 98 tens, one +1000
    // kLo = (50*100+999)//1000 = 5 -> v_lo = 10 (ranks 2..99 are 10)
    // kHi = (950*100+999)//1000 = 95 -> v_hi = 10
    // all clamp to 10 -> wsum = 1000
    val b = (1 to 100).map { i =>
      val v = if (i == 1) -1000.0 else if (i == 100) 1000.0 else 10.0
      ("b", v, i.toLong)
    }
    val a = Seq(("a", 5.0, 500L))
    val out = RobustStats.winsorizedSummary((a ++ b).toDF("g", "v", "id"), "g", "v", "id")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("b") === (("b", 100L, 10.0, 10.0, 1000.0)))
    assert(out("a") === (("a", 1L, 5.0, 5.0, 5.0))) // n=1: kLo = kHi = 1
  }

  test("winsorizedSummary: null groups and values dropped") {
    val df = Seq(
      (Option("a"), Option(1.0), 1L), (Option("a"), Option(2.0), 2L),
      (Option.empty[String], Option(9.0), 3L), (Option("a"), Option.empty[Double], 4L))
      .toDF("g", "v", "id")
    val out = RobustStats.winsorizedSummary(df, "g", "v", "id")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out.map(_._2) === Seq(2L))
  }

  test("equidepthHistogram: 100 uniform values, 10 exact buckets") {
    val df = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val out = RobustStats.equidepthHistogram(df, "v", "id",
      floor(col("v") / 7).cast("long"), buckets = 10)
      .orderBy("bucket")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(out.size === 10)
    out.zipWithIndex.foreach { case ((bucket, cnt, mn, mx, sum), i) =>
      assert(bucket === i)
      assert(cnt === 10L)
      assert(mn === i * 10 + 1.0)
      assert(mx === i * 10 + 10.0)
      assert(sum === (1 to 10).map(_ + i * 10).sum.toDouble)
    }
  }

  test("equidepthHistogram: segmentation choice doesn't change the result") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map(i => (rnd.nextInt(1000) / 100.0, i.toLong))
    val df = rows.toDF("v", "id")
    val single = RobustStats.equidepthHistogram(df, "v", "id", lit(0L), 7)
      .as[(Int, Long, Double, Double, Double)].collect().toSet
    val segmented = RobustStats.equidepthHistogram(
      df.repartition(9), "v", "id", floor(col("v")).cast("long"), 7)
      .as[(Int, Long, Double, Double, Double)].collect().toSet
    assert(single === segmented)
  }

  test("equidepthHistogram: duplicate values tie-broken deterministically") {
    // all values equal: ranks come from the tie column; buckets still
    // partition 20 rows into 4 buckets of 5
    val df = (1 to 20).map(i => (1.0, i.toLong)).toDF("v", "id")
    val out = RobustStats.equidepthHistogram(df, "v", "id", lit(0L), 4)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) === Seq(5L, 5L, 5L, 5L))
  }

  test("regressionStats + solveLinear recover an exactly linear trend") {
    // y = 3x + 7 for g1; constant x for g2 (degenerate)
    val rows = (0L to 50L).map(x => ("g1", x, 3 * x + 7)) ++
      (1 to 5).map(i => ("g2", 4L, i.toLong))
    val stats = RobustStats.regressionStats(rows.toDF("g", "x", "y"),
      "g", col("x"), col("y")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (n, sx, sy, sxy, sxx) = stats("g1")
    assert(n == 51 && sx == (0L to 50L).sum)
    val Some((slope, intercept)) = RobustStats.solveLinear(n, sx, sy, sxy, sxx)
    assert(slope == 3.0 && intercept == 7.0, s"got ($slope, $intercept)")
    val (n2, sx2, sy2, sxy2, sxx2) = stats("g2")
    assert(RobustStats.solveLinear(n2, sx2, sy2, sxy2, sxx2).isEmpty,
      "zero x-variance must be reported degenerate, not a NaN slope")
  }

  test("regressionStats merge across splits by plain addition") {
    val all = (0L until 100L).map(x => ("g", x, x * x % 97)).toDF("g", "x", "y")
    val h1 = (0L until 50L).map(x => ("g", x, x * x % 97)).toDF("g", "x", "y")
    val h2 = (50L until 100L).map(x => ("g", x, x * x % 97)).toDF("g", "x", "y")
    def s(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      RobustStats.regressionStats(df, "g", col("x"), col("y")).collect()
        .map(r => Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .head
    assert(s(h1).zip(s(h2)).map { case (a, b) => a + b } == s(all),
      "sufficient statistics must merge by addition — the incremental-load property")
  }

  test("chiSquareDrift: hand-computed values, zero case, empty-split guard") {
    // cell x: (30, 10); cell y: (10, 30) -> NA = NB = 40, N = 80.
    // For x: m = 40, dev_a = 80*30 - 40*40 = 800;
    //   chi_a = 800^2 / (80*40*40) = 5.0; symmetric -> chi2 = 10.0 per cell.
    val rows = Seq.fill(30)(("x", 0)) ++ Seq.fill(10)(("x", 1)) ++
      Seq.fill(10)(("y", 0)) ++ Seq.fill(30)(("y", 1))
    val out = RobustStats.chiSquareDrift(rows.toDF("cell", "s"),
        Seq("cell"), col("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out("x") === ((30L, 10L, 10.0)))
    assert(out("y") === ((10L, 30L, 10.0)))

    // identical distribution in both splits -> chi2 exactly 0 per cell
    val same = Seq.fill(8)(("x", 0)) ++ Seq.fill(8)(("x", 1)) ++
      Seq.fill(3)(("y", 0)) ++ Seq.fill(3)(("y", 1))
    val zeros = RobustStats.chiSquareDrift(same.toDF("cell", "s"),
      Seq("cell"), col("s")).collect().map(_.getDouble(3))
    assert(zeros.toSeq === Seq(0.0, 0.0))

    // one split globally empty -> NULL chi2, no division error
    val oneSided = Seq(("x", 0), ("y", 0))
    val nulls = RobustStats.chiSquareDrift(oneSided.toDF("cell", "s"),
      Seq("cell"), col("s")).collect().map(r => r.isNullAt(3))
    assert(nulls.toSeq === Seq(true, true))
  }

  test("exactQuantilesSelect equals full-sort rank selection on random data") {
    val rnd = new scala.util.Random(31)
    val vals = (1 to 5000).map(_ => rnd.nextDouble() * 200 - 100)
    val sorted = vals.sorted
    val n = vals.size.toLong
    for (buckets <- Seq(4, 64, 1024)) {
      val got = RobustStats.exactQuantilesSelect(
        vals.toDF("value"), "value", Seq(1, 250, 500, 900, 999, 1000), buckets)
        .as[(Long, Double)].collect().toMap
      val want = Seq(1, 250, 500, 900, 999, 1000).map { p =>
        p.toLong -> sorted((math.max(1L, (p * n + 999) / 1000) - 1).toInt)
      }.toMap
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("exactQuantilesSelect: duplicates, constant column, nulls, empty") {
    // heavy duplicates: rank falls inside a tie run — value still exact
    val dup = (Seq.fill(70)(5.0) ++ Seq.fill(30)(9.0)).map(Tuple1(_))
    val g1 = RobustStats.exactQuantilesSelect(
      dup.toDF("value"), "value", Seq(500, 800), buckets = 8)
      .as[(Long, Double)].collect().toMap
    assert(g1 == Map(500L -> 5.0, 800L -> 9.0))
    // constant column short-circuits
    val const = Seq.fill(10)(Tuple1(3.25))
    val g2 = RobustStats.exactQuantilesSelect(
      const.toDF("value"), "value", Seq(500)).as[(Long, Double)].collect().toMap
    assert(g2 == Map(500L -> 3.25))
    // nulls excluded from n
    val withNulls = (Seq[Option[Double]](None, None) ++
      (1 to 10).map(i => Some(i.toDouble))).map(Tuple1(_))
    val g3 = RobustStats.exactQuantilesSelect(
      withNulls.toDF("value"), "value", Seq(500), buckets = 4)
      .as[(Long, Double)].collect().toMap
    assert(g3 == Map(500L -> 5.0))
    // empty input → empty output
    assert(RobustStats.exactQuantilesSelect(
      Seq.empty[Tuple1[Double]].toDF("value"), "value", Seq(500)).isEmpty)
  }

  test("exactQuantilesSelect is partition-invariant and guards bad input") {
    val rnd = new scala.util.Random(37)
    val vals = (1 to 999).map(_ => rnd.nextDouble() * 10)
    val a = RobustStats.exactQuantilesSelect(
      vals.toDF("value").repartition(1), "value", Seq(500, 990), 64)
      .as[(Long, Double)].collect().toMap
    val b = RobustStats.exactQuantilesSelect(
      vals.toDF("value").repartition(13), "value", Seq(500, 990), 64)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException](RobustStats.exactQuantilesSelect(
      vals.toDF("value"), "value", Seq(0)))
    intercept[IllegalArgumentException](RobustStats.exactQuantilesSelect(
      vals.toDF("value"), "value", Seq.empty))
  }

  test("madOutliers: hand case — only the planted outlier flags; z-score would drag") {
    // group a: 1..9 (med=5, devs {0..4} -> mad=2) plus outlier 100
    // (n=10, lower-median rank 5): med = 5th of (1..9,100) = 5; devs
    // sorted: 0,1,1,2,2,3,3,4,4,95 -> mad = dev-rank-5 = 2; flag needs
    // dev*1000 > 3000*2 = dev > 6 -> only 100 (dev 95).
    val rows = ((1 to 9).map(v => ("a", v.toDouble, v)) :+ (("a", 100.0, 10)))
      .toDF("g", "v", "id")
    val got = RobustStats.madOutliers(rows, "g", "v", "id")
      .as[(String, Int, Double, Double, Double, Double)].collect().toSet
    assert(got == Set(("a", 10, 100.0, 5.0, 2.0, 95.0)))
  }

  test("madOutliers: constant group flags nothing; mad-zero group flags every deviator") {
    val rows = (Seq.fill(8)(("const", 7.0)) ++
      Seq.fill(9)(("spiky", 1.0)) ++ Seq(("spiky", 1.5), ("spiky", 0.9)))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i) }
      .toDF("g", "v", "id")
    val got = RobustStats.madOutliers(rows, "g", "v", "id")
      .as[(String, Int, Double, Double, Double, Double)].collect()
    // const: dev = 0 everywhere, 0 > 0 false. spiky: med=1, mad=0 ->
    // every row with v != 1 flags (the documented failure mode).
    assert(got.forall(_._1 == "spiky"))
    assert(got.map(_._3).sorted.toSeq == Seq(0.9, 1.5))
  }

  test("madOutliers is partition-invariant and drops nulls") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i =>
      (s"g${i % 3}", if (i % 97 == 0) Option.empty[Double]
       else Some(rnd.nextDouble() * 10 + (if (i % 151 == 0) 500 else 0)), i))
      .toDF("g", "v", "id")
    def run(parts: Int) = RobustStats.madOutliers(rows.repartition(parts),
      "g", "v", "id").as[(String, Int, Double, Double, Double, Double)]
      .collect().toSet
    val r1 = run(1)
    assert(r1 == run(17) && r1.nonEmpty)
    assert(r1.forall(_._3 > 400), "only the planted +500 spikes should flag")
  }
}
