package graft.operators

import graft.SparkTestBase

/** [[Quantiles.groupedDiscrete]] — the exact lower-quantile contract,
  * hand-computed and then fuzzed against a plain in-memory sort.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference: smallest value at sorted position ⌈q·n⌉ (1-based). */
  private def lowerQ(sorted: Seq[Double], ppm: Long): Double = {
    val n = sorted.size.toLong
    // ceil(n * ppm / 1e6) without floats
    val rank = ((n * ppm) + 999999L) / 1000000L
    sorted((rank - 1).toInt.max(0))
  }

  test("hand case: median/p90 across uneven groups, ties, single-row group") {
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 5.0),  // n=4
      ("b", 7.0),                                       // n=1
      ("c", 3.0), ("c", 3.0), ("c", 3.0), ("c", 9.0), ("c", 9.0) // n=5
    ).toDF("g", "v")
    val out = Quantiles.groupedDiscrete(df, Seq("g"), "v",
      Seq(500000L, 900000L)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // a: n=4 → p50 rank ceil(2)=2 → 1.0; p90 rank ceil(3.6)=4 → 5.0
    assert(out("a") == ((4L, 1.0, 5.0)))
    // b: single row is every quantile
    assert(out("b") == ((1L, 7.0, 7.0)))
    // c: n=5 → p50 rank 3 → 3.0; p90 rank ceil(4.5)=5 → 9.0
    assert(out("c") == ((5L, 3.0, 9.0)))
  }

  test("fuzz: matches the in-memory sorted reference on random discrete data") {
    val rnd = new scala.util.Random(232)
    val qs = Seq(10000L, 250000L, 500000L, 750000L, 990000L, 1000000L)
    for (_ <- 0 until 3) {
      val data = for {
        g <- 'a' to ('a' + rnd.nextInt(4)).toChar
        _ <- 0 until (1 + rnd.nextInt(200))
      } yield (g.toString, (rnd.nextInt(15) + 1).toDouble)
      val out = Quantiles.groupedDiscrete(data.toDF("g", "v"), Seq("g"), "v", qs)
        .collect().map(r => r.getString(0) -> r).toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        val got = out(g)
        assert(got.getLong(1) == sorted.size.toLong)
        qs.zipWithIndex.foreach { case (q, i) =>
          assert(got.getDouble(2 + i) == lowerQ(sorted, q),
            s"group $g q=$q: got ${got.getDouble(2 + i)}, " +
              s"want ${lowerQ(sorted, q)} (n=${sorted.size})")
        }
      }
    }
  }

  test("weighted quantiles == expanding each row weight times") {
    val rnd = new scala.util.Random(77)
    val data = (0 until 120).map(i =>
      ("g" + rnd.nextInt(3), (rnd.nextInt(8) + 1).toDouble, (rnd.nextInt(5) + 1).toLong))
    val df = data.toDF("g", "v", "w")
    val qs = Seq(500000L, 900000L)
    val weighted = Quantiles.groupedDiscrete(df, Seq("g"), "v", qs,
      weightCol = Some("w")).collect().map(r => r.getString(0) -> r).toMap
    // reference: physically replicate each row w times, unweighted
    val expanded = data.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
    val plain = Quantiles.groupedDiscrete(expanded.toDF("g", "v"), Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(weighted.keySet == plain.keySet)
    weighted.keySet.foreach { g =>
      assert(weighted(g).getLong(1) == plain(g).getLong(1), s"$g total weight")
      (0 until qs.size).foreach(i => assert(
        weighted(g).getDouble(2 + i) == plain(g).getDouble(2 + i), s"$g q#$i"))
    }
  }

  test("profile merge of any split == one-shot profile (exact mergeability)") {
    val rnd = new scala.util.Random(34)
    val data = (0 until 300).map(i =>
      ("g" + rnd.nextInt(3), (rnd.nextInt(12) + 1).toDouble))
    val df = data.toDF("g", "v")
    val qs = Seq(250000L, 500000L, 990000L)
    val oneShot = Quantiles.groupedDiscrete(df, Seq("g"), "v", qs)
      .collect().map(_.toSeq).toSet
    // three-way random disjoint split, profiled separately, merged
    val tagged = data.map { case (g, v) => (g, v, rnd.nextInt(3)) }
    val parts = (0 until 3).map(k =>
      Quantiles.valueProfile(
        tagged.filter(_._3 == k).map(t => (t._1, t._2)).toDF("g", "v"),
        Seq("g"), "v"))
    val merged = Quantiles.fromProfile(
      Quantiles.mergeProfiles(parts, Seq("g"), "v"), Seq("g"), "v", qs)
      .collect().map(_.toSeq).toSet
    assert(merged == oneShot)
  }

  test("binnedContinuous: hand case, edge clamping, and split-merge invariance") {
    // 10 values uniform on [0, 100) with bins=10: p50 crosses at bucket 4
    val df = (0 until 10).map(i => ("g", i * 10.0 + 5.0)).toDF("g", "x")
    val out = Quantiles.binnedContinuous(df, Seq("g"), "x", 0.0, 100.0, 10,
        Seq(500000L, 1000000L))
      .select("g", "n_rows", "p50", "p100").as[(String, Long, Double, Double)]
      .head()
    assert(out === (("g", 10L, 40.0, 90.0)))
    // out-of-bounds values clamp into edge bins instead of vanishing
    val ob = Seq(("g", -5.0), ("g", 500.0)).toDF("g", "x")
    val clamped = Quantiles.binnedContinuous(ob, Seq("g"), "x", 0.0, 100.0, 10,
        Seq(500000L, 1000000L))
      .select("n_rows", "p50", "p100").as[(Long, Double, Double)].head()
    assert(clamped === ((2L, 0.0, 90.0)))
    // bin counts are additive: binning two disjoint splits separately and
    // merging (union + regroup) answers exactly like one pass
    val big = (0 until 1000).map(i => ("g", (i * 37 % 997).toDouble)).toDF("g", "x")
    val whole = Quantiles.binnedContinuous(big, Seq("g"), "x", 0.0, 1000.0, 50)
      .collect().toSeq
    val viaUnion = Quantiles.binnedContinuous(
      big.filter(big("x") < 300.0).unionByName(big.filter(big("x") >= 300.0)),
      Seq("g"), "x", 0.0, 1000.0, 50).collect().toSeq
    assert(whole === viaUnion)
  }

  test("binnedContinuous validates bounds and bin count") {
    val df = Seq(("g", 1.0)).toDF("g", "x")
    intercept[IllegalArgumentException] {
      Quantiles.binnedContinuous(df, Seq("g"), "x", 10.0, 10.0, 10)
    }
    intercept[IllegalArgumentException] {
      Quantiles.binnedContinuous(df, Seq("g"), "x", 0.0, 1.0, 1)
    }
  }

  test("column naming and argument validation") {
    assert(Quantiles.colName(500000L) == "p50")
    assert(Quantiles.colName(990000L) == "p99")
    assert(Quantiles.colName(123456L) == "p_123456ppm")
    intercept[IllegalArgumentException] {
      Quantiles.groupedDiscrete(Seq(("a", 1.0)).toDF("g", "v"), Seq(), "v")
    }
    intercept[IllegalArgumentException] {
      Quantiles.groupedDiscrete(Seq(("a", 1.0)).toDF("g", "v"), Seq("g"), "v",
        Seq(0L))
    }
  }
}
