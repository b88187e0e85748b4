package graft.operators

import graft.SparkTestBase
import graft.functions.TextHash
import org.apache.spark.sql.functions._

/** Integer-exact HLL and weighted priority sampling: estimator accuracy on
  * known cardinalities, the register-merge property that makes the sketch a
  * sketch, and the compiled-twin determinism the oracle relies on.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("hllDistinct estimates known cardinalities within HLL error (m=256 → ~6.5% σ)") {
    // three groups with very different true cardinalities, duplicated rows
    val rows =
      (1 to 5000).map(i => ("big", s"v$i")) ++          // 5000 distinct
      (1 to 5000).map(i => ("mid", s"v${i % 400}")) ++  // 400 distinct
      (1 to 5000).map(i => ("small", s"v${i % 23}"))    // 23 distinct
    val est = Sketches.hllDistinct(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(est("big") - 5000) < 5000 * 0.25, s"big: ${est("big")}")
    assert(math.abs(est("mid") - 400) < 400 * 0.25, s"mid: ${est("mid")}")
    assert(math.abs(est("small") - 23) <= 6, s"small: ${est("small")}")
  }

  test("register tables from disjoint halves max-merge to the whole's registers") {
    val all = (1 to 2000).map(i => ("g", s"x$i")).toDF("g", "v")
    val h1 = (1 to 1000).map(i => ("g", s"x$i")).toDF("g", "v")
    val h2 = (1001 to 2000).map(i => ("g", s"x$i")).toDF("g", "v")
    def regs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Sketches.hllRegisters(df, "g", "v").collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = (regs(h1).toSeq ++ regs(h2).toSeq)
      .groupMapReduce(_._1)(_._2)(math.max)
    assert(merged == regs(all),
      "sketches must merge by register max — the incremental-load property")
  }

  test("duplicate values never move the estimate (cardinality, not count)") {
    val once = (1 to 300).map(i => ("g", s"d$i")).toDF("g", "v")
    val tenx = (1 to 300).flatMap(i => Seq.fill(10)(("g", s"d$i"))).toDF("g", "v")
    val e1 = Sketches.hllDistinct(once, "g", "v").collect()(0).getLong(1)
    val e2 = Sketches.hllDistinct(tenx, "g", "v").collect()(0).getLong(1)
    assert(e1 == e2)
  }

  test("linear-counting table agrees with its defining formula at the edges") {
    assert(Sketches.HllLinearCount(256) == 0) // V = m → ln(1) = 0
    assert(Sketches.HllLinearCount(1) == math.round(256 * math.log(256.0)))
    // monotone decreasing in V: more empty registers → fewer distincts
    assert(Sketches.HllLinearCount.drop(1).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("weightedPrioritySample keeps k rows with the min-of-w-hashes priority") {
    val df = (1 to 500).map(i => (i.toLong, i % 17)).toDF("id", "len")
    val got = Sketches.weightedPrioritySample(df, "id", expr("1 + len div 3"), k = 50)
      .collect()
    assert(got.length == 50)
    // recompute each winner's priority with the compiled twin
    got.foreach { r =>
      val id = r.getLong(0)
      val w = math.min(8, math.max(1, 1 + (id % 17).toInt / 3))
      val expected = (1 to w).map(rr => TextHash.md5Hash60(s"wps:$id:$rr")).min
      assert(r.getAs[Long]("priority") == expected, s"id=$id")
      assert(r.getAs[Int]("weight") == w)
    }
  }

  test("bloom filter: no false negatives, bounded false positives, probe matches build") {
    val members = (1 to 300).map(i => s"member-$i")
    val outsiders = (1 to 1000).map(i => s"outsider-$i")
    val bits = Sketches.bloomBits(members.toDF("v"), "v", m = 4096, k = 3)
    val probe = (members ++ outsiders).toDF("v")
      .select(col("v"), Sketches.bloomMightContain(bits, 4096, 3, col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(v => assert(probe(v), s"false negative on $v — forbidden"))
    val fps = outsiders.count(probe(_))
    // fill ≈ 1-(1-1/4096)^900 ≈ 0.197 → FP ≈ 0.197³ ≈ 0.8%; allow slack
    assert(fps < 50, s"$fps false positives of 1000 — far above the m=4096/k=3 rate")
  }

  test("bloom bitmaps from disjoint halves OR-merge to the whole's bitmap") {
    val h1 = (1 to 200).map(i => s"x$i").toDF("v")
    val h2 = (201 to 400).map(i => s"x$i").toDF("v")
    val all = (1 to 400).map(i => s"x$i").toDF("v")
    val merged = Sketches.bloomBits(h1, "v").zip(Sketches.bloomBits(h2, "v"))
      .map { case (a, b) => a | b }
    assert(merged.toSeq == Sketches.bloomBits(all, "v").toSeq,
      "bloom union law — the incremental-build property")
  }

  test("weighted sampling odds scale with weight (heavier rows win more seats)") {
    // 1000 weight-1 rows vs 1000 weight-8 rows: the weight-8 side should
    // take roughly 8/9 of the seats; determinism makes this a fixed number,
    // the assert just bounds it loosely
    val df = ((1 to 1000).map(i => (i.toLong, 1)) ++
      (1001 to 2000).map(i => (i.toLong, 8))).toDF("id", "w")
    val heavy = Sketches.weightedPrioritySample(df, "id", col("w"), k = 200)
      .filter(col("weight") === 8).count()
    assert(heavy > 140 && heavy <= 200, s"heavy won $heavy of 200 seats")
  }

  test("hllIntersectPairs recovers a planted overlap and near-zero for disjoint sets") {
    // A = s1..s1500, B = s1000..s2500 (overlap 500), C = t1..t1000 (disjoint)
    val rows =
      (1 to 1500).map(i => ("A", s"s$i")) ++
      (1000 to 2500).map(i => ("B", s"s$i")) ++
      (1 to 1000).map(i => ("C", s"t$i"))
    val got = Sketches.hllIntersectPairs(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("est_intersect"), r.getAs[Long]("est_union"))).toMap
    val ab = got(("A", "B"))
    assert(math.abs(ab._1 - 500) < 500 * 0.6, s"A∩B estimated ${ab._1}")
    assert(math.abs(ab._2 - 2500) < 2500 * 0.25, s"A∪B estimated ${ab._2}")
    val ac = got(("A", "C"))
    assert(ac._1 < 1500 * 0.2, s"disjoint A∩C estimated ${ac._1}")
    // inclusion–exclusion identity holds exactly on the emitted columns
    Sketches.hllIntersectPairs(rows.toDF("g", "v"), "g", "v").collect().foreach { r =>
      val raw = r.getAs[Long]("est_a") + r.getAs[Long]("est_b") - r.getAs[Long]("est_union")
      assert(r.getAs[Long]("raw_intersect") == raw)
      assert(r.getAs[Long]("est_intersect") == math.max(raw, 0L))
    }
  }

  test("count-min never underestimates and is exact when buckets don't collide") {
    // 40 keys with known counts 1..40 in a wide sketch (collision-free w.h.p.)
    val rows = (1 to 40).flatMap(k => Seq.fill(k)(s"k$k")).toDF("k")
    val counters = Sketches.cmsCounters(rows, "k")
    val probes = (1 to 40).map(k => s"k$k").toDF("k")
    val est = Sketches.cmsEstimate(counters, probes, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 40).foreach { k =>
      assert(est(s"k$k") >= k, s"CM must never underestimate (k$k)")
      assert(est(s"k$k") <= k + 40, s"k$k overestimate beyond εN")
    }
    // an absent key reads only collision mass — bounded by εN = e/512·820
    assert(Sketches.cmsEstimate(counters, Seq("nope").toDF("k"), "k")
      .collect()(0).getLong(1) <= 40)
  }

  test("count-min counters from disjoint halves sum-merge to the whole's counters") {
    val h1 = (1 to 500).map(i => s"a${i % 60}").toDF("k")
    val h2 = (1 to 500).map(i => s"b${i % 60}").toDF("k")
    val all = h1.unionAll(h2)
    def cnts(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      Sketches.cmsCounters(df, "k").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cnts(h1).toSeq ++ cnts(h2).toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(merged == cnts(all),
      "CM sketches must merge by counter sum — the incremental-load property")
  }

  test("count-min row mass: every depth row's counters sum to the stream length") {
    val rows = (1 to 777).map(i => s"v${i % 91}").toDF("k")
    val perRow = Sketches.cmsCounters(rows, "k")
      .groupBy("i").agg(sum("cnt").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.keySet == Set(0, 1, 2, 3))
    assert(perRow.values.forall(_ == 777L))
  }

  test("heavyHitters equals the exact groupBy threshold on a Zipf-ish stream") {
    // key k appears 400/k times: exact answer enumerable in-memory
    val data = (1 to 40).flatMap(k => Seq.fill(400 / k)(s"k$k"))
    val n = data.size
    for (s <- Seq(5, 20, 100)) {
      val want = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * s > n }.toMap
      val got = Sketches.heavyHitters(data.toDF("k"), "k", s)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"s=$s")
    }
  }

  test("heavyHitters is exact under adversarial partitioning (small s, many partitions)") {
    // s=3 counters against 97 distinct noise keys: the MG intermediate is
    // garbage per-partition, but the union-superset + recount must still be
    // exact for any partition layout
    val rnd = new scala.util.Random(7)
    val noise = (1 to 3000).map(_ => s"n${rnd.nextInt(97)}")
    val heavy = Seq.fill(1500)("HOT") ++ Seq.fill(1200)("WARM")
    val data = rnd.shuffle(noise ++ heavy)
    val n = data.size
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 3 > n }.toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Sketches.heavyHitters(
        data.toDF("k").repartition(parts), "k", s = 3)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("heavyHitters drops null keys from candidates and from n") {
    val data = (Seq.fill(30)(Some("x")) ++ Seq.fill(20)(Option.empty[String]))
      .toDF("k")
    // n must be 30 (nulls excluded), so x qualifies at s=2 (30×2 > 30)
    val got = Sketches.heavyHitters(data, "k", s = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 30L))
  }

  test("cmsJoinSize never underestimates and is near-exact without collisions") {
    // 30 distinct keys at width 512: collisions unlikely but POSSIBLE, so
    // pin only the guarantee (est >= exact) plus closeness
    val a = (1 to 300).map(i => s"k${i % 30}").toDF("k") // f=10 each
    val b = (1 to 150).map(i => s"k${i % 15}").toDF("k") // f=10 for k0..14
    val est = BigInt(Sketches.cmsJoinSize(
      Sketches.cmsCounters(a, "k"), Sketches.cmsCounters(b, "k"))
      .collect()(0).getString(0))
    val exact = BigInt(15) * 10 * 10 // 15 shared keys x 10 x 10
    assert(est >= exact, s"CM join-size must overestimate: $est < $exact")
    assert(est <= exact + 4 * 300 * 150 / 512,
      s"est $est beyond the eps*|A|*|B| envelope")
  }

  test("cmsJoinSize: disjoint key sets estimate (near) zero; merge law holds") {
    val a = (1 to 100).map(i => s"x$i").toDF("k")
    val b = (1 to 100).map(i => s"y$i").toDF("k")
    val est = BigInt(Sketches.cmsJoinSize(
      Sketches.cmsCounters(a, "k"), Sketches.cmsCounters(b, "k"))
      .collect()(0).getString(0))
    assert(est <= 4 * 100 * 100 / 512, s"disjoint est too high: $est")
  }

  test("kmv estimates known cardinalities; exact below k; duplicates ignored") {
    val rows =
      (1 to 8000).map(i => ("big", s"v$i")) ++
      (1 to 8000).map(i => ("small", s"v${i % 40}")) // 40 distinct, 200× dup
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(rows.toDF("g", "v"), "g", "v", k = 256), "g", k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // k=256 → σ ≈ 1/√254 ≈ 6.3%; allow 4σ
    assert(math.abs(est("big") - 8000) < 8000 * 0.25, s"big: ${est("big")}")
    assert(est("small") == 40L, s"small must be EXACT below k: ${est("small")}")
  }

  test("kmv sketch is partition-invariant and bounded at k rows per group") {
    val df = (1 to 3000).map(i => ("g", s"v$i")).toDF("g", "v")
    def sketch(parts: Int): Seq[(Long, Int)] =
      Sketches.kmvSketch(df.repartition(parts), "g", "v", k = 64)
        .select("h", "rn").as[(Long, Int)].collect().sortBy(_._2).toSeq
    val s1 = sketch(1)
    assert(s1 == sketch(13) && s1 == sketch(64))
    assert(s1.size == 64 && s1.map(_._2) == (1 to 64))
  }

  test("kmvOverlapPairs: identical groups → jaccard 1e6; disjoint → 0; planted overlap tracks") {
    val a = (1 to 2000).map(i => ("a", s"v$i"))
    val sameAsA = (1 to 2000).map(i => ("b", s"v$i"))
    val disjoint = (1 to 2000).map(i => ("c", s"w$i"))
    val half = (1001 to 3000).map(i => ("d", s"v$i")) // |∩a| = 1000 of 3000 ∪
    val out = Sketches.kmvOverlapPairs(
      (a ++ sameAsA ++ disjoint ++ half).toDF("g", "v"), "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    val (jAb, iAb) = out(("a", "b"))
    assert(jAb == 1000000L && math.abs(iAb - 2000) < 500, s"a~b: $jAb $iAb")
    val (jAc, iAc) = out(("a", "c"))
    assert(jAc == 0L && iAc == 0L, s"a~c: $jAc $iAc")
    val (jAd, iAd) = out(("a", "d"))
    // true J = 1000/3000 = 333333 ppm; ratio estimator σ ≈ √(J(1−J)/k) ≈ 3%
    assert(math.abs(jAd - 333333) < 120000, s"a~d jaccard: $jAd")
    assert(math.abs(iAd - 1000) < 400, s"a~d intersect: $iAd")
  }

  test("heavyHittersPerGroup equals per-group exact thresholds; partitioning-proof") {
    val rnd = new scala.util.Random(7)
    // group A: zipf-ish skew; group B: uniform (no hitters at s=5); group C
    // tiny with one dominant key
    val rows =
      (1 to 4000).map(_ => ("A", s"k${(4000 / (rnd.nextInt(200) + 1)) % 37}")) ++
      (1 to 2000).map(i => ("B", s"u${i % 500}")) ++
      Seq.fill(30)(("C", "dom")) ++ (1 to 10).map(i => ("C", s"r$i"))
    val df = rows.toDF("g", "k")
    def exact(s: Int): Set[(String, String, Long)] = {
      val byG = rows.groupBy(_._1)
      byG.flatMap { case (g, rs) =>
        rs.groupBy(_._2).collect {
          case (k, ks) if ks.size.toLong * s > rs.size => (g, k, ks.size.toLong)
        }
      }.toSet
    }
    Seq(1, 7, 32).foreach { parts =>
      val got = Sketches.heavyHittersPerGroup(df.repartition(parts), "g", "k", s = 5)
        .as[(String, String, Long)].collect().toSet
      assert(got == exact(5), s"parts=$parts")
    }
    // adversarial: sorted input (each partition sees few groups/keys), tiny s
    val sorted = df.orderBy("g", "k").coalesce(3)
    assert(Sketches.heavyHittersPerGroup(sorted, "g", "k", s = 5)
      .as[(String, String, Long)].collect().toSet == exact(5))
  }

  test("heavyHittersPerGroup: null groups and keys drop; thresholds stay per group") {
    val data = (Seq.fill(20)((Some("g1"), Some("x"))) ++
      Seq.fill(5)((Some("g1"), Some("y"))) ++
      Seq.fill(4)((Option.empty[String], Some("x"))) ++
      Seq.fill(4)((Some("g2"), Option.empty[String])) ++
      Seq.fill(3)((Some("g2"), Some("z")))).toDF("g", "k")
    val got = Sketches.heavyHittersPerGroup(data, "g", "k", s = 2)
      .as[(String, String, Long)].collect().toSet
    // g1: n=25, x=20 qualifies (40>25), y=5 doesn't; g2: n=3 (nulls out),
    // z=3 qualifies (6>3)
    assert(got == Set(("g1", "x", 20L), ("g2", "z", 3L)))
  }

  test("kmvOverlapPairs is exact when the combined distinct count is under k") {
    val rows = Seq("x", "y", "z", "w").map(("a", _)) ++
      Seq("y", "z", "q").map(("b", _)) ++
      Seq("x", "x", "y").map(("a", _)) // duplicates must not shift anything
    val r = Sketches.kmvOverlapPairs(rows.toDF("g", "v"), "g", "v", k = 64)
      .collect()(0)
    // union {x,y,z,w,q} = 5, intersect {y,z} = 2 → jaccard 400000 ppm
    assert(r.getLong(2) == 5L && r.getLong(3) == 5L)
    assert(r.getLong(4) == 400000L && r.getLong(5) == 2L, r.toString)
  }
}
