package graft.operators

import graft.SparkTestBase

/** Planted-corpus tests for the dedup operators: exact copies must collapse,
  * near-copies must pair, unrelated docs must not, and the bucketCap skew
  * guard must drop boilerplate floods.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  // Distinct long-ish sentences so unrelated docs share no shingles.
  private def doc(i: Int): String =
    s"document number $i talks about topic$i and subject$i with extra words " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"

  test("exactGroups collapses exact copies to one keeper") {
    val df = ((1 to 20).map(i => (i.toLong, doc(i))) :+ (100L, doc(7)))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length === 20)
    val dup = groups.find(_.getAs[Long]("copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 7L)
  }

  test("minhashPairs finds planted near-dups and only those") {
    val base = (1 to 30).map(i => (i.toLong, doc(i)))
    // near-copy of doc 5: one word changed out of ~20
    val near = (105L, doc(5).replace("alpha5", "ALTERED"))
    val pairs = Dedup.minhashPairs((base :+ near).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("id_a", "id_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((5L, 105L)))
    val (_, _, inter, uni) = pairs.head
    assert(inter > 0 && uni >= inter && inter * 5 >= uni * 3)
  }

  test("minhashPairs: identical docs have jaccard exactly 1") {
    val df = Seq((1L, doc(1)), (2L, doc(1))).toDF("doc_id", "text")
    val Array((inter, uni)) = Dedup.minhashPairs(df, "doc_id", "text")
      .select("inter", "uni").as[(Long, Long)].collect()
    assert(inter === uni)
  }

  test("minhashPairs bucketCap drops flooded buckets") {
    val flood = (1 to 10).map(i => (i.toLong, doc(0))).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(flood, "doc_id", "text", bucketCap = 5).count() === 0)
    assert(Dedup.minhashPairs(flood, "doc_id", "text", bucketCap = 10).count() === 45)
  }

  test("ngramJaccardPairs finds planted near-dups exactly, df-cap drops floods") {
    val base = (1 to 30).map(i => (i.toLong, doc(i)))
    val near = (105L, doc(5).replace("alpha5", "ALTERED"))
    val pairs = Dedup.ngramJaccardPairs((base :+ near).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("id_a", "id_b", "inter", "uni").as[(Long, Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((5L, 105L)))
    // exact: must agree with minhash's verification on the same pair
    val mh = Dedup.minhashPairs((base :+ near).toDF("doc_id", "text"), "doc_id", "text")
      .select("id_a", "id_b", "inter", "uni").as[(Long, Long, Long, Long)].collect()
    assert(pairs.toSet === mh.toSet)
    // a df-cap of 1 drops every shared shingle → no candidates at all
    val capped = Dedup.ngramJaccardPairs((base :+ near).toDF("doc_id", "text"),
      "doc_id", "text", maxShingleDf = 1)
    assert(capped.count() === 0)
  }

  test("containmentPairs catches a sub-document that Jaccard misses") {
    val base = (1 to 20).map(i => (i.toLong, doc(i)))
    // doc 205: doc 5 embedded inside ~3x unrelated padding — containment
    // 5→205 is ~1 while Jaccard drowns in the big side's union
    val host = (205L, doc(5) + " " + doc(305).replace("alpha305", "pad1") +
      " " + doc(306).replace("alpha306", "pad2") + " " + doc(307))
    val all = (base :+ host).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(all, "doc_id", "text")
      .select("id_a", "id_b", "cont_ab_ppm", "cont_ba_ppm")
      .as[(Long, Long, Long, Long)].collect()
    val hit = cont.find(p => p._1 == 5L && p._2 == 205L)
    assert(hit.nonEmpty, s"sub-document pair missing from ${cont.toSeq}")
    assert(hit.get._3 >= 800000L, "containment 5->205 must be near 1")
    // Jaccard at the same 4/5 threshold does NOT pair them
    val jac = Dedup.ngramJaccardPairs(all, "doc_id", "text",
      thresholdNum = 4, thresholdDen = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((5L, 205L)))
  }

  test("simhashPairs finds planted near-dups within the Hamming budget") {
    val base = (1 to 30).map(i => (i.toLong, doc(i)))
    val near = (105L, doc(5).replace("alpha5", "ALTERED"))
    val pairs = Dedup.simhashPairs((base :+ near).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 5L && p._2 == 105L && p._3 <= 3))
    // identical docs sit at Hamming 0
    val same = Dedup.simhashPairs(
      Seq((1L, doc(1)), (2L, doc(1))).toDF("doc_id", "text"), "doc_id", "text")
      .select("hamming").as[Int].collect()
    assert(same.toSeq === Seq(0))
  }

  test("token-less documents are dropped, not paired") {
    val df = Seq((1L, "!!!"), (2L, "???"), (3L, doc(3))).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(df, "doc_id", "text").count() === 0)
    assert(Dedup.simhashPairs(df, "doc_id", "text").count() === 0)
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark, and only those") {
    val bench = Seq((100L, doc(1)), (101L, doc(2))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, doc(3)),                                  // clean
      (2L, "intro words here " + doc(1)),            // embeds benchmark doc 100
      (3L, doc(2).split(" ").take(10).mkString(" ")), // 10-token prefix of doc 101
      (4L, "one two three four five six seven")       // 7 tokens: no full 8-gram
    ).toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(flagged.keySet == Set(2L, 3L),
      "exactly the embedded-excerpt docs must flag; short and clean docs must not")
    // doc 3 has 10 tokens → 3 sliding 8-grams, all inside doc(2)'s prefix
    assert(flagged(3L) == 3L)
    assert(flagged(2L) > 0L)
  }

  test("decontaminate and incremental dedup plan equi-joins only") {
    val corpus = (1 to 5).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val bench = Seq((9L, doc(1))).toDF("doc_id", "text")
    val p1 = Dedup.decontaminate(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val p2 = Dedup.minhashPairsAgainstIndex(
        Dedup.minhashSignatures(bench, "doc_id", "text"),
        Dedup.minhashSignatures(corpus, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    Seq("decontaminate" -> p1, "minhashPairsAgainstIndex" -> p2).foreach { case (n, p) =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must join on the shingle/band hash, never all-pairs")
    }
  }

  test("minhashPairsAgainstIndex finds a new near-copy against the index, cross-set only") {
    val index = Dedup.minhashSignatures(
      (1 to 10).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"), "doc_id", "text")
    // new batch: a near-copy of doc 4 and a fresh unrelated doc — PLUS an
    // internal duplicate pair (both ≈ doc 4) that must NOT be emitted
    // (new-vs-new is minhashPairs' job on the batch itself)
    val newBatch = Seq(
      (201L, doc(4).replace("alpha4", "ALTERED")),
      (202L, doc(4).replace("beta4", "CHANGED")),
      (203L, doc(99))).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsAgainstIndex(
        Dedup.minhashSignatures(newBatch, "doc_id", "text"), index)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains(201L -> 4L) && pairs.contains(202L -> 4L),
      "both near-copies must pair with their indexed source")
    assert(pairs.forall { case (a, b) => a >= 200L && b <= 10L },
      s"only cross-set (new, indexed) pairs may be emitted; got $pairs")
    assert(!pairs.exists(p => p._1 == 203L),
      "the unrelated new doc must not pair with anything")
  }

  test("decontaminate matches a brute-force 8-gram intersection on random corpora") {
    // Seeded-random differential: the distributed shingle-join must produce
    // exactly the per-doc count of distinct 8-grams shared with the
    // benchmark, as computed by a plain in-memory set intersection.
    val rnd = new scala.util.Random(99)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def randDoc() = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def grams(t: String): Set[Seq[String]] = {
      val toks = t.split(" ").filter(_.nonEmpty).toSeq
      if (toks.length < 8) Set.empty else toks.sliding(8).map(_.toSeq).toSet
    }
    (1 to 3).foreach { round =>
      val bench = (1 to 5).map(i => (100L + i, randDoc()))
      val corpus = (1 to 40).map(i => (i.toLong, randDoc()))
      val benchSet = bench.flatMap(b => grams(b._2)).toSet
      val expected = corpus
        .map { case (id, t) => id -> grams(t).count(benchSet.contains).toLong }
        .filter(_._2 > 0).toMap
      val got = Dedup.decontaminate(
          corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"round $round diverged from the in-memory model")
    }
  }

  test("CacheScope.release frees the signature caches deterministically") {
    val docs = (1 to 10).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new CacheScope
    Dedup.minhashPairs(docs, "doc_id", "text", scope = scope).count()
    val acquired = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(acquired.nonEmpty, "the signature pass must be cached while the plan runs")
    scope.release()
    val leftover = spark.sparkContext.getPersistentRDDs.keySet.intersect(acquired)
    assert(leftover.isEmpty,
      s"release() must drop every scope-owned MEMORY_AND_DISK block now, not " +
        s"when the ContextCleaner eventually notices; still cached: $leftover")
  }

  test("winnowFingerprints: token-less docs get EMPTY fps, never pair with each other") {
    // two pure-punctuation docs and a NULL-text doc share zero tokens; the
    // degenerate hash-of-"" fingerprint would pair all three as near-dups
    val df = Seq(
      (1L, doc(1)), (2L, doc(1)), // genuine near-dup pair
      (10L, "!!! ??? ..."), (11L, "§§§ ***"), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text")
    val byId = fps.as[(Long, Seq[Long])].collect().toMap
    assert(byId.keySet === Set(1L, 2L, 10L, 11L, 12L), "one row per doc survives")
    assert(byId(10L).isEmpty && byId(11L).isEmpty && byId(12L).isEmpty)
    val pairs = Dedup.winnowPairs(fps)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"token-less docs must not pair: $pairs")
  }

  test("connectedComponents labels each component with its minimum id") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on a long chain (multi-round propagation)") {
    // a 12-node path: the min label needs ~11 rounds to reach the far end
    val pairs = (1 until 12).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(labels.length === 12)
    assert(labels.forall(_._2 == 1L))
  }

  test("connectedComponents converges on a 200-node chain in O(log diameter) rounds") {
    // The templated-document pathology: a chain of 200 near-dup docs whose
    // diameter (199) far exceeds the 50-round cap. Plain label propagation
    // needs one round per hop and ABORTS at the cap after paying for all 50
    // rounds; the pointer-jumping implementation must converge in ~log2(200)
    // rounds — pin that by capping at 10.
    val pairs = (1 until 200).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, maxIterations = 10)
      .as[(Long, Long)].collect()
    assert(labels.length === 200)
    assert(labels.forall(_._2 == 1L))
  }

  test("connectedComponents converges on a 2000-node chain (diameter 40x the old cap)") {
    val pairs = (1 until 2000).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, maxIterations = 14)
      .as[(Long, Long)].collect()
    assert(labels.length === 2000)
    assert(labels.forall(_._2 == 1L))
  }

  test("connectedComponents matches an in-memory union-find on random graphs") {
    // The pointer-jumping rewrite changed the iteration structure; guard it
    // against dense random graphs (cycles, multi-edges, overlapping
    // components), not just chains and cliques.
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      val n = 60
      val edges = (1 to 80)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.groupBy(id => find(id.toInt)).values
        .flatMap { grp => val m = grp.min; grp.map(_ -> m) }.toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"round $round diverged from union-find")
    }
  }

  test("connectedComponents turns pairwise minhash output into transitive groups") {
    // a ≈ b and b ≈ c by one-word edits in DIFFERENT positions: a and c
    // differ in two words and may or may not pair directly — the component
    // must contain all three either way.
    val base = (1 to 10).map(i => (i.toLong, doc(i)))
    val b = (101L, doc(5).replace("alpha5", "ALTERED"))
    val c = (102L, doc(5).replace("alpha5", "ALTERED").replace("zeta5", "CHANGED"))
    val pairs = Dedup.minhashPairs((base ++ Seq(b, c)).toDF("doc_id", "text"),
      "doc_id", "text")
    val clusters = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(5L) === 5L && clusters(101L) === 5L && clusters(102L) === 5L)
  }

  test("dedupBlocks keeps first occurrences and reassembles in order") {
    val df = Seq(
      (1L, "a b c d e f"),    // blocks (B=2): "a b" "c d" "e f"
      (2L, "a b x y"),        // "a b" duplicates doc 1's first block
      (3L, "c d e f"),        // both blocks duplicate doc 1's
      (4L, "p q a b r s")     // middle block duplicates; ends survive
    ).toDF("doc_id", "text")
    val out = Dedup.dedupBlocks(df, "doc_id", "text", blockWords = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 3L, "a b c d e f")))
    assert(out(2L) === ((2L, 2L, 1L, "x y")))
    assert(out(3L) === ((3L, 2L, 0L, "")))
    assert(out(4L) === ((4L, 3L, 2L, "p q r s")))
  }

  test("dedupBlocks: within-doc repeats collapse; ragged tail is a block") {
    val df = Seq((7L, "a b a b z")).toDF("doc_id", "text")
    val out = Dedup.dedupBlocks(df, "doc_id", "text", blockWords = 2)
      .as[(Long, Long, Long, String)].collect()
    // blocks: "a b" (kept), "a b" (within-doc dup, dropped), tail "z" (kept)
    assert(out === Array((7L, 3L, 2L, "a b z")))
  }

  test("dedupBlocks: token-less docs report zero blocks") {
    val df = Seq((1L, "hello world"), (2L, "!!! ...")).toDF("doc_id", "text")
    val out = Dedup.dedupBlocks(df, "doc_id", "text", blockWords = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) === ((2L, 0L, 0L, "")))
    assert(out(1L) === ((1L, 1L, 1L, "hello world")))
  }

  test("winnowFingerprints: a shared token run of >= w+k-1 tokens shares a fingerprint") {
    // k=3, w=4 → the winnowing guarantee covers any shared run of 6 tokens
    val shared = "omega kappa sigma lambda theta iota"
    val df = Seq(
      (1L, s"one two three $shared four five"),
      (2L, s"alpha beta $shared gamma delta"),
      (3L, "totally different words everywhere here now")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text")
      .as[(Long, Array[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty, "guaranteed shared fp missing")
    assert((fps(1L) intersect fps(3L)).isEmpty, "unrelated docs should not collide")
    // fingerprints are sparse: never more picks than k-grams
    assert(fps(1L).size <= 11)
    // short doc: one gram, one fingerprint; deterministic across runs
    val tiny = Dedup.winnowFingerprints(
      Seq((9L, "hello")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Array[Long])].collect()
    assert(tiny.head._2.length === 1)
  }

  test("winnowPairs finds the planted near-dup and drops boilerplate fingerprints") {
    val base = (1 to 20).map(i => (i.toLong, doc(i)))
    val near = (105L, doc(5).replace("alpha5", "ALTERED"))
    val fps = Dedup.winnowFingerprints((base :+ near).toDF("doc_id", "text"),
      "doc_id", "text")
    // winnowing is a high-RECALL candidate generator: one shared 3-gram
    // (the template's "with extra words") can pair unrelated docs with
    // shared_fps = 1 — consumers threshold on the evidence count. The
    // planted copy shares long runs, so it dominates.
    val pairs = Dedup.winnowPairs(fps)
      .as[(Long, Long, Long)].collect()
    val strong = pairs.filter(_._3 >= 2).map(p => (p._1, p._2)).toSet
    assert(strong === Set((5L, 105L)), s"thresholded pairs: $strong")
    val best = pairs.maxBy(_._3)
    assert((best._1, best._2) === ((5L, 105L)), s"strongest pair: $best")

    // a footer shared by every doc must not pair the corpus quadratically:
    // the df cap prunes shared fingerprints (cap 1 = drop anything shared
    // at all → zero pairs; a loose cap keeps the quadratic blow-up)
    val footer = "common footer words repeated across the entire corpus here"
    val boiler = (1 to 12).map(i => (i.toLong, doc(i) + " " + footer))
    val boilerFps = Dedup.winnowFingerprints(boiler.toDF("doc_id", "text"),
      "doc_id", "text")
    assert(Dedup.winnowPairs(boilerFps, maxFpDf = 1).count() === 0L)
    val capped = Dedup.winnowPairs(boilerFps, maxFpDf = 6).count()
    val loose = Dedup.winnowPairs(boilerFps).count()
    assert(capped < loose, s"cap did not prune: capped=$capped loose=$loose")
  }

  test("dedupLines removes duplicate lines corpus-wide and rejoins with the separator") {
    val df = Seq(
      (1L, "alpha beta\ncommon footer\ngamma"),
      (2L, "delta\ncommon footer"),          // footer seen in doc 1 → dropped
      (3L, "common footer"),                 // only line is a dup → emptied
      (4L, "epsilon\n\nepsilon")             // empty line skipped; self-dup dropped
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 3L, "alpha beta\ncommon footer\ngamma")))
    assert(out(2L) === ((2L, 2L, 1L, "delta")))
    assert(out(3L) === ((3L, 1L, 0L, "")))
    assert(out(4L) === ((4L, 2L, 1L, "epsilon")))
  }

  test("dedupBlocks differential: matches a single-threaded reference on random corpora") {
    val rnd = new scala.util.Random(4242)
    val pool = Array("sun", "moon", "tide", "ash", "fern", "mill", "kiln", "vane")
    for (_ <- 1 to 3) {
      val B = 1 + rnd.nextInt(3)
      val corpus = (1 to 30).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(10))(pool(rnd.nextInt(pool.length))).mkString(" "))
      }
      // single-threaded reference: first occurrence in (id, pos) order wins
      val seen = scala.collection.mutable.Set.empty[String]
      val want = corpus.map { case (id, text) =>
        val blocks = text.split(" ").filter(_.nonEmpty).grouped(B).map(_.mkString(" ")).toSeq
        val kept = blocks.filter(b => seen.add(b))
        (id, blocks.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      val got = Dedup.dedupBlocks(corpus.toDF("doc_id", "text"), "doc_id", "text", B)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got === want, s"blockWords=$B")
      // global invariant: every distinct block survives exactly once
      val survivors = got.toSeq.flatMap(_._4.split(" ").filter(_.nonEmpty).grouped(B).map(_.mkString(" ")))
      assert(survivors.distinct.size === survivors.size)
    }
  }

  test("dedupBlocks is partition-count invariant") {
    // 40 docs built from a tiny 6-word pool at blockWords=2 → plenty of
    // cross-doc duplicate blocks; the winner/reassembly result must not
    // depend on how the input is split across tasks.
    val words = Array("red", "blue", "green", "ash", "oak", "elm")
    val docs = (1 to 40).map { i =>
      (i.toLong, (0 until 8).map(j => words((i * 7 + j * 3) % 6)).mkString(" "))
    }
    def run(parts: Int): Set[(Long, Long, Long, String)] =
      Dedup.dedupBlocks(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", blockWords = 2)
        .as[(Long, Long, Long, String)].collect().toSet
    val one = run(1)
    assert(run(7) === one)
    assert(run(32) === one)
    // sanity: duplication actually occurred (pool is tiny, blocks repeat)
    assert(one.exists(_._3 < 4), "expected at least one doc to lose blocks")
  }

  test("ngramNovelty: hand-computed unique fractions; short docs skipped") {
    // n=2 bigram sets: doc1 {a b, b c}, doc2 {b c, c d}, doc3 {x} (1 token,
    // skipped). "b c" has df 2; everything else df 1.
    val df = Seq((1L, "a b c"), (2L, "b c d"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(df, "doc_id", "text", n = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L))))
  }

  test("ngramNovelty counts DISTINCT n-grams (within-doc repeats once)") {
    // "a b a b" at n=2 → windows [a b][b a][a b]; distinct set {a b, b a}.
    // Both are corpus-unique.
    val got = Dedup.ngramNovelty(Seq((1L, "a b a b")).toDF("doc_id", "text"),
        "doc_id", "text", n = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 2L)))
  }

  test("duplicateSpanCoverage: within-doc repeat covers the exact union") {
    // n=2 over "a b c a b": windows [a b][b c][c a][a b]; "a b" occurs
    // twice → windows 0 and 3 are hot; coverage = {0,1} ∪ {3,4} = 4 of 5.
    val got = Dedup.duplicateSpanCoverage(
        Seq((1L, "a b c a b")).toDF("doc_id", "text"), "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 5L, 2L, 4L)))
  }

  test("duplicateSpanCoverage: overlapping hot windows merge, short docs report zero") {
    // docs 1/2 are exact copies → every window hot, coverage = whole doc;
    // doc 3 shares nothing; doc 4 is below the window length.
    val df = Seq((1L, "p q r"), (2L, "p q r"), (3L, "u v w"), (4L, "s"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpanCoverage(df, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      1L -> ((3L, 2L, 3L)), 2L -> ((3L, 2L, 3L)),
      3L -> ((3L, 0L, 0L)), 4L -> ((1L, 0L, 0L))))
  }

  test("duplicateSpanCoverage is partition-count invariant") {
    val words = Array("red", "blue", "green", "ash", "oak", "elm")
    val docs = (1 to 40).map { i =>
      (i.toLong, (0 until 10).map(j => words((i * 5 + j * 3) % 6)).mkString(" "))
    }
    def run(parts: Int): Set[(Long, Long, Long, Long)] =
      Dedup.duplicateSpanCoverage(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", n = 3)
        .as[(Long, Long, Long, Long)].collect().toSet
    val one = run(1)
    assert(run(7) === one)
    assert(run(32) === one)
    assert(one.exists(_._4 > 0), "expected duplicated spans in the tiny pool")
  }

  test("sourceOverlap: hand-computed matrix; per-source sets deduped; null sources dropped") {
    // n=2 per-source distinct bigram sets: s1 {a b, b c} (two docs, "a b"
    // appears in both — counted once), s2 {b c, c d}, s3 {x y}; a null
    // source carrying overlap text must not appear.
    val df = Seq(
      ("s1", "a b c"), ("s1", "a b"), ("s2", "b c d"), ("s3", "x y"),
      (null.asInstanceOf[String], "a b c"))
      .toDF("source", "text")
    val got = Dedup.sourceOverlap(df, "source", "text", n = 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(("s1", "s2", 1L, 2L, 2L)))
  }

  test("prefixJaccardPairs: finds planted near-dups; superset of the capped join") {
    // 30 base docs of distinct token streams + 5 planted 80%-prefix copies
    val base = (0 until 30).map { i =>
      (i.toLong, (0 until 40).map(j => s"w${i}_$j").mkString(" "))
    }
    val copies = (0 until 5).map { i =>
      val toks = (0 until 40).map(j => s"w${i}_$j").take(32) ++
        (0 until 8).map(j => s"c${i}_$j")
      (100L + i, toks.mkString(" "))
    }
    val df = (base ++ copies).toDF("doc_id", "text")
    val exact = Dedup.prefixJaccardPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert((0 until 5).forall(i => exact.exists(p => p._1 == i && p._2 == 100L + i)),
      s"planted pairs missing from $exact")
    assert(capped.subsetOf(exact))
  }

  test("prefixJaccardPairs: keeps the pair a df cap would lose") {
    // two identical docs whose EVERY shingle is shared by 30 other docs:
    // a df cap of 10 drops all their shingles (pair lost); the prefix
    // index still carries their rarest shingles - recall stays 1
    val hot = "alpha beta gamma delta epsilon zeta eta theta"
    val df = ((0 until 30).map(i => (i.toLong, s"$hot pad${i}a pad${i}b")) ++
      Seq((200L, hot), (201L, hot))).toDF("doc_id", "text")
    val exact = Dedup.prefixJaccardPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", maxShingleDf = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(exact.exists(p => p._1 == 200L && p._2 == 201L))
    assert(!capped.exists(p => p._1 == 200L && p._2 == 201L))
  }

  test("prefixJaccardPairs: no false positives below threshold") {
    // disjoint docs share nothing; near-threshold doc pairs verified exactly
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"), // identical: J = 1
      (3L, "z y x w v u t s r q")) // disjoint
      .toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L)))
    assert(got.head._4 === got.head._3) // identical sets: uni == inter
  }

  test("removeDuplicateSpans: hand-built corpus, all copies removed") {
    // docs 1 and 2 share an identical 8-token prefix (the duplicated
    // window) with distinct tails; doc 3 is clean; doc 4 is shorter than
    // a window and survives whole (token-normalized)
    val pre = "a b c d e f g h"
    val df = Seq(
      (1L, s"$pre one two three"),
      (2L, s"$pre four five"),
      (3L, "p q r s t u v w x y"),
      (4L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 11L, 3L, "one two three")))
    assert(out(2L) === ((2L, 10L, 2L, "four five")))
    assert(out(3L) === ((3L, 10L, 10L, "p q r s t u v w x y")))
    assert(out(4L) === ((4L, 2L, 2L, "tiny doc")))
  }

  test("removeDuplicateSpans: within-doc repetition removed, overlap union exact") {
    // one doc: an 8-token run repeated back-to-back plus a unique tail.
    // windows over the 16-token repeat region: every position of both
    // copies is covered (the repeated window hashes collide within ONE doc)
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val df = Seq((1L, s"$run $run tail1 tail2")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().head
    assert(out._2 === 18L)
    assert(out._4 === "tail1 tail2")
    assert(out._3 === 2L)
  }

  test("removeDuplicateSpans: fully duplicated docs collapse to empty") {
    val t = "x1 x2 x3 x4 x5 x6 x7 x8 x9"
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1L, 9L, 0L, ""), (2L, 9L, 0L, "")))
  }
}
