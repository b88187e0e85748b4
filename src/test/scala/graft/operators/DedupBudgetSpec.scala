package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The candidate-pair budget gate ([[PairBudget]]) — the automatic form
  * of the q227 pair-mass diagnostic, wired into every posting-join
  * near-dup operator. A vocabulary-saturated corpus (every doc built
  * from a tiny word pool — the r11 soak's measured quadratic case) must
  * trigger the gate; the auto-tightened run must complete inside the
  * budget with exactly the result the tightened cap implies; and
  * `PairBudget.Off` must stay byte-for-byte the historical behavior.
  */
class DedupBudgetSpec extends SparkTestBase {
  import spark.implicits._

  /** Saturated corpus: 400 docs over a 6-word vocabulary — 3-gram shingle
    * space of ≤216 values shared by all docs, so pair mass is ~quadratic
    * in docs (the sf1-soak shape in miniature). Deterministic content.
    */
  private lazy val saturated: DataFrame =
    (0L until 400L).map { i =>
      val w = Array("aa", "bb", "cc", "dd", "ee", "ff")
      val txt = (0 until 12).map(j => w(((i * 7 + j * j + j) % 6).toInt))
        .mkString(" ")
      (i, txt)
    }.toDF("doc_id", "text")

  /** An open-vocabulary corpus: unique words per doc, df ≈ 1 everywhere —
    * mass ~0, every budget passes untightened.
    */
  private lazy val sparse: DataFrame =
    (0L until 200L).map { i =>
      (i, (0 until 10).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("Refuse throws with the measured report; a fitting budget is a no-op") {
    val e = intercept[PairBudgetExceededException] {
      Dedup.ngramJaccardPairs(saturated, "doc_id", "text",
        budget = PairBudget.Refuse(1000L)).count()
    }
    assert(e.op === "ngramJaccardPairs")
    assert(e.pairMass > BigInt(1000), s"measured mass: ${e.pairMass}")
    assert(e.budget === 1000L && e.configuredCap === 1000)
    assert(e.fittingCap >= 1 && e.fittingCap < e.maxUnitSize,
      s"suggested cap ${e.fittingCap} must be a real tightening " +
        s"(hottest unit ${e.maxUnitSize})")
    // a budget above the mass gates nothing: identical result to Off
    val off = pairs(Dedup.ngramJaccardPairs(saturated, "doc_id", "text"))
    val huge = pairs(Dedup.ngramJaccardPairs(saturated, "doc_id", "text",
      budget = PairBudget.Refuse(Long.MaxValue)))
    assert(huge === off)
  }

  test("AutoTighten completes within budget and equals the tightened-cap run") {
    val scope = new CacheScope
    try {
      val gated = Dedup.ngramJaccardPairs(saturated, "doc_id", "text",
        scope = scope, budget = PairBudget.AutoTighten(1000L))
      // the gate's own arithmetic: replay the histogram to find the cap it
      // must have chosen, then the gated output must equal an explicit run
      // at that cap
      val e = intercept[PairBudgetExceededException] {
        Dedup.ngramJaccardPairs(saturated, "doc_id", "text",
          budget = PairBudget.Refuse(1000L)).count()
      }
      val expected = pairs(Dedup.ngramJaccardPairs(saturated, "doc_id",
        "text", maxShingleDf = e.fittingCap))
      assert(pairs(gated) === expected,
        s"AutoTighten(1000) must equal maxShingleDf=${e.fittingCap}")
      // and the tightened candidate volume really fits the budget: replay
      // the df histogram under the tightened cap
      val mass = Dedup.pairMassHistogramForTest(saturated, "doc_id", "text")
        .filter(col("c") >= 2 && col("c") <= e.fittingCap)
        .agg(coalesce(sum(expr("n * (c * (c - 1) div 2)")), lit(0L)))
        .head().getLong(0)
      assert(mass <= 1000L, s"tightened mass $mass must fit the budget")
    } finally scope.release()
  }

  test("a sparse corpus passes any positive budget untightened") {
    val tight = pairs(Dedup.ngramJaccardPairs(sparse, "doc_id", "text",
      budget = PairBudget.AutoTighten(10L)))
    val off = pairs(Dedup.ngramJaccardPairs(sparse, "doc_id", "text"))
    assert(tight === off)
    // Refuse also passes — zero/near-zero mass never throws
    pairs(Dedup.ngramJaccardPairs(sparse, "doc_id", "text",
      budget = PairBudget.Refuse(10L)))
  }

  test("minhashPairs: AutoTighten equals the tightened-bucketCap run") {
    val e = intercept[PairBudgetExceededException] {
      Dedup.minhashPairs(saturated, "doc_id", "text",
        budget = PairBudget.Refuse(500L)).count()
    }
    assert(e.op === "minhashPairs" && e.fittingCap < 400)
    val scope = new CacheScope
    try {
      val gated = pairs(Dedup.minhashPairs(saturated, "doc_id", "text",
        scope = scope, budget = PairBudget.AutoTighten(500L)))
      val explicit = pairs(Dedup.minhashPairs(saturated, "doc_id", "text",
        bucketCap = e.fittingCap))
      assert(gated === explicit)
    } finally scope.release()
  }

  test("simhashPairs: defaults unchanged; budget gates the band buckets") {
    // the saturated corpus collapses to few fingerprints → flood buckets
    val off = pairs(Dedup.simhashPairs(saturated, "doc_id", "text"))
    intercept[PairBudgetExceededException] {
      Dedup.simhashPairs(saturated, "doc_id", "text",
        budget = PairBudget.Refuse(100L)).count()
    }
    val gated = pairs(Dedup.simhashPairs(saturated, "doc_id", "text",
      budget = PairBudget.AutoTighten(100L)))
    assert(gated.size < off.size,
      s"tightening must drop flood-bucket pairs: ${gated.size} vs ${off.size}")
    // an explicit generous cap reproduces the uncapped result
    assert(pairs(Dedup.simhashPairs(saturated, "doc_id", "text",
      bucketCap = 100000)) === off)
  }

  test("prefixJaccardPairs: Refuse gates on prefix postings; AutoTighten refuses the API") {
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(saturated, "doc_id", "text",
        budget = PairBudget.AutoTighten(1000L))
    }
    intercept[PairBudgetExceededException] {
      Dedup.prefixJaccardPairs(saturated, "doc_id", "text",
        budget = PairBudget.Refuse(100L)).count()
    }
    // a fitting budget changes nothing
    val off = pairs(Dedup.prefixJaccardPairs(sparse, "doc_id", "text"))
    assert(pairs(Dedup.prefixJaccardPairs(sparse, "doc_id", "text",
      budget = PairBudget.Refuse(Long.MaxValue))) === off)
  }

  test("minhashPairsAgainstIndex: cross mass (batch × index) gated; Off byte-identical") {
    // index = saturated corpus; delta = 60 more docs from the same tiny
    // vocabulary — every delta band lands in a flood index bucket, so the
    // cross mass Σ n·m is ~quadratic while the delta is small
    val delta = (1000L until 1060L).map { i =>
      val w = Array("aa", "bb", "cc", "dd", "ee", "ff")
      (i, (0 until 12).map(j => w(((i * 7 + j * j + j) % 6).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val scope = new CacheScope
    try {
      val index = Dedup.minhashSignatures(saturated, "doc_id", "text")
      val dsig = Dedup.minhashSignatures(delta, "doc_id", "text")
      val off = pairs(Dedup.minhashPairsAgainstIndex(dsig, index,
        scope = scope))
      val e = intercept[PairBudgetExceededException] {
        Dedup.minhashPairsAgainstIndex(dsig, index, scope = scope,
          budget = PairBudget.Refuse(2000L)).count()
      }
      assert(e.op === "minhashPairsAgainstIndex")
      assert(e.pairMass > BigInt(2000), s"cross mass: ${e.pairMass}")
      // a generous budget gates nothing — byte-identical to Off
      assert(pairs(Dedup.minhashPairsAgainstIndex(dsig, index, scope = scope,
        budget = PairBudget.Refuse(Long.MaxValue))) === off)
      // AutoTighten == explicit run at the reported fitting cap
      val gated = pairs(Dedup.minhashPairsAgainstIndex(dsig, index,
        scope = scope, budget = PairBudget.AutoTighten(2000L)))
      val explicit = pairs(Dedup.minhashPairsAgainstIndex(dsig, index,
        scope = scope, bucketCap = e.fittingCap))
      assert(gated === explicit)
      assert(gated.size < off.size,
        s"tightening must drop flood-bucket pairs: ${gated.size} vs ${off.size}")
    } finally scope.release()
  }

  test("cosinePairs: budget gates the hyperplane buckets; cap drops flood pairs") {
    // 60 near-identical vectors (one bucket) + 40 spread vectors
    val vecs = ((0 until 60).map(i =>
        (i.toLong, Array(1.0, 1.0, 1.0).map(x => (x + i * 1e-9).toFloat))) ++
      (60 until 100).map(i =>
        (i.toLong, Array(math.sin(i * 1.7), math.cos(i * 2.3),
          math.sin(i * 0.9)).map(_.toFloat))))
      .toDF("vec_id", "embedding")
    val off = pairs(Similarity.cosinePairs(vecs, "vec_id", "embedding"))
    assert(off.size >= 60 * 59 / 2, "the flood bucket pairs quadratically")
    intercept[PairBudgetExceededException] {
      Similarity.cosinePairs(vecs, "vec_id", "embedding",
        budget = PairBudget.Refuse(100L)).count()
    }
    val gated = pairs(Similarity.cosinePairs(vecs, "vec_id", "embedding",
      budget = PairBudget.AutoTighten(100L)))
    assert(gated.size < off.size)
    // generous explicit cap reproduces the uncapped result
    assert(pairs(Similarity.cosinePairs(vecs, "vec_id", "embedding",
      bucketCap = 100000)) === off)
  }
}
