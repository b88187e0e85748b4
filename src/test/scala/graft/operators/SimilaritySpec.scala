package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Correctness + recall tests for the similarity operators: brute force must
  * rank a known-nearest vector first, and the LSH path must recover a usable
  * fraction of the exact top-k (the recall measurement the LSH variant's
  * verification was missing).
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16

  /** Deterministic corpus: 200 seeded random unit-ish vectors. */
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks an exact near-copy first") {
    val rnd = new scala.util.Random(7)
    val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val nearCopy = v.clone(); nearCopy(0) = nearCopy(0) + 0.001f
    val df = corpus.union(Seq((900L, v), (901L, nearCopy)).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 900L),
      "vec_id", "embedding", k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(top.find(_._2 == 1).map(_._1).contains(901L) || top(901L) === 1)
  }

  test("knnGraph covers every vector and finds planted copies as rank-1") {
    // plant a near-copy of every 10th vector; its top neighbor must be its
    // source (and vice versa), and every corpus vector must get k rows.
    val rnd = new scala.util.Random(13)
    val planted = (0 until 200 by 10).map { i =>
      val base = corpus.filter($"vec_id" === i.toLong)
        .select("embedding").as[Array[Float]].head()
      val copy = base.clone(); copy(0) = copy(0) + 0.001f
      (1000L + i, copy)
    }
    val df = corpus.union(planted.toDF("vec_id", "embedding"))
    val g = Similarity.knnGraph(df, "vec_id", "embedding", k = 3, planes = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val byQuery = g.groupBy(_._1)
    assert(byQuery.size == 220, "every vector must appear as a query")
    assert(byQuery.values.forall(_.length == 3), "each query gets exactly k neighbors")
    planted.foreach { case (pid, _) =>
      val top1 = byQuery(pid).find(_._3 == 1).get._2
      assert(top1 == pid - 1000L,
        s"planted near-copy $pid must rank its source first, got $top1")
    }
    // probe-uniqueness invariant: no (query, neighbor) appears twice
    assert(g.map(r => (r._1, r._2)).distinct.length == g.length)
  }

  test("knnGraph plans equi-joins only (no all-pairs fallback)") {
    val plan = Similarity.knnGraph(corpus, "vec_id", "embedding", k = 3, planes = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the candidate self-join must stay a bucket equi-join — an all-pairs plan " +
        "is the exact failure mode the LSH bucketing exists to avoid")
  }

  test("lshTopK recall@10 against the exact top-10 clears a floor") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(c, q, "vec_id", "embedding", planes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4 hyperplanes over 200 random vectors: single-probe LSH should still
    // recover a meaningful slice of the exact neighbors.
    assert(recall >= 0.2, s"recall@10 was $recall")
    // and every returned neighbor must share the query's bucket by construction
    assert(approx.nonEmpty)
  }

  test("cosinePairs finds planted perturbed copies and nothing else") {
    import org.apache.spark.sql.functions._
    val c = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // planted near-copy of vector 7: scaled + small offset, cosine ≈ 1
    val planted = c.filter($"vec_id" === 7L).select(
      lit(907L).as("vec_id"),
      transform(col("embedding"), x => x * lit(0.9) + lit(0.01)).as("embedding"))
    val pairs = Similarity.cosinePairs(c.unionByName(planted), "vec_id", "embedding")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 907L)), s"expected planted pair, got $pairs")
    // random 16-dim pairs can brush the 0.9 threshold, but the planted pair
    // must dominate: nothing else may involve vector 907
    assert(pairs.filter(p => p._1 == 907L || p._2 == 907L) == Set((7L, 907L)))
  }

  test("lshBucket fails loudly when a vector exceeds maxDim instead of silently truncating") {
    import org.apache.spark.sql.functions._
    val wide = Seq((1L, Array.fill(1100)(0.5))).toDF("vec_id", "embedding")
    val ex = intercept[Exception](
      wide.select(Similarity.lshBucket(col("embedding"), planes = 2)).collect())
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("exceeds maxDim"),
      s"expected the dimension guard to fire, got: $chain")
    // and a raised maxDim accepts the same vector
    assert(wide.select(Similarity.lshBucket(col("embedding"), planes = 2, maxDim = 2048))
      .collect().length == 1)
  }

  test("mixed embedding dimensions fail loudly instead of truncated cosines") {
    import org.apache.spark.sql.functions._
    // a 4-dim and an 8-dim vector landing in the same bucket: DotProduct
    // truncates to the shorter array, so an unguarded verify would emit a
    // systematically deflated cosine with no signal
    val mixed = Seq(
      (1L, Array.fill(8)(0.5)), (2L, Array.fill(8)(0.5)),
      (3L, Array.fill(4)(0.5)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception](
      Similarity.cosinePairs(mixed, "vec_id", "embedding", threshold = 0.1,
        planes = 1).collect())
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("mismatched embedding dimensions"),
      s"expected the dimension guard to fire, got: $chain")
  }

  test("ivfTopK skips null and zero-norm vectors when building its codebook") {
    import org.apache.spark.sql.functions._
    // null vector would NPE the driver collect; a zero-norm one would
    // normalize to an all-NaN centroid that wins argmax for every row
    val corpus = (Seq(
      (100L, null.asInstanceOf[Array[Double]]),
      (101L, Array.fill(4)(0.0))) ++
      (1L to 20L).map(i => (i, Array.tabulate(4)(d => (i % 5 + d).toDouble))))
      .toDF("vec_id", "embedding")
    val queries = Seq((1000L, Array.tabulate(4)(d => (1 + d).toDouble)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      k = 3, cells = 4, probes = 4).collect()
    assert(got.length == 3, s"expected 3 neighbors, got ${got.toSeq}")
  }

  test("invalid planes and k fail at construction with a clear message") {
    import org.apache.spark.sql.functions._
    intercept[IllegalArgumentException](Similarity.lshBucket(col("v"), planes = 0))
    intercept[IllegalArgumentException](Similarity.lshBucket(col("v"), planes = 63))
    intercept[IllegalArgumentException](
      Similarity.knnGraph(Seq((1L, Array(1.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 0))
  }

  test("ivfTopK with all cells probed equals the exact brute force") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopK(c, q, "vec_id", "embedding", cells = 8, probes = 8)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf === exact)
  }

  test("ivfTopK recall@10 with partial probing clears a floor") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(c, q, "vec_id", "embedding", cells = 8, probes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 was $recall")
  }

  test("rerankTopK with coarseK = corpus size equals the exact brute force") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val rr = Similarity.rerankTopK(c, q, "vec_id", "embedding", k = 10, coarseK = 200)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(rr === exact,
      "full-coarseK rerank must reduce to the exact ranking")
  }

  test("rerankTopK recall@10 through the coarse int8 cut clears a floor") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.rerankTopK(c, q, "vec_id", "embedding", k = 10, coarseK = 40)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect rr).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@10 through coarseK=40 was $recall")
    // and a planted exact copy must survive both stages as rank 1
    val rnd = new scala.util.Random(13)
    val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val df = c.union(Seq((900L, v), (901L, v.clone())).toDF("vec_id", "embedding"))
    val top = Similarity.rerankTopK(df, df.filter($"vec_id" === 900L),
      "vec_id", "embedding", k = 3, coarseK = 20)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(top(901L) == 1, s"planted copy ranked ${top.get(901L)}")
  }

  test("rerankTopK rejects coarseK below k") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.rerankTopK(corpus, corpus.limit(1), "vec_id", "embedding",
        k = 10, coarseK = 5)
    }
    assert(ex.getMessage.contains("coarseK"))
  }

  test("lshTopK never returns self-matches and respects k") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val rows = Similarity.lshTopK(c, q, "vec_id", "embedding", k = 10, planes = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(rows.forall(r => r._1 != r._2))
    assert(rows.groupBy(_._1).values.forall(_.length <= 10))
    assert(rows.forall(_._3 <= 10))
  }

  test("groupCentroids computes per-position means in position order") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, -4.0f)),
      (1L, Seq(3.0f, 6.0f, 0.0f)),
      (2L, Seq(10.0f, 0.5f, 0.25f))).toDF("label", "embedding")
    val got = Similarity.groupCentroids(df, "label", "embedding")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) == Seq(2.0, 4.0, -2.0))
    assert(got(2L) == Seq(10.0, 0.5, 0.25))
  }

  test("groupCentroids is partition-count invariant") {
    val base = corpus.withColumn("label",
      org.apache.spark.sql.functions.col("vec_id") % 3)
    val a = Similarity.groupCentroids(base.repartition(1), "label", "embedding")
      .as[(Long, Seq[Double])].collect().toMap
    val b = Similarity.groupCentroids(base.repartition(13), "label", "embedding")
      .as[(Long, Seq[Double])].collect().toMap
    assert(a == b, "sums must be order-insensitive (integer units)")
  }

  test("projectionMatrix is deterministic, ±1-valued, seed-sensitive") {
    val a = Similarity.projectionMatrix("jl", 8, 4)
    val b = Similarity.projectionMatrix("jl", 8, 4)
    val c = Similarity.projectionMatrix("other", 8, 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(w => w == 1.0 || w == -1.0))
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
    // not degenerate: both signs appear
    assert(a.flatten.distinct.length == 2)
  }

  test("randomProjection matches the hand-computed quantized signed sum") {
    val m = Array(Array(1.0, -1.0, 1.0), Array(-1.0, -1.0, 1.0))
    val df = Seq((1L, Seq(0.5f, -0.25f, 0.125f))).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, "vec_id", "embedding", m)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    val q = Seq(0.5, -0.25, 0.125).map(x => math.round(x * 1e9))
    val s = math.sqrt(2.0)
    assert(got(0) == ((1L, 0L, (q(0) - q(1) + q(2)).toDouble / 1e9 / s)))
    assert(got(1) == ((1L, 1L, (-q(0) - q(1) + q(2)).toDouble / 1e9 / s)))
  }

  test("randomProjection roughly preserves pairwise distance (JL contract)") {
    // deterministic given the fixed seed: 64 → 32 dims on two seeded
    // vectors; relative distance distortion must stay inside a loose band
    val rnd = new scala.util.Random(5)
    val va = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val vb = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val df = Seq((0L, va.toSeq), (1L, vb.toSeq)).toDF("vec_id", "embedding")
    val m = Similarity.projectionMatrix("jl", 64, 32)
    val proj = Similarity.randomProjection(df, "vec_id", "embedding", m)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3)
      }
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = d2(va.map(_.toDouble).toSeq, vb.map(_.toDouble).toSeq)
    val got = d2(proj(0L).toSeq, proj(1L).toSeq)
    assert(got > orig * 0.4 && got < orig * 2.5,
      s"projected distance $got vs original $orig outside the JL band")
  }

  test("randomProjection fails loudly on dimension mismatch and bad matrix") {
    val m = Array(Array(1.0, -1.0, 1.0))
    val bad = Seq((1L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProjection(bad, "vec_id", "embedding", m).collect()
    }
    assert(e.getMessage.contains("expected 3 non-null elements") ||
      Option(e.getCause).exists(_.getMessage.contains("expected 3 non-null elements")))
    intercept[IllegalArgumentException] {
      Similarity.randomProjection(bad, "vec_id", "embedding",
        Array(Array(1.0, 0.5)))
    }
    intercept[IllegalArgumentException] {
      Similarity.randomProjection(bad, "vec_id", "embedding",
        Array(Array(1.0), Array(1.0, -1.0)))
    }
  }

  test("labelOutliers ranks a planted far vector first, exact grid distance") {
    // label 0: four near-origin vectors + one far outlier; label 1: two
    // symmetric vectors whose centroid is exact — d2q values hand-checked.
    // label 2 pins the r7 hash-divergence fix: its centroid sum is 3000
    // 1e-9 units over n=2, an EXACT half (1.5) on the 1e6 grid — the
    // integer chain must round half away from zero to qc=2, where the old
    // double-mean path ((3000/1e9/2)·1e6 = 1.4999999999999998) rounded
    // engine-dependently to 1.
    val df = Seq(
      (1L, 0, Seq(0.1f, 0.0f)), (2L, 0, Seq(-0.1f, 0.0f)),
      (3L, 0, Seq(0.0f, 0.1f)), (4L, 0, Seq(0.0f, -0.1f)),
      (5L, 0, Seq(8.0f, 8.0f)),
      (10L, 1, Seq(0.0f, 0.0f)), (11L, 1, Seq(1.0f, 1.0f)),
      (20L, 2, Seq(1e-6f, 0.0f)), (21L, 2, Seq(2e-6f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelOutliers(df, "vec_id", "label", "embedding", 2)
      .as[(Int, Long, Long, Int)].collect()
      .map(r => (r._1, r._4) -> ((r._2, r._3))).toMap
    assert(got((0, 1))._1 == 5L, "the far vector must rank first")
    // label 1: centroid (0.5, 0.5); each member d2q = 2·(5e5)² = 5e11;
    // equal distances tie-break on vec_id ascending
    assert(got((1, 1)) == ((10L, 500000000000L)))
    assert(got((1, 2)) == ((11L, 500000000000L)))
    // label 2: qc = [2, 0] (half rounds AWAY); qv = [1, 0] and [2, 0]
    assert(got((2, 1)) == ((20L, 1L)))
    assert(got((2, 2)) == ((21L, 0L)))
    assert(got.size == 6, "topK=2 per label")
  }

  test("labelOutliers drops null labels and respects topK") {
    val df = Seq(
      (1L, Some(0), Seq(0.1f, 0.2f)), (2L, Some(0), Seq(0.3f, 0.1f)),
      (3L, Some(0), Seq(0.2f, 0.4f)), (4L, None, Seq(9.0f, 9.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelOutliers(df, "vec_id", "label", "embedding", 2)
      .select("vec_id").as[Long].collect().toSet
    assert(!got.contains(4L), "null-label rows have no centroid")
    assert(got.size == 2)
  }

  test("randomProjection and labelOutliers raise on null elements / ragged rows") {
    // a null ELEMENT must not null-propagate into silently-null output
    val m = Array(Array(1.0, -1.0))
    val withNullElem = Seq((1L, Seq(Some(0.5f), None)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Similarity.randomProjection(withNullElem, "vec_id", "embedding", m).collect()
    }
    assert(e1.getMessage.contains("non-null") ||
      Option(e1.getCause).exists(_.getMessage.contains("non-null")))
    val e2 = intercept[Exception] {
      Similarity.labelOutliers(
        withNullElem.withColumn("label",
          org.apache.spark.sql.functions.lit(0)),
        "vec_id", "label", "embedding", 1).collect()
    }
    assert(e2.getMessage.contains("corrupt embedding") ||
      Option(e2.getCause).exists(_.getMessage.contains("corrupt embedding")))
    // a corpus mixing embedding models (ragged lengths) must fail loudly,
    // not bury the short row at the bottom of the ranking
    val ragged = Seq(
      (1L, 0, Seq(0.1f, 0.2f)), (2L, 0, Seq(0.3f, 0.1f, 0.7f))
    ).toDF("vec_id", "label", "embedding")
    val e3 = intercept[Exception] {
      Similarity.labelOutliers(ragged, "vec_id", "label", "embedding", 1).collect()
    }
    assert(e3.getMessage.contains("corrupt embedding") ||
      Option(e3.getCause).exists(_.getMessage.contains("corrupt embedding")))
  }

  test("pqTopK ranks a planted near-copy first and is partition-invariant") {
    val rnd = new scala.util.Random(23)
    val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val near = v.map(x => x + 0.001f)
    val df = corpus.union(Seq((900L, v), (901L, near)).toDF("vec_id", "embedding"))
    def run(parts: Int) = Similarity.pqTopK(
      df.repartition(parts), df.filter($"vec_id" === 900L),
      "vec_id", "embedding", k = 5, subspaces = 4, codewords = 8)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    val one = run(1)
    // an exact-ish copy shares every codeword with its original, so its
    // ADC distance is the global minimum (possibly tied at 0 with other
    // same-code vectors — near the top either way)
    assert(one(901L) <= 2, s"near-copy ranked ${one(901L)}")
    assert(run(7) == one, "PQ ranks must not depend on partitioning")
  }

  test("pqTopK recall@10 vs exact brute force clears a floor") {
    val q = corpus.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(corpus, q, "vec_id", "embedding",
      k = 10, subspaces = 4, codewords = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // 16 codewords × 4 subspaces on random data is a coarse quantizer;
    // cosine-vs-L2 metric mismatch also costs some — anything ≥ 0.2 shows
    // the codes carry real signal (random ranking would recall ~10/200)
    assert(recall >= 0.2, s"PQ recall@10 = $recall")
  }

  test("pqTopK guards: dimension divisibility and empty codebook fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(corpus, corpus.limit(1), "vec_id", "embedding",
        subspaces = 5)
    }
    assert(e1.getMessage.contains("divisible"))
    val zeros = Seq((1L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(zeros, zeros, "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("no non-null"))
  }
}
