package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-means / semantic-dedup behavior pins: separation, determinism,
  * partition invariance, empty-cluster survival, and the SemDeDup pair
  * contract (co-clustered exact copies found, cluster cap enforced).
  */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  /** Three tight blobs at distant corners of R³: 0..9 near (10,0,0),
    * 10..19 near (0,10,0), 20..29 near (0,0,10). The per-point offset is
    * small (≤0.3) next to the inter-blob distance (~14), so any sane
    * clustering separates them.
    */
  private def blobs() = (0 until 30).map { i =>
    val c = i / 10
    val base = Array(0.0, 0.0, 0.0); base(c) = 10.0
    val off = 0.1 * (i % 10 - 5) / 5.0
    (i.toLong, Seq(base(0) + off, base(1) - off, base(2) + off))
  }.toDF("id", "vec")

  test("kmeans separates well-spread blobs into pure clusters") {
    val got = Clustering.kmeans(blobs(), "id", "vec", k = 3, iters = 4)
      .as[(Long, Int)].collect().toMap
    assert(got.keySet === (0L until 30L).toSet)
    val groups = got.groupBy(_._1 / 10).view.mapValues(_.values.toSet).toMap
    groups.foreach { case (blob, labels) =>
      assert(labels.size === 1, s"blob $blob split across clusters $labels")
    }
    assert(groups.values.flatten.toSet.size === 3,
      "two blobs collapsed into one cluster")
  }

  test("kmeans is deterministic and partition-count invariant") {
    val a = Clustering.kmeans(blobs(), "id", "vec", k = 3, iters = 2)
      .as[(Long, Int)].collect().toSet
    val b = Clustering.kmeans(blobs().repartition(7), "id", "vec", k = 3, iters = 2)
      .as[(Long, Int)].collect().toSet
    assert(a === b)
  }

  test("a cluster that loses all members keeps its previous centroid (no crash, ids stay in range)") {
    // 4 distinct points, k=4: after the first update two seeds can end up
    // coincident and one cluster may empty out; the loop must keep running.
    val pts = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.01, 0.0)),
      (3L, Seq(10.0, 10.0)), (4L, Seq(10.01, 10.0))).toDF("id", "vec")
    val got = Clustering.kmeans(pts, "id", "vec", k = 4, iters = 3)
      .as[(Long, Int)].collect()
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
    assert(got.forall { case (_, c) => c >= 0 && c < 4 })
  }

  test("iters=0 assigns against the raw md5-sampled seeds") {
    val got = Clustering.kmeans(blobs(), "id", "vec", k = 3, iters = 0)
      .as[(Long, Int)].collect().toMap
    assert(got.size === 30 && got.values.forall(c => c >= 0 && c < 3))
  }

  test("semanticPairs finds exact copies (always co-clustered) and respects the threshold") {
    // ids 100.. are exact copies of 0,5,10,...: identical vectors score
    // identically against every centroid, so they share a cluster by
    // construction and cosine = 1.
    val base = blobs()
    val dups = base.filter(col("id") % 5 === 0)
      .select((col("id") + 100L).as("id"), col("vec"))
    val got = Clustering.semanticPairs(
        base.unionByName(dups), "id", "vec", k = 3, iters = 1, threshold = 0.999)
      .as[(Long, Long)].collect().toSet
    val planted = (0 until 30 by 5).map(i => (i.toLong, i + 100L)).toSet
    assert(planted.subsetOf(got),
      s"missing planted exact-copy pairs: ${planted -- got}")
    // same-blob neighbors have cosine ≈ 0.9998+ only for tiny offsets; the
    // 0.999 threshold keeps cross-point pairs plausible, so just sanity-check
    // no cross-blob pair (cosine ≈ 0 across corners) ever passes.
    got.foreach { case (a, b) =>
      val blob = (x: Long) => (x % 100) / 10
      assert(blob(a) === blob(b), s"cross-blob pair ($a,$b) passed threshold")
    }
  }

  test("clusterExemplars picks the member closest to its centroid") {
    // Quadratic offsets oᵢ = (i%10)²/1000 have mean 0.0285; the unique
    // closest member is i%10 == 5 (|0.025 − 0.0285| = 0.0035, next best
    // 0.0075) — a margin orders of magnitude above quantization noise, so
    // the argmin is unambiguous in both engines.
    val pts = (0 until 30).map { i =>
      val c = i / 10
      val base = Array(0.0, 0.0, 0.0); base(c) = 10.0
      val off = (i % 10) * (i % 10) / 1000.0
      (i.toLong, Seq(base(0) + off, base(1) - off, base(2) + off))
    }.toDF("id", "vec")
    val got = Clustering.clusterExemplars(pts, "id", "vec", k = 3, iters = 4)
      .as[(Int, Long)].collect()
    assert(got.length === 3)
    assert(got.map(_._2).toSet === Set(5L, 15L, 25L))
  }

  test("assign routes new points to the trained centroid of their blob") {
    val cent = Clustering.kmeansCentroids(blobs(), "id", "vec", k = 3, iters = 4)
    val trained = Clustering.assign(blobs(), "id", "vec", cent)
      .as[(Long, Int)].collect().toMap
    // new points sit right at each blob's corner — they must land in the
    // cluster that blob's training members occupy
    val fresh = Seq(
      (100L, Seq(10.0, 0.05, 0.0)), (101L, Seq(0.05, 10.0, -0.05)),
      (102L, Seq(0.0, -0.05, 10.0))).toDF("id", "vec")
    val got = Clustering.assign(fresh, "id", "vec", cent)
      .as[(Long, Int)].collect().toMap
    assert(got(100L) === trained(0L))
    assert(got(101L) === trained(10L))
    assert(got(102L) === trained(20L))
    assertThrows[IllegalArgumentException] {
      Clustering.assign(fresh, "id", "vec", Array.empty[Array[Double]])
    }
  }

  test("null or ragged embeddings fail loudly instead of corrupting assignment") {
    val base = (1 to 12).map(i => (i.toLong, Seq(i.toDouble, 2.0, 3.0)))
    val ragged = base :+ (99L, Seq(1.0, 2.0)) // one short vector
    val e = intercept[Exception](
      Clustering.kmeans(ragged.toDF("id", "vec"), "id", "vec", k = 2).collect())
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("clusterCap skips oversized clusters entirely") {
    val base = blobs()
    val none = Clustering.semanticPairs(
      base, "id", "vec", k = 3, iters = 1, threshold = 0.5, clusterCap = 1L)
    assert(none.count() === 0L)
    assertThrows[IllegalArgumentException] {
      Clustering.semanticPairs(base, "id", "vec", k = 3, clusterCap = 0L)
    }
    assertThrows[IllegalArgumentException] {
      Clustering.kmeans(base, "id", "vec", k = 0)
    }
  }
}
