package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@10 of the ANN paths against [[Similarity.bruteForceTopK]] truth
  * on the sf0.1 embeddings — the measurement the codebook samplers are
  * judged by: k-means-trained codebooks (`trainIters > 0`) must not lose
  * to the historical hash-ordered sample at the same probe budget.
  */
class AnnRecallSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.1"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth: Set[(Long, Long)] =
    pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10))

  private def recall(approx: Set[(Long, Long)]): Double =
    approx.intersect(truth).size.toDouble / truth.size

  test("IVF recall@10: k-means codebook >= hash-sampled codebook") {
    val hash = recall(pairs(Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", k = 10, cells = 16, probes = 4,
      trainIters = 0)))
    val trained = recall(pairs(Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", k = 10, cells = 16, probes = 4,
      trainIters = 2)))
    info(f"IVF recall@10 (cells=16, probes=4): hash=$hash%.3f kmeans=$trained%.3f")
    assert(trained >= hash,
      f"k-means cells must not lose recall: hash=$hash%.3f kmeans=$trained%.3f")
    assert(trained >= 0.5, f"trained IVF recall unreasonably low: $trained%.3f")
  }

  test("PQ recall@10: k-means codewords >= hash-sampled codewords") {
    val hash = recall(pairs(Similarity.pqTopK(
      emb, queries, "vec_id", "embedding", k = 10, subspaces = 4,
      codewords = 16, trainIters = 0)))
    val trained = recall(pairs(Similarity.pqTopK(
      emb, queries, "vec_id", "embedding", k = 10, subspaces = 4,
      codewords = 16, trainIters = 2)))
    info(f"PQ recall@10 (subspaces=4, codewords=16): hash=$hash%.3f kmeans=$trained%.3f")
    assert(trained >= hash,
      f"k-means codewords must not lose recall: hash=$hash%.3f kmeans=$trained%.3f")
  }

  test("trainIters = 0 is bit-identical to the historical hash sample") {
    // the oracle-replay contract of q47/q188 depends on this default
    val a = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, cells = 8, probes = 2)
    val b = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, cells = 8, probes = 2, trainIters = 0)
    assert(a.collect().map(_.toString).sorted
      .sameElements(b.collect().map(_.toString).sorted))
  }
}
