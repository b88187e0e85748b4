package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation: Lloyd k-means with
  * deterministic seeding and a FIXED iteration count, plus the SemDeDup
  * composition (cluster to bound the candidate space, then exact-cosine
  * near-duplicate pairs WITHIN clusters only).
  *
  * Shape for 100 TB (the same loop Spark MLlib's KMeans runs):
  *  - centroids live on the DRIVER — k×dim doubles, bounded by structure,
  *    never by data volume — and ship to executors as literal arrays;
  *  - each assignment pass is k codegen'd [[Similarity.dot]] products
  *    riding ONE scan of the corpus (no shuffle, no UDF);
  *  - each centroid update is the exact integer-quantized elementwise mean
  *    of [[Similarity.groupCentroids]]: the shuffle carries (cluster, pos)
  *    partial sums — never vectors — and the driver collect is k×dim rows.
  *
  * Determinism (an external engine must replay every iteration exactly):
  *  - seeds are the k corpus vectors with the smallest md5(id) — the same
  *    selection as [[Similarity.ivfTopK]]'s codebook, no RNG state;
  *  - the squared-distance argmin is computed as s = −2·(v·c) + (c·c)
  *    (the ‖v‖² term is constant per row and cannot change the argmin);
  *    both dots are fixed left-to-right folds, so DuckDB's
  *    `list_dot_product` replays them bit-identically;
  *  - ties break on the smallest cluster id (`array_position` returns the
  *    FIRST index of the array minimum);
  *  - updated means use the q74 quantization contract — `round(x·1e9)`
  *    (ties away from zero in both engines) summed exactly as longs, one
  *    fixed-order double division chain at the end;
  *  - a cluster that loses all members keeps its previous centroid.
  */
object Clustering {

  private def toVecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))

  /** (id, v, cluster, smin) against fixed centroids; smin is the chosen
    * centroid's score −2·(v·c) + (c·c) — kept so callers can derive the
    * exact squared distance as (v·v) + smin without a second pass.
    */
  private def assignVecs(vecs: DataFrame, cent: Array[Array[Double]]): DataFrame = {
    val dim = cent.head.length
    // shape guard riding the scan: a NULL or ragged vector would otherwise
    // NPE (null), crash the update loop (longer), or silently truncate the
    // dot product (shorter) — one size comparison per row, loud failure
    val guarded = when(col("v").isNotNull && size(col("v")) === dim, col("v"))
      .otherwise(raise_error(concat(
        lit(s"kmeans: embedding must be non-null with dim $dim, got size "),
        coalesce(size(col("v")).cast("string"), lit("null")),
        lit(" for id "), col("id").cast("string"))))
    val scores: Column = array(cent.map { cv =>
      // (c·c) folds left-to-right on the driver — the identical sequential
      // sum an oracle's list_dot_product(cv, cv) computes.
      val c2 = cv.foldLeft(0.0)((a, x) => a + x * x)
      lit(-2.0) * Similarity.dot(col("v"), typedlit(cv.toSeq)) + lit(c2)
    }: _*)
    vecs.withColumn("v", guarded).withColumn("s", scores)
      .withColumn("smin", array_min(col("s")))
      .withColumn("cluster",
        (array_position(col("s"), col("smin")) - 1).cast("int"))
      .select(col("id"), col("v"), col("cluster"), col("smin"))
  }

  /** The trained centroids after `iters` Lloyd iterations — k×dim doubles,
    * the PERSISTABLE model: a daily pipeline trains once on the corpus and
    * [[assign]]s each new batch against the stored centroids (the same
    * incremental cadence as the minhash signature index), never re-training
    * per delta.
    */
  def kmeansCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): Array[Array[Double]] = {
    require(k > 0, s"kmeans: k must be positive, got $k")
    require(iters >= 0, s"kmeans: iters must be >= 0, got $iters")
    val vecs = toVecs(df, idCol, vecCol)
    val seeds = vecs
      .withColumn("h",
        graft.functions.TextFunctions.md5Hash60(col("id").cast("string")))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(seeds.nonEmpty, "kmeans: empty input")
    require(seeds.forall(s => s != null && s.length == seeds.head.length),
      "kmeans: seed embeddings must be non-null and share one dimension")

    var cent = seeds
    for (_ <- 1 to iters) {
      // centroid update IS Similarity.groupCentroids — one shared
      // quantization contract (q74), not a second copy of it
      val upd = Similarity.groupCentroids(
        assignVecs(vecs, cent).select(col("cluster"), col("v")),
        "cluster", "v").collect()
      // empty clusters keep their previous centroid (next starts as a copy)
      val next = cent.map(_.clone())
      upd.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](1).toArray
      }
      cent = next
    }
    cent
  }

  /** (idCol, cluster) for `df` against FIXED `centroids` — the incremental
    * assignment pass: one scan, k codegen'd dots per row, no training jobs.
    */
  def assign(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "assign: centroids must be non-empty")
    assignVecs(toVecs(df, idCol, vecCol), centroids)
      .select(col("id").as(idCol), col("cluster"))
  }

  private def lloyd(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    assignVecs(toVecs(df, idCol, vecCol),
      kmeansCentroids(df, idCol, vecCol, k, iters))

  /** (idCol, cluster) after `iters` Lloyd iterations from md5-sampled seeds.
    *
    * `iters` counts UPDATE steps: assign→update, repeated, then one final
    * assignment against the last centroids. `iters = 0` is pure seed
    * assignment (the IVF cell map).
    */
  def kmeans(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame =
    lloyd(df, idCol, vecCol, k, iters)
      .select(col("id").as(idCol), col("cluster"))

  /** One representative per cluster — the member CLOSEST to its centroid
    * (squared distance, ties on the smallest id): the diversity-selection /
    * eval-set-seeding primitive. The distance needs no second centroid
    * pass: d² = (v·v) + smin, with smin = −2·(v·c) + (c·c) already carried
    * by the assignment.
    *
    * The winner is a map-side-combined `min(struct(d2, id))` aggregate —
    * NOT a window partitioned by cluster, which would funnel the whole
    * corpus into at most k reducer tasks each sorting corpus/k rows (the
    * straggler shape [[Skew]] exists to avoid). The shuffle carries one
    * (d2, id) candidate per cluster per map task.
    */
  def clusterExemplars(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    lloyd(df, idCol, vecCol, k, iters)
      .withColumn("d2", Similarity.dot(col("v"), col("v")) + col("smin"))
      .groupBy(col("cluster"))
      .agg(min(struct(col("d2"), col("id"))).as("w"))
      .select(col("cluster"), col("w.id").as("exemplar_id"))
  }

  /** SemDeDup-style semantic near-duplicate pairs: [[kmeans]] bounds the
    * candidate space to within-cluster pairs, exact cosine ≥ `threshold`
    * verifies each one. Output is (id_a, id_b) with id_a < id_b — the same
    * composable pair contract as the other dedup operators (feed it to
    * [[Dedup.connectedComponents]] / keep-best).
    *
    * Clusters larger than `clusterCap` are SKIPPED — the O(size²) pair
    * explosion guard, same role as `bucketCap` in MinHash-LSH. A corpus
    * whose clusters trip the cap needs a larger k (more, smaller cells),
    * not a bigger cap. The default is 10k: that already admits ~5×10⁷
    * pairs from ONE hot cluster — about the most a single rescore stage
    * absorbs without dominating the job — whereas the earlier 100k default
    * admitted ~5×10⁹ (a silent runaway at corpus scale; callers who have
    * measured their cluster balance can raise it explicitly).
    *
    * Candidates never shuffle vectors: only (cluster, id) flows through the
    * self-join; vectors re-attach once per surviving candidate pair for the
    * exact rescore (the q40 id-only-shuffle lesson).
    *
    * Near-identical vectors land in the same cluster with near-certainty
    * (identical vectors with certainty — equal score arrays pick the same
    * argmin), but a pair straddling a Voronoi boundary is missed; that
    * recall trade is the SemDeDup design point, and the deterministic
    * assignment means an external oracle misses exactly the same pairs.
    */
  /** [[semanticPairs]] with k SCALED TO THE CORPUS — the 100-TB form.
    * With FIXED k, the expected within-cell pair mass is Σc² ≈ n²/k:
    * superlinear in n, and measured so by the soak gate (q128's fixed
    * k=8 exponent rises with scale exactly on the n²/k law). Holding
    * the expected CELL SIZE constant instead (k = ⌈n / target⌉) bounds
    * pair mass at ≈ n·target — linear, the shape that survives a 1000×
    * corpus. One count job prices k; assignment cost n·k dot products
    * stays bearable because centroids are broadcast driver literals.
    */
  def semanticPairsAuto(
      df: DataFrame, idCol: String, vecCol: String,
      targetCellSize: Long = 250L, iters: Int = 1, threshold: Double = 0.9,
      clusterCap: Long = 10000L,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(targetCellSize > 0,
      s"semanticPairsAuto: targetCellSize must be positive, got $targetCellSize")
    val n = df.count()
    val k = math.max(8L, (n + targetCellSize - 1) / targetCellSize)
      .min(Int.MaxValue.toLong).toInt
    semanticPairs(df, idCol, vecCol, k, iters, threshold, clusterCap, scope)
  }

  def semanticPairs(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 1, threshold: Double = 0.9,
      clusterCap: Long = 10000L,
      scope: CacheScope = CacheScope.unmanaged,
      budget: PairBudget = PairBudget.Off): DataFrame = {
    require(clusterCap > 0, s"semanticPairs: clusterCap must be positive, got $clusterCap")
    // persisted: the (id, cluster) labels feed the cap filter AND both
    // pair-join sides — uncached, each reference would re-run the full
    // k-dot-products assignment scan
    val labels = scope.own(kmeans(df, idCol, vecCol, k, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the PairBudget gate (same contract as every posting-join dedup
    // operator): the "posting unit" here is the k-means CELL, and the
    // within-cell pair mass Σ c·(c−1)/2 is priced from the cluster-size
    // aggregate the cap filter materializes anyway. Under AutoTighten a
    // fixed-k run whose cells outgrew the budget (the n²/k law) has its
    // cluster cap lowered — oversized cells are skipped exactly as if the
    // caller had configured that cap, and the pair join stays bounded at
    // any corpus scale. Off (the default) is the pre-r14 behavior.
    val effectiveCap: Long = PairBudget.resolveCap(
      labels.groupBy(col("cluster")).count().select(col("count").as("c")),
      clusterCap.min(Int.MaxValue.toLong).toInt, budget,
      "semanticPairs").toLong
    val kept = labels.join(
      broadcast(labels.groupBy(col("cluster")).count()
        .filter(col("count") <= effectiveCap).select(col("cluster"))),
      Seq("cluster"))
    val pairs = kept.select(col("cluster"), col(idCol).as("id_a"))
      .join(kept.select(col("cluster"), col(idCol).as("id_b")), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val vecs = toVecs(df, idCol, vecCol)
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= lit(threshold))
      .select(col("id_a"), col("id_b"))
  }
}
