package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query set is broadcast, so the big side streams through one scan
  *    with no shuffle of the corpus; per-query top-k is a windowed rank.
  *  - [[lshTopK]]: random-hyperplane LSH — the 100 TB path. Corpus and
  *    queries hash to sign-pattern buckets; only same-bucket candidates get
  *    exact rescoring. Bucket count 2^planes bounds each probe to
  *    corpus/2^planes expected candidates.
  *
  * All vector math is `zip_with`/`aggregate` column expressions in double
  * precision — codegen-friendly, no UDFs, deterministic.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a left-to-right double loop — a native codegen'd
    * [[graft.functions.DotProduct]] expression (same summation order as the
    * interpreted HOF fold it replaced, so values are bit-identical; the HOF
    * version walked a lambda evaluator per element and allocated a products
    * array per pair — the dominant cost of candidate verification).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, defined as 0 when either norm is 0: a zero (dead /
    * padded) embedding is similar to nothing. Without the guard the
    * division is 0/0 — under Spark's default ANSI mode that ABORTS the job
    * (DIVIDE_BY_ZERO); with ANSI off it yields NaN, which sorts FIRST under
    * `desc`, crowning the zero vector rank-1 neighbor of every query.
    * Mismatched dimensions fail LOUDLY: [[graft.functions.DotProduct]]
    * truncates to the shorter array, so a corpus mixing two embedding
    * models would otherwise produce systematically deflated cosines with
    * no signal.
    */
  def cosine(a: Column, b: Column): Column = {
    val np = l2Norm(a) * l2Norm(b)
    when(np > 0, checkedDot(a, b) / np).otherwise(lit(0.0))
  }

  /** [[dot]] with a dimension-equality guard (see [[cosine]]'s contract). */
  private def checkedDot(a: Column, b: Column): Column =
    when(size(a) === size(b), dot(a, b)).otherwise(raise_error(concat(
      lit("cosine: mismatched embedding dimensions "),
      coalesce(size(a).cast("string"), lit("null")), lit(" vs "),
      coalesce(size(b).cast("string"), lit("null")))))

  /** The multi-probe bucket set: the vector's own bucket plus each bucket
    * one flipped hyperplane away (Hamming distance 1). The probes are
    * pairwise DISTINCT and each vector sits in exactly one bucket, so a
    * probe join can never match the same candidate twice — shared by
    * [[cosinePairs]], [[knnGraph]] and [[lshTopK]] so the probe scheme
    * cannot silently diverge between them.
    */
  private def probeBuckets(bucket: Column, planes: Int): Column =
    explode(array(bucket +:
      (0 until planes).map(p => bucket.bitwiseXOR(lit(1L << p))): _*))

  /** Exact top-k neighbors for each query row.
    *
    * @param corpus  (idCol, vecCol) rows to search
    * @param queries (idCol, vecCol) rows to search for — assumed small
    *                enough to broadcast (the driver of per-query fan-out)
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Sign-pattern bucket id of a vector under `planes` deterministic
    * hyperplanes with ±1 components: bit p = [Σⱼ signₚⱼ·vⱼ > 0].
    *
    * The component sign for (plane p, dim j) is bit 0 of md5Hash60("p:j") —
    * no RNG state (RNG would break resume/retry determinism in a
    * distributed run) and md5-based so an external oracle (DuckDB) derives
    * the identical hyperplanes. The sign matrix depends only on (p, j), so
    * it is materialized ONCE on the driver (TextHash.md5Hash60 is the
    * byte-identical JVM twin of the column formula, pinned by
    * TextHashSpec's differential test) and shipped as literal vectors: each
    * projection is then one codegen'd [[dot]] instead of an interpreted
    * per-element lambda computing an md5 per row. Literal planes are padded
    * to `maxDim` for vectors shorter than it; a vector LONGER than `maxDim`
    * fails the plan loudly (`raise_error`) — silently bucketing on a
    * truncated prefix would degrade recall and diverge from the full-vector
    * oracle with no signal. Callers with wider embeddings raise `maxDim`.
    */
  def lshBucket(vec: Column, planes: Int = 8, maxDim: Int = 1024): Column = {
    require(planes > 0 && planes < 63,
      s"lshBucket: planes must be in [1, 62], got $planes")
    require(maxDim > 0, s"lshBucket: maxDim must be positive, got $maxDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    // coalesce: a NULL embedding also lands here (size(NULL) fails the
    // when), and a null-propagated concat would raise a MESSAGE-LESS error
    val checked = when(size(vec) <= maxDim, vec).otherwise(raise_error(concat(
      lit("lshBucket: embedding dimension "),
      coalesce(size(vec).cast("string"), lit("null")),
      lit(s" exceeds maxDim=$maxDim; pass a larger maxDim"))))
    (0 until planes).map { p =>
      val signs = Array.tabulate(maxDim) { j =>
        if ((graft.functions.TextHash.md5Hash60(md, s"$p:$j") & 1L) == 1L) 1.0 else -1.0
      }
      // the guard rides plane 0 only — one O(1) size check per row
      val proj = dot(if (p == 0) checked else vec, typedlit(signs.toSeq))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member of the
    * dedup family: pairs of corpus vectors with cosine ≥ threshold.
    * Candidate generation is the same multi-probe hyperplane bucketing as
    * [[lshTopK]] (near-identical vectors share a bucket or sit one flipped
    * plane apart), so the scan is one bucket join, never all-pairs; exact
    * cosine verifies each candidate. `threshold` should sit far from the
    * cosine values of unrelated vectors (random high-dim pairs concentrate
    * near 0) so the float compare is unambiguous across engines.
    */
  def cosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, planes: Int = 6,
      maxDim: Int = 1024,
      bucketCap: Int = Int.MaxValue,
      budget: PairBudget = PairBudget.Off,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // Candidate generation shuffles ONLY (id, bucket) through the
    // ×(planes+1) probe explode; vectors are re-attached afterwards, once
    // per candidate (the minhashPairs pattern — carrying the vectors
    // through the explode would multiply the candidate-join shuffle volume
    // by the probe count). No pair-dedup shuffle: the probes are distinct
    // and each id_b sits in one bucket, so a (id_a, id_b) pair can match
    // at most once (see [[probeBuckets]]).
    val ids = df.select(col(idCol).cast("long").as("id"),
      lshBucket(col(vecCol), planes, maxDim).as("bucket"))
    // `bucketCap`/`budget` guard the quadratic bucket term like
    // minhashPairs' cap: the gated unit is the SAME-bucket pair count
    // Σ c·(c−1)/2 over base buckets (the 0-flip probe's exact candidate
    // volume; each of the `planes` flip probes adds at most one cross-
    // bucket candidate set of the same per-bucket shape, so total
    // candidates ≤ (planes+1)× the gated unit). Capping drops flood
    // buckets from the BASE side — pairs through a dropped bucket vanish
    // from both the same-bucket and flipped-probe directions, since
    // every candidate joins a base-side posting. Defaults keep the
    // historical uncapped plan with no extra aggregate.
    val base0 = ids.select(col("id").as("id_b"), col("bucket"))
    val base =
      if (bucketCap == Int.MaxValue && budget == PairBudget.Off) base0
      else {
        val counts0 = ids.groupBy("bucket").agg(count(lit(1)).as("c"))
        val counts =
          if (budget == PairBudget.Off) counts0
          else scope.own(counts0
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val cap = PairBudget.resolveCap(counts, bucketCap, budget,
          "cosinePairs")
        base0.join(counts.filter(col("c") <= cap).select("bucket"),
          Seq("bucket"))
      }
    val probed = ids.select(col("id").as("id_a"),
      probeBuckets(col("bucket"), planes).as("bucket"))
    val cand = probed
      .join(base, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // norms precomputed per VECTOR so the per-PAIR check is one dot fold:
    // dot(a,b) ≥ θ·|a|·|b| ⇔ cosine ≥ θ — PROVIDED both norms are positive.
    // A zero-norm vector would degenerate the inequality to 0 ≥ 0 (true)
    // and pair with everything it buckets with, so it is excluded outright.
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("n"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b")), Seq("id_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0 &&
        checkedDot(col("v_a"), col("v_b")) >= lit(threshold) * col("n_a") * col("n_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** IVF (inverted-file) ANN — the codebook-quantized scale path next to
    * [[lshTopK]]'s hyperplane buckets: corpus vectors are assigned to the
    * nearest of `cells` coarse centroids (the inverted lists); each query
    * rescans only its `probes` closest cells.
    *
    * The codebook is the `cells` corpus vectors with the smallest md5
    * key-hash — a deterministic "random" sample (no RNG, no k-means state),
    * so an external oracle derives the identical codebook and every stage
    * stays reproducible under task retry. Centroids are L2-normalized ON THE
    * DRIVER (bounded: cells × dim doubles) and shipped as literals: cell
    * assignment is then `cells` codegen'd dots per row riding the corpus
    * scan (argmax of dot against a unit vector == argmax of cosine, |v|
    * being constant per row), one shuffle total for the candidate join.
    * First-index tie-break on equal scores matches the oracle's
    * `ORDER BY s DESC, ci`.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 10, cells: Int = 16, probes: Int = 4,
      trainIters: Int = 0): DataFrame = {
    require(k > 0 && cells > 0 && probes > 0,
      s"ivfTopK: k=$k, cells=$cells, probes=$probes must all be positive")
    require(trainIters >= 0, s"ivfTopK: trainIters must be >= 0, got $trainIters")
    import org.apache.spark.sql.expressions.Window
    // codebook candidates must be usable centroids: a NULL vector would NPE
    // the driver collect, and a zero-norm one would normalize to all-NaN —
    // and since NaN sorts greatest and NaN==NaN, the NaN cell would win
    // argmax for EVERY row, silently collapsing IVF into brute force.
    // The codebook is [[Clustering.kmeansCentroids]] over the filtered
    // corpus: trainIters = 0 keeps the historical hash-ordered sample (the
    // k-means SEEDS are exactly that sample — deterministic, no RNG), while
    // trainIters > 0 runs that many Lloyd updates so cells track density —
    // measurably better recall at the same probe budget (AnnRecallSpec).
    val filtered = corpus
      .select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast("array<double>").as(vecCol))
      .filter(col(vecCol).isNotNull && dot(col(vecCol), col(vecCol)) > 0)
    val picked = (try Clustering
      .kmeansCentroids(filtered, idCol, vecCol, cells, trainIters)
    catch { case e: IllegalArgumentException if e.getMessage.contains("empty") =>
      throw new IllegalArgumentException(
        "requirement failed: ivfTopK: no non-null, non-zero corpus vectors")
    }).filter(c => c.foldLeft(0.0)((a, x) => a + x * x) > 0)
    require(picked.nonEmpty, "ivfTopK: no non-null, non-zero corpus vectors")
    require(picked.map(_.length).distinct.length == 1,
      s"ivfTopK: mixed embedding dimensions in codebook sample: " +
        picked.map(_.length).distinct.sorted.mkString(", "))
    val codebook = picked.map { c =>
      // left-to-right sum of squares: bit-identical to the oracle's
      // list_dot_product(v, v)
      val n = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      c.map(_ / n).toSeq
    }
    def cellScores(vec: Column): Column =
      array(codebook.map(c => dot(vec, typedlit(c))): _*)
    val cd = corpus
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("sc", cellScores(col("cv")))
      .withColumn("cell",
        (array_position(col("sc"), array_max(col("sc"))) - 1).cast("int"))
      .drop("sc")
    val qs = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(cellScores(col("qv"))).as(Seq("cell", "s")))
    val wq = Window.partitionBy("query_id").orderBy(col("s").desc, col("cell"))
    val probed = broadcast(qs.withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= probes)
      .select(col("query_id"), col("qv"), col("cell")))
    val scored = probed.join(cd, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** PRODUCT-QUANTIZATION top-k via asymmetric distance computation (ADC;
    * Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): vectors are split into `subspaces` contiguous
    * sub-vectors, each encoded as the index of its nearest codeword, and a
    * query ranks the whole corpus from a per-subspace lookup table of
    * query-to-codeword distances — the memory-compression path at 100 TB,
    * where the scan carries `subspaces` small ints per vector (the CODES)
    * instead of hundreds of floats, and the exchange-free ADC rides it
    * with broadcast lookup tables.
    *
    * Determinism (the oracle-replay contract): codewords are the same
    * hash-ordered corpus sample as [[ivfTopK]]'s codebook, sliced per
    * subspace; "nearest codeword" minimizes the RANKING form of squared L2
    * (‖c‖² − 2·v_sub·c — the ‖v_sub‖² constant cancels inside an argmin),
    * with ties to the LOWest codeword index (array_position returns the
    * first minimum); the ADC score sums the per-subspace table entries
    * left-to-right. Every float op is a pinned-order dot product, so the
    * SQL restatement reproduces each comparison bit-for-bit.
    *
    * Output: (query_id, neighbor_id, rank ≤ k) by ascending ADC score —
    * APPROXIMATE ranks by construction (that is the PQ trade; the exact
    * baseline is [[bruteForceTopK]]).
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 10, subspaces: Int = 4, codewords: Int = 16,
      trainIters: Int = 0): DataFrame = {
    require(k > 0 && subspaces > 0 && codewords > 0,
      s"pqTopK: k=$k, subspaces=$subspaces, codewords=$codewords must be positive")
    require(trainIters >= 0, s"pqTopK: trainIters must be >= 0, got $trainIters")
    import org.apache.spark.sql.expressions.Window
    // same codebook contract as [[ivfTopK]]: trainIters = 0 is the
    // hash-ordered sample (k-means seeds), > 0 Lloyd-refines on the full
    // vectors (sub-sliced below — centroid slices ARE the per-subspace
    // means of the induced assignment, a PQ-flavored initialization that
    // keeps one training pass for all subspaces)
    val filteredPq = corpus
      .select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast("array<double>").as(vecCol))
      .filter(col(vecCol).isNotNull && dot(col(vecCol), col(vecCol)) > 0)
    val picked = try Clustering
      .kmeansCentroids(filteredPq, idCol, vecCol, codewords, trainIters)
    catch { case e: IllegalArgumentException if e.getMessage.contains("empty") =>
      throw new IllegalArgumentException(
        "requirement failed: pqTopK: no non-null, non-zero corpus vectors")
    }
    require(picked.nonEmpty, "pqTopK: no non-null, non-zero corpus vectors")
    require(picked.map(_.length).distinct.length == 1,
      s"pqTopK: mixed embedding dimensions in codeword sample: " +
        picked.map(_.length).distinct.sorted.mkString(", "))
    val dim = picked.head.length
    require(dim % subspaces == 0,
      s"pqTopK: dimension $dim not divisible into $subspaces subspaces")
    val sd = dim / subspaces
    // codeword sub-vectors and their ‖c‖² — Scala-folded left-to-right,
    // bit-identical to the oracle's list_dot_product(cv, cv)
    val sub = Array.tabulate(subspaces, picked.length)((m, j) =>
      picked(j).slice(m * sd, (m + 1) * sd))
    val norm2 = sub.map(_.map(c => c.foldLeft(0.0)((a, x) => a + x * x)))
    def scoreArr(vec: Column, m: Int): Column = array(
      sub(m).indices.map { j =>
        lit(norm2(m)(j)) -
          lit(2.0) * dot(slice(vec, m * sd + 1, sd), typedlit(sub(m)(j).toSeq))
      }: _*)
    // corpus → (id, code_0 … code_{M-1}): the narrow table that is PQ's
    // entire point — nothing wider ever leaves this projection
    val codes = corpus
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .select(col("neighbor_id") +: (0 until subspaces).map { m =>
        val sc = scoreArr(col("cv"), m)
        (array_position(sc, array_min(sc)) - 1).cast("int").as(s"code_$m")
      }: _*)
    // query → per-subspace lookup tables, broadcast to the code scan
    val qs = broadcast(queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id") +: (0 until subspaces).map(m =>
        scoreArr(col("qv"), m).as(s"lut_$m")): _*))
    val scored = codes.crossJoin(qs)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("ad2", (0 until subspaces)
        .map(m => element_at(col(s"lut_$m"), col(s"code_$m") + 1))
        .reduceLeft(_ + _))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ad2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Corpus-wide kNN GRAPH: the top-k nearest neighbors of EVERY vector —
    * the all-to-all sibling of [[lshTopK]] (whose query side is a small
    * broadcast set). Used for graph-based curation: semantic dedup beyond
    * near-identical, cluster discovery, diversity-aware selection.
    *
    * Shape: the corpus self-joins on hyperplane buckets with multi-probe on
    * the query side only — each vector sits in exactly ONE bucket, so the
    * (probes+1) distinct probe buckets can never match the same neighbor
    * twice and the candidate set needs no dedup shuffle. Like
    * [[cosinePairs]], only (id, bucket) flows through the probe explode and
    * the candidate join; vectors re-attach once per candidate for the exact
    * rescore, and per-query top-k is a windowed rank over candidates
    * (bounded by (planes+1)·corpus/2^planes per query — `planes` scales the
    * bucket count with the corpus so that stays a constant).
    */
  def knnGraph(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, planes: Int = 6, maxDim: Int = 1024): DataFrame = {
    require(k > 0, s"knnGraph: k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val ids = df.select(col(idCol).cast("long").as("id"),
      lshBucket(col(vecCol), planes, maxDim).as("bucket"))
    val probed = ids.select(col("id").as("query_id"),
      probeBuckets(col("bucket"), planes).as("bucket"))
    val cand = probed
      .join(ids.select(col("id").as("neighbor_id"), col("bucket")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val scored = cand
      .join(vecs.select(col("id").as("query_id"), col("v").as("qv")), Seq("query_id"))
      .join(vecs.select(col("id").as("neighbor_id"), col("v").as("cv")), Seq("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Approximate top-k with multi-probe: candidates are corpus vectors in
    * the query's hyperplane bucket OR any bucket at Hamming distance 1 from
    * it (each probe flips one hyperplane's sign bit — the buckets most
    * likely to hold near neighbors that landed just across a plane). Exact
    * cosine rescoring within the probed buckets. Recall is tuned by `planes`
    * (fewer → bigger buckets) and multi-probe (×(planes+1) candidates);
    * each corpus vector sits in exactly one bucket, so probes never produce
    * duplicate candidate pairs and the scan stays a single bucket join.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, planes: Int = 8,
      maxDim: Int = 1024): DataFrame = {
    require(k > 0, s"lshTopK: k must be positive, got $k")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes, maxDim).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes, maxDim).as("bucket"))
    val probed = broadcast(q.select(col("query_id"), col("qv"),
      probeBuckets(col("bucket"), planes).as("bucket")))
    val scored = probed.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Per-vector symmetric int8 code array, kept in DOUBLE cells: scale =
    * max-abs, code = floor(x·127/scale + ½) ∈ [−127, 127]. The same scheme
    * the q88 quantize query persists, minus the int cast — the codes are
    * integral values either way, and staying double keeps the coarse dot
    * on the codegen'd [[dot]] kernel. Every step (multiply, divide, floor)
    * is a single IEEE operation, so an external engine reproduces each
    * code bit-for-bit.
    */
  def int8Codes(vec: Column): Column = {
    val scale = array_max(transform(vec, x => abs(x)))
    when(scale === 0, transform(vec, _ => lit(0.0)))
      .otherwise(transform(vec, x => floor(x * lit(127.0) / scale + lit(0.5))))
  }

  /** Two-stage retrieval: coarse top-`coarseK` by quantized-code dot, then
    * exact-cosine re-rank of the survivors to top-`k` — the shape a 100 TB
    * embedding store actually serves queries with. The corpus pass touches
    * only the 4×-smaller code representation (in a real deployment the
    * codes are the PERSISTED index and the full vectors live in a separate
    * store fetched per candidate; here both derive from one scan), and the
    * expensive exact cosine runs on queries × coarseK rows, never the
    * corpus.
    *
    * Scale shape: stage 1 shuffles only (query_id, neighbor_id, coarse
    * score) triples into the per-query top-coarseK window; the candidate
    * id list (≤ queries × coarseK rows) then broadcast-joins back to the
    * corpus scan to fetch exact vectors, so no full-width vector ever
    * crosses an exchange before the candidate cut. Code dots are exact:
    * |code| ≤ 127, so a 64-dim dot is < 2²¹ — integers a double carries
    * exactly, making the coarse ranking engine-independent.
    *
    * Recall caveat (by design, documented not hidden): code dot
    * approximates cosine only up to the per-vector scale factor; coarseK
    * must be sized so the true top-k survive stage 1 — the spec pins
    * recall on a planted-neighbor corpus rather than assuming it.
    */
  def rerankTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, coarseK: Int = 50): DataFrame = {
    require(k > 0 && coarseK >= k,
      s"rerankTopK: need coarseK >= k > 0, got k=$k coarseK=$coarseK")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), int8Codes(col(vecCol)).as("qc")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      int8Codes(col(vecCol)).as("cc"))
    import org.apache.spark.sql.expressions.Window
    val coarseW = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id"))
    val cand = q.select(col("query_id"), col("qc")).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("coarse", dot(col("qc"), col("cc")))
      .select(col("query_id"), col("neighbor_id"), col("coarse"))
      .withColumn("crank", row_number().over(coarseW))
      .filter(col("crank") <= coarseK)
      .select(col("query_id"), col("neighbor_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val exactW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(cand).join(cv, Seq("neighbor_id"))
      .join(q.select(col("query_id"), col("qv")), Seq("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Element-wise mean embedding per group — cluster representatives for a
    * deduped/labeled corpus (e.g. one vector per dedup cluster or topic).
    *
    * Shape for 100 TB: posexplode fans each vector into (group, pos, value)
    * rows, but the hash aggregate's MAP-SIDE partials combine them to at
    * most groups×dim rows per task before the exchange — the shuffle
    * carries partial sums, never vectors (same exact-histogram shape as the
    * token-percentile query). A `collect_list`-of-vectors-then-average
    * alternative would move every vector to one reducer per group and cap
    * group size by executor memory.
    *
    * Determinism: each value is quantized to an INTEGER number of 1e-9
    * units (`round(v × 1e9)` — both the multiply and the tie-away-from-zero
    * rounding are identical IEEE ops in any engine), the units sum exactly
    * as longs in any order, and the mean is fixed-order double arithmetic
    * at the end. 1e-9 sits below a float's own ulp (~6e-8 near 1), so no
    * embedding precision is lost. Decimal sums were rejected deliberately:
    * cast-to-decimal rounding is engine-specific on exact ties (half-up vs
    * half-even — dyadic floats DO tie), which breaks cross-engine
    * verification. Assembly back to an array is `array_sort` over
    * (pos, mean) structs — struct ordering is lexicographic, pos first.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    groupSums(df, groupCol, vecCol)
      .select(col("_g"), col("_pos"),
        (col("_sum").cast("double") / lit(1e9) / col("_n")).as("_mean"))
      .groupBy(col("_g"))
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_mean")))),
        e => e.getField("_mean")).as("centroid"))
      .withColumnRenamed("_g", groupCol)

  /** The exact per-(group, position) element sums behind BOTH centroid
    * forms — [[groupCentroids]]' double mean and [[labelOutliers]]' integer
    * quantization derive from this ONE aggregate, so the 1e9-unit
    * quantization contract lives in a single place. Output: (_g, _pos,
    * _sum: decimal(38,0), _n).
    *
    * decimal(38,0) sum: a long sum of 1e9-scaled units overflows int64
    * past ~9.2e9 rows per group (ANSI aborts; non-ANSI silently wraps);
    * decimal stays exact to 38 digits like the oracle's 128-bit HUGEINT.
    * INPUT RANGE contract: the per-ELEMENT cast bounds |v| ≤ ~9.2e9
    * (long range / 1e9) — fine for any normalized or near-normalized
    * embedding; raw feature vectors beyond that abort under ANSI.
    */
  private def groupSums(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("_g"),
        posexplode(col(vecCol)).as(Seq("_pos", "_v")))
      .groupBy(col("_g"), col("_pos"))
      .agg(sum(round(col("_v").cast("double") * lit(1e9)).cast("long")
        .cast("decimal(38,0)")).as("_sum"),
        count(lit(1)).as("_n"))

  /** Deterministic ±1 Achlioptas/JL projection matrix: `outDim` rows of
    * `inDim` signs, sign(i,j) = +1 when bit 0 of md5-60-bit("seed:i:j") is
    * 0 — the SAME sign-derivation device [[lshBucket]] uses (one reused
    * MessageDigest, the `TextHash.md5Hash60` compiled twin pinned by its
    * differential test), so there is exactly one hash-parity formula to
    * keep in sync with oracles. Pure function of (seed, shape) — the
    * driver materializes the whole matrix (outDim×inDim doubles, e.g.
    * 16×64 = 1 KB) and ships it as plan literals, so executors never
    * exchange it and an oracle can restate the identical matrix.
    */
  def projectionMatrix(seed: String, inDim: Int, outDim: Int): Array[Array[Double]] = {
    require(inDim > 0 && outDim > 0,
      s"projectionMatrix: dims must be positive, got $inDim x $outDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (i, j) =>
      if ((graft.functions.TextHash.md5Hash60(md, s"$seed:$i:$j") & 1L) == 0L)
        1.0 else -1.0
    }
  }

  /** Johnson–Lindenstrauss random projection of an embedding column to
    * `matrix.length` dimensions — the dimensionality-reduction front end
    * for ANN / clustering at 100 TB (project once, then run the bucketed
    * family on vectors 4× smaller). Each output component is a signed sum
    * against a literal ±1 row, scaled by 1/√k so expected pairwise
    * distances are preserved (JL lemma); the plan is map-only — zero
    * exchanges, the projection rides whatever scan feeds it.
    *
    * Exactness: components are computed over 1e9-quantized INTEGER vector
    * elements (the [[groupCentroids]] device) — the signed sum is exact
    * int64 arithmetic, so it is independent of summation order and an
    * external oracle reproduces the final double bit-for-bit (a double
    * fold would pin the verifier to this engine's accumulation order, and
    * ±signed zeros diverge between fold directions). The ±1 restriction is
    * what keeps products exact; [[projectionMatrix]] only emits ±1
    * (Achlioptas sparse JL works too but would need its own grid).
    * Quantization costs ~1e-9 per element — noise-level against the JL
    * distortion itself. Overflow bound: |v|·1e9·inDim must fit int64,
    * i.e. |v| ≤ ~9.2e9/inDim — any normalized embedding is orders of
    * magnitude inside it.
    *
    * Output is exploded (id, pos, val) — one row per component, the q74
    * shape that keeps cross-engine comparison exact. Rows whose vector
    * length differs from the matrix width fail LOUDLY (see [[cosine]]'s
    * contract — a silent truncation would project garbage).
    */
  def randomProjection(
      df: DataFrame, idCol: String, vecCol: String,
      matrix: Array[Array[Double]]): DataFrame = {
    require(matrix.nonEmpty && matrix.head.nonEmpty,
      "randomProjection: empty projection matrix")
    val inDim = matrix.head.length
    require(matrix.forall(_.length == inDim),
      "randomProjection: ragged projection matrix")
    require(matrix.forall(_.forall(w => w == 1.0 || w == -1.0)),
      "randomProjection: matrix entries must be ±1 (see projectionMatrix)")
    val scale = lit(math.sqrt(matrix.length.toDouble))
    val v = col(vecCol).cast("array<double>")
    // loud on BOTH corruption modes: wrong length AND null elements — a
    // null element would otherwise null-propagate through the fold and
    // silently null every component (while an SQL oracle's sum() would
    // skip it and return partial numbers: the worst kind of divergence)
    val guarded = when(
      size(v) === lit(inDim) && !exists(v, _.isNull), v)
      .otherwise(raise_error(concat(
        lit(s"randomProjection: expected $inDim non-null elements, got "),
        coalesce(size(v).cast("string"), lit("null")), lit(" with "),
        coalesce(size(filter(v, _.isNull)).cast("string"), lit("?")),
        lit(" null(s)"))))
    // one quantization pass per row, shared by every component below
    val quantized = df.select(col(idCol),
      transform(guarded, x => round(x * lit(1e9)).cast("long")).as("_qv"))
    val comps = matrix.toSeq.map { row =>
      val signs = typedLit(row.map(_.toLong).toSeq)
      aggregate(zip_with(col("_qv"), signs, (x, s) => x * s),
        lit(0L), (acc, x) => acc + x)
        .cast("double") / lit(1e9) / scale
    }
    quantized.select(col(idCol),
        posexplode(array(comps: _*)).as(Seq("pos", "val")))
      .select(col(idCol), col("pos").cast("bigint").as("pos"), col("val"))
  }

  /** Per-label embedding outliers: the `topK` members FARTHEST from their
    * label's centroid — the mislabeled/corrupt-embedding sweep a curation
    * pipeline runs before training.
    *
    * Distance² is computed on a 1e6 integer grid: the vector is quantized
    * (`round(x·1e6)`, exact int64), the label centroid is quantized
    * DIRECTLY FROM ITS EXACT INTEGER SUM — qc = round-half-away(Σround(v·1e9)
    * / (1000·n)) evaluated with integer division, so the per-label mean
    * never exists as a double (a double mean landing within 1 ulp of a .5
    * boundary on the 1e6 grid rounds differently across engines — the r7
    * q104 hash divergence) — and `d2q = Σ (qvⱼ − qcⱼ)²` is summed in
    * decimal(38,0). Every step is integer arithmetic an external engine
    * replays bit-for-bit, and rank ties are decided on EQUAL integers,
    * never on float ulps (a double v·v − 2v·c + c·c expansion would make
    * the near-boundary ranks engine-dependent). d2q is emitted as BIGINT —
    * int64 is the one numeric shape every engine, parquet reader, and
    * driver hash represents identically — which bounds per-element
    * |v| ≤ ~sqrt(9.2e18/dim)/1e6 (≈380 at dim 64; any normalized or
    * near-normalized embedding is orders of magnitude inside it; ANSI mode
    * aborts loudly on the cast if exceeded). The grid costs 1e-6 per
    * element — far below any real embedding's inter-point distances.
    *
    * Corrupt rows fail LOUDLY: a null vector, a null element, or a length
    * differing from the label's centroid raises instead of
    * null-propagating into a d2q that would sort the very rows this sweep
    * exists to surface to the BOTTOM of the ranking (NULLS LAST under
    * desc) — same contract as [[randomProjection]] and [[cosine]].
    *
    * Shape for 100 TB: centroids are one tiny aggregate (labels × dim)
    * quantized once per label and broadcast back; the rank is a per-label
    * top-k window Spark executes as WindowGroupLimit — each task keeps k
    * rows per label, the corpus never sorts globally. Null labels are
    * dropped (no centroid to measure against).
    */
  def labelOutliers(
      df: DataFrame, idCol: String, labelCol: String, vecCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"labelOutliers: topK must be positive, got $topK")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(labelCol),
      col(vecCol).cast("array<double>").as("_v"))
    val quant = (c: Column) => transform(c, x => round(x * lit(1e6)).cast("long"))
    // Quantized centroid straight from groupSums' exact 1e9-unit sums (the
    // exchange carries (label, pos, sum, n), never vectors), quantized
    // ONCE per label before the broadcast. qc = round-half-away-from-zero
    // of sum/(1000·n) via integer `div` on the positive magnitude — the
    // mean is never materialized as a double, so both engines replay one
    // integer chain (see the scaladoc's r7 hash-divergence note).
    val qcMag = expr("(2 * abs(_sum) + 1000 * _n) div (2000 * _n)")
    val cent = groupSums(base, labelCol, "_v")
      .withColumn("_qc1", when(col("_sum") < 0, -qcMag).otherwise(qcMag))
      .groupBy(col("_g"))
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_qc1")))),
        e => e.getField("_qc1")).as("_qc"))
      .withColumnRenamed("_g", labelCol)
    val guarded = when(
      size(col("_v")) === size(col("_qc")) && !exists(col("_v"), _.isNull),
      quant(col("_v")))
      .otherwise(raise_error(concat(
        lit("labelOutliers: corrupt embedding for id-column value "),
        coalesce(col(idCol).cast("string"), lit("null")), lit(": size "),
        coalesce(size(col("_v")).cast("string"), lit("null")),
        lit(" vs centroid "), size(col("_qc")).cast("string"))))
    // exact: longs cast to decimal losslessly; (19,0)×(19,0) capped at 38
    val d2 = aggregate(
      zip_with(guarded, col("_qc"), (a, b) => a - b),
      lit(new java.math.BigDecimal(0)).cast("decimal(38,0)"),
      (acc, d) => acc +
        (d.cast("decimal(19,0)") * d.cast("decimal(19,0)")).cast("decimal(38,0)"))
    val w = Window.partitionBy(col(labelCol)).orderBy(col("_d2").desc, col(idCol))
    base.join(broadcast(cent), Seq(labelCol))
      .withColumn("_d2", d2)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      // BIGINT output (not decimal): see scaladoc — ANSI aborts on overflow
      .select(col(labelCol), col(idCol),
        col("_d2").cast("bigint").as("d2q"), col("rank"))
  }
}
