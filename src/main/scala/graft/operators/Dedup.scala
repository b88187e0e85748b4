package graft.operators

import java.security.MessageDigest

import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora, designed for the
  * 100 TB shape: every variant is a hash-bucketed shuffle (groupBy on a
  * digest or an LSH band key), never an all-pairs comparison.
  *
  * Signature computation (shingling, MinHash, SimHash) runs as ONE compiled
  * `mapPartitions` pass per document via [[graft.functions.TextHash]] — one
  * `MessageDigest` per partition, linear in corpus bytes, distributing with
  * the scan. Higher-order-function column expressions are deliberately NOT
  * used here: they are interpreted and projection collapse re-inlines their
  * subtrees, re-running the shingle pipeline k×bands times per row (the
  * round-3 q31 pathology: 1558 s for 6k docs).
  *
  * Every hash bottoms out in md5 (see TextHash's determinism contract), so a
  * DuckDB oracle recomputes identical signatures; Jaccard verification is
  * emitted as exact integers (intersection, union) — no float compare hazard.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct text with the
    * canonical (minimum) id and the duplicate count. A single hash aggregate:
    * partial aggregation runs map-side, the shuffle carries one row per
    * distinct digest.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Per-document MinHash signature artifacts: (id, hs: distinct hashed
    * shingles, bkeys: LSH band keys). Token-less documents are dropped.
    *
    * PUBLIC as the persistable dedup INDEX for incremental pipelines: write
    * this table once per corpus snapshot, and each incoming batch only
    * hashes itself ([[minhashPairsAgainstIndex]]) instead of re-signing the
    * full corpus per run — the only dedup cadence that works when the corpus
    * is 100 TB and the daily delta is 0.1 TB.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val spark = df.sparkSession
    import spark.implicits._
    val (a, b) = TextHash.minhashCoeffs(k)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val toks = TextHash.tokens(text)
          if (toks.isEmpty) None
          else {
            val hs = TextHash.hashedShingles(toks, md)
            val sig = TextHash.minhashFromHashes(hs, a, b)
            Some((id, hs, TextHash.bandKeys(sig, bands)))
          }
        }
      }
      .toDF("id", "hs", "bkeys")
  }

  /** [[minhashSignatures]] persisted under the caller's [[CacheScope]] — the
    * within-plan cache for the self-join operators below, which consume the
    * signatures four times (both band-join sides + both shingle
    * re-attachments).
    */
  private def minhashSigs(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, scope: CacheScope): DataFrame =
    scope.own(minhashSignatures(df, idCol, textCol, k, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Incremental near-dedup: pairs between a NEW batch's signatures and an
    * EXISTING index ([[minhashSignatures]] output, typically read back from
    * storage) — cross-set pairs only; new-vs-new pairs come from
    * [[minhashPairs]] over the batch itself.
    *
    * The band join explodes ids only; the skew cap applies to the INDEX side
    * (boilerplate floods live in the corpus; a cap there bounds per-bucket
    * fan-out at cap candidates per new-doc band). The index postings are
    * FIRST semi-joined to the batch's bucket set: a daily batch touches a
    * vanishing fraction of a 100 TB index's buckets, and since the
    * semi-join keeps whole buckets, per-bucket counts (and therefore the
    * cap) are unchanged — without it the cap's count window would shuffle
    * the ENTIRE index every run. Exact Jaccard verification re-attaches the
    * shingle sets once per surviving pair, same integer (inter, uni)
    * contract as [[minhashPairs]].
    *
    * `budget` gates the CROSS candidate volume Σ n·m over touched buckets
    * (batch × index postings — [[PairBudget.resolveCapCross]]): the
    * per-delta form of the self-join gate, measured before the band join
    * from aggregates bounded by the delta's touched buckets.
    */
  def minhashPairsAgainstIndex(
      newSigs: DataFrame,
      index: DataFrame,
      thresholdNum: Int = 3,
      thresholdDen: Int = 5,
      bucketCap: Int = 1000,
      scope: CacheScope = CacheScope.unmanaged,
      budget: PairBudget = PairBudget.Off): DataFrame = {
    // persisted: the batch signatures feed the band explode AND the final
    // hs re-attach — uncached, the per-doc md5 signing pass (the dominant
    // cost of the daily-delta cadence) would run three times
    val sigs = scope.own(newSigs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nb = sigs.select(col("id").as("id_a"),
      posexplode(col("bkeys")).as(Seq("band", "bkey")))
    val ib = index.select(col("id").as("id_b"),
      posexplode(col("bkeys")).as(Seq("band", "bkey")))
    val touched = nb.select("band", "bkey").distinct()
    // Persisted: the semi-joined index postings (bounded by the batch's
    // touched buckets, a vanishing fraction of the 100 TB index) feed BOTH
    // the bucket-count aggregate and the cap join — uncached, the full
    // index explode + semi-join would run twice per daily batch.
    val touchedIx = scope.own(ib.join(touched, Seq("band", "bkey"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // bucketCap via pre-aggregate + join over the TOUCHED postings only
    // (whole buckets survive the semi-join, so counts — and the cap —
    // are identical to a full-index count; see ngramJaccardPairs for why
    // an aggregate beats a window here)
    val ixCounts0 = touchedIx.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bsize"))
    // With a budget set, the gate needs BOTH sides' posting counts per
    // touched bucket (candidate volume here is n·m, not c·(c−1)/2 — the
    // cross-join mass): one extra aggregate over the batch's postings +
    // a join on the touched buckets, all bounded by the delta. The index
    // counts feed the gate and the cap filter — persist against rerun.
    val ixCounts =
      if (budget == PairBudget.Off) ixCounts0
      else scope.own(ixCounts0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cap = if (budget == PairBudget.Off) bucketCap else {
      val crossCounts = ixCounts.select(col("band"), col("bkey"),
          col("bsize").as("c"))
        .join(nb.groupBy("band", "bkey").agg(count(lit(1)).as("n")),
          Seq("band", "bkey"))
      PairBudget.resolveCapCross(crossCounts, bucketCap, budget,
        "minhashPairsAgainstIndex")
    }
    val smallIxBuckets = ixCounts
      .filter(col("bsize") <= cap)
      .select("band", "bkey")
    val cappedIx = touchedIx.join(smallIxBuckets, Seq("band", "bkey"))
      .select("band", "bkey", "id_b")
    val pairs = nb.join(cappedIx, Seq("band", "bkey"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(sigs.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(index.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("uni",
        (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("inter"))
      .filter(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: word-3-gram shingles → k-wide MinHash signature → `bands` LSH
    * band keys (all in one compiled pass, see [[minhashSigs]]) → explode to
    * (band, bkey, id) — ids only, the shingle arrays never enter the band
    * shuffle → self-join on the band key (candidate generation linear in
    * corpus size, not quadratic) → dedup id pairs → re-attach the hashed
    * shingle sets → exact Jaccard ≥ thresholdNum/thresholdDen.
    *
    * Band math: P(candidate) = 1 - (1 - j^r)^b — with 16×4 the s-curve
    * midpoint sits near j ≈ 0.5, standard for 0.6-0.8 thresholds.
    *
    * `bucketCap` is the skew guard: a band bucket holding > cap documents
    * (boilerplate floods — empty pages, license headers) would go quadratic
    * within the bucket, so it is dropped wholesale before the self-join. The
    * cap bounds per-bucket join work at cap² regardless of corpus size.
    *
    * Output: (id_a, id_b, inter, uni) with jaccard = inter/uni — exact
    * integers so an external oracle matches bit-for-bit.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 64,
      bands: Int = 16,
      thresholdNum: Int = 3,
      thresholdDen: Int = 5,
      bucketCap: Int = 1000,
      scope: CacheScope = CacheScope.unmanaged,
      budget: PairBudget = PairBudget.Off): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")

    val sigs = minhashSigs(df, idCol, textCol, k, bands, scope)

    val banded = sigs.select(col("id"), posexplode(col("bkeys")).as(Seq("band", "bkey")))
    // bucketCap via pre-aggregate + join (see ngramJaccardPairs): one row
    // per distinct bucket crosses the count shuffle, and the flood bucket's
    // rows are dropped by a hash-join probe instead of all sorting into a
    // single window partition first
    val counts0 = banded.groupBy("band", "bkey").agg(count(lit(1)).as("c"))
    // with a budget set the bucket-size aggregate feeds both the gate and
    // the cap filter — persist it so the band explode + combine runs once
    val counts =
      if (budget == PairBudget.Off) counts0
      else scope.own(counts0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cap = PairBudget.resolveCap(counts, bucketCap, budget, "minhashPairs")
    val smallBuckets = counts.filter(col("c") <= cap).select("band", "bkey")
    val capped = banded.join(smallBuckets, Seq("band", "bkey"))
      .select("band", "bkey", "id")

    val l = capped.select(col("band"), col("bkey"), col("id").as("id_a"))
    val r = capped.select(col("band"), col("bkey"), col("id").as("id_b"))
    val pairs = l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    pairs
      .join(sigs.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("uni",
        (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("inter"))
      .filter(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs via an inverted shingle
    * index — the exact counterpart of [[minhashPairs]] (no signature
    * approximation, so recall is 1 by construction for any pair sharing a
    * discriminative shingle).
    *
    * Pipeline: one compiled pass produces each doc's distinct hashed
    * 3-gram set → explode to (shingle, id) postings → drop shingles whose
    * document frequency exceeds `maxShingleDf` (ubiquitous boilerplate
    * n-grams generate quadratic candidate floods while discriminating
    * nothing — the df-cap twin of minhash's bucketCap) → self-join postings
    * on the shingle (candidates = pairs sharing ≥1 surviving shingle) →
    * verify with exact Jaccard over the FULL shingle sets.
    *
    * Output: (id_a, id_b, inter, uni) — same exact-integer contract as
    * [[minhashPairs]].
    */
  /** Shared candidate machinery for the exact shingle-set joins: hashed
    * shingle sets per doc (cached under `scope`) and the df-capped
    * candidate pair list, joined back to both sides' full sets. Returns
    * (id_a, id_b, hs_a, hs_b) with id_a < id_b.
    */
  private def shingleCandidates(
      df: DataFrame, idCol: String, textCol: String,
      maxShingleDf: Int, scope: CacheScope,
      budget: PairBudget = PairBudget.Off,
      op: String = "shingleCandidates"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = scope.own(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) =>
            val toks = TextHash.tokens(text)
            if (toks.isEmpty) None else Some((id, TextHash.hashedShingles(toks, md)))
          }
        }
        .toDF("id", "hs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // df guard via PRE-AGGREGATE, not a window over the posting list: the
    // aggregate map-side-combines to one row per DISTINCT shingle before
    // any shuffle, and the join back probes a hash table — a window would
    // carry (and sort) every posting row of the hottest shingle through
    // one partition, exactly the boilerplate flood the cap exists to guard.
    val ex = docs.select(col("id"), explode(col("hs")).as("h"))
    val dfAgg0 = ex.groupBy("h").agg(count(lit(1)).as("c"))
    // with a budget set this aggregate feeds BOTH the gate's histogram
    // (an eager constant-output job) and the keep filter — persist it so
    // the postings explode + combine runs once, not per consumer
    val dfAgg =
      if (budget == PairBudget.Off) dfAgg0
      else scope.own(dfAgg0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cap = PairBudget.resolveCap(dfAgg, maxShingleDf, budget, op)
    val keepH = dfAgg.filter(col("c") <= cap).select("h")
    val postings = ex.join(keepH, Seq("h")).select("h", "id")

    postings.select(col("h"), col("id").as("id_a"))
      .join(postings.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(docs.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
  }

  /** Candidate-pair mass DIAGNOSTIC — the budgeting probe the r11 scaling
    * soak motivates (SCALING.md): every shingle-candidate near-dup
    * operator's cost is linear in Σ df·(df−1)/2 over shingle document
    * frequencies (the number of candidate pairs a posting join emits),
    * NOT in rows — a vocabulary-saturated corpus grows pair mass
    * quadratically while row count grows linearly. Run this BEFORE a
    * near-dup campaign: one row with (n_docs, n_shingles, pair_mass,
    * max_df); a pair_mass ≫ n_docs says raise the shingle width `n` or
    * tighten `maxShingleDf` before paying the posting join.
    *
    * Shingles are plain whitespace word n-grams (distinct per doc) so the
    * number is reproducible by any engine; [[shingleCandidates]]' hashed
    * shingles have the same df profile (the hash is per-shingle). Cost:
    * one explode + two aggregations with constant-size output — no joins,
    * no pair materialization.
    */
  def pairMassReport(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ")
    val sh = when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
    val perShingle = df
      .select(col(idCol), explode(sh).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("d"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    perShingle.agg(
      count(lit(1)).as("n_shingles"),
      // integer `div`, not `/`: float division would round the mass at
      // 2^53 pairs — a scale a 100 TB corpus's hot shingles can reach
      expr("sum(d * (d - 1)) div 2").as("pair_mass"),
      max(col("d")).as("max_df"))
      .crossJoin(nDocs) // 1×1 rows — a literal attach, not a real product
      .select(col("n_docs"), col("n_shingles"), col("pair_mass"),
        col("max_df"))
  }

  /** Test hook: the HASHED-shingle df histogram (c = document frequency,
    * n = shingles at that df) the [[PairBudget]] gate's mass arithmetic
    * runs on — lets a spec replay the gate's cap choice independently.
    */
  private[graft] def pairMassHistogramForTest(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val toks = TextHash.tokens(text)
          if (toks.isEmpty) None else Some((id, TextHash.hashedShingles(toks, md)))
        }
      }
      .toDF("id", "hs")
      .select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
  }

  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 3,
      thresholdDen: Int = 5,
      maxShingleDf: Int = 1000,
      scope: CacheScope = CacheScope.unmanaged,
      budget: PairBudget = PairBudget.Off): DataFrame =
    shingleCandidates(df, idCol, textCol, maxShingleDf, scope, budget,
      "ngramJaccardPairs")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("uni",
        (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("inter"))
      .filter(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))

  /** DIRECTIONAL containment pairs — the asymmetric near-dup measure
    * Jaccard cannot see: containment(A→B) = |A∩B| / |A| is high when A's
    * shingles mostly appear inside B even if B is far larger (a quoted
    * article inside a page, a doc embedded in a crawl dump), exactly the
    * sub-document duplication case where Jaccard(A,B) stays tiny because
    * the union is dominated by B. A pair is emitted when EITHER direction
    * reaches thresholdNum/thresholdDen; both directions are reported as
    * exact integer ppm (inter·10⁶ div |side|) so ranking needs no float.
    *
    * Same df-capped candidate machinery and scale posture as
    * [[ngramJaccardPairs]] (one pre-aggregate guard, posting join on rare
    * shingles, full-set verification join). Output: (id_a, id_b, inter,
    * n_a, n_b, cont_ab_ppm, cont_ba_ppm), id_a < id_b.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 4,
      thresholdDen: Int = 5,
      maxShingleDf: Int = 1000,
      scope: CacheScope = CacheScope.unmanaged,
      budget: PairBudget = PairBudget.Off): DataFrame =
    shingleCandidates(df, idCol, textCol, maxShingleDf, scope, budget,
      "containmentPairs")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("n_a", size(col("hs_a")).cast("long"))
      .withColumn("n_b", size(col("hs_b")).cast("long"))
      .filter(col("inter") * thresholdDen >= col("n_a") * thresholdNum ||
        col("inter") * thresholdDen >= col("n_b") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
        expr("inter * 1000000 div n_a").as("cont_ab_ppm"),
        expr("inter * 1000000 div n_b").as("cont_ba_ppm"))

  /** Connected components over a near-duplicate pair list: labels every
    * document that appears in a pair with the smallest id reachable through
    * the pair graph. This is the step that turns pairwise near-dup output
    * into actionable dedup GROUPS — keep `cluster_id` (the minimum member),
    * drop the rest — without which transitive duplicates (a≈b, b≈c but a, c
    * never a candidate pair) survive pairwise filtering.
    *
    * Implementation: iterative min-label propagation WITH pointer jumping.
    * Each round (1) joins the current labels across the bidirectional edge
    * list and takes the min of (own label, neighbors' labels), then (2) has
    * every node adopt its label's own label — since labels are always node
    * ids, this halves the remaining distance to the component minimum, so
    * the fixpoint arrives in O(log diameter) rounds instead of O(diameter)
    * (a 50-round cap covers any graph that fits on hardware; the plain
    * propagation it replaces aborted on chains longer than the cap). The
    * convergence check is FOLDED into the round itself: the aggregate
    * carries each node's previous label, and one `count` over the round's
    * checkpointed output — not an extra join+isEmpty job — detects change.
    * Labels are `localCheckpoint`ed per round so the plan (and its
    * task-retry lineage) doesn't grow with iteration count; driver state
    * stays O(1).
    *
    * Output: (doc_id, cluster_id) for every node of the pair graph.
    */
  def connectedComponents(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIterations: Int = 50): DataFrame = {
    val edges = pairs.select(col(idACol).cast("long").as("src"), col(idBCol).cast("long").as("dst"))
    // Single scan: exploding each edge into both directions in place keeps
    // the (possibly expensive) upstream pair computation to ONE evaluation;
    // a union of (edges, edges.swapped) would run it twice to fill the cache.
    val bidir = edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = bidir.groupBy(col("src").as("id")).agg(min(col("dst")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("label"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxIterations) {
      // 1. propagate: every node hears its neighbors' labels
      val heard = bidir.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
      // Own rows carry their previous label; heard rows carry +inf — the
      // same min-aggregate that merges labels also recovers prev, so change
      // detection needs no second join.
      val merged = labels.select(col("id"), col("label"), col("label").as("prev"))
        .unionByName(heard.withColumn("prev", lit(Long.MaxValue)))
        .groupBy("id").agg(min("label").as("label"), min("prev").as("prev"))
      // 2. pointer jump: adopt my label's label (labels are node ids, so the
      //    label row exists whenever the label is not already a root)
      val jumped = merged
        .join(merged.select(col("id").as("label"), col("label").as("ll")), Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"),
          col("prev"))
        .localCheckpoint()
      val changed = jumped.filter(col("label") < col("prev")).count()
      labels = jumped.select("id", "label")
      converged = changed == 0L
      round += 1
    }
    bidir.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIterations rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Benchmark decontamination: flag every corpus document that shares at
    * least one word n-gram with a benchmark/eval set — the leakage check a
    * training pipeline runs before assembly (n = 8 by default, the window
    * length commonly used so that natural phrase reuse doesn't flag).
    *
    * Both sides get ONE compiled pass producing distinct hashed n-gram sets
    * (documents shorter than n tokens carry no full n-gram and are skipped —
    * on either side). The benchmark's distinct shingles form the SMALL join
    * side: corpus postings (id, shingle-hash) inner-join it on the hash and
    * aggregate to |S_doc ∩ S_bench| per flagged doc. At scale the postings
    * explode is linear in corpus tokens (unavoidable — the op inspects every
    * n-gram once) and the join broadcasts whenever the benchmark fits under
    * the broadcast threshold (AQE decides; a benchmark suite is MBs, not
    * TBs), so no corpus-sized shuffle.
    *
    * Output: (doc_id, n_shared) for contaminated corpus docs only.
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    def shingleSets(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) =>
            val toks = TextHash.tokens(text)
            if (toks.length < n) None
            else Some((id, TextHash.hashedShingles(toks, md, n)))
          }
        }
        .toDF("id", "hs")
    }
    val benchShingles = shingleSets(benchmark)
      .select(explode(col("hs")).as("h")).distinct()
    shingleSets(corpus)
      .select(col("id"), explode(col("hs")).as("h"))
      .join(benchShingles, Seq("h"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id").as("doc_id"), col("n_shared"))
  }

  /** Per-document n-gram novelty profile: of each document's distinct word
    * n-grams, how many occur NOWHERE else in the corpus (document frequency
    * exactly 1)? High-novelty documents carry original text; low-novelty
    * ones are assembled from n-grams the corpus already contains — the
    * originality signal quality-weighted sampling and dedup triage both
    * consume. n = 8 matches [[decontaminate]]'s leak window.
    *
    * Shape for 100 TB: one compiled pass per document produces the distinct
    * hashed n-gram set (linear in corpus bytes, rides the scan); the df
    * aggregate map-side-combines to ONE row per distinct corpus n-gram
    * before its shuffle; the join back is n-gram-keyed and carries (id,
    * hash) longs only — document text never crosses an exchange — and the
    * closing aggregate is id-keyed. Documents shorter than n tokens carry
    * no full n-gram and are skipped, mirroring [[decontaminate]].
    *
    * Output: (doc_id, n_ngrams, n_unique) — the distinct n-gram count and
    * its corpus-unique subset, exact integers.
    */
  def ngramNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val postings = scope.own(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) =>
            val toks = TextHash.tokens(text)
            if (toks.length < n) Iterator.empty
            else TextHash.hashedShingles(toks, md, n).iterator.map(h => (id, h))
          }
        }
        .toDF("id", "h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = postings.groupBy("h").agg(count(lit(1)).as("df"))
    postings.join(dfreq, Seq("h"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_unique"))
      .select(col("id").as("doc_id"), col("n_ngrams"), col("n_unique"))
  }

  /** Duplicate-substring coverage profile — the diagnosis step of
    * substring-level dedup (cf. Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", which removes repeated substrings
    * a suffix array finds): for every document, how much of it lies inside
    * a duplicated token run? A positional n-token window is DUPLICATED when
    * its hash occurs at least twice corpus-wide (across documents or
    * repeated within one — both are training-time repetition); a token
    * position is COVERED when at least one duplicated window contains it.
    * Overlapping duplicated windows merge into maximal runs by construction,
    * so `n_covered` is the exact union length, never a double-counted
    * window sum — `n_covered / n_toks` is the removable-repetition
    * fraction substring dedup would reclaim.
    *
    * Shape for 100 TB: positional window hashes are one compiled pass per
    * document ([[graft.functions.TextHash.shingles]] + md5Hash60, duplicates
    * and order kept — the positional twin of [[ngramNovelty]]'s set); the
    * hot-window detector is a pre-aggregate (one row per distinct window
    * hash crosses its shuffle) joined back onto the postings, never a
    * window function over the posting list. The position explode that
    * computes the coverage union multiplies only DUPLICATED windows by n —
    * a clean corpus pays nothing; a fully-duplicated one pays n× its
    * duplicated volume, bounded and linear.
    *
    * Output: (doc_id, n_toks, n_dup_windows, n_covered); documents shorter
    * than n tokens report zero windows and zero coverage.
    */
  def duplicateSpanCoverage(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = scope.own(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.map { case (id, text) =>
            val toks = TextHash.tokens(text)
            val grams =
              if (toks.length < n) Array.empty[Long]
              else TextHash.shingles(toks, n).map(TextHash.md5Hash60(md, _))
            (id, toks.length.toLong, grams)
          }
        }
        .toDF("id", "n_toks", "hs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val pos = base.select(col("id"), posexplode(col("hs")).as(Seq("j", "h")))
    // total-occurrence threshold, NOT per-doc-distinct df: a window repeated
    // inside one document is exactly as much training-time repetition as one
    // shared across two.
    val hot = pos.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("h")
    val covered = pos.join(hot, Seq("h"))
      .select(col("id"), col("j"),
        explode(sequence(col("j"), col("j") + lit(n - 1))).as("p"))
      .groupBy("id")
      .agg(countDistinct(col("j")).as("n_dup_windows"),
        countDistinct(col("p")).as("n_covered"))
    base.select("id", "n_toks").join(covered, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_toks"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
  }

  /** Duplicate-span REMOVAL — the action step behind
    * [[duplicateSpanCoverage]]'s diagnosis (Lee et al. 2022 substring
    * dedup): drop every token position covered by a duplicated n-token
    * window (hash occurs ≥ 2 times corpus-wide, ALL copies removed — the
    * coverage profile's exact semantics) and reassemble each document
    * from its surviving tokens in order.
    *
    * The output text is the kept TOKEN STREAM rejoined with single
    * spaces — tokenizer-normalized (lowercased, punctuation/whitespace
    * folded), i.e. training-ready tokens, NOT the original raw bytes;
    * span removal is position-level, so this is the contract that makes
    * cross-engine verification exact.
    *
    * Shape for 100 TB: the hot-window detector is the same text-free
    * pre-aggregate as the coverage profile (one row per distinct window
    * hash crosses its shuffle); covered positions explode only DUPLICATED
    * windows by n; the reassembly is one id-keyed aggregate over (pos,
    * token) pairs — the only exchange that carries tokens, sized by the
    * SURVIVING volume.
    *
    * Output: (doc_id, n_toks, n_kept, text_kept); documents shorter than
    * n tokens have no window and survive whole (token-normalized).
    */
  def removeDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = scope.own(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.map { case (id, text) =>
            val toks = TextHash.tokens(text)
            val grams =
              if (toks.length < n) Array.empty[Long]
              else TextHash.shingles(toks, n).map(TextHash.md5Hash60(md, _))
            (id, toks, grams)
          }
        }
        .toDF("id", "toks", "hs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val pos = base.select(col("id"), posexplode(col("hs")).as(Seq("j", "h")))
    val hot = pos.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("h")
    val covered = pos.join(hot, Seq("h"))
      .select(col("id"),
        explode(sequence(col("j"), col("j") + lit(n - 1))).as("p"))
      .distinct()

    val kept = base
      .select(col("id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(covered, Seq("id", "p"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(sort_array(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("text_kept"))

    base.select(col("id"), size(col("toks")).cast("long").as("n_toks"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_toks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Cross-source n-gram overlap matrix: for every pair of provenance
    * sources, how many distinct word n-grams they share — the source-level
    * duplication map (mirror sites, syndicated feeds, re-scraped dumps) a
    * curation pipeline consults before setting per-source mixture weights;
    * `shared_ngrams / least(n_a, n_b)` is the exact overlap coefficient.
    * n = 8 matches [[decontaminate]].
    *
    * Shape for 100 TB: the per-source distinct shingle table is one hash
    * aggregate over the compiled shingle pass — map-side combine collapses
    * each partition's repeats, and the shuffle carries (source, hash) pairs
    * only, never text. Pair counts come from the n-gram-keyed self-join of
    * that distinct table: each n-gram contributes at most |sources|² pair
    * rows, and |sources| is small by construction (a provenance label, not
    * a key), so the join output is bounded by |sources|² × shared volume.
    * The totals join is |sources| rows — AQE broadcasts it.
    *
    * Output: (source_a, source_b, shared_ngrams, n_a, n_b) for pairs
    * sharing ≥ 1 n-gram, source_a < source_b, n_x = that source's distinct
    * n-gram count. Null sources are dropped by contract.
    */
  def sourceOverlap(
      df: DataFrame, sourceCol: String, textCol: String, n: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = scope.own(
      df.select(col(sourceCol).cast("string").as("src"), col(textCol).as("text"))
        .filter(col("src").isNotNull)
        .as[(String, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (src, text) =>
            val toks = TextHash.tokens(text)
            if (toks.length < n) Iterator.empty
            else TextHash.hashedShingles(toks, md, n).iterator.map(h => (src, h))
          }
        }
        .toDF("src", "h")
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = sh.groupBy("src").agg(count(lit(1)).as("n"))
    sh.select(col("src").as("source_a"), col("h"))
      .join(sh.select(col("src").as("source_b"), col("h")), Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_ngrams"))
      .join(totals.select(col("src").as("source_a"), col("n").as("n_a")), Seq("source_a"))
      .join(totals.select(col("src").as("source_b"), col("n").as("n_b")), Seq("source_b"))
      .select("source_a", "source_b", "shared_ngrams", "n_a", "n_b")
  }

  /** SimHash near-dup pairs: docs whose 60-bit SimHash
    * ([[TextHash.simhash60]], one compiled pass) matches on at least one of
    * four 15-bit bands (Hamming-distance blocking — two docs within Hamming
    * distance 3 share a band by pigeonhole), verified by full-fingerprint
    * Hamming distance ≤ `maxHamming`. The fingerprint is a single long, so
    * carrying it through the band join costs nothing.
    *
    * `bucketCap` drops band buckets larger than the cap before the
    * self-join (the minhash skew guard — a near-identical boilerplate
    * flood collapses to few fingerprints and would go quadratic in its
    * bucket); the default is uncapped, the historical behavior. `budget`
    * gates on Σ c·(c−1)/2 over bucket sizes like [[minhashPairs]]. With
    * both at their defaults the plan is byte-identical to before — no
    * extra aggregate or join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      scope: CacheScope = CacheScope.unmanaged,
      bucketCap: Int = Int.MaxValue,
      budget: PairBudget = PairBudget.Off): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fps = scope.own(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) => TextHash.simhash60(md, text).map(fp => (id, fp)) }
        }
        .toDF("id", "fp")
        // consumed by both band-join sides — cache one fingerprint pass
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val banded0 = fps.select(col("id"), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * 15).bitwiseAND(0x7FFFL).as("bkey"))): _*)).as("bb"))
      .select(col("id"), col("fp"), col("bb.band"), col("bb.bkey"))
    val banded =
      if (bucketCap == Int.MaxValue && budget == PairBudget.Off) banded0
      else {
        val counts0 = banded0.groupBy("band", "bkey")
          .agg(count(lit(1)).as("c"))
        val counts =
          if (budget == PairBudget.Off) counts0
          else scope.own(counts0
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val cap = PairBudget.resolveCap(counts, bucketCap, budget,
          "simhashPairs")
        banded0.join(counts.filter(col("c") <= cap).select("band", "bkey"),
          Seq("band", "bkey"))
      }

    val l = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("fp").as("fp_a"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Corpus-wide block-level exact dedup with reassembly — the CCNet /
    * RefinedWeb "remove duplicated lines across the corpus" pass. The test
    * corpus is single-line, so fixed non-overlapping `blockWords`-token
    * blocks stand in for lines; the operator is line-granular when fed a
    * corpus where blocks ARE lines.
    *
    * Only the FIRST occurrence of each distinct block survives, ordered by
    * (document id, block position); every document is then reassembled from
    * its surviving blocks in position order. Output is one row per input
    * document: `(doc_id, n_blocks, n_kept, text_kept)` — a fully-duplicated
    * document comes back with `n_kept = 0` and empty text, the usual signal
    * for a downstream drop.
    *
    * Scale shape — block TEXT crosses exactly ONE shuffle. The winner
    * election runs over a text-FREE projection (id, pos, digest): one hash
    * aggregate on the digest (map-side-combined `min(struct(id, pos))`, one
    * row per DISTINCT block crosses), one digest join back to the 16-byte
    * occurrence rows, and a per-doc `collect_set(pos)` of surviving
    * positions (bounded by a single document's block count). Only THEN do
    * the text-bearing blocks shuffle — once, by id — to meet their doc's
    * kept-position set, and the final reassembly aggregate reuses that id
    * partitioning (no second text exchange). At 100 TB the corpus bytes
    * move once; everything that moves twice is fixed-width ids. No windows
    * over the corpus, no all-pairs, no broadcast assumption, driver state
    * zero.
    */
  def dedupBlocks(df: DataFrame, idCol: String, textCol: String,
      blockWords: Int = 25): DataFrame = {
    require(blockWords > 0, s"blockWords=$blockWords must be positive")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val nb = floor((size(toks) + lit(blockWords - 1)) / lit(blockWords)).cast("int")
    // guard the empty case: sequence(0, -1) counts DOWN in Spark
    val blockArr = when(nb > 0, transform(sequence(lit(0), nb - 1),
        i => array_join(slice(toks, i * blockWords + 1, lit(blockWords)), " ")))
      .otherwise(array().cast("array<string>"))
    dedupBlockArray(df, idCol, blockArr, " ")
  }

  /** [[dedupBlocks]] at true LINE granularity — blocks are the text's
    * non-empty lines (or `sep`-separated units), the exact CCNet/RefinedWeb
    * formulation for multi-line corpora. Same semantics, scale shape and
    * output schema; surviving lines rejoin with `sep`.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    // coalesce: a NULL text must report n_blocks = 0 like dedupBlocks, not
    // a NULL count that poisons downstream three-valued comparisons
    val lines = filter(
      split(coalesce(col(textCol), lit("")), java.util.regex.Pattern.quote(sep)),
      l => l =!= "")
    dedupBlockArray(df, idCol, lines, sep)
  }

  /** Per-document winnowing fingerprints ([[TextHash.winnow]]): (id, fps).
    * Like [[minhashSignatures]] this is a persistable INDEX — fingerprints
    * are exact-match keys, so near-dup candidates are pairs sharing any fp
    * (one explode + hash join, never all-pairs), with the winnowing
    * guarantee that any shared token run of ≥ w+k−1 tokens IS caught. One
    * compiled pass per document, distributing with the scan.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, s"k=$k and w=$w must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = TextHash.tokens(text)
          // token-less docs (non-Latin script, pure punctuation, NULL text)
          // get an EMPTY fingerprint set, not the degenerate hash of "" —
          // which is identical across all such docs and would collapse
          // every unrelated token-less page into one near-dup cluster in
          // [[winnowPairs]] (the same guard minhashSignatures applies by
          // dropping; here the row survives so the index stays one row
          // per document)
          if (toks.isEmpty) (id, Array.empty[Long])
          else (id, TextHash.winnow(toks, md, k, w))
        }
      }
      .toDF("id", "fps")
  }

  /** Near-dup candidate pairs from a [[winnowFingerprints]] index: pairs
    * sharing ≥1 fingerprint, with the shared count as evidence. Fingerprints
    * more frequent than `maxFpDf` are dropped first (the boilerplate guard —
    * a site-wide footer fingerprint would otherwise pair quadratically),
    * mirroring [[ngramJaccardPairs]]' document-frequency cap. One explode +
    * one hash join on the fingerprint, never all-pairs.
    */
  def winnowPairs(fps: DataFrame, maxFpDf: Int = 1000,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(maxFpDf > 0, s"maxFpDf=$maxFpDf must be positive")
    // Persisted: the exploded index feeds BOTH the df aggregate and the
    // probe join — uncached, the (typically storage-backed) index explode
    // would run twice.
    val ex = scope.own(fps.select(col("id"), explode(col("fps")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // df guard via pre-aggregate + join (see ngramJaccardPairs: the window
    // formulation funnels the hottest fingerprint's postings through one
    // sorted partition). Persisted: both pair-join sides consume it.
    val keepFp = ex.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxFpDf)
      .select("fp")
    val keep = scope.own(ex.join(keepFp, Seq("fp"))
      .select("fp", "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    keep.select(col("fp"), col("id").as("id_a"))
      .join(keep.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
  }

  /** Exact Jaccard similarity join via PREFIX FILTERING (the AllPairs /
    * PPJoin candidate scheme, Bayardo et al. WWW'07; Xiao et al. WWW'08)
    * — the exact-similarity-join alternative to [[ngramJaccardPairs]]'s
    * df cap: instead of DROPPING ubiquitous shingles (which silently
    * loses pairs whose every shared shingle is hot), each document
    * indexes only its `|d| − ceil(τ·|d|) + 1` RAREST shingles in one
    * global (df, shingle) order. Any pair with Jaccard ≥ τ provably
    * shares a prefix shingle, so recall is 1 with no cap tuning — the
    * candidate volume concentrates on rare shingles whose posting lists
    * are short by construction.
    *
    * Shape for 100 TB: the shingle-frequency table is a pre-aggregate
    * (one row per distinct shingle crosses its shuffle); the per-doc rank
    * is a window partitioned BY DOCUMENT (bounded frames, no global
    * sort); the prefix self-join's fan-out is Σ df(h)² over PREFIX
    * postings only — boilerplate shingles sit at the END of every
    * document's order and never enter the index.
    *
    * Output: (id_a, id_b, inter, uni) — the same exact-integer contract
    * as [[ngramJaccardPairs]]; τ = thresholdNum/thresholdDen.
    */
  def prefixJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 3,
      thresholdDen: Int = 5,
      scope: CacheScope = CacheScope.unmanaged,
      budget: PairBudget = PairBudget.Off): DataFrame = {
    require(thresholdNum > 0 && thresholdDen >= thresholdNum,
      s"threshold must be in (0, 1]: $thresholdNum/$thresholdDen")
    // prefix filtering is EXACT (recall 1 by theorem) — there is no skew
    // cap to tighten without silently breaking that contract, so the only
    // budget mode is Refuse: measure the prefix-posting pair mass and stop
    // before the join. A caller who wants auto-tightening wants the capped
    // operator: ngramJaccardPairs with PairBudget.AutoTighten.
    budget match {
      case PairBudget.AutoTighten(_) => throw new IllegalArgumentException(
        "prefixJaccardPairs is exact (recall 1); AutoTighten would " +
          "silently break the prefix-filter theorem — use " +
          "PairBudget.Refuse, or ngramJaccardPairs with AutoTighten")
      case _ => ()
    }
    val spark = df.sparkSession
    import spark.implicits._
    val docs = scope.own(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) =>
            val toks = TextHash.tokens(text)
            if (toks.isEmpty) None else Some((id, TextHash.hashedShingles(toks, md)))
          }
        }
        .toDF("id", "hs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val post = docs.select(col("id"), size(col("hs")).as("sz"),
      explode(col("hs")).as("h"))
    val dfreq = post.groupBy("h").agg(count(lit(1)).as("dfreq"))
    val ranked = post.join(dfreq, Seq("h"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("dfreq"), col("h"))))
    // prefix length p = sz − ceil(τ·sz) + 1, all integer arithmetic
    val prefix0 = ranked.filter(col("rk") <=
        col("sz") - expr(s"($thresholdNum * sz + ${thresholdDen - 1}) div $thresholdDen") + 1)
      .select("h", "id")
    val prefix = budget match {
      case PairBudget.Refuse(_) =>
        // measure Σ df·(df−1)/2 over the PREFIX postings — the exact
        // candidate volume the self-join below would emit — and throw
        // before paying it when over budget. The prefix index is persisted
        // so the rank window runs once for the gate and both join sides.
        val p = scope.own(prefix0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        PairBudget.resolveCap(p.groupBy("h").agg(count(lit(1)).as("c")),
          Int.MaxValue, budget, "prefixJaccardPairs")
        p
      case _ => prefix0
    }

    val pairs = prefix.select(col("h"), col("id").as("id_a"))
      .join(prefix.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    pairs
      .join(docs.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("uni",
        (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("inter"))
      .filter(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  private def dedupBlockArray(df: DataFrame, idCol: String,
      blockArr: org.apache.spark.sql.Column, joinSep: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"), blockArr.as("blocks"))
      .withColumn("n_blocks", size(col("blocks")).cast("long"))

    val blocks = base.filter(col("n_blocks") > 0)
      .select(col("id"), posexplode(col("blocks")))
      .select(col("id"), col("pos"), md5(col("col").cast("binary")).as("digest"),
        col("col").as("block"))

    val occ = blocks.select("id", "pos", "digest")
    val winners = occ.groupBy("digest")
      .agg(min(struct(col("id"), col("pos"))).as("w"))
    val keptPos = occ.join(winners, "digest")
      .filter(struct(col("id"), col("pos")) === col("w"))
      .groupBy("id").agg(collect_set(col("pos")).as("keep"))

    val kept = blocks.join(keptPos, "id")
      .filter(array_contains(col("keep"), col("pos")))
      .groupBy("id").agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(sort_array(collect_list(struct(col("pos"), col("block")))),
          s => s.getField("block")), joinSep).as("text_kept"))

    base.join(kept, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }
}
