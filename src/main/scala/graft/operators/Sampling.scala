package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing — the step between dedup/quality
  * filtering and training-set assembly: keep each stratum (language, domain,
  * source) at its own rate.
  *
  * Sampling is by KEY HASH, not RNG: a row survives iff
  * `md5Hash60(key) % 100 < rate(stratum)`. That makes the sample
  *  - reproducible across runs, engines and partitionings (no seed state to
  *    coordinate across 1000 executors, no resample on task retry);
  *  - stable under corpus growth (a surviving key keeps surviving, so
  *    incremental pipeline runs don't churn the training set);
  *  - a pure map-side filter — at 100 TB it rides the scan with zero shuffle
  *    and composes with parquet predicate/column pushdown on the stratum.
  */
object Sampling {

  /** DOMAIN SEPARATION: every operator hashes `"<domain>:" + key`, not the
    * bare key. With one shared hash, composed decisions are perfectly
    * correlated — e.g. a sampler keeping bucket < 950 followed by a
    * train/val/test split whose test range is [950, 1000) would produce an
    * EMPTY test split (survivors of the first decision can never land in
    * the second's tail range). Distinct per-operator domains make the
    * bucket streams independent while preserving every determinism /
    * growth-stability property. Oracles prepend the same literal prefix.
    */
  private def domainHash(domain: String, key: Column): Column =
    TextFunctions.domainHash(domain, key)

  /** Per-key percentage bucket in [0, 100) — md5-derived so any engine can
    * recompute membership. Bare-key primitive; the operators below use
    * their own domain-prefixed streams.
    */
  def hashBucket(key: Column): Column =
    pmod(TextFunctions.md5Hash60(key.cast("string")), lit(100L))

  /** Keep rows of stratum s at `rates(s)` percent (`defaultRate` for strata
    * not in the map), deciding by the key's hash bucket (domain "sample").
    */
  def sampleByHash(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Int],
      defaultRate: Int): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val rate = coalesce(element_at(typedLit(rates), col(stratumCol)), lit(defaultRate))
    df.filter(pmod(domainHash("sample", col(keyCol)), lit(100L)) < rate)
  }

  /** Fine-grained bucket in [0, mod) for rates that need more resolution
    * than whole percents (stratum balancing at large count ratios).
    * Bare-key primitive, see [[hashBucket]].
    */
  def hashBucketMod(key: Column, mod: Long): Column =
    pmod(TextFunctions.md5Hash60(key.cast("string")), lit(mod))

  /** Cap every group at `k` rows — the per-domain/per-source cap a
    * crawl-derived corpus needs so one hostname cannot dominate the mix.
    *
    * Keeps the k rows with the SMALLEST key hash per group (ties by id), so
    * the cap inherits [[sampleByHash]]'s determinism contract: reproducible
    * across runs/engines/partitionings, and growth-stable — a kept key is
    * only ever displaced by a smaller-hash newcomer, never by reordering.
    * The closing semi-join matches on (group, key), so a key kept in one
    * group never leaks rows into another group's cap. Keys are expected
    * unique within a group (a primary key); rows duplicating a key survive
    * or drop together with it and can overshoot the cap by their
    * multiplicity.
    *
    * Implementation rides [[graft.functions.TopKAggregator]]: every stage
    * holds ≤k entries per group (partial top-k map-side, O(k) merges), so
    * no group is ever sorted and the shuffle carries ≤k ids per (group,
    * map task) — the row_number() window formulation would sort each
    * group's full row set instead. The hash is taken mod 2^50 so its
    * double-encoded score is EXACT (2^50 < 2^53); at 60 bits the score
    * would round and the boundary ordering could disagree with an external
    * engine's exact-integer ordering.
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(k > 0, s"k must be positive, got $k")
    val kt = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(kt),
      s"capPerGroup needs an integral key column (cast to long for the " +
        s"top-k buffer); '$keyCol' is $kt")
    val topk = udaf(new graft.functions.TopKAggregator(k),
      ExpressionEncoder[graft.functions.ScoredId]())
    val kept = df
      .select(col(groupCol).as("_g"), col(keyCol).cast("long").as("_id"),
        pmod(domainHash("cap", col(keyCol)), lit(1L << 50)).as("_h"))
      .groupBy(col("_g"))
      .agg(topk(col("_id"), -col("_h").cast("double")).as("_top"))
      .select(col("_g"), explode(col("_top")).as("_e"))
      .select(col("_g"), col("_e").getField("id").as("_keep_id"))
    // <=> on the group: a NULL group is still a group to cap — a plain ===
    // would never match NULL = NULL and silently drop the whole null group
    df.join(kept, df(groupCol) <=> kept("_g") &&
      df(keyCol).cast("long") === kept("_keep_id"), "left_semi")
  }

  /** Balance the mixture: downsample every stratum to (approximately) the
    * size of the SMALLEST one — the equalizing step when one language or
    * source dominates a corpus and would swamp the training mix.
    *
    * One tiny aggregate (bounded by the stratum count, collected to the
    * driver like the reference collects table maps) computes per-stratum
    * counts n_s and the floor t = min(n_s); a row of stratum s then survives
    * iff `bucket(key) · n_s < t · B` — an integer comparison both engines
    * evaluate exactly, accepting ≈ t/n_s of the stratum. Same determinism
    * contract as [[sampleByHash]]: reproducible, growth-stable, and after
    * the one count job a pure map-side filter (zero shuffle on the data
    * path). Bounds: bucket < B = 10⁶ and counts ≤ ~10¹² keep both products
    * under 2⁶³.
    */
  def balanceStrata(df: DataFrame, keyCol: String, stratumCol: String): DataFrame = {
    val B = 1000000L
    // NULL strata count as their own stratum via a sentinel — a literal map
    // cannot carry a null key, and dropping null-stratum rows silently
    // would be a correctness trap. The NUL prefix (written as an escape so
    // the source file stays text, not binary) cannot collide with a genuine
    // stratum string; [[temperatureMix]] uses the same sentinel.
    val NullKey = "\u0000<null>"
    val stratum = coalesce(col(stratumCol).cast("string"), lit(NullKey))
    val counts = df.groupBy(stratum.as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) df
    else {
      val t = counts.values.min
      val n = element_at(typedLit(counts), stratum)
      df.filter(pmod(domainHash("balance", col(keyCol)), lit(B)) * n < lit(t) * lit(B))
    }
  }

  /** Deterministic train/validation/test assignment — the canonical split
    * step before training: each key's hash bucket (per-mille) lands in one
    * named range, so membership is reproducible across runs/engines,
    * leak-free by construction (a key can never change split), and stable
    * under corpus growth — exactly the [[sampleByHash]] contract, emitted
    * as a column instead of a filter. Pure map-side expression.
    *
    * `splits` are (name, per-mille) pairs summing to 1000, assigned in
    * order: `Seq(("train", 980), ("val", 10), ("test", 10))`.
    */
  def splitByHash(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "each split needs a positive per-mille share")
    require(splits.map(_._2).sum == 1000,
      s"split shares must sum to 1000 per-mille, got ${splits.map(_._2).sum}")
    // a NULL key would null every comparison and leak a NULL split —
    // violate the total-assignment contract loudly instead
    val bucket = when(col(keyCol).isNotNull,
      pmod(domainHash("split", col(keyCol)), lit(1000L)))
      .otherwise(raise_error(lit(s"splitByHash: null key in column $keyCol")))
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    // innermost-out CASE chain: bucket < cut1 → name1, else < cut2 → name2…
    val assigned = splits.zip(cuts).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Temperature-based mixture sampling — the standard multilingual /
    * multi-source α-mix: the kept volume of stratum s is ∝ count(s)^alpha,
    * flattening the head without equalizing ([[balanceStrata]] is the
    * α → 0 extreme; the raw mix is α = 1). The smallest stratum keeps 100%
    * and stratum s keeps ⌊1000·(min_count/count_s)^(1−α)⌋ per-mille of its
    * rows, decided by the key's hash bucket — so the sample inherits
    * [[sampleByHash]]'s reproducibility/growth-stability contract.
    *
    * Unlike [[balanceStrata]] nothing collects to the driver: the
    * per-stratum rates are a tiny aggregate broadcast back onto the rows,
    * so the operator is one map-side-combined count plus a broadcast-join
    * filter riding the scan — strata cardinality can grow without driver
    * involvement.
    *
    * α = 0.5 (the common choice) computes via `sqrt`, which IEEE 754
    * specifies exactly — any engine reproduces the cut bit-for-bit; other
    * α go through `pow`, whose ulp error is engine-specific (fine for
    * production, not for cross-engine hash verification).
    */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha=$alpha must be in [0, 1]")
    // NULL strata ride a sentinel (same trap balanceStrata documents: an
    // inner equi-join never matches NULL = NULL, silently dropping rows)
    val NullKey = "\u0000<null>"
    val stratum = coalesce(col(stratumCol).cast("string"), lit(NullKey))
    val tagged = df.withColumn("_stratum", stratum)
    val counts = tagged.groupBy(col("_stratum")).agg(count(lit(1)).as("cnt"))
    val minc = counts.agg(min(col("cnt")).as("min_cnt"))
    val ratio = col("min_cnt").cast("double") / col("cnt").cast("double")
    val factor = // (min/cnt)^(1-alpha), exact-reproducible path for α = ½
      if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(minc))
      .select(col("_stratum"),
        greatest(floor(lit(1000000.0) * factor), lit(1L)).cast("long").as("ppm"))
    tagged.join(broadcast(rates), Seq("_stratum"))
      .filter(pmod(domainHash("temp", col(keyCol)), lit(1000000L)) < col("ppm"))
      .drop("ppm", "_stratum")
  }
}
