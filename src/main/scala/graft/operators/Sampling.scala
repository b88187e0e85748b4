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

  /** Per-key percentage bucket in [0, 100) — md5-derived so any engine can
    * recompute membership.
    */
  def hashBucket(key: Column): Column =
    pmod(TextFunctions.md5Hash60(key.cast("string")), lit(100L))

  /** Keep rows of stratum s at `rates(s)` percent (`defaultRate` for strata
    * not in the map), deciding by the key's hash bucket.
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
    df.filter(hashBucket(col(keyCol)) < rate)
  }

  /** Fine-grained bucket in [0, mod) for rates that need more resolution
    * than whole percents (stratum balancing at large count ratios).
    */
  def hashBucketMod(key: Column, mod: Long): Column =
    pmod(TextFunctions.md5Hash60(key.cast("string")), lit(mod))

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
    val counts = df.groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) df
    else {
      val t = counts.values.min
      val n = element_at(typedLit(counts), col(stratumCol))
      df.filter(hashBucketMod(col(keyCol), B) * n < lit(t) * lit(B))
    }
  }
}
