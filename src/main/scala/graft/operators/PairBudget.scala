package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-pair budget policy for the posting-join near-dup operators
  * ([[Dedup.ngramJaccardPairs]], [[Dedup.containmentPairs]],
  * [[Dedup.minhashPairs]], [[Dedup.simhashPairs]],
  * [[Dedup.prefixJaccardPairs]], [[Similarity.cosinePairs]]) — the
  * automatic form of the [[Dedup.pairMassReport]] diagnostic.
  *
  * Why it exists (SCALING.md, r11): these operators' cost is linear in
  * the CANDIDATE-PAIR MASS Σ c·(c−1)/2 over posting-unit sizes (shingle
  * document frequencies, LSH bucket sizes), not in rows. On an
  * open-vocabulary corpus the mass tracks corpus size (Heaps' law keeps
  * df sparse); on a vocabulary-saturated one it grows QUADRATICALLY — the
  * measured sf0.1→sf1 soak saw 98× pairs for 10× docs, turning a
  * minutes-scale campaign into days at 100×. The only defense before this
  * gate was running the pairMassReport probe BY HAND. With a budget set,
  * the operator measures the mass from the posting-size aggregate it
  * already materializes (one extra constant-output aggregation, no pair
  * materialization) and acts BEFORE paying the posting join.
  *
  * Modes:
  *  - [[PairBudget.Off]] — no gate (default; the pre-r12 behavior).
  *  - [[PairBudget.Refuse]] — throw [[PairBudgetExceededException]]
  *    carrying the measured report when the mass under the operator's
  *    configured skew cap exceeds `maxPairs`. The campaign driver decides
  *    (raise shingle width, partition the corpus, accept a tighter cap).
  *  - [[PairBudget.AutoTighten]] — lower the operator's skew cap
  *    (`maxShingleDf` / `bucketCap`) to the LARGEST value whose
  *    cumulative mass fits `maxPairs`, log the decision loudly, and
  *    proceed. Recall degrades exactly as if the caller had passed the
  *    tightened cap — the trade every LSH/df-cap operator already makes,
  *    now budget-driven instead of guessed.
  */
sealed trait PairBudget
object PairBudget {
  case object Off extends PairBudget
  final case class Refuse(maxPairs: Long) extends PairBudget {
    require(maxPairs >= 0, s"maxPairs=$maxPairs must be non-negative")
  }
  final case class AutoTighten(maxPairs: Long) extends PairBudget {
    require(maxPairs >= 0, s"maxPairs=$maxPairs must be non-negative")
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Resolve the EFFECTIVE skew cap for one gated operator run.
    *
    * `counts` is the operator's own posting-size aggregate — one row per
    * posting unit (shingle / band bucket) with a long column `c` (unit
    * size); the caller materializes it anyway to apply its cap, so the
    * gate adds one histogram aggregation with constant-size output, never
    * a pair materialization. The histogram (one row per DISTINCT size)
    * is where the cumulative-mass window runs: its single-partition sort
    * is bounded by the number of distinct unit sizes — thousands at any
    * corpus scale, not units.
    *
    * Mass arithmetic carries 2·mass = Σ n·c·(c−1) in decimal(38,0): the
    * per-unit product alone overflows a long once a unit holds > 3×10⁹
    * members, a size a 100 TB corpus's hottest boilerplate shingle can
    * reach — and an overflow here would silently wave a quadratic
    * campaign through the gate.
    *
    * Returns the cap to use: `configured` when the mass fits (or the
    * budget is Off); the largest tightened cap whose cumulative mass fits
    * under AutoTighten (≥ 1 — size-1 units carry zero pairs, so 1 always
    * fits); throws [[PairBudgetExceededException]] under Refuse.
    */
  private[graft] def resolveCap(counts: DataFrame, configured: Int,
      budget: PairBudget, op: String): Int = {
    val limit = budget match {
      case Off => return configured
      case Refuse(m) => m
      case AutoTighten(m) => m
    }
    import org.apache.spark.sql.expressions.Window
    val hist = counts
      .filter(col("c") >= 2 && col("c") <= configured)
      .groupBy("c").agg(count(lit(1)).as("n"))
    // 2·mass per size, then cumulative smallest-size-first
    val m2 = hist.withColumn("m2",
      col("n").cast("decimal(38,0)") * col("c") * (col("c") - 1))
    val cum = m2.withColumn("cm2",
      sum(col("m2")).over(Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val r = cum.agg(
      sum(col("m2")).as("total2"),
      max(when(col("cm2") <= lit(limit).cast("decimal(38,0)") * 2,
        col("c"))).as("fit"),
      max(col("c")).as("maxc")).head()
    if (r.isNullAt(0)) return configured // no unit of size ≥ 2: zero mass
    val total2 = r.getDecimal(0).toBigInteger
    val mass = BigInt(total2) / 2
    if (mass <= BigInt(limit)) return configured
    val tightened = if (r.isNullAt(1)) 1 else r.getLong(1).toInt
    val maxC = r.getLong(2)
    budget match {
      case Refuse(_) =>
        throw new PairBudgetExceededException(op, mass, limit, configured,
          maxC, tightened)
      case AutoTighten(_) =>
        log.warn(s"[$op] candidate-pair budget: mass $mass under cap " +
          s"$configured exceeds budget $limit (hottest unit: $maxC " +
          s"members) — tightening cap to $tightened; recall degrades as " +
          "if the caller had configured that cap")
        tightened
      case Off => configured // unreachable
    }
  }

  /** [[resolveCap]]'s CROSS-join twin, for the batch-against-index
    * operators ([[Dedup.minhashPairsAgainstIndex]]): there the candidate
    * volume of a bucket is `n·m` (batch postings × index postings), not
    * `c·(c−1)/2`, and the skew cap drops whole buckets by their INDEX
    * size. `counts` carries one row per touched bucket with `c` (index
    * size) and `n` (batch size); the histogram groups buckets by index
    * size with Σn per size, so the cumulative window is again bounded by
    * distinct sizes. Mass is exact decimal(38,0) (no halving — cross
    * pairs are not double-counted). Semantics mirror [[resolveCap]]:
    * Off/fits → `configured`; AutoTighten → largest index-size cap whose
    * cumulative mass fits (≥ 0 — a cap of 0 means even size-1 buckets
    * blow the budget, and the operator then emits nothing, loudly);
    * Refuse → throw with the report.
    */
  private[graft] def resolveCapCross(counts: DataFrame, configured: Int,
      budget: PairBudget, op: String): Int = {
    val limit = budget match {
      case Off => return configured
      case Refuse(m) => m
      case AutoTighten(m) => m
    }
    import org.apache.spark.sql.expressions.Window
    val hist = counts
      .filter(col("c") >= 1 && col("c") <= configured && col("n") >= 1)
      .groupBy("c").agg(sum(col("n")).as("sn"))
    val m1 = hist.withColumn("m",
      col("sn").cast("decimal(38,0)") * col("c"))
    val cum = m1.withColumn("cm",
      sum(col("m")).over(Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val r = cum.agg(
      sum(col("m")).as("total"),
      max(when(col("cm") <= lit(limit).cast("decimal(38,0)"), col("c")))
        .as("fit"),
      max(col("c")).as("maxc")).head()
    if (r.isNullAt(0)) return configured // no touched bucket: zero mass
    val mass = BigInt(r.getDecimal(0).toBigInteger)
    if (mass <= BigInt(limit)) return configured
    val tightened = if (r.isNullAt(1)) 0 else r.getLong(1).toInt
    val maxC = r.getLong(2)
    budget match {
      case Refuse(_) =>
        throw new PairBudgetExceededException(op, mass, limit, configured,
          maxC, tightened)
      case AutoTighten(_) =>
        log.warn(s"[$op] candidate-pair budget (cross): mass $mass under " +
          s"index-bucket cap $configured exceeds budget $limit (hottest " +
          s"bucket: $maxC index members) — tightening cap to $tightened")
        tightened
      case Off => configured // unreachable
    }
  }
}

/** Thrown by [[PairBudget.Refuse]]: the q227-style report as an error —
  * the measured candidate-pair mass under the operator's configured cap,
  * the budget it exceeds, the hottest posting unit, and the cap that
  * WOULD fit (what [[PairBudget.AutoTighten]] would choose).
  */
final class PairBudgetExceededException(
    val op: String,
    val pairMass: BigInt,
    val budget: Long,
    val configuredCap: Int,
    val maxUnitSize: Long,
    val fittingCap: Int)
  extends RuntimeException(
    s"$op: candidate-pair mass $pairMass under cap $configuredCap exceeds " +
      s"the budget of $budget pairs (hottest posting unit: $maxUnitSize " +
      s"members). Raise the shingle width, partition the corpus, raise the " +
      s"budget, or tighten the cap to $fittingCap (what " +
      s"PairBudget.AutoTighten($budget) would do).")
