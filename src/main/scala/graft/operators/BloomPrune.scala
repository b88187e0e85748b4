package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the standard big-join reduction at
  * warehouse scale (the same shape Catalyst's own runtime row-level filter
  * injects for shuffle joins; reference delegates all joins to Greenplum,
  * which relies on the analogous bitmap/index semi-join, cf. the forced
  * index-nested-loop delete plan, Bireme.java:155-160 / SURVEY §2.1 X4).
  *
  * Why it matters at 100 TB: a plain semi-join shuffles EVERY fact row on the
  * join key before any can be discarded. Building a bloom filter over the
  * (much smaller) filtered key side and probing it on the fact side drops
  * non-matching rows AT THE SCAN, before the exchange — the shuffle then
  * carries only candidate rows (true matches + the bloom's false-positive
  * fraction). The final exact semi-join runs over that reduced input, so the
  * result is EXACT regardless of false positives.
  *
  * Mechanics: the filter is built by a distributed `BloomFilterAggregate`
  * (partial blooms built map-side, OR-merged — one ~numBits/8-byte binary
  * reaches the driver, bounded by construction), then re-enters the probe
  * plan as a `Literal` so `BloomFilterMightContain` rides the fact scan
  * inside whole-stage codegen. Both expressions hash with `XxHash64`, the
  * codegen'd 64-bit hash the runtime filter framework itself uses — no UDF,
  * no boxing.
  */
object BloomPrune {

  /** `large` rows whose `largeKey` might be in `small`'s `smallKey` set —
    * a superset of the true semi-join (bloom false positives included).
    * `expectedItems` sizes the filter (bits ≈ items × 8 at the default FPP);
    * oversizing is cheap (1 M keys ≈ 1 MiB).
    */
  def mightMatch(large: DataFrame, largeKey: Column,
                 small: DataFrame, smallKey: Column,
                 expectedItems: Long = 1000000L): DataFrame = {
    // XxHash64 finalizes IntegerType and LongType (etc.) DIFFERENTLY: a
    // type-mismatched key pair would build the bloom from one hash family
    // and probe with another, silently dropping virtually every true match
    // at the scan while the closing semi-join's implicit cast still
    // "works" — near-empty results with no error. Fail loudly instead.
    val (lt, rt) = (ColumnBridge.expression(largeKey).dataType,
      ColumnBridge.expression(smallKey).dataType)
    require(lt == rt,
      s"bloom prune keys must share one data type (hash families differ): " +
        s"large is $lt, small is $rt — cast one side first")
    val build = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(smallKey))), expectedItems)
      .toAggregateExpression()
    val bloom = small.select(ColumnBridge.column(build)).head().getAs[Array[Byte]](0)
    // An empty build side yields a null bloom — nothing can match.
    if (bloom == null) return large.limit(0)
    val probe = BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(largeKey))))
    large.filter(ColumnBridge.column(probe))
  }

  /** Exact semi-join with bloom pre-pruning: prune `large` at the scan, then
    * close the false positives with a real `left_semi` on the reduced input.
    *
    * The small side's key projection is persisted under `scope` across its
    * two consumers (the eager bloom-build job inside [[mightMatch]] — note
    * that job runs at CONSTRUCTION time, not first action — and the closing
    * semi-join); an expensive filtered build subquery would otherwise
    * execute twice.
    */
  def semiJoin(large: DataFrame, largeKey: String,
               small: DataFrame, smallKey: String,
               expectedItems: Long = 1000000L,
               scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val keys = scope.own(small.select(small(smallKey))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pruned = mightMatch(large, large(largeKey), keys, keys(smallKey), expectedItems)
    pruned.join(keys, pruned(largeKey) === keys(smallKey), "left_semi")
  }
}
