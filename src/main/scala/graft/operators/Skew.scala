package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual counterpart to AQE's
  * skew-join splitting, for when the skew is KNOWN up front (a handful of
  * hot keys owning a large fraction of the fact table — the classic
  * power-law corpus shape: one `source` domain with half the documents, one
  * `event_type` with most events).
  *
  * Why it matters at 100 TB: a shuffle hash-partitions by key, so a key with
  * 10% of a 100 TB table sends 10 TB to ONE reducer — the job runs at the
  * speed of that straggler (or OOMs it). Salting scatters each hot key
  * across `salt` sub-partitions; the other side is replicated `salt` ways so
  * every (key, salt) pair still sees the full dimension row set. Exactness:
  * each fact row carries exactly one salt value and meets exactly one
  * replica of each matching dimension row — the join multiset is unchanged.
  *
  * AQE's skew handling (enabled by default in this engine) covers
  * sort-merge-join skew adaptively; salting remains the right tool for
  * skewed AGGREGATIONS (two-stage fold) and for joins whose skew AQE cannot
  * split (e.g. a hot build side in a shuffled hash join).
  */
object Skew {

  /** Inner-join `fact` with `dim` on `keys`, scattering each fact key across
    * `salt` reducer partitions and replicating `dim` `salt` ways.
    *
    * The salt is a deterministic hash of the fact row's non-key identity
    * (all columns), so repeated runs produce identical plans and the salt is
    * uncorrelated with the join key.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!(fact.columns ++ dim.columns).contains("_graft_salt"),
      "input already has a _graft_salt column")
    val saltCol = pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salt))
    val factS = fact.withColumn("_graft_salt", saltCol)
    val dimS = dim.withColumn("_graft_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    factS.join(dimS, keys :+ "_graft_salt").drop("_graft_salt")
  }

  /** Two-stage aggregation under key skew: fold each (key, salt) group
    * map-side and in a first reduce, then combine the `salt` partials per
    * key in a second (tiny) reduce. Only works for mergeable aggregates —
    * the caller provides the partial aggs and how to combine them.
    *
    * `partials` run per (key, salt); `combine` merges the partials per key.
    * The second shuffle carries ≤ `salt` rows per key regardless of fact
    * row count — the hot key's data never converges on one reducer.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                partials: Seq[Column], combine: Seq[Column]): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!df.columns.contains("_graft_salt"),
      "input already has a _graft_salt column")
    val saltCol = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt))
    df.withColumn("_graft_salt", saltCol)
      .groupBy((keys.map(col) :+ col("_graft_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }
}
