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
    * The salt mixes a row-position component (`monotonically_increasing_id`,
    * stable for a deterministic input) into the column hash so that even
    * FULLY IDENTICAL fact rows scatter — a hot key whose rows are exact
    * duplicates is the common worst case (keys-only fact tables, repeated
    * measurements), and a purely value-derived salt would send all of them
    * to one reducer, silently reintroducing the straggler this operator
    * exists to remove. The salt value never affects the join RESULT (every
    * (key, salt) replica carries the full dim row set for the key), only
    * the partitioning.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!(fact.columns ++ dim.columns).contains("_graft_salt"),
      "input already has a _graft_salt column")
    val factS = fact.withColumn("_graft_salt", rowSalt(fact, salt))
    val dimS = dim.withColumn("_graft_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    factS.join(dimS, keys :+ "_graft_salt").drop("_graft_salt")
  }

  /** Per-row salt in [0, salt): column hash mixed with the row's position
    * so identical rows still spread. */
  private def rowSalt(df: DataFrame, salt: Int): Column =
    pmod(xxhash64((df.columns.map(col) :+ monotonically_increasing_id())
      .toIndexedSeq: _*), lit(salt))

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
    df.withColumn("_graft_salt", rowSalt(df, salt))
      .groupBy((keys.map(col) :+ col("_graft_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }
}
