package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
  * SALT DETERMINISM (correctness under task retry): by default the salt is
  * derived ONLY from row content, so a re-executed map task reproduces the
  * identical salt for every row — safe even when the salted frame sits on
  * top of a shuffle whose intra-partition row order varies across attempts
  * (the SPARK-23207 corruption shape: a position-derived key plus a fetch
  * failure re-buckets rows between attempts, double-counting some and
  * dropping others). The cost: rows that are EXACT duplicates across every
  * hashed column share one salt and do not spread. If the hot key's rows
  * really are full duplicates (keys-only fact tables), either pre-aggregate
  * them first (the better pipeline anyway) or pass
  * `spreadDuplicates = true`, which mixes the row position
  * (`monotonically_increasing_id`) into the salt — deterministic ONLY over
  * deterministic inputs (a file scan with fixed splits), so reserve it for
  * frames read directly from storage.
  *
  * AQE's skew handling (enabled by default in this engine) covers
  * sort-merge-join skew adaptively; salting remains the right tool for
  * skewed AGGREGATIONS (two-stage fold) and for joins whose skew AQE cannot
  * split (e.g. a hot build side in a shuffled hash join).
  */
object Skew {

  /** Inner-join `fact` with `dim` on `keys`, scattering each fact key across
    * `salt` reducer partitions and replicating `dim` `salt` ways. The salt
    * value never affects the join RESULT (every (key, salt) replica carries
    * the full dim row set for the key), only the partitioning.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int, spreadDuplicates: Boolean = false): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!(fact.columns ++ dim.columns).contains("_graft_salt"),
      "input already has a _graft_salt column")
    val factS = fact.withColumn("_graft_salt", rowSalt(fact, salt, spreadDuplicates))
    val dimS = dim.withColumn("_graft_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    factS.join(dimS, keys :+ "_graft_salt").drop("_graft_salt")
  }

  /** xxhash64 rejects MapType anywhere in a column's type — skip such
    * columns when deriving the content salt. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** Per-row salt in [0, salt) — see the determinism contract above. */
  private def rowSalt(df: DataFrame, salt: Int, spreadDuplicates: Boolean): Column = {
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val parts =
      if (spreadDuplicates) cols :+ monotonically_increasing_id()
      else if (cols.nonEmpty) cols
      // every column is a map: position is the only distinguisher left
      else IndexedSeq(monotonically_increasing_id())
    pmod(xxhash64(parts: _*), lit(salt.toLong))
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
                partials: Seq[Column], combine: Seq[Column],
                spreadDuplicates: Boolean = false): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!df.columns.contains("_graft_salt"),
      "input already has a _graft_salt column")
    df.withColumn("_graft_salt", rowSalt(df, salt, spreadDuplicates))
      .groupBy((keys.map(col) :+ col("_graft_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Hot-key profile of a would-be shuffle key: the top `topK` keys by row
    * count with each key's parts-per-million share — the measurement that
    * DECIDES whether [[saltedJoin]]/[[saltedAgg]] (or a broadcast) is
    * needed, instead of guessing. Share is exact integer ppm (cnt·10^6 div
    * total — cnt ≤ 10^12 rows keeps the product inside int64).
    *
    * Scale shape: one map-side-combined count per key, then a global top-k
    * (TakeOrdered — per-partition heads, never a full sort); the one-row
    * total is a broadcast cross join, not a window over all keys (a
    * single-partition window would funnel every key through one task). The
    * per-key counts feed BOTH the total and the ranked output, so they are
    * persisted under the caller's [[CacheScope]] — without it the raw scan
    * and count aggregate run twice (once per branch of the cross join).
    */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int = 10,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = scope.own(df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val total = counts.agg(sum(col("cnt")).as("_total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), expr("cnt * 1000000 div _total").as("ppm"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }
}
