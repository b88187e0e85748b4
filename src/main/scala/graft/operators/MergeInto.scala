package graft.operators

import graft.sources.TableStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General conditional MERGE — the lakehouse `MERGE INTO` statement over
  * the engine's keyed stores, compiled down to the SAME compacted-batch
  * machinery every CDC apply path uses. The reference exposes upsert
  * through its loaders (ChangeLoader's delete+copy cycle,
  * reference: ChangeLoader.java:340-468); MERGE generalizes it to
  * caller-supplied clause conditions:
  *
  *   WHEN MATCHED AND <cond> THEN DELETE
  *   WHEN MATCHED AND <cond> THEN UPDATE SET col = expr, ...
  *   WHEN NOT MATCHED AND <cond> THEN INSERT *
  *
  * Clause semantics follow SQL MERGE: for a matched (source, target) pair
  * the DELETE clause is evaluated first, then UPDATE (first true clause
  * wins, the rest are skipped); a matched pair passing neither is left
  * untouched, and a NULL condition counts as false. Conditions and SET
  * expressions may reference both sides — source columns as `s.<col>`,
  * target (pre-image) columns as `t.<col>`.
  *
  * Scale contract: cost is O(source batch), never O(table) —
  *
  *  1. the pre-image resolves through the store's KEYED read
  *     (`snapshotForKeys` / staged-EXISTS on JDBC): only buckets that can
  *     contain a source key are opened;
  *  2. classification is ONE left join of the source against that bounded
  *     pre-image (broadcast under the store's own key-count guards);
  *  3. the apply is one [[CompactedBatch]] merge — bucket-pruned CoW /
  *     MOR delta append / warehouse transaction, whatever the store is.
  *
  * Rows of the TARGET absent from the source are never read, classified,
  * or rewritten beyond their bucket's CoW amplification.
  *
  * The source must be key-unique (standard MERGE precondition — two
  * source rows hitting one target row make the result order-dependent);
  * violated, this fails loudly with the offending count rather than
  * applying either row.
  */
object MergeInto {

  /** WHEN MATCHED AND `condition` THEN UPDATE SET `set` (target-column
    * name → expression over `s.`/`t.`). Columns not in `set` keep their
    * pre-image value.
    */
  final case class Update(condition: Column, set: Map[String, Column])

  /** Per-clause row counts of one merge application (one aggregate over
    * the classified join — driver-side constant state).
    */
  final case class Stats(matched: Long, deleted: Long, updated: Long,
      inserted: Long)

  /** Execute the merge against `store`. `preImage` is the store's keyed
    * read (pass `store.snapshotForKeys` — kept explicit because the
    * keyed-read signatures differ per store family). `insertWhenNotMatched`
    * None disables inserts; `Some(lit(true))` is the unconditional form.
    */
  def apply(
      store: TableStore,
      preImage: DataFrame => DataFrame,
      source: DataFrame,
      whenMatchedDelete: Option[Column] = None,
      whenMatchedUpdate: Option[Update] = None,
      whenNotMatchedInsert: Option[Column] = None): Stats = {
    val spec = store.spec
    val pk = spec.pkCols
    val dataCols = spec.dataCols
    require(dataCols.forall(c => source.columns.exists(_.equalsIgnoreCase(c))),
      s"MERGE source must carry every column of ${spec.name}; missing: " +
        dataCols.filterNot(c => source.columns.exists(_.equalsIgnoreCase(c)))
          .mkString(","))

    val src = source.select(dataCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dups = src.groupBy(pk.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count()
      require(dups == 0L,
        s"MERGE source has duplicate keys on (${pk.mkString(",")}) — " +
          "the result would depend on row order; deduplicate (e.g. " +
          "Compaction.compact for CDC streams) before merging")

      // keyed pre-image: O(source), bucket/stage-pruned by the store
      val pre = preImage(src.select(pk.map(col): _*))
        .withColumn("_graft_m", lit(1))
      val joinCond = pk.map(k => col(s"s.$k") === col(s"t.$k")).reduce(_ && _)
      val classified = src.alias("s")
        .join(pre.alias("t"), joinCond, "left")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val matched = col("t._graft_m").isNotNull
        val delC = whenMatchedDelete
          .map(c => matched && coalesce(c, lit(false)))
          .getOrElse(lit(false))
        val updC = whenMatchedUpdate
          .map(u => matched && !delC && coalesce(u.condition, lit(false)))
          .getOrElse(lit(false))
        val insC = whenNotMatchedInsert
          .map(c => !matched && coalesce(c, lit(false)))
          .getOrElse(lit(false))

        val stats = {
          val r = classified.agg(
            sum(when(matched, 1L).otherwise(0L)).as("m"),
            sum(when(delC, 1L).otherwise(0L)).as("d"),
            sum(when(updC, 1L).otherwise(0L)).as("u"),
            sum(when(insC, 1L).otherwise(0L)).as("i")).head()
          def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
          Stats(g(0), g(1), g(2), g(3))
        }

        val deletes = classified.filter(delC)
          .select(pk.map(k => col(s"s.$k").as(k)): _*)
        val updates = whenMatchedUpdate match {
          case Some(u) => classified.filter(updC).select(dataCols.map { c =>
            u.set.collectFirst {
              case (n, e) if n.equalsIgnoreCase(c) => e.as(c)
            }.getOrElse(col(s"t.$c").as(c))
          }: _*)
          case None => store.snapshot().limit(0).select(dataCols.map(col): _*)
        }
        val inserts = classified.filter(insC)
          .select(dataCols.map(c => col(s"s.$c").as(c)): _*)

        store.merge(CompactedBatch(
          deletes = deletes,
          upserts = updates.unionByName(inserts)))
        stats
      } finally classified.unpersist(blocking = false)
    } finally src.unpersist(blocking = false)
  }
}
