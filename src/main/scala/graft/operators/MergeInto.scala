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
    *
    * `insertSet` (optional): target-column name → expression computing the
    * INSERTED value from the source row (`s.` references only — a
    * not-matched pair has no target row to read). Columns absent from the
    * map insert their same-named source column (the identity mapping, the
    * pre-r14 behavior). With a non-empty `insertSet`, a target column may
    * be missing from the source ENTIRELY as long as the map covers it —
    * the warehouse MERGE shape where the source is not schema-identical
    * to the target (`INSERT (pk, bal) VALUES (s.pk, s.bal * 1.1)`).
    */
  def apply(
      store: TableStore,
      preImage: DataFrame => DataFrame,
      source: DataFrame,
      whenMatchedDelete: Option[Column] = None,
      whenMatchedUpdate: Option[Update] = None,
      whenNotMatchedInsert: Option[Column] = None,
      insertSet: Map[String, Column] = Map.empty): Stats = {
    val spec = store.spec
    val pk = spec.pkCols
    val dataCols = spec.dataCols
    def inSource(c: String) = source.columns.exists(_.equalsIgnoreCase(c))
    def inSet(c: String) = insertSet.keys.exists(_.equalsIgnoreCase(c))
    // keys must ride the source as columns (the classification join and
    // the delete clause read them); non-key columns may instead be
    // covered by an insertSet expression when inserts are the only
    // consumer that needs them
    require(pk.forall(inSource),
      s"MERGE source must carry the key columns of ${spec.name}; missing: " +
        pk.filterNot(inSource).mkString(","))
    // inserted columns take insertSet else s.<c> — only that fallback
    // requires the source column structurally (UPDATE SET expressions
    // name their s./t. references explicitly and fail analysis loudly
    // if the source lacks one; unset columns keep t.<c>)
    val needed = dataCols.filter(c =>
      whenNotMatchedInsert.nonEmpty && !inSet(c))
    require(needed.forall(inSource),
      s"MERGE source must carry every column of ${spec.name} not covered " +
        s"by insertSet; missing: ${needed.filterNot(inSource).mkString(",")}")

    // carry the full source row (insertSet/SET expressions may reference
    // any source column, not only the target-schema ones)
    val src = source
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

        // computed SET/INSERT expressions cast to the DECLARED column
        // type: the upsert union and the parquet write must carry the
        // store's schema exactly (an uncast double SET on a decimal
        // column would otherwise widen the union and drift the files)
        def declared(c: String) = spec.schema(
          spec.schema.fieldNames.find(_.equalsIgnoreCase(c)).get).dataType
        val deletes = classified.filter(delC)
          .select(pk.map(k => col(s"s.$k").as(k)): _*)
        val updates = whenMatchedUpdate match {
          case Some(u) => classified.filter(updC).select(dataCols.map { c =>
            u.set.collectFirst {
              case (n, e) if n.equalsIgnoreCase(c) => e.cast(declared(c)).as(c)
            }.getOrElse(col(s"t.$c").as(c))
          }: _*)
          case None => store.snapshot().limit(0).select(dataCols.map(col): _*)
        }
        val inserts = classified.filter(insC)
          .select(dataCols.map { c =>
            insertSet.collectFirst {
              case (n, e) if n.equalsIgnoreCase(c) => e.cast(declared(c)).as(c)
            }.getOrElse(col(s"s.$c").as(c))
          }: _*)

        val upserts = updates.unionByName(inserts)
        // a computed-KEY insert (insertSet covering a pk column) can map
        // two distinct source keys onto one inserted key — or onto a
        // matched-and-updated key — making the upsert order-dependent;
        // refuse exactly like source duplicates. (An inserted key that
        // exists in the TARGET outside the matched set upserts over it —
        // the engine-wide INSERT contract, same as GraftInsertCommand.)
        // The check is one extra aggregate, paid only in the computed-key
        // case; identity inserts inherit uniqueness from the source check.
        if (insertSet.keys.exists(k => pk.exists(_.equalsIgnoreCase(k)))) {
          val keyDups = upserts.groupBy(pk.map(col): _*).count()
            .filter(col("count") > 1).limit(1).count()
          require(keyDups == 0L,
            s"MERGE computed INSERT keys collide on (${pk.mkString(",")}) — " +
              "the upsert result would depend on row order")
        }
        store.merge(CompactedBatch(deletes = deletes, upserts = upserts))
        stats
      } finally classified.unpersist(blocking = false)
    } finally src.unpersist(blocking = false)
  }
}
