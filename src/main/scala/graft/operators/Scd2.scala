package graft.operators

import graft.sources.{AppendLog, ParquetTableStore, TableStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 maintenance — versioned dimension
  * rows with validity intervals, maintained incrementally from change
  * batches. The classic warehouse layout splits naturally onto this
  * engine's two store families, and the split IS the scale design:
  *
  *  - the CURRENT version of every entity lives in a keyed
  *    [[ParquetTableStore]] (pk = the business key): point lookups and
  *    the change-batch pre-image read are bucket-pruned O(batch);
  *  - CLOSED versions are immutable facts and land in a zone-mapped
  *    [[AppendLog]] (zones on `valid_to_us`): history grows append-only,
  *    one directory per change wave, and "as-of T" / audit scans prune
  *    to the directories whose closing window covers T — never a
  *    rewrite, never a full-history scan.
  *
  * Per [[apply]] batch (eff timestamp `effUs`, caller-supplied so replays
  * are deterministic):
  *
  *  1. key-unique guard on the batch (same precondition as
  *     [[MergeInto]] — two images for one key make the result
  *     order-dependent);
  *  2. keyed pre-image of the touched business keys;
  *  3. classify: CHANGED (any attribute differs, null-safe) → the prior
  *     current row closes at `effUs` into the history log and the new
  *     image becomes current with `valid_from_us = effUs`; IDENTICAL →
  *     no-op (no spurious version — the guard that keeps a chatty
  *     upstream from exploding the dimension); NEW key → first current
  *     version; DELETE (separate key frame) → prior row closes into
  *     history with no successor;
  *  4. one [[CompactedBatch]] merge applies current-side effects.
  *
  * The full SCD2 view is `history.scan() ∪ current.snapshot()` (open
  * rows carry `valid_to_us` NULL); "as of T" =
  * `history.scanWhere(valid_from_us <= T < valid_to_us)` ∪ current rows
  * with `valid_from_us <= T` — the first term rides the zone prune.
  *
  * The current store's schema must be business key + attributes +
  * `valid_from_us BIGINT`; the history log's schema adds
  * `valid_to_us BIGINT`.
  */
object Scd2 {

  final case class Stats(changed: Long, unchanged: Long, created: Long,
      deleted: Long)

  val ValidFrom = "valid_from_us"
  val ValidTo = "valid_to_us"

  /** Apply one change wave at `effUs`. `changes` carries the FULL new
    * image per business key (key + every attribute column); `deletes`
    * carries business keys only.
    */
  def apply(
      current: ParquetTableStore,
      history: AppendLog,
      changes: DataFrame,
      deletes: DataFrame,
      effUs: Long): Stats =
    apply(current, current.snapshotForKeys(_), history, changes, deletes, effUs)

  /** Store-family-agnostic form: `preImage` is the store's keyed read
    * (MOR `snapshotForKeys`, JDBC `withSnapshotForKeys`-scoped reads, …) —
    * the same explicit-pre-image contract as [[MergeInto]], because the
    * keyed-read signatures differ per family while the maintenance logic
    * does not.
    */
  def apply(
      current: TableStore,
      preImage: DataFrame => DataFrame,
      history: AppendLog,
      changes: DataFrame,
      deletes: DataFrame,
      effUs: Long): Stats = {
    val spec = current.spec
    val nk = spec.pkCols
    val attrs = spec.dataCols.filterNot(c => nk.contains(c) || c == ValidFrom)
    require(spec.dataCols.contains(ValidFrom),
      s"current store ${spec.name} must carry a $ValidFrom column")
    require(attrs.forall(c => changes.columns.exists(_.equalsIgnoreCase(c))),
      s"SCD2 change batch must carry every attribute of ${spec.name}; " +
        s"missing: ${attrs.filterNot(c => changes.columns.exists(_.equalsIgnoreCase(c))).mkString(",")}")

    val src = changes.select((nk ++ attrs).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val del = deletes.select(nk.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // BOTH wave guards in ONE job (r14: these were two separate counting
      // jobs per wave — at a store-lifecycle query's job counts the driver's
      // per-job planning time dominates the data): a key is duplicated when
      // its change-image count exceeds 1, and changed+deleted when it
      // carries both a change image and a delete marker.
      // NULL business keys: groupBy groups NULLs TOGETHER, so a null-key
      // change plus a null-key delete (or two null-key changes) now refuse
      // here — STRICTER than the r13 two-job form, whose left_semi overlap
      // check never matched NULLs. Deliberate: a NULL key also never
      // matches the pre-image equi-join below, so it could only ever
      // insert duplicate "new" rows per wave — refusing the ambiguous
      // wave up front is the honest contract (r14 advice, documented).
      val guards = src.select(nk.map(col) :+ lit(1L).as("_c") :+ lit(0L).as("_d"): _*)
        .unionByName(del.select(nk.map(col) :+ lit(0L).as("_c") :+ lit(1L).as("_d"): _*))
        .groupBy(nk.map(col): _*)
        .agg(sum(col("_c")).as("_cs"), sum(col("_d")).as("_ds"))
        .agg(max(col("_cs")).as("maxc"),
          max(when(col("_cs") > 0 && col("_ds") > 0, 1).otherwise(0)).as("both"))
        .head()
      require(guards.isNullAt(0) || guards.getLong(0) <= 1L,
        s"SCD2 change batch has duplicate business keys " +
          s"on (${nk.mkString(",")}) — one image per key per wave")
      require(guards.isNullAt(1) || guards.getInt(1) == 0,
        "a key cannot be both changed and deleted in one SCD2 wave")

      val touched = src.select(nk.map(col): _*).unionByName(del)
      val pre = preImage(touched)
        .withColumn("_scd_m", lit(1))
      val joinCond = nk.map(k => col(s"s.$k") === col(s"t.$k")).reduce(_ && _)
      val classified = src.alias("s")
        .join(pre.alias("t"), joinCond, "left")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val matched = col("t._scd_m").isNotNull
        val differs = attrs.map(c => !(col(s"s.$c") <=> col(s"t.$c")))
          .reduce(_ || _)
        val changedC = matched && differs
        val newC = !matched

        // deletes close their current row with no successor
        val deletedPre = pre.join(del, nk, "left_semi")

        val stats = {
          val r = classified.agg(
            sum(when(changedC, 1L).otherwise(0L)),
            sum(when(matched && !differs, 1L).otherwise(0L)),
            sum(when(newC, 1L).otherwise(0L))).head()
          def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
          Stats(g(0), g(1), g(2), deletedPre.count())
        }

        // history: prior images of changed keys + deleted keys, closed now
        val closing = classified.filter(changedC)
          .select((nk ++ attrs :+ ValidFrom).map(c => col(s"t.$c").as(c)): _*)
          .unionByName(deletedPre.select((nk ++ attrs :+ ValidFrom).map(col): _*))
          .withColumn(ValidTo, lit(effUs))
        // an all-no-op wave commits nothing — no empty history dirs.
        // CRASH CONTRACT (the two stores cannot commit atomically):
        // history commits FIRST, keyed by the wave's effUs, so the whole
        // wave is RE-RUNNABLE: a crash between the two commits leaves
        // closed intervals whose keys still hold the old open image
        // (fullView transiently shows both), and re-running the SAME
        // wave recomputes the identical closing set against the
        // unchanged pre-image, the keyed append skips as already
        // committed, and the current merge completes the wave. A re-run
        // AFTER both commits is a no-op end-to-end (changed keys now
        // classify as unchanged, delete keys have no pre-image — empty
        // closing, idempotent merge). Distinct waves must carry
        // distinct effUs (already required for interval sanity).
        if (stats.changed + stats.deleted > 0L)
          history.append(closing,
            Some("scd2_" + java.lang.Long.toString(effUs).replace('-', 'n')))

        // current: new versions for changed keys, first versions for new
        // keys, removal of deleted keys
        val upserts = classified.filter(changedC || newC)
          .select((nk ++ attrs).map(c => col(s"s.$c").as(c)): _*)
          .withColumn(ValidFrom, lit(effUs))
        current.merge(CompactedBatch(deletes = del, upserts = upserts))
        stats
      } finally classified.unpersist(blocking = false)
    } finally { src.unpersist(blocking = false); del.unpersist(blocking = false) }
  }

  /** The full versioned view: every closed interval plus the open
    * current rows (`valid_to_us` NULL).
    */
  def fullView(current: TableStore, history: AppendLog): DataFrame = {
    val cur = current.snapshot()
      .withColumn(ValidTo, lit(null).cast("bigint"))
    history.scan().unionByName(cur)
  }

  /** TEMPORAL fact join — each fact row picks the dimension version
    * valid at ITS OWN timestamp (`vf <= ts < vt`), the read pattern SCD2
    * exists for (late-arriving facts must see the attributes of their
    * time, not today's). One equi-join on the business key with the
    * interval residual as a join filter: Catalyst plans a shuffle/SMJ on
    * the KEY (never a range cross product), and the per-key version
    * count bounds the filter work — at 100 TB the shuffle is the same
    * one a non-versioned dimension join pays. Facts older than the
    * entity's first version (or keyless) keep a NULL dimension side
    * (left join) — dropping them silently would unbalance fact counts.
    *
    * `factKeys` maps fact column → dimension business-key column; both
    * sides are exposed under the `f`/`dim` aliases for the caller's
    * select.
    */
  def temporalJoin(
      current: TableStore,
      history: AppendLog,
      facts: DataFrame,
      factKeys: Map[String, String],
      tsUsCol: String): DataFrame = {
    require(factKeys.nonEmpty, "temporalJoin needs a fact->dimension key map")
    val dim = fullView(current, history).alias("dim")
    val f = facts.alias("f")
    val cond = factKeys.map { case (fc, nc) =>
      col(s"f.$fc") === col(s"dim.$nc")
    }.reduce(_ && _) &&
      col(s"f.$tsUsCol") >= col(s"dim.$ValidFrom") &&
      (col(s"dim.$ValidTo").isNull || col(s"f.$tsUsCol") < col(s"dim.$ValidTo"))
    f.join(dim, cond, "left")
  }

  /** Dimension as of `tUs`: closed intervals covering `tUs` (the scan
    * rides the history log's zone prune on `valid_to_us`) plus current
    * rows already valid then.
    */
  def asOf(current: TableStore, history: AppendLog, tUs: Long): DataFrame = {
    val closedAt = history
      .scanWhere(col(ValidTo) > tUs)
      .filter(col(ValidFrom) <= tUs)
    val openAt = current.snapshot().filter(col(ValidFrom) <= tUs)
      .withColumn(ValidTo, lit(null).cast("bigint"))
    closedAt.unionByName(openAt)
  }
}
