package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic packing of weighted rows (documents × token counts) into
  * fixed-budget shards — the training-set assembly step after dedup /
  * filtering / sampling: shard s holds the documents whose cumulative token
  * count starts in [s·budget, (s+1)·budget).
  *
  * The global order is (md5 key-hash, id): content-independent, reproducible
  * across runs and engines, and uniformly shuffled so shards mix sources.
  *
  * The prefix sum is a SEGMENTED two-phase scan — NOT a global
  * `Window.orderBy` (which Spark executes in ONE partition, the classic
  * 100 TB killer):
  *   1. each row lands in a deterministic segment = the high bits of its
  *      md5 key-hash (`segments` of them, uniformly filled because the hash
  *      is uniform);
  *   2. a running-sum window per segment (one shuffle on the segment key,
  *      sort + linear pass within) yields segment-local prefix sums;
  *   3. per-segment totals (one tiny aggregate, ≤ `segments` rows) are
  *      prefix-summed on the driver and added back as a literal lookup.
  * Driver state is O(segments), never O(rows).
  *
  * DETERMINISM CONTRACT: every value above is a pure function of the DATA —
  * the segment comes from the key hash, never from a task/partition id. An
  * earlier formulation stamped `TaskContext.getPartitionId()` inside a
  * `mapPartitions` over a range-shuffled cache; that id is an EXECUTION
  * artifact, and a cache-miss recompute under a coalescing consumer (or an
  * executor loss at scale) replayed every range partition inside one task —
  * pid 0 for all rows, silently corrupting every offset. Here a recompute
  * of any stage reproduces identical rows, so the `scope` cache is purely a
  * performance lever, never a correctness dependency.
  */
object Sharding {

  /** (id, w, start): each row's EXCLUSIVE global prefix sum of weight under
    * the deterministic (md5 key-hash, id) order — the segmented scan both
    * packers share.
    */
  private def globalStarts(
      df: DataFrame, idCol: String, weightCol: String,
      segments: Int, scope: CacheScope): DataFrame = {
    require(segments >= 0 && segments <= 65536,
      s"segments=$segments out of range (driver offset state is O(segments))")
    val segs = if (segments > 0) segments else 1024
    val span = 1L << 60 // md5Hash60 < 2^60
    val segWidth = (span + segs - 1) / segs
    // a NULL (or non-castable, with ANSI off) id would hash to a NULL
    // segment and NPE the driver-side totals collect far from the bad row —
    // violate the total-assignment contract loudly instead (the splitByHash
    // rule). coalesce in the message: a null-propagated concat would raise
    // a MESSAGE-LESS error.
    val idGuard = when(col(idCol).cast("long").isNotNull, col(idCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"Sharding: id column $idCol is null or not castable to long: "),
        coalesce(col(idCol).cast("string"), lit("null")))))
    // a negative weight would silently make the prefix sum non-monotone
    // (out-of-order / negative shard ids); a NULL weight would null the
    // cumulative sum — fail the job loudly instead
    val guarded = when(col("w") >= 0, col("w")).otherwise(raise_error(concat(
      lit("packByBudget: weight must be non-negative, got "),
      coalesce(col("w").cast("string"), lit("null")),
      lit(" for id "), coalesce(col("id").cast("string"), lit("null")))))
    val keyed = df.select(
        idGuard.as("id"),
        col(weightCol).cast("long").as("w"),
        TextFunctions.md5Hash60(col(idCol).cast("string")).as("h"))
      .select(col("id"), guarded.as("w"), col("h"),
        expr(s"CAST(h DIV ${segWidth}L AS INT)").as("seg"))
    // w joins the sort key so DUPLICATE ids stay deterministic: two rows
    // sharing an id tie on (h, id), and the running sum's order between
    // them would otherwise be whatever the shuffle produced — their start
    // values could swap between runs. With equal (id, w) the swap is
    // value-identical, so the order is total in every observable way.
    val win = Window.partitionBy("seg").orderBy(col("h"), col("id"), col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = scope.own(keyed.withColumn("cum", sum(col("w")).over(win))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val totals = cums.groupBy("seg").agg(sum("w").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until segs).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    val off = element_at(typedlit(offsets.toSeq), col("seg") + 1)
    cums.withColumn("start", col("cum") - col("w") + off)
  }

  /** @return (idCol, weightCol, shard) — shard = floor(global exclusive
    *         prefix sum of weight / budget) under the deterministic order.
    */
  def packByBudget(
      df: DataFrame, idCol: String, weightCol: String,
      budget: Long, segments: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalStarts(df, idCol, weightCol, segments, scope)
      .select(col("id").as(idCol), col("w").as(weightCol),
        expr(s"CAST(start DIV ${budget}L AS BIGINT)").as("shard"))
  }

  /** Token-stream sequence packing — the final pretraining assembly step:
    * concatenate every document (in the same deterministic (md5, id) order
    * as [[packByBudget]]) into one global token stream and cut it into
    * fixed-length training sequences of `seqLen` tokens, documents
    * SPLITTING across sequence boundaries (GPT-style packing, no padding
    * waste). One output row per (document, sequence) slice:
    *
    *  - `seq` — the training sequence this slice lands in;
    *  - `doc_from` / `doc_to` — the doc-local token span [from, to) of the
    *    slice (a doc shorter than its remaining sequence emits one row
    *    covering [0, w));
    *  - `off_in_seq` — where in the sequence the slice begins.
    *
    * Everything is integer arithmetic on the [[globalStarts]] prefix sums;
    * a document of weight w emits ⌈w/seqLen⌉+1 rows at most, so the
    * explode is output-linear. Zero-weight documents occupy no tokens and
    * emit nothing. Downstream writers group by `seq` and concatenate
    * slices in `off_in_seq` order.
    */
  def packSequences(
      df: DataFrame, idCol: String, weightCol: String,
      seqLen: Long, segments: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    globalStarts(df, idCol, weightCol, segments, scope)
      .filter(col("w") > 0)
      .withColumn("seq", explode(expr(
        s"sequence(start DIV ${seqLen}L, (start + w - 1) DIV ${seqLen}L)")))
      .select(col("id").as(idCol), col("seq"),
        (greatest(col("start"), col("seq") * seqLen) - col("start"))
          .as("doc_from"),
        (least(col("start") + col("w"), (col("seq") + 1) * seqLen) - col("start"))
          .as("doc_to"),
        (greatest(col("start"), col("seq") * seqLen) - col("seq") * seqLen)
          .as("off_in_seq"))
  }

  /** Deterministic corpus shuffle — the training-order randomization step:
    * every row gets a `shard` in [0, shards) and a dense 1-based `pos`
    * within its shard, both pure functions of the UNIQUE key (md5 under a
    * `seed`-derived domain), so any engine — and any re-run after an
    * executor loss — reproduces the identical training order. Trainers
    * read shard files in `pos` order; cross-shard order is irrelevant by
    * construction because the hash already mixed sources. A null key fails
    * the job loudly (a silent NULL shard would misfile the row); rows
    * sharing a key tie on the sort and may swap `pos` between runs — pass
    * a unique id, like every packer above.
    *
    * Scale: ONE shuffle, on the shard id; the per-shard `row_number` sorts
    * only that shard's rows inside its partition. `shards` bounds per-task
    * data — size it like output files (100 TB / target file size), never a
    * small constant; a handful of shards over a huge corpus funnels the
    * sort into a handful of tasks.
    */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int,
      seed: Long = 42L): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    Seq("shard", "pos", "_graft_shuffle_h").find(df.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"shuffleShards: input already has a '$c' column — rename it first"))
    val h = when(col(keyCol).isNull,
      raise_error(lit(s"shuffleShards: key column $keyCol is null")))
      .otherwise(TextFunctions.domainHash(s"shuffle:$seed", col(keyCol)))
    df.withColumn("_graft_shuffle_h", h)
      .withColumn("shard", pmod(col("_graft_shuffle_h"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_graft_shuffle_h"), col(keyCol))))
      .drop("_graft_shuffle_h")
  }
}
