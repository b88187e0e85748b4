package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
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
  * The prefix sum is the textbook two-phase distributed scan — NOT a global
  * `Window.orderBy` (which Spark executes in ONE partition, the classic
  * 100 TB killer):
  *   1. range-repartition on the hash key + sort within partitions
  *      (one shuffle, the same one any global ordering pays);
  *   2. one linear pass per partition for local cumulative sums;
  *   3. per-partition totals (one tiny job, ≤ one row per partition) are
  *      prefix-summed on the driver and added back as a broadcast literal.
  * Driver state is O(partitions), never O(rows).
  */
object Sharding {

  /** (id, w, start): each row's EXCLUSIVE global prefix sum of weight under
    * the deterministic (md5 key-hash, id) order — the two-phase scan both
    * packers share.
    */
  private def globalStarts(
      df: DataFrame, idCol: String, weightCol: String,
      partitions: Int, scope: CacheScope): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = df.select(
        col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"),
        TextFunctions.md5Hash60(col(idCol).cast("string")).as("h"))
      .repartitionByRange(p, col("h"), col("id"))
      .sortWithinPartitions(col("h"), col("id"))
    val cums = scope.own(keyed.as[(Long, Long, Long)].mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var cum = 0L
      it.map { case (id, w, _) =>
        // a negative weight would silently make the prefix sum non-monotone
        // (out-of-order / negative shard ids) — fail the job loudly instead
        require(w >= 0, s"packByBudget: weight must be non-negative, got $w for id $id")
        cum += w
        (pid, id, w, cum)
      }
    }.toDF("pid", "id", "w", "cum")
      .persist(StorageLevel.MEMORY_AND_DISK))
    val totals = cums.groupBy("pid").agg(max("cum").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    val off = element_at(typedlit(offsets.toSeq), col("pid") + 1)
    cums.withColumn("start", col("cum") - col("w") + off)
  }

  /** @return (idCol, weightCol, shard) — shard = floor(global exclusive
    *         prefix sum of weight / budget) under the deterministic order.
    */
  def packByBudget(
      df: DataFrame, idCol: String, weightCol: String,
      budget: Long, partitions: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalStarts(df, idCol, weightCol, partitions, scope)
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
      seqLen: Long, partitions: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    globalStarts(df, idCol, weightCol, partitions, scope)
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
}
