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

  /** @return (idCol, weightCol, shard) — shard = floor(global exclusive
    *         prefix sum of weight / budget) under the deterministic order.
    */
  def packByBudget(
      df: DataFrame, idCol: String, weightCol: String,
      budget: Long, partitions: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(budget > 0, "budget must be positive")
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
    cums
      .withColumn("start", col("cum") - col("w") + off)
      .select(col("id").as(idCol), col("w").as(weightCol),
        expr(s"CAST(start DIV ${budget}L AS BIGINT)").as("shard"))
  }
}
