package graft.operators

import graft.model.CdcOp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result of compacting one micro-batch for one table: the final action per
  * primary key (the reference's `LoadTask {delete, insert}`,
  * reference: LoadTask.java:19-31).
  *
  * @param deletes keys whose final action is DELETE — columns = pk cols
  * @param upserts rows whose final action is INSERT/UPDATE — full table schema
  */
final case class CompactedBatch(deletes: DataFrame, upserts: DataFrame)

/** Per-primary-key micro-batch compaction — the reference's merge operator
  * M1–M8 (reference: RowCache.java:180-215 `RowBatchMerger.call`), rebuilt
  * order-insensitively for distributed execution.
  *
  * The reference folds rows in single-threaded arrival order; under Spark a
  * shuffle destroys arrival order, so each event carries a `seq` that is a
  * total order per key (Kafka (partition,offset) or file line number) and the
  * fold becomes "last event per key wins" (`max_by(…, seq)`), which is
  * associative/commutative and therefore shuffle- and partial-aggregation-
  * safe (SURVEY.md §2.1.1):
  *
  *  - M1 insert-overwrites-insert, M2 delete-cancels-insert, M4
  *    update≡delete+insert: all collapse to "take the event with max seq per
  *    key; op=delete → delete-set, else upsert-set".
  *  - M3/M5 PK-change updates are exploded first into (delete oldKey, upsert
  *    newKey) at the same seq — the two derived events target different keys
  *    so sharing a seq is safe BETWEEN the pair. The derived delete competes
  *    against the OLD key's other events by that seq, which is only a total
  *    order if the producer put both keys' events on one comparable sequence
  *    — true for the file replay (one global seq) and for Kafka topics
  *    partitioned by TABLE, but NOT for Kafka partitioned by primary key,
  *    where the A→B update's offset lives on B's partition and is
  *    incomparable with A's own offsets (the reference inherits the same
  *    limitation from its per-partition FIFO, RowCache.java:36 — an
  *    operator deploying PK-change-heavy workloads must partition by table;
  *    see [[graft.streaming.CdcPipeline.kafkaMaxwellStream]]).
  *  - M6 deletes-before-inserts ordering is the sink's job
  *    ([[graft.sources.TableStore]]); M7 (delete of absent key is a no-op)
  *    falls out of the anti-join there; M8 (insert dedup) falls out of
  *    one-row-per-key.
  *
  * At 100 TB this is a single hash-aggregate keyed by PK: Spark plans a
  * partial `max_by` before the shuffle, so the shuffled volume is one row per
  * distinct key per map task, not the raw event stream.
  *
  * Input columns: op, seq, key (struct), oldKey (nullable struct), data
  * (nullable struct) — the output of [[graft.parse.Projection.typed]].
  */
object Compaction {

  /** Flatten PK-change updates into two single-key actions (M3).
    *
    * Single scan: each event becomes a 1- or 2-element action array that is
    * exploded in place. A union of (base, filtered-derived) subplans would
    * evaluate the upstream parse/decode chain twice per batch — measured 2×
    * the whole-pipeline cost at sf0.1 — because the two branches cannot
    * share one scan.
    */
  private[operators] def explodePkChange(events: DataFrame): DataFrame = {
    val dataT = events.schema("data").dataType
    val base = struct(col("op"), col("seq"), col("key"), col("data"))
    val derivedDelete = struct(
      lit(CdcOp.Delete).as("op"), col("seq"), col("oldKey").as("key"),
      lit(null).cast(dataT).as("data"))
    events
      .select(explode(when(col("oldKey").isNotNull, array(base, derivedDelete))
        .otherwise(array(base))).as("a"))
      .select(col("a.op").as("op"), col("a.seq").as("seq"),
        col("a.key").as("key"), col("a.data").as("data"))
  }

  /** @param scope owns the cache of the compacted per-key aggregate. The
    *   returned deletes/upserts both derive from it, and a sink consumes
    *   them across several jobs (stage keys, stage rows, rewrite buckets) —
    *   uncached, EVERY job re-runs the parse + shuffle + aggregate. Callers
    *   that fully consume the batch in one call (e.g.
    *   [[graft.streaming.CdcPipeline.applyBatch]]) pass a scope and release
    *   it after the merge; the default defers to the ContextCleaner.
    */
  def compact(events: DataFrame,
      scope: CacheScope = CacheScope.unmanaged): CompactedBatch = {
    val last = scope.own(explodePkChange(events)
      .groupBy(col("key"))
      .agg(max_by(struct(col("op"), col("data")), col("seq")).as("fin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val deletes = last.filter(col("fin.op") === CdcOp.Delete).select(col("key.*"))
    val upserts = last.filter(col("fin.op") =!= CdcOp.Delete).select(col("fin.data.*"))
    CompactedBatch(deletes, upserts)
  }
}
