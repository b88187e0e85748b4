package graft.sources

import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A [[ParquetTableStore]] with a maintained SECONDARY INDEX on one
  * non-key column — the "find rows by value without scanning the table"
  * path (all orders with status X, all users in segment Y) that a 100 TB
  * primary-key-bucketed layout cannot answer from pk pruning.
  *
  * The index is itself a ParquetTableStore over (value, pk…) rows with
  * composite primary key (value first): bucket files are PK-SORTED, so the
  * index probe pushes an `In` filter on its LEADING column straight into
  * the parquet scan — row-group stats + bloom filters skip everything but
  * the matching value runs. [[lookup]] then fetches the resolved pks
  * through the primary's bucket-pruned point lookup
  * ([[ParquetTableStore.snapshotForKeys]]): value → pks → rows, never a
  * table scan.
  *
  * Maintenance rides the SAME compacted batch as the primary: the
  * pre-image of every changed key is read through the bucket-pruned
  * lookup (cost ∝ batch, not table), its old (value, pk) pairs become
  * index deletes, the batch's upserts become index inserts. Each merge is
  * two manifest commits — primary first, then index — so a crash BETWEEN
  * them leaves a stale index: [[lookup]] re-verifies the indexed value on
  * the fetched rows (stale-extra entries can never surface as wrong
  * results), while a lost-entry miss window exists until [[rebuildIndex]]
  * runs; a deployment needing atomicity across both would journal the two
  * commits under one manifest, which this sandbox-scoped store documents
  * rather than implements.
  */
final class IndexedTableStore(
    spark: org.apache.spark.sql.SparkSession,
    root: String,
    val spec: TableSpec,
    indexedCol: String,
    numBuckets: Int = 64)
  extends TableStore {
  require(spec.dataCols.contains(indexedCol) && !spec.pkCols.contains(indexedCol),
    s"indexedCol $indexedCol must be a non-key data column of ${spec.name}")

  private val pk = spec.pkCols
  val primary = new ParquetTableStore(spark, s"$root/primary", spec, numBuckets)

  private val idxSpec = TableSpec(
    spec.name + "_ix",
    StructType((indexedCol +: pk).map(spec.schema(_)).toArray),
    indexedCol +: pk)
  val index = new ParquetTableStore(spark, s"$root/index", idxSpec, numBuckets)

  private def indexRows(rows: DataFrame): DataFrame =
    rows.select((indexedCol +: pk).map(col): _*)
      // a NULL indexed value cannot live in the index pk; such rows are
      // findable only by pk — the standard "NULLs are not indexed" rule
      .filter(col(indexedCol).isNotNull)

  def init(df: DataFrame): Unit = {
    primary.init(df)
    index.init(indexRows(df))
  }

  def snapshot(): DataFrame = primary.snapshot()

  def merge(batch: CompactedBatch): Unit = {
    val changed = batch.deletes.select(pk.map(col): _*)
      .unionByName(batch.upserts.select(pk.map(col): _*))
    // pre-image BEFORE the primary commit — bucket-pruned, cost ∝ batch
    val oldPairs = indexRows(primary.snapshotForKeys(changed))
      .localCheckpoint() // materialize: must survive the primary's rewrite
    primary.merge(batch)
    index.merge(CompactedBatch(
      deletes = oldPairs,
      upserts = indexRows(batch.upserts)))
  }

  /** Rows whose indexed column currently equals one of `values`:
    * In-filtered index probe (leading-column row-group skip) → pks →
    * bucket-pruned primary fetch. The final re-verification filter makes
    * a stale-extra index entry harmless (see class doc).
    */
  def lookup(values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "lookup needs at least one value")
    val pks = index.snapshot()
      .filter(col(indexedCol).isin(values: _*))
      .select(pk.map(col): _*)
    primary.snapshotForKeys(pks)
      .filter(col(indexedCol).isin(values: _*))
  }

  /** Rows whose indexed column currently lies in [lo, hi] (inclusive):
    * the RANGE twin of [[lookup]] — a BETWEEN on the index's leading
    * column pushes into the parquet scan, where the value-sorted bucket
    * files skip every row group outside the range (the stats give real
    * pruning precisely because the index pk leads with the value), then
    * the resolved pks fetch through the primary's bucket-pruned lookup.
    * Same stale-extra re-verification as [[lookup]]. The selective-band
    * query ("orders between 100 and 200 dollars") a pk-bucketed primary
    * can only answer by full scan.
    */
  def lookupRange(lo: Any, hi: Any): DataFrame = {
    require(lo != null && hi != null, "lookupRange bounds must be non-null")
    val pks = index.snapshot()
      .filter(col(indexedCol) >= lit(lo) && col(indexedCol) <= lit(hi))
      .select(pk.map(col): _*)
    primary.snapshotForKeys(pks)
      .filter(col(indexedCol) >= lit(lo) && col(indexedCol) <= lit(hi))
  }

  /** Recreate the index from the primary — the recovery path for the
    * documented crash window between the two merge commits.
    */
  def rebuildIndex(): Unit = index.init(indexRows(primary.snapshot()))
}
