package graft.plans

import graft.SparkTestBase
import graft.model.TableSpec
import graft.obs.PipelineMetrics
import graft.operators.CompactedBatch
import graft.sources.ParquetTableStore
import org.apache.spark.sql.types._

/** MV freshness observability: an attached maintainer surfaces per-table
  * synced-vs-current version lag in the state JSON (`mv_freshness`), so a
  * deployment can alarm on a stale accelerator — lag > 0 means every
  * rollup is silently falling back to the live join until the next sync.
  */
class MvFreshnessSpec extends SparkTestBase {
  import spark.implicits._

  private val factSchema = StructType(Seq(
    StructField("o_id", LongType), StructField("f_cust", LongType),
    StructField("v", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("c_cust", LongType), StructField("seg", StringType)))

  test("lag goes 0 -> n -> 0 across merges and a sync; state JSON carries it") {
    val fs = new ParquetTableStore(spark, tmpDir("fresh_fs"),
      TableSpec("public.fresh_f", factSchema, Seq("o_id")), 4,
      retainedVersions = 3)
    val ds = new ParquetTableStore(spark, tmpDir("fresh_ds"),
      TableSpec("public.fresh_d", dimSchema, Seq("c_cust")), 4,
      retainedVersions = 3)
    fs.init((1L to 50L).map(i => (i, 1L + i % 5, i % 10)).toDF("o_id", "f_cust", "v"))
    ds.init((1L to 5L).map(c => (c, s"s$c")).toDF("c_cust", "seg"))
    val factKey = tmpDir("fresh_fkey"); val dimKey = tmpDir("fresh_dkey")
    fs.snapshot().write.mode("overwrite").parquet(factKey)
    ds.snapshot().write.mode("overwrite").parquet(dimKey)
    import StarMv.{QCol, StarMvDef}
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(factKey, dimKey),
      joins = Seq((QCol(factKey, "f_cust"), QCol(dimKey, "c_cust"))),
      groupCols = Seq(QCol(dimKey, "seg")),
      measureCols = Seq(QCol(factKey, "v")),
      summaryPath = tmpDir("fresh_sum")))
    val m = StarMvMaintainer.create(spark,
      Map(factKey -> fs, dimKey -> ds), mv, tmpDir("fresh_state") + "/s")
    val metrics = new PipelineMetrics("fresh-src")
    try {
      m.attachMetrics(metrics)
      def lag: Long = metrics.mvFreshness.values.head
        .values.map { case (s, c) => c - s }.max
      assert(lag == 0L, "fresh maintainer reports zero lag")

      // two fact merges + one dim merge land without a sync: the fact's
      // lag is 2, the dim's 1 — the summary-level max is 2
      fs.merge(CompactedBatch(Seq(1L).toDF("o_id"),
        Seq((100L, 2L, 7L)).toDF("o_id", "f_cust", "v")))
      fs.merge(CompactedBatch(Seq(2L).toDF("o_id"),
        Seq.empty[(Long, Long, Long)].toDF("o_id", "f_cust", "v")))
      ds.merge(CompactedBatch(Seq.empty[Long].toDF("c_cust"),
        Seq((3L, "s_m")).toDF("c_cust", "seg")))
      assert(lag == 2L, "lag counts committed-but-unsynced versions")

      m.sync()
      assert(lag == 0L, "sync restores zero lag")

      // the state JSON carries the section (and omits it when nothing is
      // attached — reference-shape stability)
      val json = metrics.stateJson()
      assert(json.contains("\"mv_freshness\""), json)
      assert(json.contains("\"lag\": 0"), json)
      assert(!new PipelineMetrics("bare").stateJson()
        .contains("mv_freshness"))

      // detach: the section disappears
      metrics.unregisterMvFreshness(
        m.definition.summaryPath.replaceAll("_v\\d+$", ""))
      assert(!metrics.stateJson().contains("mv_freshness"))
    } finally StarMv.unregister(m.definition.summaryPath)
  }
}
