package graft.plans

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import graft.sources.JdbcTableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Star-MV maintenance + serving over JDBC-synced tables
  * ([[JdbcStarMaintainer]] on embedded Derby): feeds reconstructed from
  * keyed pre-image reads, version pinning by apply order, per-table
  * durable progress, serving via the (url, table) leaf identity with the
  * pause gate closing the no-structural-freshness hole.
  */
class JdbcStarMaintainerSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private val factSchema = StructType(Seq(
    StructField("o_id", LongType), StructField("f_cust", LongType),
    StructField("v", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("c_cust", LongType), StructField("seg", StringType)))

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private def servedFromSummary(df: DataFrame, sumTag: String): Boolean = {
    val paths = scanPaths(df)
    paths.nonEmpty && paths.forall(_.contains(sumTag))
  }

  private final class Fixture(tag: String) {
    val url = s"jdbc:derby:memory:jsm_$tag;create=true"
    var facts: Seq[(Long, Long, Long)] = (1L to 120L)
      .map(i => (i, 1L + i % 15, i % 90))
    var dims: Seq[(Long, String)] = (1L to 15L).map(c => (c, s"s${c % 4}"))

    val factStore = new JdbcTableStore(spark, url,
      TableSpec(s"public.jsm_${tag}_f", factSchema, Seq("o_id")))
    val dimStore = new JdbcTableStore(spark, url,
      TableSpec(s"public.jsm_${tag}_d", dimSchema, Seq("c_cust")))
    factStore.init(facts.toDF("o_id", "f_cust", "v"))
    dimStore.init(dims.toDF("c_cust", "seg"))

    import StarMv.{QCol, StarMvDef}
    val fk = factStore.servingKey
    val dk = dimStore.servingKey
    val root = tmpDir(s"jsm_${tag}_root")
    val mvDef = StarMv.build(spark, StarMvDef(
      tables = Seq(fk, dk),
      joins = Seq((QCol(fk, "f_cust"), QCol(dk, "c_cust"))),
      groupCols = Seq(QCol(dk, "seg")),
      measureCols = Seq(QCol(fk, "v")),
      summaryPath = tmpDir(s"jsm_${tag}_sum")),
      tableOverrides = Map(fk -> factStore.snapshot(), dk -> dimStore.snapshot()))
    val m = JdbcStarMaintainer.create(spark,
      Map(fk -> factStore, dk -> dimStore), mvDef, root)

    def truth: Set[(String, Long, Long, Long, Long)] = {
      val segOf = dims.toMap
      val joined = facts.flatMap { case (_, c, v) =>
        segOf.get(c).map(s => (s, v)) }
      joined.groupBy(_._1).map { case (s, rs) =>
        (s, rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).min,
          rs.map(_._2).max)
      }.toSet
    }

    def rollup: DataFrame = factStore.snapshot()
      .join(dimStore.snapshot(), col("f_cust") === col("c_cust"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))

    def values(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
      df.as[(String, Long, Long, Long, Long)].collect().toSet

    def factBatch(deletes: Seq[Long],
        upserts: Seq[(Long, Long, Long)]): CompactedBatch = {
      facts = facts.filterNot(r => deletes.contains(r._1))
        .filterNot(r => upserts.exists(_._1 == r._1)) ++ upserts
      CompactedBatch(deletes.toDF("o_id"),
        upserts.toDF("o_id", "f_cust", "v"))
    }
    def dimBatch(deletes: Seq[Long],
        upserts: Seq[(Long, String)]): CompactedBatch = {
      dims = dims.filterNot(r => deletes.contains(r._1))
        .filterNot(r => upserts.exists(_._1 == r._1)) ++ upserts
      CompactedBatch(deletes.toDF("c_cust"), upserts.toDF("c_cust", "seg"))
    }

    def close(): Unit = StarMv.unregister(m.definition.summaryPath)
  }

  test("warehouse rollups serve from the summary; batches keep it exact") {
    val f = new Fixture("serve")
    try {
      assert(servedFromSummary(f.rollup, "jsm_serve_sum"),
        s"jdbc-leaf rollup must reroute: ${scanPaths(f.rollup)}")
      assert(f.values(f.rollup) === f.truth)

      // batch 1: overlapping deltas — new fact rows referencing a dim key
      // inserted in the same batch, a deleted extreme (repair), a segment
      // move. The maintainer sequences fact-then-dim correctly.
      val maxRow = f.facts.maxBy(_._3)
      f.m.sync(1L, Map(
        f.fk -> f.factBatch(Seq(maxRow._1),
          Seq((300L, 21L, 55L), (301L, 21L, 7L))),
        f.dk -> f.dimBatch(Seq(7L), Seq((21L, "s_new"), (3L, "s3")))))
      assert(f.values(f.rollup) === f.truth,
        "post-sync summary must equal the recomputed warehouse join")
      assert(servedFromSummary(f.rollup, "jsm_serve_sum"))

      // batch 2: fact-only delete wave
      f.m.sync(2L, Map(f.fk -> f.factBatch(f.facts.take(4).map(_._1), Nil)))
      assert(f.values(f.rollup) === f.truth)
      assert(f.m.lastCompletedBatch === 2L)
    } finally f.close()
  }

  test("replay of a completed batch re-merges idempotently, never re-refreshes") {
    val f = new Fixture("replay")
    try {
      val b = f.factBatch(Seq(1L), Seq((300L, 2L, 11L)))
      f.m.sync(1L, Map(f.fk -> b))
      val after = f.values(f.rollup)
      assert(after === f.truth)
      // the stream crashes after completion but before its checkpoint
      // commit: the same batch is re-delivered
      f.m.sync(1L, Map(f.fk -> b))
      assert(f.values(f.rollup) === after,
        "replay must not double-apply the signed refresh")
      // a batch OLDER than the last completed one is a consumer restarted
      // from a stale checkpoint — re-merging it would rewind the
      // warehouse under a summary that moved on; must fail loudly
      f.m.sync(2L, Map(f.fk -> f.factBatch(Seq(3L), Nil)))
      val e = intercept[IllegalArgumentException](
        f.m.sync(1L, Map(f.fk -> b)))
      assert(e.getMessage.contains("precedes"))
    } finally f.close()
  }

  test("a >1024-key batch reads its pre-image via the staged EXISTS, not a table pull") {
    val f = new Fixture("bigbatch")
    try {
      // a bulk-load-sized batch: 1100 fact upserts (some overwriting live
      // keys, most new) pushes the key set past the IN-filter limit — the
      // pre-image read must stage the keys into the warehouse and come
      // back WHERE EXISTS (lastKeyedPath), never snapshot() the table
      val ups = (1L to 1100L).map(i =>
        (if (i <= 50) i else 1000L + i, 1L + i % 15, (i * 7) % 90))
      f.m.sync(1L, Map(f.fk -> f.factBatch(Seq(60L, 61L), ups)))
      assert(f.factStore.lastKeyedPath == "staged-exists",
        s"large pre-image read took '${f.factStore.lastKeyedPath}'")
      assert(f.values(f.rollup) === f.truth,
        "summary must converge exactly on the bulk batch")
      assert(servedFromSummary(f.rollup, "jsm_bigbatch_sum"))
      // follow-up micro-batch still uses the cheap IN path
      f.m.sync(2L, Map(f.fk -> f.factBatch(Seq(5L), Seq((2000L, 3L, 42L)))))
      assert(f.factStore.lastKeyedPath == "in")
      assert(f.values(f.rollup) === f.truth)
    } finally f.close()
  }

  test("crash mid-sequence: open() resumes from staged feeds, exactly once") {
    val f = new Fixture("crash")
    try {
      // the real crash window: the fact half of a two-table batch is
      // fully processed (feed staged, merged, refreshed, progress
      // committed), then the process dies at the DIM step. Forced by a
      // dim batch that fails at ACTION time — after the fact's progress
      // commit, before any dim work lands.
      val factB = f.factBatch(Seq(2L), Seq((310L, 3L, 88L)))
      val dimB = f.dimBatch(Nil, Seq((5L, "s_moved")))
      val poison = CompactedBatch(
        Seq.empty[Long].toDF("c_cust"),
        Seq((5L, "s_moved")).toDF("c_cust", "seg")
          .filter(expr("assert_true(c_cust > 99999) is null")))
      val metrics = new graft.obs.PipelineMetrics("jsm")
      f.m.attachMetrics(metrics)
      intercept[Exception](f.m.sync(1L, Map(f.fk -> factB, f.dk -> poison)))
      // serving is paused while the batch is incomplete — and the
      // freshness probe reports exactly that window as lag 1
      assert(!servedFromSummary(f.rollup, "jsm_crash_sum"),
        "mid-sequence summary must not serve")
      assert(metrics.mvFreshness.values.head
        .values.map { case (s, c) => c - s }.max > 0L,
        "an abandoned batch must surface as positive lag")
      // restart: open() keeps it paused, replaying the batch completes it
      val m2 = JdbcStarMaintainer.open(spark,
        Map(f.fk -> f.factStore, f.dk -> f.dimStore), f.root)
      m2.sync(1L, Map(f.fk -> factB, f.dk -> dimB))
      assert(f.values(f.rollup) === f.truth,
        "resumed batch must converge exactly (no double-apply of the fact feed)")
      assert(servedFromSummary(f.rollup, "jsm_crash_sum"),
        "serving resumes once the batch completes")
      StarMv.unregister(m2.definition.summaryPath)
    } finally f.close()
  }
}
