package graft.plans

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import graft.sources.ParquetTableStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential fuzz of the maintainer machinery: random merge batches
  * (inserts / updates / deletes / no-op upserts / NULL group keys),
  * random sync cadence (several merges can pile up between syncs),
  * random restarts (reopen from the state file), and — for the star
  * variant — random MULTI-table batches with overlapping deltas. After
  * every sync the summary-served rollup must equal a from-scratch
  * recompute of the live state. Seeds are fixed; a failure prints the
  * seed's round.
  */
class MvMaintainerFuzzSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private val tableSchema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType),
    StructField("m", LongType)))

  test("single-table maintainer: 12 random rounds with skips and restarts") {
    val rnd = new scala.util.Random(101)
    var rows: Map[Long, (String, Long)] = (1L to 300L).map { i =>
      // ~8% NULL group keys — legal dimension values
      val g = if (rnd.nextInt(12) == 0) null else s"g${rnd.nextInt(5)}"
      i -> (g, rnd.nextInt(1000).toLong)
    }.toMap
    val store = new ParquetTableStore(spark, tmpDir("mvf_store"),
      TableSpec("public.mvf", tableSchema, Seq("id")), 4,
      retainedVersions = 8)
    store.init(rows.toSeq.map { case (i, (g, m)) => (i, g, m) }
      .toDF("id", "g", "m"))
    val base = tmpDir("mvf_base")
    store.snapshot().write.mode("overwrite").parquet(base)
    val mvDef = MaterializedView.build(spark, base, Seq("g"), Seq("m"),
      tmpDir("mvf_sum"))
    val statePath = tmpDir("mvf_state") + "/s"
    var m = MvMaintainer.create(spark, store, mvDef, statePath)
    try {
      (1 to 12).foreach { round =>
        // 1-2 merges per round (a sync can lag several versions)
        (0 until 1 + rnd.nextInt(2)).foreach { _ =>
          val delIds = rnd.shuffle(rows.keys.toList).take(rnd.nextInt(12))
          val upserts = rnd.shuffle((1L to 320L).toList).take(rnd.nextInt(15))
            .filterNot(delIds.contains)
            .map { i =>
              if (rnd.nextBoolean() && rows.contains(i)) {
                val (g, mm) = rows(i) // no-op upsert: byte-identical row
                (i, g, mm)
              } else {
                val g = if (rnd.nextInt(12) == 0) null else s"g${rnd.nextInt(5)}"
                (i, g, rnd.nextInt(1000).toLong)
              }
            }
          store.merge(CompactedBatch(delIds.toDF("id"),
            upserts.toDF("id", "g", "m")))
          rows = rows -- delIds ++ upserts.map(u => u._1 -> (u._2, u._3))
        }
        if (rnd.nextInt(4) == 0) // random restart
          m = MvMaintainer.open(spark, store, statePath)
        m.sync()
        val want = rows.values.toSeq.groupBy(_._1).map { case (g, rs) =>
          (Option(g), rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).min,
            rs.map(_._2).max)
        }.toSet
        val got = store.snapshot().groupBy("g")
          .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
            min(col("m")).as("mn"), max(col("m")).as("mx"))
          .collect().map(r => (Option(r.getString(0)), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4))).toSet
        assert(got === want, s"single-table fuzz diverged at round $round")
      }
    } finally MaterializedView.unregister(base)
  }

  test("star maintainer: 10 random overlapping fact+dim rounds with restarts") {
    import StarMv.{QCol, StarMvDef}
    val rnd = new scala.util.Random(211)
    var facts: Map[Long, (Long, Long)] = (1L to 250L)
      .map(i => i -> (1L + rnd.nextInt(25), rnd.nextInt(500).toLong)).toMap
    var dims: Map[Long, String] = (1L to 25L)
      .map(c => c -> s"s${c % 6}").toMap
    var nextCust = 26L

    val factStore = new ParquetTableStore(spark, tmpDir("smf_fs"),
      TableSpec("public.smf_f", StructType(Seq(StructField("o", LongType),
        StructField("fc", LongType), StructField("v", LongType))), Seq("o")),
      4, retainedVersions = 8)
    val dimStore = new ParquetTableStore(spark, tmpDir("smf_ds"),
      TableSpec("public.smf_d", StructType(Seq(StructField("dc", LongType),
        StructField("seg", StringType))), Seq("dc")), 4, retainedVersions = 8)
    factStore.init(facts.toSeq.map { case (o, (c, v)) => (o, c, v) }
      .toDF("o", "fc", "v"))
    dimStore.init(dims.toSeq.toDF("dc", "seg"))
    val factKey = tmpDir("smf_fkey")
    val dimKey = tmpDir("smf_dkey")
    factStore.snapshot().write.mode("overwrite").parquet(factKey)
    dimStore.snapshot().write.mode("overwrite").parquet(dimKey)
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(factKey, dimKey),
      joins = Seq((QCol(factKey, "fc"), QCol(dimKey, "dc"))),
      groupCols = Seq(QCol(dimKey, "seg")),
      measureCols = Seq(QCol(factKey, "v")),
      summaryPath = tmpDir("smf_sum")))
    val statePath = tmpDir("smf_state") + "/s"
    var m = StarMvMaintainer.create(spark,
      Map(factKey -> factStore, dimKey -> dimStore), mv, statePath)
    try {
      (1 to 10).foreach { round =>
        // overlapping deltas by construction: a new dim key plus fact rows
        // referencing it, in the SAME round, plus random churn on both
        val newCust = nextCust; nextCust += 1
        val factDel = rnd.shuffle(facts.keys.toList).take(rnd.nextInt(10))
        val factUps = rnd.shuffle((251L to 400L).toList).take(rnd.nextInt(8))
          .filterNot(factDel.contains)
          .map(o => (o, if (rnd.nextBoolean()) newCust
            else 1L + rnd.nextInt(25).toLong, rnd.nextInt(500).toLong))
        val dimDel = rnd.shuffle(dims.keys.toList).take(rnd.nextInt(2))
        val dimUps = (Seq((newCust, s"sn$round")) ++
          rnd.shuffle(dims.keys.toList).take(rnd.nextInt(3))
            .filterNot(dimDel.contains)
            .map(c => (c, s"s${rnd.nextInt(6)}")))
        factStore.merge(CompactedBatch(factDel.toDF("o"),
          factUps.toDF("o", "fc", "v")))
        dimStore.merge(CompactedBatch(dimDel.toDF("dc"),
          dimUps.toDF("dc", "seg")))
        facts = facts -- factDel ++ factUps.map(u => u._1 -> (u._2, u._3))
        dims = dims -- dimDel ++ dimUps
        if (rnd.nextInt(4) == 0) // random restart
          m = StarMvMaintainer.open(spark,
            Map(factKey -> factStore, dimKey -> dimStore), statePath)
        m.sync()
        val want = facts.values.toSeq
          .flatMap { case (c, v) => dims.get(c).map(s => (s, v)) }
          .groupBy(_._1).map { case (s, rs) =>
            (s, rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).min,
              rs.map(_._2).max)
          }.toSet
        val got = factStore.snapshot()
          .join(dimStore.snapshot(), col("fc") === col("dc"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            min(col("v")).as("mn"), max(col("v")).as("mx"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(got === want, s"star fuzz diverged at round $round")
      }
    } finally StarMv.unregister(m.definition.summaryPath)
  }
}
