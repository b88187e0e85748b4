package graft.plans

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import graft.sources.{JdbcTableStore, MorTableStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Not an assertion suite — a PLAN ARTIFACT generator: prints the
  * optimized plans PLANS_r10.md records (MOR snapshot rollup served vs
  * fallback, JDBC warehouse rollup served, cost-based candidate choice),
  * each delimited for capture. Run with
  * `sbt "testOnly graft.plans.PlanCaptureSpec" | sed -n '/8<--/,/-->8/p'`.
  * Kept green in the suite so the artifact stays reproducible.
  */
class PlanCaptureSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
    println(s"8<-- $tag")
    println(df.queryExecution.optimizedPlan.treeString.trim)
    println("-->8")
  }

  private val factSchema = StructType(Seq(
    StructField("o_id", LongType), StructField("f_cust", LongType),
    StructField("v", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("c_cust", LongType), StructField("seg", StringType)))

  test("capture MOR star serving plans") {
    val fs = new MorTableStore(spark, tmpDir("pc_fs"),
      TableSpec("public.pc_f", factSchema, Seq("o_id")), 4)
    val ds = new MorTableStore(spark, tmpDir("pc_ds"),
      TableSpec("public.pc_d", dimSchema, Seq("c_cust")), 4)
    fs.init((1L to 200L).map(i => (i, 1L + i % 20, i % 100))
      .toDF("o_id", "f_cust", "v"))
    ds.init((1L to 20L).map(c => (c, s"s${c % 5}")).toDF("c_cust", "seg"))
    val factKey = tmpDir("pc_fkey"); val dimKey = tmpDir("pc_dkey")
    fs.snapshot().write.mode("overwrite").parquet(factKey)
    ds.snapshot().write.mode("overwrite").parquet(dimKey)
    import StarMv.{QCol, StarMvDef}
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(factKey, dimKey),
      joins = Seq((QCol(factKey, "f_cust"), QCol(dimKey, "c_cust"))),
      groupCols = Seq(QCol(dimKey, "seg")),
      measureCols = Seq(QCol(factKey, "v")),
      summaryPath = tmpDir("pc_sum")))
    val m = StarMvMaintainer.create(spark,
      Map(factKey -> fs, dimKey -> ds), mv, tmpDir("pc_state") + "/s")
    try {
      fs.merge(CompactedBatch(Seq(1L).toDF("o_id"),
        Seq((300L, 2L, 7L)).toDF("o_id", "f_cust", "v")))
      def rollup = fs.snapshot()
        .join(ds.snapshot(), col("f_cust") === col("c_cust"))
        .groupBy("seg").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      dump("mor-star-UNSYNCED-fallback (live newest-wins resolution)", rollup)
      m.sync()
      dump("mor-star-SYNCED-served (one summary scan, Window gone)", rollup)
      assert(rollup.queryExecution.optimizedPlan.collectLeaves().size == 1)
    } finally StarMv.unregister(m.definition.summaryPath)
  }

  test("capture JDBC star serving plan") {
    val url = s"jdbc:derby:memory:pcap;create=true"
    val cs = new JdbcTableStore(spark, url,
      TableSpec("public.pc_jf", factSchema, Seq("o_id")))
    val ns = new JdbcTableStore(spark, url,
      TableSpec("public.pc_jd", dimSchema, Seq("c_cust")))
    cs.init((1L to 100L).map(i => (i, 1L + i % 10, i % 40))
      .toDF("o_id", "f_cust", "v"))
    ns.init((1L to 10L).map(c => (c, s"s${c % 3}")).toDF("c_cust", "seg"))
    import StarMv.{QCol, StarMvDef}
    val fk = cs.servingKey; val dk = ns.servingKey
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(fk, dk),
      joins = Seq((QCol(fk, "f_cust"), QCol(dk, "c_cust"))),
      groupCols = Seq(QCol(dk, "seg")),
      measureCols = Seq(QCol(fk, "v")),
      summaryPath = tmpDir("pc_jsum")),
      tableOverrides = Map(fk -> cs.snapshot(), dk -> ns.snapshot()))
    val m = JdbcStarMaintainer.create(spark,
      Map(fk -> cs, dk -> ns), mv, tmpDir("pc_jroot"))
    try {
      val rollup = cs.snapshot()
        .join(ns.snapshot(), col("f_cust") === col("c_cust"))
        .groupBy("seg").agg(sum(col("v")).as("s"))
      dump("jdbc-star-served (warehouse join gone, one summary scan)", rollup)
      assert(rollup.queryExecution.optimizedPlan.collectLeaves().size == 1)
    } finally StarMv.unregister(m.definition.summaryPath)
  }

  test("capture cost-based candidate choice") {
    val fact = tmpDir("pc_cost_fact"); val dim = tmpDir("pc_cost_dim")
    (1L to 400L).map(i => (i, 1L + i % 20, i % 100))
      .toDF("o_id", "f_cust", "v").write.mode("overwrite").parquet(fact)
    (1L to 20L).map(c => (c, s"s${c % 4}", s"r${c % 2}"))
      .toDF("c_cust", "seg", "reg").write.mode("overwrite").parquet(dim)
    import StarMv.{QCol, StarMvDef}
    val joins = Seq((QCol(fact, "f_cust"), QCol(dim, "c_cust")))
    val fine = StarMv.build(spark, StarMvDef(
      tables = Seq(fact, dim), joins = joins,
      groupCols = Seq(QCol(dim, "seg"), QCol(dim, "c_cust")),
      measureCols = Seq(QCol(fact, "v")),
      summaryPath = tmpDir("pc_cost_fine")))
    val coarse = StarMv.build(spark, StarMvDef(
      tables = Seq(fact, dim), joins = joins,
      groupCols = Seq(QCol(dim, "seg")),
      measureCols = Seq(QCol(fact, "v")),
      summaryPath = tmpDir("pc_cost_coarse")))
    try {
      val q = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("f_cust") === col("c_cust"))
        .groupBy("seg").agg(sum(col("v")).as("s"))
      dump("cost-choice (two servable summaries; the smaller 'coarse' wins)", q)
    } finally {
      StarMv.unregister(fine.summaryPath)
      StarMv.unregister(coarse.summaryPath)
    }
  }
}
