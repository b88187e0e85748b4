package graft.parse

import graft.SparkTestBase
import graft.model.{TableRegistry, TableSpec}
import graft.sources.{JdbcTableStore, ParquetTableStore}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mid-stream schema drift ([[SchemaDrift]]): a stream whose tail starts
  * carrying a column the spec doesn't know must (1) fire the per-table
  * counter, (2) auto-evolve end-to-end on the Parquet store with old rows
  * null-filled, and (3) fail LOUDLY on the JDBC store — never silently
  * drop the new column, which is what the reference's fixed-schema parse
  * does forever.
  */
class SchemaDriftSpec extends SparkTestBase {
  import spark.implicits._

  graft.plans.MaterializedView.install(spark) // the star serving case below

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val spec = TableSpec("public.t", schema, Seq("id"))
  private val registry = TableRegistry(
    Map("demo.t" -> "public.t"), Map("public.t" -> spec))

  /** Maxwell envelopes; rows ≥ driftFrom additionally carry `note`. */
  private def stream(n: Int, driftFrom: Int) =
    (1 to n).map { i =>
      val note = if (i >= driftFrom) s""","note":"n$i"""" else ""
      (s"""{"database":"demo","table":"t","type":"insert","ts":1,""" +
        s""""data":{"id":$i,"v":"v$i"$note}}""", i.toLong)
    }.toDF("value", "seq0")

  test("detect counts unknown data-map keys per (table, column)") {
    val events = MaxwellParser.events(stream(10, driftFrom = 7), registry, col("seq0"))
    val got = SchemaDrift.detect(events, registry)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("public.t", "note", 4L)))
  }

  test("replay with a drifting tail: counter fires, Parquet store auto-evolves") {
    val metrics = new graft.obs.PipelineMetrics("drift_src")
    val root = tmpDir("drift_store")
    val store = new ParquetTableStore(spark, root, spec, 4)
    val events1 = MaxwellParser.events(stream(6, driftFrom = 99), registry, col("seq0"))
    CdcPipeline.applyBatch(events1, registry, Map("public.t" -> store),
      driftHook = Some(metrics.recordDrift _))
    assert(metrics.driftCounters.isEmpty, "no drift in the clean prefix")
    // the tail adds `note` — same store root, counter must fire
    val events2 = MaxwellParser.events(stream(10, driftFrom = 7), registry, col("seq0"))
    CdcPipeline.applyBatch(events2, registry, Map("public.t" -> store),
      driftHook = Some(metrics.recordDrift _))
    assert(metrics.driftCounters == Map(("public.t", "note") -> 4L))
    assert(metrics.stateJson().contains(
      """"schema_drift": [{"table": "public.t", "column": "note", "rows": 4}]"""),
      metrics.stateJson())
    // additive evolution: widen the spec, reopen the store on the SAME
    // root, re-merge the drifted tail — pre-evolution rows read back NULL
    val spec2 = SchemaDrift.evolved(spec, Seq("note"))
    assert(spec2.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    val registry2 = TableRegistry(Map("demo.t" -> "public.t"),
      Map("public.t" -> spec2))
    val store2 = new ParquetTableStore(spark, root, spec2, 4)
    CdcPipeline.applyBatch(
      MaxwellParser.events(stream(10, driftFrom = 7), registry2, col("seq0")),
      registry2, Map("public.t" -> store2))
    val got = store2.snapshot().as[(Long, String, Option[String])].collect().toSet
    val want = (1 to 10).map(i =>
      (i.toLong, s"v$i", if (i >= 7) Some(s"n$i") else None)).toSet
    assert(got == want, s"evolved snapshot diverged: $got")
    // and the evolved registry no longer reports drift
    assert(SchemaDrift.detect(
      MaxwellParser.events(stream(10, 7), registry2, col("seq0")),
      registry2).isEmpty)
  }

  test("JDBC store under an evolved spec fails loudly, never drops the column") {
    val dbUrl = s"jdbc:derby:memory:drift_${System.nanoTime()}"
    val store = new JdbcTableStore(spark, dbUrl + ";create=true", spec)
    store.init(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val spec2 = SchemaDrift.evolved(spec, Seq("note"))
    val store2 = new JdbcTableStore(spark, dbUrl, spec2)
    val e = intercept[Exception] {
      store2.merge(graft.operators.CompactedBatch(
        deletes = Seq.empty[Long].toDF("id"),
        upserts = Seq((3L, "c", "n3")).toDF("id", "v", "note")))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).nonEmpty, "JDBC evolution must fail with a real error")
    try { java.sql.DriverManager.getConnection(dbUrl + ";drop=true"); () }
    catch { case e: java.sql.SQLException if e.getSQLState == "08006" => () }
  }

  test("evolved refuses existing columns") {
    intercept[IllegalArgumentException](SchemaDrift.evolved(spec, Seq("V")))
  }

  test("star-MV maintenance survives additive fact evolution mid-stream") {
    import graft.plans.{MaterializedView, StarMv, StarMvMaintainer}
    import graft.sources.ParquetTableStore
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val factSchema = StructType(Seq(
      StructField("o_id", LongType), StructField("f_cust", LongType),
      StructField("v", LongType)))
    val dimSchema = StructType(Seq(
      StructField("c_cust", LongType), StructField("seg", StringType)))
    val factSpec = TableSpec("public.drift_f", factSchema, Seq("o_id"))
    val froot = tmpDir("drift_smv_f"); val droot = tmpDir("drift_smv_d")
    val fs = new ParquetTableStore(spark, froot, factSpec, 4,
      retainedVersions = 3)
    val ds = new ParquetTableStore(spark, droot,
      TableSpec("public.drift_d", dimSchema, Seq("c_cust")), 4,
      retainedVersions = 3)
    fs.init((1L to 60L).map(i => (i, 1L + i % 6, i % 10))
      .toDF("o_id", "f_cust", "v"))
    ds.init((1L to 6L).map(c => (c, s"s$c")).toDF("c_cust", "seg"))
    val factKey = tmpDir("drift_smv_fk"); val dimKey = tmpDir("drift_smv_dk")
    fs.snapshot().write.mode("overwrite").parquet(factKey)
    ds.snapshot().write.mode("overwrite").parquet(dimKey)
    import StarMv.{QCol, StarMvDef}
    val mv = StarMv.build(spark, StarMvDef(
      tables = Seq(factKey, dimKey),
      joins = Seq((QCol(factKey, "f_cust"), QCol(dimKey, "c_cust"))),
      groupCols = Seq(QCol(dimKey, "seg")),
      measureCols = Seq(QCol(factKey, "v")),
      summaryPath = tmpDir("drift_smv_sum")))
    val statePath = tmpDir("drift_smv_state") + "/s"
    val m0 = StarMvMaintainer.create(spark,
      Map(factKey -> fs, dimKey -> ds), mv, statePath)
    var liveSummary = m0.definition.summaryPath
    try {
      // mid-stream DDL: the fact grows a column; the store is reopened
      // under the evolved spec (pre-evolution files surface it as NULL)
      // and the MAINTAINER is reopened over the evolved store — the
      // registered pre-evolution definition must keep maintaining and
      // serving (the new column is simply unused by the summary)
      val evolvedSpec = SchemaDrift.evolved(factSpec, Seq("note"))
      val fs2 = new ParquetTableStore(spark, froot, evolvedSpec, 4,
        retainedVersions = 3)
      val m = StarMvMaintainer.open(spark,
        Map(factKey -> fs2, dimKey -> ds), statePath)
      fs2.merge(graft.operators.CompactedBatch(
        deletes = Seq(1L, 2L).toDF("o_id"),
        upserts = Seq((100L, 3L, 42L, "hello"))
          .toDF("o_id", "f_cust", "v", "note")))
      m.sync()
      liveSummary = m.definition.summaryPath
      def rollup = fs2.snapshot()
        .join(ds.snapshot(), col("f_cust") === col("c_cust"))
        .groupBy("seg").agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      val truth = ((3L to 60L).map(i => (i, 1L + i % 6, i % 10)) :+
        ((100L, 3L, 42L))).groupBy(_._2).map { case (c, rs) =>
        (s"s$c", rs.map(_._3).sum, rs.size.toLong) }.toSet
      assert(rollup.as[(String, Long, Long)].collect().toSet === truth,
        "post-evolution sync must stay convergent")
      val paths = rollup.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
      }.flatten
      assert(paths.nonEmpty && paths.forall(_.contains("drift_smv_sum")),
        s"evolved-fact rollup must still serve from the summary: $paths")
      // a query USING the evolved column cannot be served — and is right
      val q2 = fs2.snapshot()
        .join(ds.snapshot(), col("f_cust") === col("c_cust"))
        .groupBy("seg").agg(count(col("note")).as("n_note"))
      assert(q2.as[(String, Long)].collect().toMap.values.sum === 1L,
        "the evolved column reads correctly through the live join")
    } finally {
      StarMv.unregister(liveSummary)
      MaterializedView.replaceDirs(factKey, Nil)
      MaterializedView.replaceDirs(dimKey, Nil)
    }
  }
}
