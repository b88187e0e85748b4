package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `graft` TableCatalog: durable names resolving in ANY session with
  * zero register calls — the session-independence contract the r13
  * verdict ranked first. Covers: `_spec` round-trip, catalog SELECT via
  * both tiers (V1Scan fallback in a plain session; native-plan splice
  * under the extensions resolution rule), time travel (VERSION and
  * TIMESTAMP AS OF), DDL (CREATE/DROP/list), and DML through the SQL
  * face's catalog resolution.
  */
class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("bal", DoubleType),
    StructField("seg", StringType)))

  private def freshCatalog(name: String): String = {
    val root = tmpDir(s"gcat-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    root
  }

  private def buildStore(root: String, dotted: String,
      retained: Int = 1): ParquetTableStore = {
    val st = new ParquetTableStore(spark, root,
      TableSpec(dotted, schema, Seq("id")), 8, retainedVersions = retained)
    st.init(Seq((1L, 100.0, "A"), (2L, 200.0, "B"), (3L, 300.0, "A"))
      .toDF("id", "bal", "seg"))
    st
  }

  test("_spec round-trips every field; loader reopens the right family") {
    val root = tmpDir("gcat-spec")
    val rec = StoreSpecIO.Rec("cow", "public.t1", schema, Seq("id"),
      buckets = 8, retained = 3, cluster = Seq("seg"))
    val dir = GraftStoreLoader.tableDir(root, "public.t1")
    StoreSpecIO.ensure(spark.sparkContext.hadoopConfiguration, dir, rec)
    assert(StoreSpecIO.read(spark.sparkContext.hadoopConfiguration, dir)
      .contains(rec))
    // a committed store writes its own _spec; the loader reopens it
    buildStore(root, "public.orders", retained = 2)
    GraftStoreLoader.load(spark, root, "public.orders") match {
      case Some(GraftStoreLoader.LoadedCow(r, st)) =>
        assert(r.pk == Seq("id") && r.buckets == 8 && r.retained == 2)
        assert(st.snapshot().count() == 3)
      case other => fail(s"expected LoadedCow, got $other")
    }
    // MOR and log write identity too
    val mor = new MorTableStore(spark, root,
      TableSpec("public.m1", schema, Seq("id")), 4)
    mor.init(Seq((1L, 1.0, "x")).toDF("id", "bal", "seg"))
    assert(GraftStoreLoader.load(spark, root, "public.m1")
      .exists(_.isInstanceOf[GraftStoreLoader.LoadedMor]))
    val log = new AppendLog(spark, root, "public.l1", schema, Seq("id"))
    log.append(Seq((9L, 9.0, "z")).toDF("id", "bal", "seg"))
    GraftStoreLoader.load(spark, root, "public.l1") match {
      case Some(GraftStoreLoader.LoadedLog(r, lg)) =>
        assert(r.zones == Seq("id") && lg.scan().count() == 1)
      case other => fail(s"expected LoadedLog, got $other")
    }
  }

  test("catalog SELECT in a PLAIN session (V1Scan fallback), fresh-session durability, DDL") {
    val root = freshCatalog("gtest")
    try {
      buildStore(root, "public.orders")
      // zero register calls: the name resolves through the catalog
      val rows = spark.sql(
        "SELECT seg, CAST(sum(bal) AS DOUBLE) AS s FROM gtest.public.orders GROUP BY seg")
        .as[(String, Double)].collect().toMap
      assert(rows == Map("A" -> 400.0, "B" -> 200.0))
      // a FRESH session sees the same durable name with nothing but the
      // catalog conf (normally spark-defaults) — zero register calls
      val ns = spark.newSession()
      ns.conf.set("spark.sql.catalog.gtest", "graft.sources.GraftCatalog")
      ns.conf.set("spark.sql.catalog.gtest.root", root)
      assert(ns.sql("SELECT count(*) AS n FROM gtest.public.orders")
        .as[Long].head() == 3L)
      assert(ns.catalog.tableExists("gtest.public.orders"))
      // DDL: CREATE an empty store, insert via the SQL face, DROP it
      ns.sql("CREATE TABLE gtest.public.fresh (k BIGINT, v STRING) " +
        "TBLPROPERTIES('pk'='k','buckets'='4')")
      assert(ns.sql("SELECT * FROM gtest.public.fresh").count() == 0L)
      graft.operators.MergeIntoSql.sql(ns,
        "INSERT INTO gtest.public.fresh VALUES (1, 'a'), (2, 'b')")
      assert(ns.sql("SELECT * FROM gtest.public.fresh").count() == 2L)
      assert(ns.sql("SHOW TABLES IN gtest.public").collect()
        .map(_.getString(1)).toSet == Set("orders", "fresh"))
      ns.sql("DROP TABLE gtest.public.fresh")
      assert(!ns.catalog.tableExists("gtest.public.fresh"))
      // CREATE without pk fails loudly (the reference's own invariant)
      val e = intercept[Exception](ns.sql(
        "CREATE TABLE gtest.public.nopk (k BIGINT) TBLPROPERTIES('kind'='cow')"))
      assert(e.getMessage.contains("pk"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gtest")
      spark.conf.unset("spark.sql.catalog.gtest.root")
    }
  }

  test("time travel through the catalog: VERSION AS OF and TIMESTAMP AS OF") {
    val root = freshCatalog("gtt")
    try {
      val st = buildStore(root, "public.acct", retained = 3)
      val v0 = st.currentVersion
      val ts0 = st.versionTimestamp(v0).get
      // ensure the next commit lands on a LATER wall-clock millisecond
      while (System.currentTimeMillis() <= ts0) Thread.sleep(2)
      st.merge(graft.operators.CompactedBatch(
        deletes = Seq.empty[Long].toDF("id"),
        upserts = Seq((1L, 111.0, "A")).toDF("id", "bal", "seg")))
      val v1 = st.currentVersion
      val ts1 = st.versionTimestamp(v1).get
      assert(ts1 > ts0)
      def q(sql: String) = spark.sql(sql).as[Double].head()
      assert(q("SELECT CAST(sum(bal) AS DOUBLE) FROM gtt.public.acct") == 611.0)
      assert(q(s"SELECT CAST(sum(bal) AS DOUBLE) FROM gtt.public.acct VERSION AS OF $v0") == 600.0)
      // a timestamp BETWEEN the two commits resolves the first version
      val mid = java.time.Instant.ofEpochMilli(ts0)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(q(s"SELECT CAST(sum(bal) AS DOUBLE) FROM gtt.public.acct TIMESTAMP AS OF '$mid'") == 600.0)
      // ...and one after the second commit resolves the head
      val late = java.time.Instant.ofEpochMilli(ts1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(q(s"SELECT CAST(sum(bal) AS DOUBLE) FROM gtt.public.acct TIMESTAMP AS OF '$late'") == 611.0)
      // before-the-table timestamps refuse loudly
      val e = intercept[Exception](spark.sql(
        "SELECT * FROM gtt.public.acct TIMESTAMP AS OF '1999-01-01'").collect())
      assert(e.getMessage.contains("predates") || e.getMessage.contains("retention"))
      // the REGISTRY twin resolves the same timestamp forms
      graft.operators.MergeIntoSql.register("acct_reg", st, st.snapshotForKeys(_))
      try {
        assert(graft.operators.MergeIntoSql.sql(spark,
          s"SELECT CAST(sum(bal) AS DOUBLE) FROM acct_reg TIMESTAMP AS OF '$mid'")
          .as[Double].head() == 600.0)
      } finally graft.operators.MergeIntoSql.unregister("acct_reg")
    } finally {
      spark.conf.unset("spark.sql.catalog.gtt")
      spark.conf.unset("spark.sql.catalog.gtt.root")
    }
  }

  test("extensions tier: the resolution rule splices the NATIVE parquet plan (no V1 RDD scan)") {
    val root = tmpDir("gcat-ext")
    buildStore(root, "public.fast")
    val ext = org.apache.spark.sql.graft.ExtensionsBridge
      .sessionWithExtensions(spark, new graft.GraftExtensions()(_))
    ext.conf.set("spark.sql.catalog.gext", "graft.sources.GraftCatalog")
    ext.conf.set("spark.sql.catalog.gext.root", root)
    val df = ext.sql(
      "SELECT seg, CAST(sum(bal) AS DOUBLE) AS s FROM gext.public.fast " +
        "WHERE bal > 150.0 GROUP BY seg")
    // analysis replaced the catalog relation with the store's own scan:
    // the optimized plan holds a parquet LogicalRelation, no DSv2 node
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.nonEmpty, s"expected a native parquet relation in:\n$optimized")
    assert(optimized.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
    }.isEmpty, "DSv2 relation must be spliced away by the resolution rule")
    // and the pushed filter reaches the scan
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("bal"),
      s"expected a pushed filter in:\n$physical")
    assert(df.collect().map(r => (r.getString(0), r.getDouble(1))).toMap ==
      Map("A" -> 300.0, "B" -> 200.0))
    // the extensions parser also owns DML over the catalog name
    ext.sql("DELETE FROM gext.public.fast WHERE seg = 'B'")
    assert(ext.sql("SELECT count(*) FROM gext.public.fast").as[Long].head() == 2L)
  }

  test("DML via the SQL face against catalog names: zero registration, all four statements") {
    val root = freshCatalog("gdml")
    try {
      buildStore(root, "public.acct")
      val log = new AppendLog(spark, root, "public.ev", schema, Seq("id"))
      log.append(Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("id", "bal", "seg"))
      def g(sql: String): Long =
        graft.operators.MergeIntoSql.sql(spark, sql).head().getLong(0)
      assert(g("DELETE FROM gdml.public.acct WHERE seg = 'B'") == 1L)
      assert(g("UPDATE gdml.public.acct SET bal = bal + 1.0 WHERE seg = 'A'") == 2L)
      assert(g("INSERT INTO gdml.public.acct VALUES (7, 7.0, 'C')") == 1L)
      Seq((1L, 150.0, "A"), (8L, 800.0, "D")).toDF("id", "bal", "seg")
        .createOrReplaceTempView("gdml_src")
      val merged = graft.operators.MergeIntoSql.sql(spark,
        """MERGE INTO gdml.public.acct t USING gdml_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET bal = s.bal
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        .as[(Long, Long, Long, Long)].head()
      assert(merged == ((1L, 0L, 1L, 1L)))
      val fin = spark.sql("SELECT id, bal FROM gdml.public.acct")
        .as[(Long, Double)].collect().toMap
      assert(fin == Map(1L -> 150.0, 3L -> 301.0, 7L -> 7.0, 8L -> 800.0))
      // log statements: INSERT appends, DELETE prunes, UPDATE refuses
      assert(g("INSERT INTO gdml.public.ev VALUES (3, 3.0, 'z')") == 1L)
      assert(g("DELETE FROM gdml.public.ev WHERE id = 1") == 1L)
      val e = intercept[IllegalArgumentException](graft.operators.MergeIntoSql
        .sql(spark, "UPDATE gdml.public.ev SET bal = 0"))
      assert(e.getMessage.contains("immutable"))
      assert(spark.sql("SELECT id FROM gdml.public.ev").as[Long]
        .collect().toSet == Set(2L, 3L))
    } finally {
      spark.conf.unset("spark.sql.catalog.gdml")
      spark.conf.unset("spark.sql.catalog.gdml.root")
    }
  }
}
