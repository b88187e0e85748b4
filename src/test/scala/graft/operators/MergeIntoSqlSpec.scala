package graft.operators

import graft.SparkTestBase
import graft.model.TableSpec
import graft.sources.ParquetTableStore
import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MergeIntoSqlSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.acct_sql",
    StructType(Seq(
      StructField("id", LongType),
      StructField("bal", DoubleType),
      StructField("seg", StringType))),
    Seq("id"))

  private def initStore(name: String = "public.acct_sql") = {
    val s = new ParquetTableStore(spark, tmpDir("misql"), spec.copy(name = name), 8)
    s.init(Seq(
      (1L, 100.0, "A"), (2L, 200.0, "B"), (3L, 300.0, "A"), (4L, 400.0, "B"))
      .toDF("id", "bal", "seg"))
    s
  }

  private def state(s: graft.sources.TableStore): Map[Long, (Double, String)] =
    s.snapshot().collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap

  private val sourceRows = Seq(
    (1L, 150.0, "A"),   // matched, update cond true (bal rises)
    (2L, 0.0, "DROP"),  // matched, delete cond true
    (3L, 250.0, "A"),   // matched, neither -> byte-identical no-op
    (9L, 900.0, "C"),   // not matched, insert
    (10L, -1.0, "C"))   // not matched, insert cond false -> dropped

  test("SQL MERGE produces the same table and stats as the Scala API") {
    val viaSql = initStore()
    val viaApi = initStore("public.acct_api")
    try {
      sourceRows.toDF("id", "bal", "seg").createOrReplaceTempView("mi_src")
      MergeIntoSql.register("public.acct_sql", viaSql, viaSql.snapshotForKeys(_))
      val stats = MergeIntoSql.sql(spark,
        """MERGE INTO public.acct_sql t USING mi_src s ON t.id = s.id
          |WHEN MATCHED AND s.seg = 'DROP' THEN DELETE
          |WHEN MATCHED AND t.bal < s.bal THEN UPDATE SET bal = s.bal
          |WHEN NOT MATCHED AND s.bal > 0 THEN INSERT *""".stripMargin)
        .as[(Long, Long, Long, Long)].head()
      assert(stats == ((3L, 1L, 1L, 1L)))
      MergeInto(viaApi, viaApi.snapshotForKeys(_),
        sourceRows.toDF("id", "bal", "seg"),
        whenMatchedDelete = Some(col("s.seg") === "DROP"),
        whenMatchedUpdate = Some(MergeInto.Update(
          col("t.bal") < col("s.bal"), Map("bal" -> col("s.bal")))),
        whenNotMatchedInsert = Some(col("s.bal") > 0))
      assert(state(viaSql) == state(viaApi))
      assert(state(viaSql) == Map(
        1L -> ((150.0, "A")), 3L -> ((300.0, "A")), 4L -> ((400.0, "B")),
        9L -> ((900.0, "C"))))
    } finally { MergeIntoSql.clear() }
  }

  test("UPDATE SET *, identity INSERT list, subquery source, reversed ON sides") {
    val store = initStore()
    try {
      sourceRows.toDF("id", "bal", "seg").createOrReplaceTempView("mi_src2")
      MergeIntoSql.register("public.acct_sql", store, store.snapshotForKeys(_))
      val stats = MergeIntoSql.sql(spark,
        """MERGE INTO public.acct_sql t
          |USING (SELECT * FROM mi_src2 WHERE bal >= 0) s ON s.id = t.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT (id, bal, seg) VALUES (s.id, s.bal, s.seg)
          |""".stripMargin).as[(Long, Long, Long, Long)].head()
      assert(stats == ((3L, 0L, 3L, 1L)))
      assert(state(store) == Map(
        1L -> ((150.0, "A")), 2L -> ((0.0, "DROP")), 3L -> ((250.0, "A")),
        4L -> ((400.0, "B")), 9L -> ((900.0, "C"))))
    } finally { MergeIntoSql.clear() }
  }

  test("computed INSERT expressions: arbitrary source-side VALUES, cast to the declared type") {
    val store = initStore()
    try {
      sourceRows.toDF("id", "bal", "seg").createOrReplaceTempView("mi_srcX")
      MergeIntoSql.register("public.acct_sql", store, store.snapshotForKeys(_))
      val stats = MergeIntoSql.sql(spark,
        """MERGE INTO public.acct_sql t USING mi_srcX s ON t.id = s.id
          |WHEN NOT MATCHED AND s.bal > 0 THEN
          |  INSERT (id, bal, seg) VALUES (s.id + 1000, s.bal * 1.1, upper(s.seg))
          |""".stripMargin).as[(Long, Long, Long, Long)].head()
      assert(stats == ((3L, 0L, 0L, 1L)))
      val st = state(store)
      assert(st(1009L)._2 == "C" && math.abs(st(1009L)._1 - 990.0) < 1e-6)
      assert(st.keySet == Set(1L, 2L, 3L, 4L, 1009L))
      // the Scala API twin: insertSet map, source NOT carrying a column
      // the map covers
      val store2 = initStore("public.acct_sql_is")
      val thin = Seq((20L, 5.0)).toDF("id", "bal") // no seg column at all
      val s2 = MergeInto(store2, store2.snapshotForKeys(_), thin,
        whenNotMatchedInsert = Some(lit(true)),
        insertSet = Map("seg" -> lit("NEW"), "bal" -> (col("s.bal") * 2)))
      assert(s2 == MergeInto.Stats(0L, 0L, 0L, 1L))
      assert(state(store2)(20L) == ((10.0, "NEW")))
    } finally { MergeIntoSql.clear() }
  }

  test("GraftExtensions installs the parser: registered target compiles, others pass through") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val parser = org.apache.spark.sql.graft.ExtensionsBridge
      .buildParser(ext, spark, spark.sessionState.sqlParser)
    val stmt = """MERGE INTO public.acct_sql t USING mi_src s ON t.id = s.id
                 |WHEN MATCHED THEN DELETE""".stripMargin
    // unregistered: the parsed MergeIntoTable passes through untouched
    MergeIntoSql.clear()
    assert(parser.parsePlan(stmt).isInstanceOf[MergeIntoTable])
    // registered: compiles to the graft command
    val store = initStore()
    try {
      MergeIntoSql.register("public.acct_sql", store, store.snapshotForKeys(_))
      val plan = parser.parsePlan(stmt)
      assert(plan.isInstanceOf[GraftMergeCommand],
        s"expected GraftMergeCommand, got ${plan.getClass}")
      // and a non-MERGE statement is the delegate's own plan shape
      // (exprIds differ between parses — compare structure, not ids)
      val p = parser.parsePlan("SELECT 1 AS one")
      val d = spark.sessionState.sqlParser.parsePlan("SELECT 1 AS one")
      assert(p.getClass == d.getClass && p.children.size == d.children.size)
    } finally { MergeIntoSql.clear() }
  }

  test("SQL DELETE / UPDATE / INSERT drive the registered store with store-native semantics") {
    val store = initStore()
    try {
      MergeIntoSql.register("public.acct_sql", store, store.snapshotForKeys(_))
      // DELETE: bucket-pruned CoW deleteWhere; NULL-pred rows kept
      val del = MergeIntoSql.sql(spark,
        "DELETE FROM public.acct_sql WHERE seg = 'A' AND bal < 200.0")
        .as[Long].head()
      assert(del == 1L)
      assert(state(store) == Map(2L -> ((200.0, "B")), 3L -> ((300.0, "A")),
        4L -> ((400.0, "B"))))
      // UPDATE with SET over the row's own columns and a target-qualified ref
      val upd = MergeIntoSql.sql(spark,
        "UPDATE public.acct_sql t SET bal = t.bal + 10.0 WHERE t.seg = 'B'")
        .as[Long].head()
      assert(upd == 2L)
      assert(state(store) == Map(2L -> ((210.0, "B")), 3L -> ((300.0, "A")),
        4L -> ((410.0, "B"))))
      // INSERT: positional VALUES; keyed-store semantics are UPSERT
      val ins = MergeIntoSql.sql(spark,
        "INSERT INTO public.acct_sql VALUES (9, 900.0, 'C'), (3, 333.0, 'Z')")
        .as[Long].head()
      assert(ins == 2L)
      assert(state(store) == Map(2L -> ((210.0, "B")), 3L -> ((333.0, "Z")),
        4L -> ((410.0, "B")), 9L -> ((900.0, "C"))))
      // duplicate keys within one INSERT batch are refused, store untouched
      val e = intercept[Exception](MergeIntoSql.sql(spark,
        "INSERT INTO public.acct_sql VALUES (7, 1.0, 'X'), (7, 2.0, 'Y')"))
      assert(e.getMessage.contains("duplicate keys"))
      assert(!state(store).contains(7L))
      // UPDATE SET on the key column is refused at compile time
      val e2 = intercept[IllegalArgumentException](MergeIntoSql.sql(spark,
        "UPDATE public.acct_sql SET id = 99 WHERE bal > 0"))
      assert(e2.getMessage.contains("key column"))
      // INSERT OVERWRITE refused
      val e3 = intercept[IllegalArgumentException](MergeIntoSql.sql(spark,
        "INSERT OVERWRITE TABLE public.acct_sql VALUES (1, 1.0, 'A')"))
      assert(e3.getMessage.contains("OVERWRITE"))
    } finally { MergeIntoSql.clear(); MergeIntoSql.unregisterLog("public.acct_sql") }
  }

  test("SQL DELETE / INSERT on a registered append log; UPDATE on a log is refused") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    val log = new graft.sources.AppendLog(spark, tmpDir("sqllog"),
      "public.ev_sql", schema, Seq("v"))
    try {
      log.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
      log.append(Seq((3L, 30.0)).toDF("id", "v"))
      MergeIntoSql.registerLog("public.ev_sql", log)
      // INSERT appends ONE new batch
      val ins = MergeIntoSql.sql(spark,
        "INSERT INTO public.ev_sql VALUES (4, 40.0)").as[Long].head()
      assert(ins == 1L && log.batchCount == 3)
      // DELETE rides the zone-pruned dir surgery
      val del = MergeIntoSql.sql(spark,
        "DELETE FROM public.ev_sql WHERE v >= 30.0").as[Long].head()
      assert(del == 2L)
      assert(log.scan().select("id").as[Long].collect().toSet == Set(1L, 2L))
      val e = intercept[IllegalArgumentException](MergeIntoSql.sql(spark,
        "UPDATE public.ev_sql SET v = 0.0 WHERE id = 1"))
      assert(e.getMessage.contains("immutable"))
    } finally MergeIntoSql.unregisterLog("public.ev_sql")
  }

  test("SELECT face: registered names resolve as relations, VERSION AS OF time-travels, temp views win") {
    val store = initStore()
    try {
      MergeIntoSql.register("public.acct_sql", store, store.snapshotForKeys(_))
      // live snapshot through plain SQL
      val live = MergeIntoSql.sql(spark,
        "SELECT seg, sum(bal) AS s FROM public.acct_sql GROUP BY seg")
        .as[(String, Double)].collect().toMap
      assert(live == Map("A" -> 400.0, "B" -> 600.0))
      // mutate, then time-travel back to the initial version
      val v0 = store.currentVersion
      MergeIntoSql.sql(spark,
        "UPDATE public.acct_sql SET bal = bal + 1000.0 WHERE seg = 'A'")
      val now = MergeIntoSql.sql(spark,
        "SELECT sum(bal) AS s FROM public.acct_sql").as[Double].head()
      assert(now == 3000.0)
      val back = MergeIntoSql.sql(spark,
        s"SELECT sum(bal) AS s FROM public.acct_sql VERSION AS OF $v0")
        .as[Double].head()
      assert(back == 1000.0)
      // a registered name also serves as a DML source
      val store2 = initStore("public.acct_sql2")
      MergeIntoSql.register("public.acct_sql2", store2, store2.snapshotForKeys(_))
      MergeIntoSql.sql(spark,
        """MERGE INTO public.acct_sql2 t USING
          |  (SELECT id, bal, seg FROM public.acct_sql WHERE seg = 'A') s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET bal = s.bal""".stripMargin)
      assert(state(store2)(1L)._1 == 1100.0)
      // an existing temp view of the same name wins over the registration
      Seq((42L, 1.0, "V")).toDF("id", "bal", "seg")
        .createOrReplaceTempView("acct_shadow")
      MergeIntoSql.register("acct_shadow", store, store.snapshotForKeys(_))
      assert(MergeIntoSql.sql(spark, "SELECT count(*) AS n FROM acct_shadow")
        .as[Long].head() == 1L)
      // TIMESTAMP AS OF resolves against commit wall-clock (r14);
      // a timestamp predating every retained commit refuses loudly
      val e = intercept[IllegalArgumentException](MergeIntoSql.sql(spark,
        "SELECT * FROM public.acct_sql TIMESTAMP AS OF '2024-01-01'"))
      assert(e.getMessage.contains("predates"))
      // ...and a current one reads the head era
      val nowIso = java.time.Instant.now().plusSeconds(1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
      assert(MergeIntoSql.sql(spark,
        s"SELECT sum(bal) AS s FROM public.acct_sql TIMESTAMP AS OF '$nowIso'")
        .as[Double].head() == now)
    } finally {
      spark.catalog.dropTempView("acct_shadow")
      MergeIntoSql.clear()
    }
  }

  test("unsupported shapes fail with a clean [GRAFT_MERGE] error") {
    val store = initStore()
    try {
      MergeIntoSql.register("public.acct_sql", store, store.snapshotForKeys(_))
      Seq(1L).toDF("id").createOrReplaceTempView("mi_keys")
      sourceRows.toDF("id", "bal", "seg").createOrReplaceTempView("mi_src3")
      def err(sql: String): String =
        intercept[IllegalArgumentException](MergeIntoSql.sql(spark, sql)).getMessage
      // unregistered target is refused by the no-extensions entry point
      assert(err("""MERGE INTO public.nope t USING mi_src3 s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin).contains("not a registered"))
      // ON must be the full key equality
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.bal = s.bal
        |WHEN MATCHED THEN DELETE""".stripMargin).contains("ON must be the key equality"))
      // UPDATE written before DELETE would reorder clause evaluation
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN MATCHED AND t.bal < s.bal THEN UPDATE SET bal = s.bal
        |WHEN MATCHED AND s.seg = 'DROP' THEN DELETE""".stripMargin)
        .contains("DELETE clause before UPDATE"))
      // SET on a key column
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET id = s.id""".stripMargin)
        .contains("key column"))
      // NOT MATCHED BY SOURCE is deleteWhere's job
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        .contains("NOT MATCHED BY SOURCE"))
      // computed INSERT values may not read the target image
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, bal, seg) VALUES (s.id, t.bal, s.seg)
        |""".stripMargin).contains("no target image"))
      // INSERT list must cover every target column
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.id, s.bal)
        |""".stripMargin).contains("must cover every column"))
      // a column assigned twice is ambiguous
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, bal, bal) VALUES (s.id, s.bal, s.bal * 2)
        |""".stripMargin).contains("twice"))
      // the store is untouched after every refused statement
      assert(state(store) == Map(
        1L -> ((100.0, "A")), 2L -> ((200.0, "B")), 3L -> ((300.0, "A")),
        4L -> ((400.0, "B"))))
    } finally { MergeIntoSql.clear() }
  }
}
