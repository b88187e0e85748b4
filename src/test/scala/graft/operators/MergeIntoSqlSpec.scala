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
      // non-identity INSERT list
      assert(err("""MERGE INTO public.acct_sql t USING mi_src3 s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, bal, seg) VALUES (s.id, s.bal * 2, s.seg)
        |""".stripMargin).contains("identity mapping"))
      // the store is untouched after every refused statement
      assert(state(store) == Map(
        1L -> ((100.0, "A")), 2L -> ((200.0, "B")), 3L -> ((300.0, "A")),
        4L -> ((400.0, "B"))))
    } finally { MergeIntoSql.clear() }
  }
}
