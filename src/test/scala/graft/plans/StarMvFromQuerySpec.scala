package graft.plans

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** [[StarMv.fromQuery]] — `CREATE MATERIALIZED VIEW … AS <query>`: the
  * definition is DERIVED from the query the user wants accelerated, so
  * after one call that exact query (and the family the rewrite implies)
  * serves from the summary. Tests pin extraction of plain groups, derived
  * day groups (named by the query's own alias), plain and expression
  * measures, and the refusal matrix.
  */
class StarMvFromQuerySpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private val rnd = new scala.util.Random(53)
  private val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
  private val factRows = (1 to 400).map { _ =>
    (new Timestamp(base + rnd.nextInt(30) * 86400000L +
      rnd.nextInt(86400) * 1000L),
      rnd.nextInt(5).toLong + 1, rnd.nextInt(40).toLong,
      (rnd.nextInt(500) + 100).toLong)
  }
  private val dimRows = (1 to 5).map(k => (k.toLong, s"c${k % 2}"))

  private def tables(tag: String): (String, String) = {
    val (f, dm) = (tmpDir(s"sfq_${tag}_fact"), tmpDir(s"sfq_${tag}_dim"))
    factRows.toDF("ts", "f_d", "qty", "price")
      .write.mode("overwrite").parquet(f)
    dimRows.toDF("d_k", "cat").write.mode("overwrite").parquet(dm)
    (f, dm)
  }

  private def query(f: String, dm: String): DataFrame =
    spark.read.parquet(f)
      .join(spark.read.parquet(dm), col("f_d") === col("d_k"))
      .groupBy(col("cat"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"),
        min(col("qty")).as("mnq"), avg(col("qty")).as("aq"),
        sum(col("qty") * col("price")).as("rev"))

  test("the registered query itself serves from the summary immediately") {
    val (f, dm) = tables("self")
    val s = tmpDir("sfq_self_sum")
    val before = query(f, dm).collect().map(_.toString).toSet
    val d = StarMv.fromQuery(spark, query(f, dm), s)
    try {
      assert(d.groupCols.map(_.name) === Seq("cat"))
      assert(d.derivedGroups.map(_._1) === Seq("day"))
      assert(d.measureCols.map(_.name) === Seq("qty"))
      assert(d.derivedMeasures.size === 1) // qty * price
      val served = query(f, dm)
      assert(scanPaths(served) == Seq(MaterializedView.normalize(s)),
        s"must scan ONLY the summary: ${scanPaths(served)}")
      assert(served.collect().map(_.toString).toSet === before)
    } finally StarMv.unregister(s)
  }

  test("sibling shapes the def implies serve too (month rollup over day)") {
    val (f, dm) = tables("sib")
    val s = tmpDir("sfq_sib_sum")
    StarMv.fromQuery(spark, query(f, dm), s)
    try {
      def sib = spark.read.parquet(f)
        .join(spark.read.parquet(dm), col("f_d") === col("d_k"))
        .groupBy(trunc(col("ts").cast("date"), "mon").as("month"))
        .agg(sum(col("qty") * col("price")).as("rev"), count(lit(1)).as("n"))
      assert(scanPaths(sib) == Seq(MaterializedView.normalize(s)))
      val on = sib.collect().map(_.toString).toSet
      spark.conf.set("spark.graft.mv.enabled", "false")
      val off = try sib.collect().map(_.toString).toSet
        finally spark.conf.set("spark.graft.mv.enabled", "true")
      assert(on === off)
    } finally StarMv.unregister(s)
  }

  test("losslessTables pass through to verification and sub-join serving") {
    val (f, dm) = tables("loss")
    val s = tmpDir("sfq_loss_sum")
    StarMv.fromQuery(spark, query(f, dm), s, losslessTables = Seq(dm))
    try {
      def bare = spark.read.parquet(f)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("n"))
      assert(scanPaths(bare) == Seq(MaterializedView.normalize(s)),
        "bare-fact day rollup must serve from the summary")
    } finally StarMv.unregister(s)
  }

  test("autoLossless detects provable extensions; dirty dims stay undeclared") {
    val (f, dm) = tables("auto")
    val s = tmpDir("sfq_auto_sum")
    StarMv.fromQuery(spark, query(f, dm), s, autoLossless = true)
    try {
      val d = StarMv.registered.find(_.summaryPath == s).get
      assert(d.losslessTables.map(MaterializedView.normalize) ===
        Seq(MaterializedView.normalize(dm)))
      def bare = spark.read.parquet(f)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("qty")).as("sq"))
      assert(scanPaths(bare) == Seq(MaterializedView.normalize(s)),
        "auto-detected losslessness must enable bare-fact serving")
    } finally StarMv.unregister(s)
    // a dim with a duplicate key is NOT detected: the build succeeds
    // (nothing declared), and the sub-join falls back to the base
    val (f2, dm2) = tables("auto2")
    dimRows.++(Seq((1L, "cDUP"))).toDF("d_k", "cat")
      .write.mode("overwrite").parquet(dm2)
    val s2 = tmpDir("sfq_auto2_sum")
    StarMv.fromQuery(spark, query(f2, dm2), s2, autoLossless = true)
    try {
      assert(StarMv.registered.find(_.summaryPath == s2)
        .get.losslessTables.isEmpty)
      val bare2 = spark.read.parquet(f2)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("qty")).as("sq"))
      assert(scanPaths(bare2).exists(_ != MaterializedView.normalize(s2)),
        "an undetectable extension must not serve sub-joins")
    } finally StarMv.unregister(s2)
  }

  test("refusals name the reason: filters, outer joins, distinct aggs") {
    val (f, dm) = tables("ref")
    val s = tmpDir("sfq_ref_sum")
    val filtered = spark.read.parquet(f)
      .join(spark.read.parquet(dm), col("f_d") === col("d_k"))
      .filter(col("qty") > 5)
      .groupBy(col("cat")).agg(sum(col("qty")).as("sq"))
    val e1 = intercept[IllegalArgumentException] {
      StarMv.fromQuery(spark, filtered, s) }
    assert(e1.getMessage.contains("residual"))
    val outer = spark.read.parquet(f)
      .join(spark.read.parquet(dm), col("f_d") === col("d_k"), "left")
      .groupBy(col("cat")).agg(sum(col("qty")).as("sq"))
    val e2 = intercept[IllegalArgumentException] {
      StarMv.fromQuery(spark, outer, s) }
    assert(e2.getMessage.contains("inner-equi-join"))
    val distinctAgg = spark.read.parquet(f)
      .join(spark.read.parquet(dm), col("f_d") === col("d_k"))
      .groupBy(col("cat")).agg(countDistinct(col("qty")).as("dq"))
    val e3 = intercept[IllegalArgumentException] {
      StarMv.fromQuery(spark, distinctAgg, s) }
    assert(e3.getMessage.contains("distinct"))
    // scoped to THIS test's paths — global emptiness would couple the
    // assertion to every other suite's registry hygiene
    assert(!StarMv.registered.exists(_.summaryPath == s),
      "refused fromQuery must not register anything")
  }
}
