package graft.plans

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Derived group columns in the MV rewrite: a summary built with an
  * EXPRESSION group (`day = cast(ts as date)`) must capture queries that
  * group by the same analyzed expression — the time-hierarchy MV shape —
  * while leaving different expressions on the base path.
  */
class MvDerivedSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val rows = Seq(
    ("click", ts("2024-03-01 08:00:00"), 10),
    ("click", ts("2024-03-01 17:30:00"), 20),
    ("view", ts("2024-03-01 09:00:00"), 5),
    ("click", ts("2024-03-02 10:00:00"), 7),
    ("view", ts("2024-03-03 23:59:59"), 1))

  private def setup(tag: String): String = {
    val base = tmpDir(s"mvdg_${tag}_base")
    rows.toDF("etype", "ts", "v").write.mode("overwrite").parquet(base)
    MaterializedView.build(spark, base, Seq("etype", "day"), Seq("v"),
      tmpDir(s"mvdg_${tag}_sum"),
      derivedGroups = Seq("day" -> "cast(ts as date)"))
    base
  }

  test("grouping by the derived expression reroutes to the summary") {
    val base = setup("hit")
    try {
      val q = spark.read.parquet(base)
        .groupBy(col("etype"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("mn"))
      val paths = scanPaths(q)
      assert(!paths.contains(MaterializedView.normalize(base)), s"scan: $paths")
      assert(q.as[(String, java.sql.Date, Long, Long, Int)].collect().toSet ==
        Set(("click", java.sql.Date.valueOf("2024-03-01"), 2L, 30L, 10),
          ("view", java.sql.Date.valueOf("2024-03-01"), 1L, 5L, 5),
          ("click", java.sql.Date.valueOf("2024-03-02"), 1L, 7L, 7),
          ("view", java.sql.Date.valueOf("2024-03-03"), 1L, 1L, 1)))
    } finally MaterializedView.unregister(base)
  }

  test("coarser rollup over only the derived day re-aggregates the summary") {
    val base = setup("coarse")
    try {
      val q = spark.read.parquet(base)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      assert(!scanPaths(q).contains(MaterializedView.normalize(base)))
      assert(q.as[(java.sql.Date, Long, Long)].collect().toSet ==
        Set((java.sql.Date.valueOf("2024-03-01"), 35L, 3L),
          (java.sql.Date.valueOf("2024-03-02"), 7L, 1L),
          (java.sql.Date.valueOf("2024-03-03"), 1L, 1L)))
    } finally MaterializedView.unregister(base)
  }

  test("a filter on a plain group column composes with derived grouping") {
    val base = setup("filt")
    try {
      val q = spark.read.parquet(base).filter(col("etype") === "click")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("v")).as("s"))
      assert(!scanPaths(q).contains(MaterializedView.normalize(base)))
      assert(q.as[(java.sql.Date, Long)].collect().toSet ==
        Set((java.sql.Date.valueOf("2024-03-01"), 30L),
          (java.sql.Date.valueOf("2024-03-02"), 7L)))
    } finally MaterializedView.unregister(base)
  }

  test("a DIFFERENT ts expression stays on the base — no false capture") {
    val base = setup("miss")
    try {
      // hour-level truncation is finer than the day summary: must not match
      val q = spark.read.parquet(base)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("v")).as("s"))
      assert(scanPaths(q) == Seq(MaterializedView.normalize(base)))
      assert(q.collect().length == 5)
      // raw ts grouping likewise
      val q2 = spark.read.parquet(base).groupBy(col("ts"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(q2) == Seq(MaterializedView.normalize(base)))
    } finally MaterializedView.unregister(base)
  }

  test("a day-RANGE filter (optimizer-rewritten to ts bounds) still reroutes") {
    val base = setup("range")
    try {
      // the optimizer turns these date-cast bounds into raw ts bounds at
      // session-TZ midnight; the rule must convert them back to day bounds
      val q = spark.read.parquet(base)
        .filter(col("ts").cast("date") >= lit(java.sql.Date.valueOf("2024-03-01")) &&
          col("ts").cast("date") < lit(java.sql.Date.valueOf("2024-03-03")))
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      assert(!scanPaths(q).contains(MaterializedView.normalize(base)),
        s"day-range rollup must answer from the summary: ${scanPaths(q)}")
      assert(q.as[(java.sql.Date, Long, Long)].collect().toSet ==
        Set((java.sql.Date.valueOf("2024-03-01"), 35L, 3L),
          (java.sql.Date.valueOf("2024-03-02"), 7L, 1L)))
      // a NON-midnight ts bound is not a day bound — must fall back
      val q2 = spark.read.parquet(base)
        .filter(col("ts") >= lit(ts("2024-03-01 12:00:00")))
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("v")).as("s"))
      assert(scanPaths(q2) == Seq(MaterializedView.normalize(base)))
      assert(q2.as[(java.sql.Date, Long)].collect().toSet ==
        Set((java.sql.Date.valueOf("2024-03-01"), 20L),
          (java.sql.Date.valueOf("2024-03-02"), 7L),
          (java.sql.Date.valueOf("2024-03-03"), 1L)))
    } finally MaterializedView.unregister(base)
  }

  test("a MONTH rollup (expression over the derived day) re-aggregates the summary") {
    val base = setup("month")
    try {
      val q = spark.read.parquet(base)
        .groupBy(trunc(col("ts").cast("date"), "mon").as("month"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      assert(!scanPaths(q).contains(MaterializedView.normalize(base)),
        s"month hierarchy must answer from the day summary: ${scanPaths(q)}")
      assert(q.as[(java.sql.Date, Long, Long)].collect().toSet ==
        Set((java.sql.Date.valueOf("2024-03-01"), 43L, 5L)))
    } finally MaterializedView.unregister(base)
  }

  test("min/max over the derived day (first/last active) answer from the summary") {
    val base = setup("actv")
    try {
      val q = spark.read.parquet(base).groupBy("etype")
        .agg(min(col("ts").cast("date")).as("first_day"),
          max(col("ts").cast("date")).as("last_day"),
          sum(col("v")).as("s"))
      assert(!scanPaths(q).contains(MaterializedView.normalize(base)),
        s"group-expression extremes must reroute: ${scanPaths(q)}")
      assert(q.as[(String, java.sql.Date, java.sql.Date, Long)].collect().toSet ==
        Set(("click", java.sql.Date.valueOf("2024-03-01"),
            java.sql.Date.valueOf("2024-03-02"), 37L),
          ("view", java.sql.Date.valueOf("2024-03-01"),
            java.sql.Date.valueOf("2024-03-03"), 6L)))
    } finally MaterializedView.unregister(base)
  }

  test("refreshDelta maintains a derived-group summary at day granularity") {
    val base = setup("delta")
    try {
      val deletes = Seq(("click", ts("2024-03-01 08:00:00"), 10))
        .toDF("etype", "ts", "v") // removes 03-01's click min
      // TWO same-day inserts: they fold into ONE summary group, keeping
      // the summary strictly smaller than the base — the MvCost serving
      // gate refuses a base-sized summary by design
      val added = Seq(("view", ts("2024-03-04 00:00:01"), 99),
        ("view", ts("2024-03-04 01:00:00"), 1))
      val inserts = added.toDF("etype", "ts", "v")
      (rows.filterNot(_._3 == 10) ++ added)
        .toDF("etype", "ts", "v").write.mode("overwrite").parquet(base)
      MaterializedView.refreshDelta(spark, base, inserts, deletes)
      val q = spark.read.parquet(base)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("v")).as("s"), min(col("v")).as("mn"),
          count(lit(1)).as("n"))
      assert(!scanPaths(q).contains(MaterializedView.normalize(base)))
      assert(q.as[(java.sql.Date, Long, Int, Long)].collect().toSet ==
        Set((java.sql.Date.valueOf("2024-03-01"), 25L, 5, 2L),
          (java.sql.Date.valueOf("2024-03-02"), 7L, 7, 1L),
          (java.sql.Date.valueOf("2024-03-03"), 1L, 1, 1L),
          (java.sql.Date.valueOf("2024-03-04"), 100L, 1, 2L)))
    } finally MaterializedView.unregister(base)
  }
}
