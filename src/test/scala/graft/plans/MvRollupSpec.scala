package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** ROLLUP / CUBE / GROUPING SETS through the MV rewrite: the analyzer's
  * Expand below the Aggregate is rebuilt over the summary (same null
  * pattern, same grouping-id literals, partials passed through), so every
  * grouping-set tier re-aggregates partials instead of rescanning the
  * base. Assertions are on the optimized plan's scan path (results alone
  * can't distinguish a fired rewrite from a correct fallback) AND on the
  * values against the registry-off computation.
  */
class MvRollupSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private val rows = Seq(
    ("a", "x", 1, 2.0), ("a", "x", 3, 1.5), ("a", "y", 5, 9.0),
    ("b", "x", 7, -1.0), ("b", "y", 2, 4.0), ("b", "y", 4, 0.5))

  private def withMv[A](f: (String, String) => A): A = {
    val base = tmpDir("mvgs_base")
    rows.toDF("g1", "g2", "m1", "m2").write.mode("overwrite").parquet(base)
    val summary = tmpDir("mvgs_sum")
    MaterializedView.build(spark, base, Seq("g1", "g2"), Seq("m1", "m2"), summary)
    try f(base, summary)
    finally MaterializedView.unregister(base)
  }

  /** run df with the registry off and return its rows (the truth). */
  private def directRows(mk: => DataFrame): Set[Seq[Any]] = {
    spark.conf.set("spark.graft.mv.enabled", "false")
    try mk.collect().map(_.toSeq).toSet
    finally spark.conf.unset("spark.graft.mv.enabled")
  }

  test("rollup reroutes every tier to the summary and matches the base") {
    withMv { (base, summary) =>
      def q = spark.read.parquet(base).rollup("g1", "g2")
        .agg(count(lit(1)).as("n"), sum(col("m1")).as("s1"),
          min(col("m2")).as("mn2"), max(col("m2")).as("mx2"),
          avg(col("m1")).as("a1"), count(col("m2")).as("c2"))
      val paths = scanPaths(q)
      assert(paths.contains(MaterializedView.normalize(summary)), s"scan: $paths")
      assert(!paths.contains(MaterializedView.normalize(base)))
      assert(q.collect().map(_.toSeq).toSet == directRows(q))
      // 6 (g1,g2) + 2 (g1) + 1 () = 9 rows
      assert(q.count() == 4 + 2 + 1)
    }
  }

  test("cube and grouping sets reroute; grouping()/grouping_id() survive") {
    withMv { (base, summary) =>
      def cube = spark.read.parquet(base).cube("g1", "g2")
        .agg(sum(col("m1")).as("s1"), count(lit(1)).as("n"))
      assert(scanPaths(cube).contains(MaterializedView.normalize(summary)))
      assert(cube.collect().map(_.toSeq).toSet == directRows(cube))

      def gs = spark.read.parquet(base)
        .createOrReplaceTempView("mvgs_t")
      gs
      def sets = spark.sql(
        """SELECT g1, g2, grouping(g1) AS gg1, grouping_id() AS gid,
          |  sum(m1) AS s1, avg(m2) AS a2
          |FROM mvgs_t
          |GROUP BY GROUPING SETS ((g1), (g2), (g1, g2))""".stripMargin)
      assert(scanPaths(sets).contains(MaterializedView.normalize(summary)),
        s"grouping sets must reroute: ${scanPaths(sets)}")
      assert(sets.collect().map(_.toSeq).toSet == directRows(sets))
    }
  }

  test("group-column filter replays below the rebuilt Expand") {
    withMv { (base, summary) =>
      def q = spark.read.parquet(base).filter(col("g2") === "y")
        .rollup("g1").agg(sum(col("m1")).as("s1"), count(lit(1)).as("n"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)))
      assert(q.collect().map(_.toSeq).toSet == directRows(q))
      assert(q.collect().map(_.toSeq).toSet ==
        Set(Seq("a", 5L, 1L), Seq("b", 6L, 2L), Seq(null, 11L, 3L)))
    }
  }

  test("aggregates over expressions of the expanded keys cnt-weight") {
    withMv { (base, summary) =>
      // sum/avg/count over length(g2): nulled per tier exactly as the base
      def q = spark.read.parquet(base).rollup("g1", "g2")
        .agg(sum(length(col("g2"))).as("s"), avg(length(col("g2"))).as("a"),
          count(col("g2")).as("c"), min(col("g2")).as("mn"))
      assert(scanPaths(q).contains(MaterializedView.normalize(summary)))
      assert(q.collect().map(_.toSeq).toSet == directRows(q))
      // COUNT(DISTINCT key) is multiplicity-free and passes through
      def qd = spark.read.parquet(base).rollup("g1")
        .agg(countDistinct(col("g2")).as("d"), count(lit(1)).as("n"))
      assert(scanPaths(qd).contains(MaterializedView.normalize(summary)))
      assert(qd.collect().map(_.toSeq).toSet == directRows(qd))
    }
  }

  test("non-rewritable rollup shapes fall through untouched") {
    withMv { (base, _) =>
      val basePath = MaterializedView.normalize(base)
      // measure in grouping position
      assert(scanPaths(spark.read.parquet(base).rollup("g1", "m1")
        .agg(count(lit(1)).as("n"))) == Seq(basePath))
      // measure-mixing aggregate expression
      assert(scanPaths(spark.read.parquet(base).rollup("g1")
        .agg(sum(col("m1") + 1).as("s"))) == Seq(basePath))
      // DISTINCT over a measure
      assert(scanPaths(spark.read.parquet(base).rollup("g1")
        .agg(countDistinct(col("m1")).as("d"))) == Seq(basePath))
      // measure filter below the Expand
      assert(scanPaths(spark.read.parquet(base).filter(col("m1") > 2)
        .rollup("g1").agg(count(lit(1)).as("n"))) == Seq(basePath))
      // TRY-mode aggregate
      assert(scanPaths(spark.read.parquet(base).rollup("g1")
        .agg(expr("try_sum(m1)").as("s"))) == Seq(basePath))
      // every shape above still computes correctly off the base
      val q = spark.read.parquet(base).rollup("g1")
        .agg(sum(col("m1") + 1).as("s"))
      assert(q.collect().map(_.toSeq).toSet ==
        Set(Seq("a", 12L), Seq("b", 16L), Seq(null, 28L)))
    }
  }
}
