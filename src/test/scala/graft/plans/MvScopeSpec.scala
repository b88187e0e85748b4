package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Registry scoping: sessions with distinct `spark.graft.mv.scope` tags
  * register and serve independently — conflicting definitions over the
  * SAME base never interact — while the untagged default keeps today's
  * shared-JVM behavior. Closes the suite-order footgun class (one spec's
  * registration leaking into another's plans).
  */
class MvScopeSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  test("two scoped sessions: same base, conflicting MVs, zero interaction") {
    val base = tmpDir("scope_base")
    (1L to 200L).map(i => (i, s"g${i % 4}", i % 9)).toDF("id", "g", "v")
      .write.mode("overwrite").parquet(base)

    val s2 = spark.newSession()
    MaterializedView.install(s2)
    spark.conf.set("spark.graft.mv.scope", "tenant_a")
    s2.conf.set("spark.graft.mv.scope", "tenant_b")
    try {
      // tenant A registers over the base; tenant B registers a DIFFERENT
      // def (other groups) over the SAME base — in one scope this would
      // be a conflicting overwrite
      def inSession[T](s: SparkSession)(f: => T): T = {
        SparkSession.setActiveSession(s)
        try f finally SparkSession.setActiveSession(spark)
      }
      inSession(spark)(MaterializedView.build(spark, base, Seq("g"),
        Seq("v"), tmpDir("scope_sum_a")))
      inSession(s2)(MaterializedView.build(s2, base, Seq("v"), Nil,
        tmpDir("scope_sum_b")))

      val qa = spark.read.parquet(base).groupBy("g").agg(sum(col("v")).as("s"))
      assert(scanPaths(qa).forall(_.contains("scope_sum_a")),
        s"tenant A serves from its own summary: ${scanPaths(qa)}")
      val qb = s2.read.parquet(base).groupBy("v").agg(count(lit(1)).as("n"))
      assert(inSession(s2)(scanPaths(qb)).forall(_.contains("scope_sum_b")),
        "tenant B serves from its own summary")
      // B's rollup shape in A's session: A's def cannot serve a per-v
      // grouping (v is A's measure) — falls back to the base, never to
      // B's summary
      val qcross = spark.read.parquet(base).groupBy("v")
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(qcross).forall(_.contains("scope_base")),
        s"A must not see B's registration: ${scanPaths(qcross)}")
      // values are right everywhere
      assert(qa.as[(String, Long)].collect().toMap ===
        (1L to 200L).groupBy(i => s"g${i % 4}")
          .map { case (g, xs) => g -> xs.map(_ % 9).sum })
      // unregister in A leaves B intact
      inSession(spark)(MaterializedView.unregister(base))
      assert(scanPaths(spark.read.parquet(base).groupBy("g")
        .agg(sum(col("v")).as("s"))).forall(_.contains("scope_base")))
      assert(inSession(s2)(scanPaths(s2.read.parquet(base).groupBy("v")
        .agg(count(lit(1)).as("n")))).forall(_.contains("scope_sum_b")))
      inSession(s2)(MaterializedView.unregister(base))
    } finally {
      spark.conf.unset("spark.graft.mv.scope")
      s2.conf.unset("spark.graft.mv.scope")
    }
  }
}
