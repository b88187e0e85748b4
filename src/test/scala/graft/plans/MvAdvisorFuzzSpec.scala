package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized differential for [[MvAdvisor]]: random workloads (random
  * grains and aggregate picks over a fixed star, plus unservable
  * members) → advise → accept the top recommendation → every SERVABLE
  * member of its family must (a) reroute to the built summary and
  * (b) equal its rewrite-off recomputation. This is the composition the
  * directed spec pins once: union-grain merge correctness across
  * arbitrary grain subsets, measure union, and the serve-time
  * re-aggregation from the merged grain.
  */
class MvAdvisorFuzzSpec extends SparkTestBase {
  import spark.implicits._

  MaterializedView.install(spark)

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten

  test("five random workloads: the accepted recommendation serves its family exactly") {
    val rnd = new scala.util.Random(307)
    val fact = tmpDir("advf_fact")
    val dim = tmpDir("advf_dim")
    (1L to 500L).map(i => (i, 1L + i % 25, 1L + i % 4, i % 100, (i * 3) % 7))
      .toDF("o_id", "f_cust", "f_chan", "v", "w")
      .write.mode("overwrite").parquet(fact)
    (1L to 25L).map(c => (c, s"s${c % 5}", s"r${c % 3}"))
      .toDF("c_cust", "seg", "reg").write.mode("overwrite").parquet(dim)
    // the grain pool the random workloads draw from (dim + fact side)
    val grainPool = Vector("seg", "reg", "f_chan", "c_cust")
    val measurePool = Vector[(String, DataFrame => org.apache.spark.sql.Column)](
      ("s_v", _ => sum(col("v")).as("s_v")),
      ("n", _ => count(lit(1)).as("n")),
      ("mx_w", _ => max(col("w")).as("mx_w")),
      ("mn_v", _ => min(col("v")).as("mn_v")))

    (1 to 5).foreach { round =>
      def base = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("f_cust") === col("c_cust"))
      // 2-4 servable members with random grain subsets + aggregates
      val members = (0 until 2 + rnd.nextInt(3)).map { _ =>
        val grain = rnd.shuffle(grainPool).take(1 + rnd.nextInt(3)).sorted
        val aggs = rnd.shuffle(measurePool).take(1 + rnd.nextInt(3))
        (grain, aggs.map(_._1))
      }
      def memberDf(grain: Seq[String], aggNames: Seq[String]): DataFrame = {
        val aggCols = aggNames.map(n => measurePool.find(_._1 == n).get._2(base))
        base.groupBy(grain.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      }
      val unservable = base.filter(col("v") > 50L)
        .groupBy("seg").agg(sum(col("v")).as("s"))
      val workload = members.map { case (g, a) => memberDf(g, a) } :+ unservable
      val recs = MvAdvisor.advise(spark, workload, k = 1)
      assert(recs.nonEmpty, s"round $round: a servable family must advise")
      val top = recs.head
      assert(top.hits === members.size,
        s"round $round: one join tree → one family: $top vs ${members.size}")
      // union grain covers every member's grain
      val unionGrain = top.definition.groupCols.map(_.name).toSet
      members.foreach { case (g, _) =>
        assert(g.toSet.subsetOf(unionGrain), s"round $round grain $g ⊄ $unionGrain")
      }
      val d = top.buildAs(spark, tmpDir(s"advf_sum$round"))
      try {
        members.foreach { case (g, a) =>
          val served = memberDf(g, a)
          val paths = scanPaths(served)
          assert(paths.nonEmpty && paths.forall(_.contains(s"advf_sum$round")),
            s"round $round member ($g, $a) must serve: $paths")
          val got = served.collect().toSet
          spark.conf.set("spark.graft.mv.enabled", "false")
          val want = try memberDf(g, a).collect().toSet
            finally spark.conf.set("spark.graft.mv.enabled", "true")
          assert(got === want,
            s"round $round member ($g, $a) diverged from rewrite-off truth")
        }
      } finally StarMv.unregister(d.summaryPath)
    }
  }
}
