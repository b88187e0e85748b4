package graft.tools

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job time profile of a registered query — the measure-first tool
  * behind the r14 optimization pass (guide §1): runs the query exactly as
  * Bench does (`queryExecution.toRdd.foreach`) and prints every Spark job
  * it submitted with wall duration, stage/task counts and call site, so a
  * multi-job e2e harness shows WHERE its seconds go (store writes, probe
  * collects, MV syncs) instead of one opaque total.
  *
  * Usage: `runMain graft.tools.JobProfile <sfDir> q1[,q2,...] [repeat]`
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object JobProfile {
  private final case class JobRec(id: Int, var desc: String, var site: String,
    var nStages: Int, var nTasks: Int, var startMs: Long, var endMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q229_advisor_maintained"))
    val repeat = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same unmeasured warmup as Bench.newSession
    try {
      spark.range(2000000).selectExpr("sum(id * 2)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000).count()
    } catch { case _: Throwable => () }

    val jobs = new ConcurrentHashMap[Int, JobRec]()
    val order = new ArrayBuffer[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          // fall back to the result stage's name — the callsite property is
          // frequently absent on SQL-submitted jobs
          .orElse(e.stageInfos.sortBy(_.stageId).lastOption.map(_.name))
          .getOrElse("")
        jobs.put(e.jobId,
          JobRec(e.jobId, desc, site, e.stageInfos.size,
            e.stageInfos.map(_.numTasks).sum, e.time, -1L))
        order.synchronized { order += e.jobId; () }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.endMs = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    })

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to repeat).foreach { it =>
        jobs.clear(); order.synchronized { order.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val total = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        // let async job-end events drain before reading the table
        Thread.sleep(300)
        println(f"\n===== $name run $it%d total $total%.2f s =====")
        val rows = order.synchronized { order.toSeq }.flatMap(id => Option(jobs.get(id)))
        val jobSum = rows.map(r => (r.endMs - r.startMs).max(0L)).sum / 1e3
        println(f"jobs ${rows.size}%d, sum of job wall times $jobSum%.2f s (overlap possible)")
        println("  ms  stages tasks  callsite | description")
        rows.foreach { r =>
          val ms = (r.endMs - r.startMs).max(0L)
          if (ms >= 20)
            println(f"$ms%6d ${r.nStages}%6d ${r.nTasks}%5d  ${r.site.take(40)}%-40s | ${r.desc.take(80)}")
        }
        val small = rows.count(r => (r.endMs - r.startMs).max(0L) < 20)
        println(s"(+ $small jobs under 20 ms)")
      }
    }
    spark.stop()
  }
}
