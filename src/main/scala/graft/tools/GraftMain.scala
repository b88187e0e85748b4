package graft.tools

import graft.config.{GraftBoot, GraftConfig}
import graft.obs.{ConsoleReporter, PipelineMetrics, StateServer}
import graft.streaming.SupervisedQuery
import org.apache.spark.sql.SparkSession

/** The deployment entry point — the reference's `Bireme.main` lifecycle
  * (Bireme.java:188-265: parse config → probe target metadata → build one
  * loader per table → start pipelines → metrics reporter + state server →
  * block; SIGTERM runs an orderly stop) re-expressed over the config boot
  * layer and Structured Streaming.
  *
  * Usage: `runMain graft.tools.GraftMain <config.properties> [workDir]`
  * `workDir` (default `./graft-work`) holds per-source checkpoints — on a
  * cluster this must be a SHARED filesystem path.
  *
  * Each source runs under a [[SupervisedQuery]] (the O2 restart policy:
  * `maxRestarts` failures poison the pipeline to ERROR and drop it from
  * rotation, like the reference's scheduler). Kafka sources need the
  * spark-sql-kafka connector and a reachable broker; a source with
  * `<name>.replay.dir` replays archived Maxwell JSON offline.
  */
object GraftMain {

  /** Everything [[boot]] started, with an orderly [[Running.stop]]. */
  final case class Running(
      sources: Map[String, SupervisedQuery],
      metrics: Map[String, PipelineMetrics],
      stateServer: StateServer,
      reporter: Option[ConsoleReporter]) {
    def stop(): Unit = {
      sources.values.foreach(s => try s.stop() catch { case _: Exception => () })
      reporter.foreach(_.stop())
      stateServer.stop()
    }
  }

  /** Wire the full lifecycle for `cfg` and return the running handle —
    * factored from [[main]] so tests (and embedding applications) drive the
    * exact production boot path without process-level blocking.
    */
  def boot(spark: SparkSession, cfg: GraftConfig, workDir: String,
      maxRestarts: Int = 3): Running = {
    val perSource = cfg.sources.map { source =>
      // §1.4: the target database's own metadata supplies every schema/PK
      val registry = GraftBoot.registryFor(cfg, source)
      val stores = GraftBoot.storesFor(spark, cfg, registry)
      val metrics = new PipelineMetrics(source.name)
      spark.streams.addListener(metrics)
      val supervised = new SupervisedQuery(
        () => GraftBoot.startSource(spark, cfg, source, registry, stores,
          s"$workDir/ckpt-${source.name}"),
        maxRestarts).start()
      (source.name, supervised, metrics)
    }
    val allMetrics = perSource.map(_._3)
    val stateServer = new StateServer(allMetrics,
      cfg.stateServerPort, cfg.stateServerAddr)
    stateServer.start()
    val reporter =
      if (cfg.reporter == "console")
        Some(new ConsoleReporter(allMetrics, cfg.reportIntervalSec).start())
      else None
    Running(
      perSource.map(t => t._1 -> t._2).toMap,
      perSource.map(t => t._1 -> t._3).toMap,
      stateServer, reporter)
  }

  def main(args: Array[String]): Unit = {
    val configFile = args.headOption.getOrElse(
      sys.error("usage: GraftMain <config.properties> [workDir]"))
    val workDir = args.lift(1).getOrElse("graft-work")
    val cfg = GraftConfig.load(configFile)
    val spark = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val running = boot(spark, cfg, workDir)
    println(s"graft started: ${cfg.sources.map(_.name).mkString(", ")} " +
      s"(state at http://${cfg.stateServerAddr}:${running.stateServer.port}/)")
    // the reference's commandline stop → orderly shutdown (Bireme.java:216-242)
    sys.addShutdownHook(running.stop())
    spark.streams.awaitAnyTermination()
  }
}
