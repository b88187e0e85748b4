package graft.tools

import graft.config.{GraftBoot, GraftConfig}
import graft.obs.{PipelineMetrics, StateServer}
import graft.sources.ParquetTableStore
import graft.streaming.CdcPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Runnable end-to-end example booted the way the reference deploys: a
  * `config.properties` + `<source>.properties` table map name the source and
  * target, the target database's own DDL supplies schemas and primary keys
  * (the §1.4 metadata probe), and a Maxwell CDC event file is continuously
  * synced into a queryable bucketed Parquet table, then queried with plain
  * Spark SQL — the whole point of the engine in ~60 lines. Mirrors the
  * reference's quickstart flow (reference: docs/bireme_guide.md:32-37,
  * README.md:99-105) without needing MySQL/Maxwell/Kafka.
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-cdc-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("graft-demo")
    val in = Files.createDirectory(work.resolve("in"))

    // ── reference-style startup: properties files + target-DDL probe ──────
    val dbUrl = s"jdbc:derby:memory:demo${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(dbUrl)
    try conn.createStatement().execute(
      "CREATE TABLE PUBLIC_ACCOUNTS (id INTEGER NOT NULL, owner VARCHAR(100), " +
        "balance DECIMAL(10,2), PRIMARY KEY (id))")
    finally conn.close()
    Files.write(work.resolve("config.properties"),
      s"""target.url = $dbUrl
         |data_source = maxwell1
         |maxwell1.type = maxwell
         |maxwell1.kafka.server = 127.0.0.1:9092
         |maxwell1.kafka.topic = demo_topic
         |merge.interval = 1000
         |""".stripMargin.getBytes("UTF-8"))
    Files.write(work.resolve("maxwell1.properties"),
      "demo.accounts = public.accounts\n".getBytes("UTF-8"))

    val cfg = GraftConfig.load(work.resolve("config.properties").toString)
    val registry = GraftBoot.registryFor(cfg, cfg.sources.head)
    val spec = registry.specFor("public.accounts")
    println(s"== booted from config.properties: probed $spec ==")

    val store = new ParquetTableStore(spark, work.resolve("tables").toString, spec, 8)

    // X1/X2: per-pipeline metrics + the reference's state JSON endpoint
    val metrics = new PipelineMetrics("demo-source")
    spark.streams.addListener(metrics)
    val stateServer = new StateServer(metrics, requestedPort = 0)
    stateServer.start()
    // metrics.reporter=console from config.properties (reference:
    // Bireme.java:249-265) — periodic counter blocks on stdout
    val reporter =
      if (cfg.reporter == "console")
        Some(new graft.obs.ConsoleReporter(Seq(metrics), cfg.reportIntervalSec).start())
      else None

    Files.write(in.resolve("batch0.json"), java.util.Arrays.asList(
      """{"database":"demo","table":"accounts","type":"insert","ts":1,"data":{"id":1,"owner":"ada","balance":"10.00"}}""",
      """{"database":"demo","table":"accounts","type":"insert","ts":2,"data":{"id":2,"owner":"bob","balance":"20.00"}}""",
      """{"database":"demo","table":"accounts","type":"insert","ts":3,"data":{"id":3,"owner":"cyd","balance":"30.00"}}""",
      """{"database":"demo","table":"accounts","type":"update","ts":4,"data":{"id":2,"owner":"bob","balance":"25.50"},"old":{"balance":"20.00"}}""",
      """{"database":"demo","table":"accounts","type":"delete","ts":5,"data":{"id":1,"owner":"ada","balance":"10.00"}}""",
      """{"database":"ignored","table":"junk","type":"insert","ts":6,"data":{"id":9}}"""))

    // cfg.trigger carries merge.interval from the properties file (T1)
    val q = CdcPipeline.fileMaxwellStream(
      spark, in.toString, registry, Map("public.accounts" -> store),
      work.resolve("ckpt").toString, cfg.trigger)
    q.processAllAvailable()

    println("== after batch 0 (3 inserts, 1 update, 1 delete, 1 unmapped) ==")
    store.snapshot().createOrReplaceTempView("accounts")
    spark.sql("SELECT * FROM accounts ORDER BY id").show()

    // a second live batch, including a PK-change update (id 3 → 30).
    // Written OUTSIDE the watched dir and atomically moved in: the file
    // source reads each file exactly once, so a trigger listing a
    // half-written file would silently lose the unwritten tail.
    val staged1 = work.resolve("batch1.json.tmp")
    Files.write(staged1, java.util.Arrays.asList(
      """{"database":"demo","table":"accounts","type":"update","ts":7,"data":{"id":30,"owner":"cyd","balance":"31.00"},"old":{"id":3}}""",
      """{"database":"demo","table":"accounts","type":"insert","ts":8,"data":{"id":4,"owner":"dee","balance":"40.00"}}""",
      // malformed line and a partial row: dropped / null-filled, never fatal
      """this is not json {{{""",
      """{"database":"demo","table":"accounts","type":"insert","ts":9,"data":{"id":5,"owner":"eve"}}"""))
    Files.move(staged1, in.resolve("batch1.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    q.processAllAvailable()
    q.stop()

    println("== after batch 1 (PK change 3→30, insert id 4) ==")
    store.snapshot().createOrReplaceTempView("accounts")
    spark.sql("SELECT * FROM accounts ORDER BY id").show()
    spark.sql("SELECT count(*) AS n, sum(balance) AS total FROM accounts").show()

    // post-merge integrity gate: the synced table must keep its PK unique
    // and non-null (the invariant the whole merge protocol exists to hold)
    println("== post-merge quality report ==")
    graft.operators.Quality.check(spark.table("accounts"), Seq(
      graft.operators.Quality.Unique(Seq("id")),
      graft.operators.Quality.NotNull("id"))).show(truncate = false)

    println(s"== pipeline state (also served at http://localhost:${stateServer.port}/" +
      s" and /${metrics.sourceName}) ==")
    println(metrics.stateJson(pretty = true))
    // measured micro-batch latency vs the reference's 10 s merge-interval
    // envelope (README.md:99-105) — Spark's own batchDuration per batch
    metrics.pipelines.foreach { p =>
      println(f"== measured micro-batch latency: last=${p.lastBatchDurMs}%d ms, " +
        f"worst=${p.maxBatchDurMs}%d ms over ${p.batches}%d batches " +
        f"(reference envelope: 10000 ms) ==")
    }
    println("== console reporter (one-shot) ==")
    reporter.foreach { r => r.report(); r.stop() }
    stateServer.stop()
    spark.stop()
  }
}
