package graft.tools

import graft.model.{TableRegistry, TableSpec}
import graft.obs.{PipelineMetrics, StateServer}
import graft.sources.ParquetTableStore
import graft.streaming.CdcPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Runnable end-to-end example: a Maxwell CDC event file continuously synced
  * into a queryable bucketed Parquet table, then queried with plain Spark
  * SQL — the whole point of the engine in ~50 lines. Mirrors the reference's
  * quickstart flow (reference: docs/bireme_guide.md:32-37) without needing
  * MySQL/Maxwell/Kafka.
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

    val spec = TableSpec("public.accounts",
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("owner", StringType),
        StructField("balance", DecimalType(10, 2)))),
      Seq("id"))
    val registry = TableRegistry(Map("demo.accounts" -> "public.accounts"),
      Map("public.accounts" -> spec))

    val work = Files.createTempDirectory("graft-demo")
    val in = Files.createDirectory(work.resolve("in"))
    val store = new ParquetTableStore(spark, work.resolve("tables").toString, spec, 8)

    // X1/X2: per-pipeline metrics + the reference's state JSON endpoint
    val metrics = new PipelineMetrics("demo-source")
    spark.streams.addListener(metrics)
    val stateServer = new StateServer(metrics, requestedPort = 0)
    stateServer.start()

    Files.write(in.resolve("batch0.json"), java.util.Arrays.asList(
      """{"database":"demo","table":"accounts","type":"insert","ts":1,"data":{"id":1,"owner":"ada","balance":"10.00"}}""",
      """{"database":"demo","table":"accounts","type":"insert","ts":2,"data":{"id":2,"owner":"bob","balance":"20.00"}}""",
      """{"database":"demo","table":"accounts","type":"insert","ts":3,"data":{"id":3,"owner":"cyd","balance":"30.00"}}""",
      """{"database":"demo","table":"accounts","type":"update","ts":4,"data":{"id":2,"owner":"bob","balance":"25.50"},"old":{"balance":"20.00"}}""",
      """{"database":"demo","table":"accounts","type":"delete","ts":5,"data":{"id":1,"owner":"ada","balance":"10.00"}}""",
      """{"database":"ignored","table":"junk","type":"insert","ts":6,"data":{"id":9}}"""))

    val q = CdcPipeline.fileMaxwellStream(
      spark, in.toString, registry, Map("public.accounts" -> store),
      work.resolve("ckpt").toString, Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()

    println("== after batch 0 (3 inserts, 1 update, 1 delete, 1 unmapped) ==")
    store.snapshot().createOrReplaceTempView("accounts")
    spark.sql("SELECT * FROM accounts ORDER BY id").show()

    // a second live batch, including a PK-change update (id 3 → 30)
    Files.write(in.resolve("batch1.json"), java.util.Arrays.asList(
      """{"database":"demo","table":"accounts","type":"update","ts":7,"data":{"id":30,"owner":"cyd","balance":"31.00"},"old":{"id":3}}""",
      """{"database":"demo","table":"accounts","type":"insert","ts":8,"data":{"id":4,"owner":"dee","balance":"40.00"}}""",
      // malformed line and a partial row: dropped / null-filled, never fatal
      """this is not json {{{""",
      """{"database":"demo","table":"accounts","type":"insert","ts":9,"data":{"id":5,"owner":"eve"}}"""))
    q.processAllAvailable()
    q.stop()

    println("== after batch 1 (PK change 3→30, insert id 4) ==")
    store.snapshot().createOrReplaceTempView("accounts")
    spark.sql("SELECT * FROM accounts ORDER BY id").show()
    spark.sql("SELECT count(*) AS n, sum(balance) AS total FROM accounts").show()

    println(s"== pipeline state (also served at http://localhost:${stateServer.port}/) ==")
    println(metrics.stateJson(pretty = true))
    stateServer.stop()
    spark.stop()
  }
}
