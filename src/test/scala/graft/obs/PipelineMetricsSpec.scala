package graft.obs

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Listener + state endpoint over a real (file-backed) streaming query. */
class PipelineMetricsSpec extends SparkTestBase {

  test("listener tracks progress, state transitions, and renders state JSON") {
    val metrics = new PipelineMetrics("test-source")
    spark.streams.addListener(metrics)
    try {
      val in = tmpDir("obs-in")
      Files.write(Paths.get(in, "f0.json"),
        """{"ts":"2024-01-01T10:00:00.000Z","v":1}
          |{"ts":"2024-01-01T11:00:00.000Z","v":2}""".stripMargin.getBytes)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.IntegerType)))
      val q = spark.readStream.schema(schema).json(in)
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour")).count()
        .writeStream.format("memory").queryName("obs_sink")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("obs-ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
      // listener events are delivered asynchronously — poll for the terminal state
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !metrics.pipelines.exists(p => p.rows == 2 && p.state == "FINISHED"))
        Thread.sleep(100)

      val ps = metrics.pipelines
      assert(ps.exists(p => p.rows == 2 && p.batches >= 1),
        s"expected a pipeline with 2 input rows, got $ps")
      val done = ps.find(_.rows == 2).get
      assert(done.state == "FINISHED")
      assert(done.delayMs >= 0, "watermark-based delay should be known")

      val json = metrics.stateJson()
      assert(json.contains(""""source_name": "test-source""""))
      assert(json.contains(""""state": "FINISHED""""))
      // valid JSON: the driver-side python would parse this; cheap sanity here
      assert(json.count(_ == '{') == json.count(_ == '}'))
    } finally spark.streams.removeListener(metrics)
  }

  test("state HTTP endpoint serves the JSON (X2)") {
    val metrics = new PipelineMetrics("http-source")
    val server = new StateServer(metrics, requestedPort = 0)
    server.start()
    try {
      val url = java.net.URI.create(s"http://localhost:${server.port}/?pretty").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body.contains(""""source_name": "http-source""""))
      assert(body.contains(""""pipelines""""))
    } finally server.stop()
  }

  test("state endpoint answers HEAD cleanly and 404s unknown paths") {
    val metrics = new graft.obs.PipelineMetrics("http-source2")
    val server = new graft.obs.StateServer(metrics, requestedPort = 0)
    server.start()
    try {
      val head = new java.net.URL(s"http://127.0.0.1:${server.port}/")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      head.setRequestMethod("HEAD")
      assert(head.getResponseCode === 200)
      val notFound = new java.net.URL(s"http://127.0.0.1:${server.port}/nope")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(notFound.getResponseCode === 404)
    } finally server.stop()
  }

  test("per-source GET /<source> serves that source; unknown source gets the reference 404 body") {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val a = new PipelineMetrics("source-a")
    val b = new PipelineMetrics("source-b")
    // give source-b one pipeline so the routed payloads differ observably
    b.onQueryStarted(new QueryStartedEvent(java.util.UUID.randomUUID(),
      java.util.UUID.randomUUID(), "b-pipe", "2026-01-01T00:00:00.000Z"))
    val server = new StateServer(Seq(a, b), requestedPort = 0)
    server.start()
    try {
      def get(path: String): (Int, String) = {
        val conn = java.net.URI.create(s"http://127.0.0.1:${server.port}$path")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        (code, new String(is.readAllBytes(), "UTF-8"))
      }
      val (cb, bodyB) = get("/source-b")
      assert(cb == 200)
      assert(bodyB.contains(""""source_name": "source-b""""))
      assert(bodyB.contains("b-pipe"))
      assert(!bodyB.contains("source-a"))
      val (ca, bodyA) = get("/source-a")
      assert(ca == 200 && bodyA.contains(""""source_name": "source-a""""))
      // aggregate route renders BOTH sources as a JSON array
      val (cr, bodyRoot) = get("/")
      assert(cr == 200)
      assert(bodyRoot.contains("source-a") && bodyRoot.contains("source-b"))
      assert(bodyRoot.trim.startsWith("[") && bodyRoot.trim.endsWith("]"))
      // reference parity: StateServer.java:121-127 message
      val (cn, bodyN) = get("/nope")
      assert(cn == 404)
      assert(bodyN.contains("the datasource is not found"))
    } finally server.stop()
  }

  test("console reporter prints one block per source with the pipeline counters") {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val m = new PipelineMetrics("report-source")
    val id = java.util.UUID.randomUUID()
    m.onQueryStarted(new QueryStartedEvent(id, java.util.UUID.randomUUID(),
      "rpt-pipe", "2026-01-01T00:00:00.000Z"))
    val buf = new java.io.ByteArrayOutputStream()
    val rep = new ConsoleReporter(Seq(m), intervalSec = 3600,
      new java.io.PrintStream(buf, true, "UTF-8"))
    rep.report() // one-shot: don't wait for the interval
    val outStr = buf.toString("UTF-8")
    assert(outStr.contains("source=report-source"))
    assert(outStr.contains("rpt-pipe"))
    assert(outStr.contains("state=NORMAL"))
    assert(outStr.contains("batches=0") && outStr.contains("rows=0"))
    // the periodic thread starts and stops cleanly without reaching a tick
    rep.start()
    rep.stop()
  }

  test("a restart with the same query id preserves cumulative counters") {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val m = new graft.obs.PipelineMetrics("restart-source")
    val id = java.util.UUID.randomUUID()
    m.onQueryStarted(new QueryStartedEvent(id, java.util.UUID.randomUUID(),
      "q", "2026-01-01T00:00:00.000Z"))
    // no progress events needed: terminate with an error, then restart
    m.onQueryTerminated(new QueryTerminatedEvent(id, java.util.UUID.randomUUID(),
      Some("boom")))
    assert(m.pipelines.head.state === "ERROR")
    m.onQueryStarted(new QueryStartedEvent(id, java.util.UUID.randomUUID(),
      "q", "2026-01-01T00:01:00.000Z"))
    val s = m.pipelines.head
    assert(s.state === "NORMAL")
    assert(s.error === Some("boom"), "prior error evidence must survive a restart")
  }
}
