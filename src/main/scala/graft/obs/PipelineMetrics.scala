package graft.obs

import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-pipeline observability (operators X1/X2 + the O2 state machine):
  * the Spark-native form of the reference's Dropwizard metrics
  * (PipeLineStat.java:19-128 — delay timer, record meter, newest-completed
  * gauge) and NORMAL/ERROR pipeline state (PipeLine.java:40,84-97, where any
  * stage error poisons the pipeline and drops it from rotation).
  *
  * One listener instance observes every streaming query of a session;
  * [[stateJson]] renders the same shape the reference's Jetty endpoint
  * serves (StateServer.java:145-191, format documented in README.md:121-167):
  * `{source_name, type, pipelines: [{name, latest, delay, state}]}`.
  */
final class PipelineMetrics(source: String = "graft") extends StreamingQueryListener {
  import StreamingQueryListener._

  final case class PipelineState(
      name: String,
      state: String, // NORMAL | ERROR | FINISHED
      latestMs: Long, // wall-clock of the newest completed batch
      delayMs: Long, // now − event-time watermark at the newest batch, −1 unknown
      batches: Long,
      rows: Long,
      error: Option[String])

  private val states = TrieMap.empty[UUID, PipelineState]

  /** Terminal (FINISHED/ERROR) entries kept before the oldest are evicted —
    * a session launching short-lived queries in a loop (per-table backfills)
    * would otherwise grow the map and the state payload without bound.
    */
  private val maxTerminal = 100

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    states.updateWith(e.id) {
      // a RESTART reuses the query id: keep the cumulative counters and the
      // prior error evidence instead of silently wiping them back to zero
      case Some(s) => Some(s.copy(state = "NORMAL"))
      case None => Some(PipelineState(
        Option(e.name).getOrElse(e.id.toString), "NORMAL", -1L, -1L, 0L, 0L, None))
    }

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    // the batch's own trigger timestamp, not listener-delivery time: the
    // async listener bus can lag seconds behind under driver load, which
    // would inflate both `latest` and the watermark delay
    val batchMs =
      try java.time.Instant.parse(p.timestamp).toEpochMilli
      catch { case _: Exception => System.currentTimeMillis() }
    val delay = Option(p.eventTime.get("watermark"))
      .filter(_ != "1970-01-01T00:00:00.000Z") // no event-time data yet
      .map(w => batchMs - java.time.Instant.parse(w).toEpochMilli)
      .getOrElse(-1L)
    states.updateWith(p.id) {
      case Some(s) => Some(s.copy(
        latestMs = batchMs, delayMs = delay,
        batches = s.batches + 1, rows = s.rows + p.numInputRows))
      case None => Some(PipelineState(
        Option(p.name).getOrElse(p.id.toString), "NORMAL", batchMs, delay, 1L, p.numInputRows, None))
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    states.updateWith(e.id)(_.map(s => e.exception match {
      case Some(err) => s.copy(state = "ERROR", error = Some(err))
      case None => s.copy(state = "FINISHED")
    }))
    // bound the terminal backlog, evicting oldest-completed first
    val terminal = states.toSeq.filter(t => t._2.state != "NORMAL")
    if (terminal.size > maxTerminal)
      terminal.sortBy(_._2.latestMs)
        .take(terminal.size - maxTerminal)
        .foreach { case (id, _) => states.remove(id) }
  }

  def pipelines: Seq[PipelineState] = states.values.toSeq.sortBy(_.name)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The reference's state-endpoint JSON (README.md:138-167). */
  def stateJson(pretty: Boolean = false): String = {
    val (nl, ind) = if (pretty) ("\n", "  ") else ("", "")
    val ps = pipelines.map { s =>
      s"""$ind$ind{"name": "${esc(s.name)}", "latest": ${s.latestMs}, """ +
        s""""delay": ${s.delayMs}, "batches": ${s.batches}, "rows": ${s.rows}, """ +
        s""""state": "${s.state}"${s.error.map(e => s""", "error": "${esc(e)}"""").getOrElse("")}}"""
    }.mkString(s",$nl")
    s"""{$nl$ind"source_name": "${esc(source)}",$nl$ind"type": "spark",$nl""" +
      s"""$ind"pipelines": [$nl$ps$nl$ind]$nl}"""
  }
}

/** Minimal state HTTP endpoint over [[PipelineMetrics]] — the reference's
  * Jetty server (StateServer.java:35-225) on the JDK's built-in HttpServer
  * (zero extra dependencies). `GET /` (optionally `?pretty`) returns the
  * state JSON. Pass port 0 for an ephemeral port; read it back from [[port]].
  */
final class StateServer(metrics: PipelineMetrics, requestedPort: Int = 8080,
    bindAddr: String = "0.0.0.0") {
  private var server: com.sun.net.httpserver.HttpServer = _

  def start(): Unit = {
    server = com.sun.net.httpserver.HttpServer.create(
      // honor state.server.addr: an operator binding 127.0.0.1 keeps the
      // unauthenticated endpoint off the network
      new java.net.InetSocketAddress(java.net.InetAddress.getByName(bindAddr),
        requestedPort), 0)
    server.createContext("/", { exchange =>
      try {
        val path = exchange.getRequestURI.getPath
        val isHead = exchange.getRequestMethod.equalsIgnoreCase("HEAD")
        if (path != "/") {
          exchange.sendResponseHeaders(404, -1L)
        } else {
          val pretty = Option(exchange.getRequestURI.getQuery).exists(_.contains("pretty"))
          val body = metrics.stateJson(pretty).getBytes("UTF-8")
          exchange.getResponseHeaders.set("Content-Type", "application/json")
          if (isHead) exchange.sendResponseHeaders(200, -1L)
          else {
            exchange.sendResponseHeaders(200, body.length.toLong)
            val os = exchange.getResponseBody
            try os.write(body) finally os.close()
          }
        }
      } catch {
        case _: Exception =>
          try exchange.sendResponseHeaders(500, -1L) catch { case _: Exception => () }
      } finally exchange.close()
    })
    server.start()
  }

  def port: Int = server.getAddress.getPort

  def stop(): Unit = if (server != null) server.stop(0)
}
