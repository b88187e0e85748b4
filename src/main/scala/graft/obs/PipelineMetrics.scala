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

  /** The source this listener reports as — the state server's route key. */
  def sourceName: String = source

  final case class PipelineState(
      name: String,
      state: String, // NORMAL | ERROR | FINISHED
      latestMs: Long, // wall-clock of the newest completed batch
      delayMs: Long, // now − event-time watermark at the newest batch, −1 unknown
      batches: Long,
      rows: Long,
      error: Option[String],
      // measured micro-batch latency (Spark's own batchDuration, ms) — the
      // evidence for the reference's merge-interval envelope (its 10 s
      // default, README.md:99-105): lastBatchDurMs for the newest batch,
      // maxBatchDurMs for the worst batch of the pipeline's lifetime
      lastBatchDurMs: Long = -1L,
      maxBatchDurMs: Long = -1L)

  private val states = TrieMap.empty[UUID, PipelineState]

  // Mid-stream schema-drift counters (see [[graft.parse.SchemaDrift]]):
  // (table, column) → cumulative rows that carried a data-map key the
  // spec doesn't cover. The loud per-table signal the reference lacks —
  // its fixed-schema parse silently drops new columns forever.
  private val drift = TrieMap.empty[(String, String), Long]

  /** Accumulate a drift observation (called per batch by the pipelines'
    * drift hook; see [[graft.streaming.CdcPipeline.applyBatch]]).
    */
  def recordDrift(table: String, column: String, nEvents: Long): Unit = {
    drift.updateWith((table, column))(p => Some(p.getOrElse(0L) + nEvents))
    ()
  }

  /** Current (table, column) → rows-seen drift counters. */
  def driftCounters: Map[(String, String), Long] = drift.toMap

  // MV freshness probes: summary name → () => per-table (synced, current)
  // store versions. Registered by the maintainers
  // ([[graft.plans.StarMvMaintainer.attachMetrics]]) so a deployment can
  // alarm on a stale accelerator: a summary whose lag stays > 0 is being
  // silently bypassed by every query (the dir-set staleness guard falls
  // back to the base join — correct, but the speedup is gone).
  private val mvProbes =
    TrieMap.empty[String, () => Map[String, (Long, Long)]]

  def registerMvFreshness(name: String,
      probe: () => Map[String, (Long, Long)]): Unit = {
    mvProbes.put(name, probe); ()
  }

  def unregisterMvFreshness(name: String): Unit = { mvProbes.remove(name); () }

  /** Evaluated freshness per registered summary: table → (synced,
    * current). Probe cost is one manifest listing per table — bounded,
    * no data access. A probe that throws (store root deleted mid-flight)
    * reports as an empty table map rather than poisoning the endpoint.
    */
  def mvFreshness: Map[String, Map[String, (Long, Long)]] =
    mvProbes.toMap.map { case (n, probe) =>
      n -> (try probe() catch { case scala.util.control.NonFatal(_) =>
        Map.empty[String, (Long, Long)] })
    }

  // Listener registration is SESSION-global: with several per-source
  // listeners on one SparkSession (the multi-source deployment), every
  // listener would otherwise record every source's queries — the
  // `/<source>` route would show foreign pipelines and counters would
  // multiply. Once any id is tracked, events from other queries are
  // ignored; an untracked listener (the single-source default) keeps the
  // record-everything behavior.
  private val trackedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[UUID]()
  @volatile private var restricted = false

  /** Enter tracking-only mode BEFORE the query id is known — closes the
    * window between listener registration and [[track]] in which another
    * source's already-running query could slip events in.
    */
  def restrictToTracked(): this.type = { restricted = true; this }

  /** Restrict this listener to the given query (callable per query; a
    * supervised restart from the same checkpoint keeps the query id, so one
    * call covers the pipeline's lifetime).
    */
  def track(id: UUID): this.type = { trackedIds.add(id); restricted = true; this }

  private def tracks(id: UUID): Boolean = !restricted || trackedIds.contains(id)

  /** Terminal (FINISHED/ERROR) entries kept before the oldest are evicted —
    * a session launching short-lived queries in a loop (per-table backfills)
    * would otherwise grow the map and the state payload without bound.
    */
  private val maxTerminal = 100

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    if (tracks(e.id)) states.updateWith(e.id) {
      // a RESTART reuses the query id: keep the cumulative counters and the
      // prior error evidence instead of silently wiping them back to zero
      case Some(s) => Some(s.copy(state = "NORMAL"))
      case None => Some(PipelineState(
        Option(e.name).getOrElse(e.id.toString), "NORMAL", -1L, -1L, 0L, 0L, None))
    }

  override def onQueryProgress(e: QueryProgressEvent): Unit = if (tracks(e.progress.id)) {
    val p = e.progress
    // the batch's own trigger timestamp, not listener-delivery time: the
    // async listener bus can lag seconds behind under driver load, which
    // would inflate both `latest` and the watermark delay
    val batchMs =
      try java.time.Instant.parse(p.timestamp).toEpochMilli
      catch { case _: Exception => System.currentTimeMillis() }
    val delay = Option(p.eventTime.get("watermark"))
      .filter(_ != "1970-01-01T00:00:00.000Z") // no event-time data yet
      // guarded like p.timestamp above: an unparsable watermark string would
      // throw out of onQueryProgress, and Spark's listener bus swallows the
      // exception — silently freezing latest/batches/rows for every
      // subsequent batch of a healthy query
      .flatMap(w =>
        try Some(batchMs - java.time.Instant.parse(w).toEpochMilli)
        catch { case _: Exception => None })
      .getOrElse(-1L)
    val dur = p.batchDuration
    states.updateWith(p.id) {
      case Some(s) => Some(s.copy(
        latestMs = batchMs, delayMs = delay,
        batches = s.batches + 1, rows = s.rows + p.numInputRows,
        lastBatchDurMs = dur, maxBatchDurMs = math.max(s.maxBatchDurMs, dur)))
      case None => Some(PipelineState(
        Option(p.name).getOrElse(p.id.toString), "NORMAL", batchMs, delay,
        1L, p.numInputRows, None, dur, dur))
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = if (tracks(e.id)) {
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
        s""""batch_ms": ${s.lastBatchDurMs}, "batch_ms_max": ${s.maxBatchDurMs}, """ +
        s""""state": "${s.state}"${s.error.map(e => s""", "error": "${esc(e)}"""").getOrElse("")}}"""
    }.mkString(s",$nl")
    // schema_drift appears only once something drifted, so the steady-state
    // payload (and the reference's shape, README.md:138-167) is unchanged
    val driftJson = {
      val d = driftCounters
      if (d.isEmpty) ""
      else d.toSeq.sorted.map { case ((t, c), n) =>
        s"""$ind$ind{"table": "${esc(t)}", "column": "${esc(c)}", "rows": $n}"""
      }.mkString(s",$nl$ind\"schema_drift\": [$nl", s",$nl", s"$nl$ind]")
    }
    // mv_freshness appears only when a maintainer attached itself — the
    // steady-state payload shape stays reference-exact otherwise
    val mvJson = {
      val f = mvFreshness
      if (f.isEmpty) ""
      else f.toSeq.sortBy(_._1).map { case (name, tables) =>
        val lag = if (tables.isEmpty) -1L
          else tables.values.map { case (s, c) => c - s }.max
        val ts = tables.toSeq.sorted.map { case (t, (s, c)) =>
          s"""{"table": "${esc(t)}", "synced": $s, "current": $c}"""
        }.mkString("[", ", ", "]")
        s"""$ind$ind{"summary": "${esc(name)}", "lag": $lag, "tables": $ts}"""
      }.mkString(s",$nl$ind\"mv_freshness\": [$nl", s",$nl", s"$nl$ind]")
    }
    s"""{$nl$ind"source_name": "${esc(source)}",$nl$ind"type": "spark",$nl""" +
      s"""$ind"pipelines": [$nl$ps$nl$ind]$driftJson$mvJson$nl}"""
  }
}

/** Minimal state HTTP endpoint over one or more [[PipelineMetrics]] — the
  * reference's Jetty server (StateServer.java:35-225) on the JDK's built-in
  * HttpServer (zero extra dependencies). Routes, mirroring the reference's
  * per-source handlers (StateServer.java:117-137):
  *  - `GET /` (optionally `?pretty`): every source's state — one object for
  *    a single source (the common deployment), a JSON array for several;
  *  - `GET /<source_name>`: that source's state alone;
  *  - unknown source: 404 with `{"message": "the datasource is not found"}`
  *    (the reference's exact message).
  * Pass port 0 for an ephemeral port; read it back from [[port]].
  */
final class StateServer(metricsList: Seq[PipelineMetrics],
    requestedPort: Int, bindAddr: String) {

  // a duplicate name would silently shadow one source on its /<name> route
  // while GET / still lists both — fail loudly at construction instead
  require(metricsList.map(_.sourceName).distinct.size == metricsList.size,
    s"duplicate source names: ${metricsList.map(_.sourceName).mkString(", ")}")

  def this(metrics: PipelineMetrics, requestedPort: Int = 8080,
      bindAddr: String = "0.0.0.0") = this(Seq(metrics), requestedPort, bindAddr)

  def this(metricsList: Seq[PipelineMetrics], requestedPort: Int) =
    this(metricsList, requestedPort, "0.0.0.0")

  private var server: com.sun.net.httpserver.HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  private def bySource: Map[String, PipelineMetrics] =
    metricsList.map(m => m.sourceName -> m).toMap

  def start(): Unit = {
    server = com.sun.net.httpserver.HttpServer.create(
      // honor state.server.addr: an operator binding 127.0.0.1 keeps the
      // unauthenticated endpoint off the network
      new java.net.InetSocketAddress(java.net.InetAddress.getByName(bindAddr),
        requestedPort), 0)
    // A handler pool: the JDK server's default executor runs every handler
    // on its single dispatcher thread, so one slow-reading (or half-dead)
    // client would stall every other monitor's poll behind it — the
    // reference's Jetty served from a pool (StateServer.java:35-58).
    pool = java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-state-server")
      t.setDaemon(true)
      t
    })
    server.setExecutor(pool)
    server.createContext("/", { exchange =>
      try {
        val path = exchange.getRequestURI.getPath
        val isHead = exchange.getRequestMethod.equalsIgnoreCase("HEAD")
        val pretty = Option(exchange.getRequestURI.getQuery).exists(_.contains("pretty"))
        def respond(status: Int, json: String): Unit = {
          val body = json.getBytes("UTF-8")
          exchange.getResponseHeaders.set("Content-Type", "application/json")
          if (isHead) exchange.sendResponseHeaders(status, -1L)
          else {
            exchange.sendResponseHeaders(status, body.length.toLong)
            val os = exchange.getResponseBody
            try os.write(body) finally os.close()
          }
        }
        if (path == "/") {
          val json = metricsList match {
            case Seq(only) => only.stateJson(pretty)
            case ms => ms.map(_.stateJson(pretty)).mkString("[", ",\n", "]")
          }
          respond(200, json)
        } else bySource.get(path.stripPrefix("/")) match {
          case Some(m) => respond(200, m.stateJson(pretty))
          case None =>
            // reference parity: StateServer.java:121-127
            respond(404, """{"message": "the datasource is not found"}""")
        }
      } catch {
        case _: Exception =>
          try exchange.sendResponseHeaders(500, -1L) catch { case _: Exception => () }
      } finally exchange.close()
    })
    server.start()
  }

  def port: Int = server.getAddress.getPort

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) { pool.shutdownNow(); () }
  }
}

/** Periodic metrics reporter — the Spark-native form of the reference's
  * Dropwizard console reporter (Bireme.java:249-265, `metrics.reporter =
  * console` + `metrics.reporter.console.interval` in its config): every
  * `intervalSec` seconds each source's pipeline counters print as one
  * compact block. `out` is injectable so tests capture the output; the
  * thread is a daemon like the reference's reporter, and [[report]] is
  * callable one-shot (the JMX analogue is Spark's own metrics sink config,
  * not re-implemented here).
  */
final class ConsoleReporter(metricsList: Seq[PipelineMetrics],
    intervalSec: Int = 10, out: java.io.PrintStream = System.out) {

  def this(metrics: PipelineMetrics, intervalSec: Int) =
    this(Seq(metrics), intervalSec)

  require(intervalSec > 0, s"report interval must be positive, got $intervalSec")

  @volatile private var running = false
  private val thread = new Thread(() => {
    while (running) {
      try Thread.sleep(intervalSec * 1000L)
      catch { case _: InterruptedException => () }
      if (running) report()
    }
  }, "graft-console-reporter")

  /** One report block per source, Dropwizard-console-like. */
  def report(): Unit = {
    val now = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
    metricsList.foreach { m =>
      val ps = m.pipelines
      out.println(s"-- pipeline state: source=${m.sourceName} " +
        s"pipelines=${ps.size} @ $now --")
      ps.foreach { p =>
        out.println(f"   ${p.name}%s state=${p.state}%s batches=${p.batches}%d " +
          f"rows=${p.rows}%d latest=${p.latestMs}%d delay=${p.delayMs}%dms" +
          p.error.map(e => s" error=$e").getOrElse(""))
      }
    }
  }

  def start(): this.type = {
    running = true
    thread.setDaemon(true)
    thread.start()
    this
  }

  def stop(): Unit = {
    running = false
    thread.interrupt()
    thread.join(2000)
  }
}
