package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}

/** O2: the pipeline state machine / restart policy. The reference marks a
  * pipeline ERROR on any stage exception and drops it from the scheduler's
  * rotation (reference: PipeLine.java:40,84-97, Scheduler.java:49-88 — an
  * ERROR pipeline is never resubmitted); restarting is left to the operator.
  * Here a supervisor thread watches the query, restarts it up to
  * `maxRestarts` times on failure (the checkpoint makes the replay safe —
  * the merge is idempotent), and poisons it to ERROR when the budget is
  * exhausted.
  *
  * States: NORMAL (running, possibly after restarts) → STOPPED (clean
  * [[stop]]) | ERROR (failed `maxRestarts`+1 times).
  */
final class SupervisedQuery(startFn: () => StreamingQuery, maxRestarts: Int = 3) {

  @volatile private var current: StreamingQuery = _
  @volatile private var _restarts = 0
  @volatile private var _state = "NORMAL"
  @volatile private var _lastError: Option[String] = None
  private val stopping = new AtomicBoolean(false)
  // Serializes the restart path against stop(): a restart re-checks
  // `stopping` INSIDE this lock before launching, so stop() can never
  // interleave between the check and `startFn()` and leak a fresh query.
  private val restartLock = new Object
  private val monitor = new Thread(() => loop(), "graft-query-supervisor")

  def start(): this.type = {
    current = startFn()
    monitor.setDaemon(true)
    monitor.start()
    this
  }

  private def loop(): Unit = {
    var done = false
    while (!done) {
      val error: Option[String] =
        try { current.awaitTermination(); None }
        catch { case e: StreamingQueryException => Some(e.getMessage) }
      error match {
        case None =>
          if (!stopping.get()) _state = "STOPPED"
          done = true
        case Some(msg) =>
          _lastError = Some(msg)
          // startFn() itself can throw (broker still down, checkpoint FS
          // hiccup — the very conditions that killed the query): an
          // uncaught throw here would kill THIS supervisor thread and
          // strand the pipeline in a healthy-looking NORMAL state with a
          // dead query. A failed launch burns a restart and retries.
          val restarted = restartLock.synchronized {
            var launched = false
            var backoffMs = 200L
            while (!launched && !stopping.get() && _restarts < maxRestarts) {
              _restarts += 1
              try { current = startFn(); launched = true }
              catch {
                case e: Exception =>
                  _lastError = Some(s"restart failed: ${e.getMessage}")
                  // Exponential backoff before the next attempt: an
                  // immediate retry against a still-down broker burns the
                  // whole restart budget in milliseconds and lands in ERROR
                  // on what was a transient outage. `wait` (not sleep)
                  // releases the lock so stop() is never blocked by the
                  // backoff — it notifies to end the wait early.
                  if (_restarts < maxRestarts && !stopping.get()) {
                    try restartLock.wait(backoffMs)
                    catch { case _: InterruptedException => () }
                    backoffMs = math.min(backoffMs * 2, 30000L)
                  }
              }
            }
            launched
          }
          if (!restarted) {
            if (!stopping.get())
              _state = "ERROR" // poisoned — dropped from rotation, like the reference
            done = true
          }
      }
    }
  }

  def state: String = _state
  def restarts: Int = _restarts
  def lastError: Option[String] = _lastError
  def query: StreamingQuery = current

  /** Block until the underlying query has processed all available input —
    * retries across supervised restarts. Throws if the deadline expires or
    * the pipeline leaves NORMAL first: returning silently would let a
    * caller read a sink believing it complete when it is not.
    */
  def processAllAvailable(deadlineMs: Long = 60000): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    var ok = false
    while (!ok && System.currentTimeMillis() < end && _state == "NORMAL") {
      // Each attempt runs on a bounded helper thread: a bare
      // `current.processAllAvailable()` can block INDEFINITELY (wedged
      // broker poll, stalled foreachBatch target) and the between-attempt
      // deadline check would never re-run — the documented deadline has to
      // hold even when the query is alive-but-stuck. A timed-out helper is
      // a daemon and is abandoned, not interrupted (interrupting a thread
      // inside Spark's query lock could wedge the query worse).
      val q = current
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val done = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        try q.processAllAvailable()
        catch { case e: Throwable => err.set(e) }
        finally done.countDown()
      }, "graft-process-all-available")
      t.setDaemon(true)
      t.start()
      val finished = done.await(
        math.max(1L, end - System.currentTimeMillis()),
        java.util.concurrent.TimeUnit.MILLISECONDS)
      if (finished && err.get == null) ok = true
      else if (finished) Thread.sleep(100) // query mid-restart; retry
      // !finished → deadline expired while blocked; loop condition ends it
    }
    if (!ok) throw new IllegalStateException(
      s"processAllAvailable did not complete: state=${_state}" +
        _lastError.map(e => s", lastError=$e").getOrElse(""))
  }

  def stop(): Unit = {
    stopping.set(true)
    // ERROR is a TERMINAL poisoned state (the reference never resurrects an
    // ERROR pipeline) — an unconditional overwrite here would make a
    // shutdown hook's routine stop() report a failed pipeline as cleanly
    // stopped to any post-shutdown state read.
    if (_state == "NORMAL") _state = "STOPPED"
    restartLock.synchronized {
      restartLock.notifyAll() // wake a supervisor sleeping in restart backoff
      try current.stop() catch { case _: Exception => () }
    }
    monitor.join(10000)
    // If a restart won the race before `stopping` was visible, `current` now
    // points at that fresh query — stop whatever the monitor left behind.
    try current.stop() catch { case _: Exception => () }
  }
}
