package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Driver-side USAGE ledger for registered summaries — the missing
  * lifecycle half of the advisor loop: [[MvAdvisor.advise]] creates
  * summaries, the rewrite serves them, the maintainers refresh them, and
  * until now nothing ever asked whether a summary still EARNS its
  * maintenance. Two counters per summary identity:
  *
  *  - `hits`: times the rewrite actually rerouted a query to the summary
  *    (recorded at every serve decision in [[MvRewriteRule]] /
  *    [[StarMv]]; approximate under re-optimization — an advisor signal,
  *    not an audit log);
  *  - `maintEvents`: refresh/rebuild waves applied (each one rewrites
  *    the summary — the recurring cost serving must amortize).
  *
  * Identity strips the `_vN` version suffix ([[key]]): every refresh
  * retires the old path for a new version, and usage must accumulate
  * across versions or each refresh would zero the evidence.
  * Constant-size driver state; `reset()` starts a new observation window.
  */
object MvUsage {

  final case class Usage(hits: Long, maintEvents: Long)

  private val hits = new ConcurrentHashMap[String, AtomicLong]()
  private val maint = new ConcurrentHashMap[String, AtomicLong]()

  /** Version-stripped, normalized summary identity. */
  def key(summaryPath: String): String =
    MaterializedView.normalize(summaryPath).replaceAll("_v\\d+$", "")

  private[plans] def recordServe(summaryPath: String): Unit = {
    hits.computeIfAbsent(key(summaryPath), _ => new AtomicLong())
      .incrementAndGet(); ()
  }

  private[plans] def recordMaintenance(summaryPath: String): Unit = {
    maint.computeIfAbsent(key(summaryPath), _ => new AtomicLong())
      .incrementAndGet(); ()
  }

  /** Usage for a summary path (any version). */
  def usageOf(summaryPath: String): Usage = {
    val k = key(summaryPath)
    Usage(Option(hits.get(k)).map(_.get).getOrElse(0L),
      Option(maint.get(k)).map(_.get).getOrElse(0L))
  }

  /** Start a new observation window. */
  def reset(): Unit = { hits.clear(); maint.clear() }
}
