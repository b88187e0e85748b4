package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** THE json string-body escaper for the graft harness (Bench error
    * entries and Verify's oracle dump share it): quote, backslash, and
    * every control character — an unescaped \b or \f would make the
    * driver's JSON parse fail and void the round.
    */
  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** JSON string literal for per-query error entries: truncate FIRST
    * (cutting after escaping could split an escape pair in half).
    */
  private[graft] def jstr(s: String): String =
    "\"" + jsonEscape(s.take(200)) + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify: the corpus's timestamp_ntz columns are interpreted
      // in the session TZ — an unpinned zone would bench a different
      // workload than the one Verify validated
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TestdataGate.check(spark, sfDir) // loud stderr line on corpus drift
    // Unmeasured warmup: JIT + codegen + parquet footer caches, so the first
    // measured query doesn't absorb one-time JVM costs (a long-running
    // cluster never pays them per-query).
    try {
      spark.range(2000000).selectExpr("sum(id * 2)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000).count()
    } catch { case _: Throwable => () }
    // Optional arg: comma-separated query subset (dev iteration only; the
    // driver passes no args → full run).
    val only: Option[Set[String]] = args.headOption.map(_.split(",").toSet)
    // (time, error): a failing query must surface as an "err" entry, never
    // as a ~0 s timing that flatters the total.
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Materialize the query's own physical plan in full (every output
      // column, every row) — a count() on top would let Catalyst prune the
      // computed columns and under-measure projection-heavy queries.
      val err =
        try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        }
      val elapsed = (System.nanoTime() - t0) / 1e9 // stop the clock BEFORE teardown
      // Isolate measurements: drop the query's unmanaged per-plan caches
      // (dedup signature persists etc.) so one query's pinned blocks don't
      // squeeze memory under the next — an 80-query session otherwise
      // accumulates every MEMORY_AND_DISK intermediate at once, a state no
      // per-job cluster run ever sees. Via the CacheManager so the plan
      // cache can't hand a later query a gutted InMemoryRelation.
      spark.sharedState.cacheManager.clearCache()
      name -> (elapsed, err)
    }
    // 3-decimal seconds: the driver captures a bounded stdout TAIL — full
    // double precision across 120+ queries risks cutting the line's head
    // (both r6 and r7 lost the leading "total" field to exactly that).
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map {
      case (k, (v, None)) => s"\"" + k + "\":" + sec(v)
      case (k, (_, Some(e))) => s"\"" + k + "\":{\"err\":" + jstr(e) + "}"
    }.mkString("{", ",", "}")
    val errCount = results.count(_._2._2.isDefined)
    val total = results.collect { case (_, (v, None)) => v }.sum
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","errors":$errCount,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
