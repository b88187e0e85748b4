package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names (dev iteration only;
    // the driver always passes exactly two args → full run).
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TestdataGate.check(spark, sfDir) // loud stderr line on corpus drift
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // always-on start marker: warnings in the driver log attribute to a
      // query by the nearest preceding marker (failures print their own)
      System.err.println(s"[verify] $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Free unmanaged per-plan caches between queries (see Bench) — the
      // 80-query sweep otherwise pins every dedup signature cache at once.
      // Through the CacheManager, not raw RDD unpersist: later queries
      // plan-match registered InMemoryRelations, and an entry whose blocks
      // were yanked out from under it silently recomputes (or worse — this
      // is how the TaskContext partition-id bug in Sharding surfaced).
      spark.sharedState.cacheManager.clearCache()
      }
    // the shared harness escaper (see Bench.jsonEscape) — NO truncation
    // here: the oracle SQL must round-trip whole
    def q(s: String): String = "\"" + Bench.jsonEscape(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
