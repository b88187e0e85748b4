package graft.streaming

import java.nio.file.Files
import java.nio.file.attribute.FileTime

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for the Spark-internal watermark semantics q19's oracle encodes
  * (SPARK-40025 split, documented in
  * `graft.queries.StreamingQueries`): in micro-batch N the LATE-EVENT FILTER
  * uses the watermark that was in effect during batch N-1, while STATE
  * EVICTION/emission uses the current watermark (computed from batches ≤
  * N-1). q19's three-file replay and its DuckDB oracle both assume exactly
  * this one-batch lag — if a Spark upgrade changes it, THIS test fails with
  * an explanation, instead of q19 going red in the driver with no pointer.
  *
  * Replay (watermark delay 10 s, 10 s tumbling windows, one file per batch):
  *  - batch 0: t=25          → state [20,30); wm after batch = 15
  *  - batch 1: t=120         → wm after batch = 110
  *  - batch 2: t=27 and t=5  → filter runs at the PREVIOUS batch's wm (15):
  *      t=27 (window ends 30 > 15) MERGES although the current wm (110) has
  *      long passed its window; t=5 (window ends 10 ≤ 15) is DROPPED.
  *      Eviction then runs at wm 110 → [20,30) emits with count 2.
  */
class WatermarkCanarySpec extends SparkTestBase {

  test("late-event filter lags state eviction by one batch (q19's oracle contract)") {
    val in = Files.createTempDirectory("canary_in")
    val ckpt = tmpDir("canary_ckpt")
    val now = System.currentTimeMillis()
    def file(name: String, mtime: Long, secs: Seq[Long]): Unit = {
      val p = in.resolve(name)
      Files.write(p, secs.map(s => s"""{"sec":$s}""").mkString("\n").getBytes)
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtime))
    }
    file("f0.json", now - 120000, Seq(25L))
    file("f1.json", now - 60000, Seq(120L))
    file("f2.json", now, Seq(27L, 5L))

    val agg = spark.readStream
      .schema(StructType(Seq(StructField("sec", LongType))))
      .option("maxFilesPerTrigger", 1)
      .json(in.toString)
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("win_start"), col("cnt"))

    val sink = s"canary_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table(sink).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.get(20L).contains(2L),
      "batch 2's straggler at t=27 must MERGE into window [20,30) although the current " +
        "watermark (110 s) already passed it: Spark filters late events with the PREVIOUS " +
        "batch's watermark (15 s). If this fails after a Spark upgrade, the one-batch lag " +
        "changed — re-derive q19's oracle in StreamingQueries.scala before anything else.")
    assert(!rows.contains(0L),
      "the straggler at t=5 (window end 10 ≤ previous-batch watermark 15 s) must be " +
        "DROPPED — its presence means the late filter stopped lagging by one batch.")
    assert(rows.keySet == Set(20L),
      s"append mode must emit exactly the closed window [20,30); got $rows")
  }
}
