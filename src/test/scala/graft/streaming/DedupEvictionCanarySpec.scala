package graft.streaming

import java.nio.file.Files
import java.nio.file.attribute.FileTime

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for `dropDuplicatesWithinWatermark`'s BOUNDED-STATE semantics —
  * the entire reason q49 uses it over plain `dropDuplicates`
  * (`graft.queries.StreamingQueries.streamDedup`): a key's dedup state is
  * kept only until the watermark passes its event time + delay, after which
  * the state evicts and a later duplicate of the SAME key is re-emitted as if
  * new. q49's 60-day delay deliberately never evicts (exact-dedup oracle);
  * this test runs the short-watermark schedule that DOES, pinning the
  * trade-off the scaladoc claims: bounded state in exchange for re-emission
  * beyond the watermark horizon.
  *
  * Replay (watermark delay 10 s, one file per batch, dedup key `id`;
  * emissions verified empirically on this engine — Spark removes expired
  * dedup state at the END of a batch, after its input was matched):
  *  - batch 0: (id 1, t=25)            → emitted; state for id 1 expires
  *                                       once the eviction watermark > 35
  *  - batch 1: (id 1, t=26), (id 2, t=100)
  *                                     → t=26 duplicates WITHIN the watermark
  *                                       (eviction wm still 15 from batch 0):
  *                                       dropped. id 2 emitted; watermark
  *                                       advances to 90.
  *  - batch 2: (id 1, t=95)            → eviction wm is now 90 > 35, but
  *                                       cleanup runs AFTER input matching:
  *                                       the row still hits live state and is
  *                                       dropped; the state evicts at batch
  *                                       end.
  *  - batch 3: (id 1, t=96)            → state is GONE: the row RE-EMITS and
  *                                       re-establishes state (expiry 106).
  *  - batch 4: (id 1, t=97)            → deduped against the NEW state.
  */
class DedupEvictionCanarySpec extends SparkTestBase {

  test("dropDuplicatesWithinWatermark evicts state past the watermark and re-emits (q49's bounded-state contract)") {
    val in = Files.createTempDirectory("dedup_canary_in")
    val ckpt = tmpDir("dedup_canary_ckpt")
    val now = System.currentTimeMillis()
    def file(name: String, mtime: Long, rows: Seq[(Int, Long)]): Unit = {
      val p = in.resolve(name)
      Files.write(p, rows.map { case (id, s) => s"""{"id":$id,"sec":$s}""" }
        .mkString("\n").getBytes)
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtime))
    }
    file("f0.json", now - 200000, Seq(1 -> 25L))
    file("f1.json", now - 150000, Seq(1 -> 26L, 2 -> 100L))
    file("f2.json", now - 100000, Seq(1 -> 95L))
    file("f3.json", now - 50000, Seq(1 -> 96L))
    file("f4.json", now, Seq(1 -> 97L))

    val deduped = spark.readStream
      .schema(StructType(Seq(StructField("id", IntegerType), StructField("sec", LongType))))
      .option("maxFilesPerTrigger", 1)
      .json(in.toString)
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")

    val sink = s"dedup_canary_${System.nanoTime()}"
    val q = deduped.writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val emitted = spark.table(sink).collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[Long]("sec")).toSet
    assert(!emitted.contains(1 -> 26L),
      "the duplicate (id 1, t=26) arrives while id 1's state is still live " +
        "(eviction watermark 15 < expiry 35) and must be DROPPED — its presence " +
        "means within-watermark dedup stopped working and q49 would double-count.")
    assert(!emitted.contains(1 -> 95L),
      "the duplicate (id 1, t=95) arrives in the SAME batch whose watermark " +
        "(90) expires id 1's state — but cleanup runs after input matching, so " +
        "the row must still be dropped; re-emission starting one batch early " +
        "means the eviction order changed.")
    assert(emitted.contains(1 -> 96L),
      "the duplicate (id 1, t=96) arrives after id 1's state evicted (end of " +
        "batch 2) and must RE-EMIT — bounded state is the documented trade-off " +
        "of dropDuplicatesWithinWatermark. If this fails after a Spark upgrade, " +
        "state outlives the watermark and q49's scaladoc claim (and its 100 TB " +
        "state-size argument) must be re-derived.")
    assert(!emitted.contains(1 -> 97L),
      "(id 1, t=97) must dedup against the state RE-ESTABLISHED by the t=96 " +
        "re-emission — its presence means re-emitted keys no longer write state.")
    assert(emitted == Set(1 -> 25L, 2 -> 100L, 1 -> 96L),
      s"expected exactly first-seen rows plus the post-eviction re-emission; got $emitted")
  }
}
