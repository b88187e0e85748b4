package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Unit pins for the cross-batch STATE semantics q71/q72 rely on, with
  * tiny synthetic streams — if the driver-graded replays go red, these
  * point at the exact broken mechanism (join state retention / custom
  * per-key state continuity) instead of a hash mismatch.
  */
class StreamStateSpec extends SparkTestBase {

  private def file(dir: Path, name: String, mtime: Long, lines: Seq[String]): Unit = {
    val p = dir.resolve(name)
    Files.write(p, lines.mkString("\n").getBytes)
    Files.setLastModifiedTime(p, FileTime.fromMillis(mtime))
  }

  test("stream-stream join matches pairs across micro-batches, both directions") {
    val cIn = Files.createTempDirectory("ssj_c")
    val pIn = Files.createTempDirectory("ssj_p")
    val ckpt = tmpDir("ssj_ckpt")
    val now = System.currentTimeMillis()
    // click A (user 1) arrives batch 0; its purchase Y arrives batch 1.
    // purchase X (user 2) arrives batch 0; its click B arrives batch 1.
    file(cIn, "c0.json", now - 60000,
      Seq("""{"c_id":1,"c_user":1,"c_ts":"2024-01-01T10:00:00.000Z"}"""))
    file(cIn, "c1.json", now,
      Seq("""{"c_id":2,"c_user":2,"c_ts":"2024-01-01T10:05:00.000Z"}"""))
    file(pIn, "p0.json", now - 60000,
      Seq("""{"p_id":10,"p_user":2,"p_ts":"2024-01-01T10:30:00.000Z"}"""))
    file(pIn, "p1.json", now,
      Seq("""{"p_id":11,"p_user":1,"p_ts":"2024-01-01T10:20:00.000Z"}"""))

    val cSchema = StructType(Seq(StructField("c_id", LongType),
      StructField("c_user", LongType), StructField("c_ts", TimestampType)))
    val pSchema = StructType(Seq(StructField("p_id", LongType),
      StructField("p_user", LongType), StructField("p_ts", TimestampType)))
    def src(dir: Path, schema: StructType) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)

    val joined = src(cIn, cSchema).withWatermark("c_ts", "30 days")
      .join(src(pIn, pSchema).withWatermark("p_ts", "30 days"),
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"))

    val sink = s"ssj_sink_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table(sink).select("c_id", "p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 11L), (2L, 10L)),
      "both cross-batch pairs must match: a batch-0 click against a " +
        "batch-1 purchase AND a batch-1 click against buffered batch-0 state")
  }

  test("flatMapGroupsWithState carries per-key state across micro-batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("fmgs_in")
    val ckpt = tmpDir("fmgs_ckpt")
    val now = System.currentTimeMillis()
    // user 1 appears in all three batches; user 2 only in batch 1.
    file(in, "a0.json", now - 120000, Seq("""{"id":1,"user":1}"""))
    file(in, "a1.json", now - 60000,
      Seq("""{"id":5,"user":1}""", """{"id":3,"user":2}"""))
    file(in, "a2.json", now, Seq("""{"id":2,"user":1}"""))

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("user", LongType)))
    val updates = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.toString)
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state) =>
          val (b0, n0) = state.getOption.getOrElse((0L, 0L))
          val n = n0 + rows.length
          state.update((b0 + 1, n))
          Iterator.single((user, b0 + 1, n))
      }.toDF("user", "upd_seq", "n")

    val sink = s"fmgs_sink_${System.nanoTime()}"
    val q = updates.writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table(sink).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (2L, 1L, 1L)),
      "state must accumulate per key across batches; absent keys emit nothing")
  }
}
