package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression pin for the round-7 testdata drift: events.parquet has shipped
  * with `ts` as TIMESTAMP(NANOS) (surfacing as LongType under the
  * `nanosAsLong` flag) and as plain TIMESTAMP(MICROS); a regeneration that
  * flips the physical type must not break the 26 events-backed queries.
  * [[RelationalQueries.events]] dispatches on the surfaced Catalyst type —
  * this spec drives every branch with a fixture file per shape.
  */
class EventsSchemaAdaptiveSpec extends SparkTestBase {
  import spark.implicits._

  // 2021-01-01T00:00:00.123456Z in µs since epoch.
  private val baseUs = 1609459200123456L

  private def readBack(dir: String) = {
    val df = RelationalQueries.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events() must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts")).as("us"), col("event_id"))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
  }

  test("µs-typed ts (current corpus shape) passes through untouched") {
    val dir = tmpDir("ev-us")
    Seq((1L, baseUs), (2L, baseUs + 7L))
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir) == Seq((baseUs, 1L), (baseUs + 7L, 2L)))
  }

  test("int64 ns ts (NANOS-as-long shape) is integer-truncated to µs") {
    val dir = tmpDir("ev-ns")
    // A plain int64 column surfaces as LongType exactly like a
    // TIMESTAMP(NANOS) column does under nanosAsLong (Spark cannot WRITE
    // nanos parquet, so the long fixture stands in for the read-side shape).
    Seq((1L, baseUs * 1000L + 999L), (2L, (baseUs + 7L) * 1000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // 999 trailing ns truncate away; no float math may round them up.
    assert(readBack(dir) == Seq((baseUs, 1L), (baseUs + 7L, 2L)))
  }

  test("timestamp_ntz ts is cast to session-TZ timestamp") {
    val dir = tmpDir("ev-ntz")
    Seq((1L, baseUs))
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // Session TZ is UTC in tests, so the µs value survives the cast exactly.
    assert(readBack(dir) == Seq((baseUs, 1L)))
  }
}
