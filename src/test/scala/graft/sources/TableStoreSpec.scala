package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.types._

class TableStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.t",
    StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
    Seq("id"))

  private def newStore(buckets: Int = 8) =
    new ParquetTableStore(spark, tmpDir("store"), spec, buckets)

  private def state(s: TableStore): Map[Int, String] =
    s.snapshot().collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("init + snapshot round-trips") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(state(s) == Map(1 -> "a", 2 -> "b"))
  }

  test("merge applies deletes then upserts (M6), replace semantics") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    s.merge(CompactedBatch(
      deletes = Seq(2).toDF("id"),
      upserts = Seq((1, "a2"), (4, "d")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a2", 3 -> "c", 4 -> "d"))
  }

  test("merge into empty/nonexistent table creates it") {
    val s = newStore()
    s.merge(CompactedBatch(Seq(9).toDF("id"), Seq((1, "a")).toDF("id", "v")))
    assert(state(s) == Map(1 -> "a"))
  }

  test("only affected buckets are rewritten; others untouched") {
    val s = newStore(buckets = 4)
    s.init((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"))
    s.merge(CompactedBatch(Seq(7).toDF("id"), Seq((7, "seven")).toDF("id", "v")))
    val expect = ((1 to 100).map(i => i -> s"v$i").toMap) + (7 -> "seven")
    assert(state(s) == expect)
  }

  test("idempotent re-apply of the same batch (crash-replay safety)") {
    val s = newStore()
    s.init(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val batch = CompactedBatch(Seq(1).toDF("id"), Seq((2, "b2"), (5, "e")).toDF("id", "v"))
    s.merge(batch)
    val once = state(s)
    s.merge(batch)
    assert(state(s) == once && once == Map(2 -> "b2", 5 -> "e"))
  }
}
