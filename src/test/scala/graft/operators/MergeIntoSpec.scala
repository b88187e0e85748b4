package graft.operators

import graft.SparkTestBase
import graft.model.TableSpec
import graft.sources.{MorTableStore, ParquetTableStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MergeIntoSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.acct",
    StructType(Seq(
      StructField("id", LongType),
      StructField("bal", DoubleType),
      StructField("seg", StringType))),
    Seq("id"))

  private def initStore() = {
    val s = new ParquetTableStore(spark, tmpDir("mi"), spec, 8)
    s.init(Seq(
      (1L, 100.0, "A"), (2L, 200.0, "B"), (3L, 300.0, "A"), (4L, 400.0, "B"))
      .toDF("id", "bal", "seg"))
    s
  }

  private def state(s: graft.sources.TableStore): Map[Long, (Double, String)] =
    s.snapshot().collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap

  test("update + delete + insert clauses classify and apply; untouched keys stay") {
    val store = initStore()
    val source = Seq(
      (1L, 150.0, "A"),   // matched, update cond true (bal rises)
      (2L, 0.0, "DROP"),  // matched, delete cond true
      (3L, 250.0, "A"),   // matched, neither (t.bal > s.bal) -> no-op
      (9L, 900.0, "C"),   // not matched, insert
      (10L, -1.0, "C"))   // not matched, insert cond false -> dropped
      .toDF("id", "bal", "seg")
    val stats = MergeInto(store, store.snapshotForKeys(_), source,
      whenMatchedDelete = Some(col("s.seg") === "DROP"),
      whenMatchedUpdate = Some(MergeInto.Update(
        col("t.bal") < col("s.bal"),
        Map("bal" -> col("s.bal")))),
      whenNotMatchedInsert = Some(col("s.bal") > 0))
    assert(stats == MergeInto.Stats(matched = 3, deleted = 1, updated = 1,
      inserted = 1))
    assert(state(store) == Map(
      1L -> ((150.0, "A")), 3L -> ((300.0, "A")), 4L -> ((400.0, "B")),
      9L -> ((900.0, "C"))))
  }

  test("delete clause wins over update when both conditions hold") {
    val store = initStore()
    val source = Seq((1L, 999.0, "DROP")).toDF("id", "bal", "seg")
    val stats = MergeInto(store, store.snapshotForKeys(_), source,
      whenMatchedDelete = Some(col("s.seg") === "DROP"),
      whenMatchedUpdate = Some(MergeInto.Update(lit(true),
        Map("bal" -> col("s.bal")))))
    assert(stats.deleted == 1 && stats.updated == 0)
    assert(!state(store).contains(1L))
  }

  test("NULL conditions count as false (SQL semantics)") {
    val store = initStore()
    // bal = null in the source -> t.bal < s.bal is NULL -> no clause fires
    val source = Seq((1L, null.asInstanceOf[java.lang.Double], "A"))
      .toDF("id", "bal", "seg").withColumn("bal", col("bal").cast("double"))
    val stats = MergeInto(store, store.snapshotForKeys(_), source,
      whenMatchedUpdate = Some(MergeInto.Update(
        col("t.bal") < col("s.bal"), Map("bal" -> col("s.bal")))))
    assert(stats == MergeInto.Stats(1, 0, 0, 0))
    assert(state(store)(1L) == ((100.0, "A")))
  }

  test("SET expressions may combine both sides; unset columns keep pre-image values") {
    val store = initStore()
    val source = Seq((1L, 50.0, "IGNORED")).toDF("id", "bal", "seg")
    MergeInto(store, store.snapshotForKeys(_), source,
      whenMatchedUpdate = Some(MergeInto.Update(lit(true),
        Map("bal" -> (col("t.bal") + col("s.bal"))))))
    // bal = 100 + 50; seg untouched (not in SET) stays "A", not "IGNORED"
    assert(state(store)(1L) == ((150.0, "A")))
  }

  test("duplicate source keys are rejected loudly") {
    val store = initStore()
    val source = Seq((1L, 1.0, "A"), (1L, 2.0, "A")).toDF("id", "bal", "seg")
    val e = intercept[IllegalArgumentException] {
      MergeInto(store, store.snapshotForKeys(_), source,
        whenNotMatchedInsert = Some(lit(true)))
    }
    assert(e.getMessage.contains("duplicate keys"))
    assert(state(store).size == 4) // nothing applied
  }

  test("insert-only merge with no matched clauses leaves matched rows alone") {
    val store = initStore()
    val source = Seq((1L, 1.0, "Z"), (7L, 700.0, "C")).toDF("id", "bal", "seg")
    val stats = MergeInto(store, store.snapshotForKeys(_), source,
      whenNotMatchedInsert = Some(lit(true)))
    assert(stats == MergeInto.Stats(1, 0, 0, 1))
    assert(state(store)(1L) == ((100.0, "A")) &&
      state(store)(7L) == ((700.0, "C")))
  }

  test("merge applies identically over a MOR store (delta append, newest-wins read)") {
    val store = new MorTableStore(spark, tmpDir("mi-mor"), spec, 8)
    store.init(Seq((1L, 100.0, "A"), (2L, 200.0, "B")).toDF("id", "bal", "seg"))
    val source = Seq((1L, 500.0, "A"), (2L, 0.0, "DROP"), (5L, 50.0, "C"))
      .toDF("id", "bal", "seg")
    val stats = MergeInto(store, store.snapshotForKeys(_), source,
      whenMatchedDelete = Some(col("s.seg") === "DROP"),
      whenMatchedUpdate = Some(MergeInto.Update(
        col("t.bal") < col("s.bal"), Map("bal" -> col("s.bal")))),
      whenNotMatchedInsert = Some(lit(true)))
    assert(stats == MergeInto.Stats(2, 1, 1, 1))
    assert(state(store) == Map(1L -> ((500.0, "A")), 5L -> ((50.0, "C"))))
  }
}
