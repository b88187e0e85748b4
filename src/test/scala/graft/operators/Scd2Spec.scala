package graft.operators

import graft.SparkTestBase
import graft.model.TableSpec
import graft.sources.{AppendLog, ParquetTableStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val curSchema = StructType(Seq(
    StructField("nk", LongType), StructField("seg", StringType),
    StructField("bal", DoubleType), StructField("valid_from_us", LongType)))
  private val histSchema = StructType(curSchema.fields :+
    StructField("valid_to_us", LongType))

  private def build() = {
    val root = tmpDir("scd2")
    val cur = new ParquetTableStore(spark, root,
      TableSpec("public.dim", curSchema, Seq("nk")), 8)
    val hist = new AppendLog(spark, root, "public.dim_hist", histSchema,
      zoneCols = Seq("valid_to_us"))
    cur.init(Seq((1L, "A", 100.0, 10L), (2L, "B", 200.0, 10L),
      (3L, "A", 300.0, 10L)).toDF("nk", "seg", "bal", "valid_from_us"))
    (cur, hist)
  }

  private def emptyDel = Seq.empty[Long].toDF("nk")

  test("change closes the prior version, no-op creates none, new key starts open") {
    val (cur, hist) = build()
    val wave = Seq(
      (1L, "A", 150.0),  // changed: bal moves
      (2L, "B", 200.0),  // identical image -> no version
      (9L, "C", 900.0))  // new key
      .toDF("nk", "seg", "bal")
    val st = Scd2(cur, hist, wave, emptyDel, effUs = 20L)
    assert(st == Scd2.Stats(changed = 1, unchanged = 1, created = 1, deleted = 0))
    val full = Scd2.fullView(cur, hist)
      .select("nk", "bal", "valid_from_us", "valid_to_us")
      .as[(Long, Double, Long, Option[Long])].collect().toSet
    assert(full == Set(
      (1L, 100.0, 10L, Some(20L)), (1L, 150.0, 20L, None),
      (2L, 200.0, 10L, None), (3L, 300.0, 10L, None),
      (9L, 900.0, 20L, None)))
  }

  test("delete closes with no successor; asOf reconstructs each instant") {
    val (cur, hist) = build()
    Scd2(cur, hist, Seq((1L, "A", 150.0)).toDF("nk", "seg", "bal"),
      emptyDel, effUs = 20L)
    Scd2(cur, hist, Seq((1L, "Z", 160.0)).toDF("nk", "seg", "bal"),
      Seq(3L).toDF("nk"), effUs = 30L)
    def at(t: Long): Map[Long, Double] =
      Scd2.asOf(cur, hist, t).select("nk", "bal")
        .as[(Long, Double)].collect().toMap
    assert(at(15L) == Map(1L -> 100.0, 2L -> 200.0, 3L -> 300.0))
    assert(at(25L) == Map(1L -> 150.0, 2L -> 200.0, 3L -> 300.0))
    assert(at(35L) == Map(1L -> 160.0, 2L -> 200.0)) // 3 deleted at 30
    // history zones: as-of 15 prunes to the dirs whose close window covers it
    val (kept, total) = hist.zonePrune(col("valid_to_us") > 15L)
    assert(total == 2 && kept.size == 2) // both close waves are after 15
    val (kept2, _) = hist.zonePrune(col("valid_to_us") > 25L)
    assert(kept2.size == 1) // only the t=30 wave can cover 25
  }

  test("a key cannot be changed and deleted in the same wave; duplicate images refused") {
    val (cur, hist) = build()
    intercept[IllegalArgumentException] {
      Scd2(cur, hist, Seq((1L, "A", 1.0)).toDF("nk", "seg", "bal"),
        Seq(1L).toDF("nk"), effUs = 20L)
    }
    intercept[IllegalArgumentException] {
      Scd2(cur, hist, Seq((1L, "A", 1.0), (1L, "A", 2.0)).toDF("nk", "seg", "bal"),
        emptyDel, effUs = 20L)
    }
    // nothing applied
    assert(Scd2.fullView(cur, hist).count() == 3)
  }

  test("temporalJoin: each fact sees the version valid at its own timestamp") {
    val (cur, hist) = build()
    Scd2(cur, hist, Seq((1L, "A2", 150.0)).toDF("nk", "seg", "bal"),
      emptyDel, effUs = 20L)
    Scd2(cur, hist, Seq((1L, "A3", 160.0)).toDF("nk", "seg", "bal"),
      Seq(2L).toDF("nk"), effUs = 30L)
    val facts = Seq(
      (100L, 1L, 15L),  // sees (A, 100) [10,20)
      (101L, 1L, 25L),  // sees (A2, 150) [20,30)
      (102L, 1L, 35L),  // sees (A3, 160) current
      (103L, 2L, 35L),  // key 2 deleted at 30 -> no valid version
      (104L, 9L, 15L))  // unknown key -> null dim
      .toDF("fid", "u", "ts_us")
    val out = Scd2.temporalJoin(cur, hist, facts, Map("u" -> "nk"), "ts_us")
      .select(col("f.fid"), col("dim.seg")).as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(100L -> Some("A"), 101L -> Some("A2"),
      102L -> Some("A3"), 103L -> None, 104L -> None))
  }

  test("store-family-agnostic: the same waves over a MOR current store") {
    val root = tmpDir("scd2-mor")
    val cur = new graft.sources.MorTableStore(spark, root,
      TableSpec("public.dimm", curSchema, Seq("nk")), 8)
    val hist = new AppendLog(spark, root, "public.dimm_hist", histSchema,
      zoneCols = Seq("valid_to_us"))
    cur.init(Seq((1L, "A", 100.0, 10L), (2L, "B", 200.0, 10L))
      .toDF("nk", "seg", "bal", "valid_from_us"))
    val st = Scd2(cur, cur.snapshotForKeys(_), hist,
      Seq((1L, "A", 150.0), (3L, "C", 300.0)).toDF("nk", "seg", "bal"),
      Seq(2L).toDF("nk"), effUs = 20L)
    assert(st == Scd2.Stats(changed = 1, unchanged = 0, created = 1, deleted = 1))
    val full = Scd2.fullView(cur, hist)
      .select("nk", "bal", "valid_from_us", "valid_to_us")
      .as[(Long, Double, Long, Option[Long])].collect().toSet
    assert(full == Set(
      (1L, 100.0, 10L, Some(20L)), (1L, 150.0, 20L, None),
      (2L, 200.0, 10L, Some(20L)), (3L, 300.0, 20L, None)))
  }

  test("null-safe attribute compare: null -> value and value -> null are changes, null -> null is not") {
    val (cur, hist) = build()
    Scd2(cur, hist, Seq((1L, null.asInstanceOf[String], 100.0)).toDF("nk", "seg", "bal"),
      emptyDel, effUs = 20L) // A -> null: change
    val st = Scd2(cur, hist,
      Seq((1L, null.asInstanceOf[String], 100.0)).toDF("nk", "seg", "bal"),
      emptyDel, effUs = 30L) // null -> null: no-op
    assert(st == Scd2.Stats(0, 1, 0, 0))
    assert(hist.batchCount == 1)
  }

  test("crash contract: re-running a wave is idempotent — mid-wave (history committed, current not) and after full commit") {
    val (cur, hist) = build()
    val wave = Seq((1L, "A", 150.0), (9L, "C", 900.0)).toDF("nk", "seg", "bal")
    val del = Seq(3L).toDF("nk")
    // simulate the crash window: history committed, current merge lost.
    // The closing set the wave would write is prior images of changed(1)
    // + deleted(3) keys, closed at effUs — committed with the wave's key.
    val closing = Seq((1L, "A", 100.0, 10L, 20L), (3L, "A", 300.0, 10L, 20L))
      .toDF("nk", "seg", "bal", "valid_from_us", "valid_to_us")
    hist.append(closing, Some("scd2_20"))
    // transiently both the closed and the open image of nk=1/3 exist
    assert(Scd2.fullView(cur, hist).filter(col("nk") === 1L).count() == 2)
    // RE-RUN the identical wave: keyed append skips, merge completes
    val st = Scd2(cur, hist, wave, del, effUs = 20L)
    assert(st == Scd2.Stats(changed = 1, unchanged = 0, created = 1, deleted = 1))
    assert(hist.batchCount == 1) // no duplicate history dir
    val full = Scd2.fullView(cur, hist)
      .select("nk", "bal", "valid_from_us", "valid_to_us")
      .as[(Long, Double, Long, Option[Long])].collect().toSet
    val expect = Set(
      (1L, 100.0, 10L, Some(20L)), (1L, 150.0, 20L, None),
      (2L, 200.0, 10L, None), (3L, 300.0, 10L, Some(20L)),
      (9L, 900.0, 20L, None))
    assert(full == expect)
    // a THIRD run after full commit is a no-op end-to-end
    val st2 = Scd2(cur, hist, wave, del, effUs = 20L)
    assert(st2 == Scd2.Stats(0, 2, 0, 0))
    assert(hist.batchCount == 1)
    assert(Scd2.fullView(cur, hist)
      .select("nk", "bal", "valid_from_us", "valid_to_us")
      .as[(Long, Double, Long, Option[Long])].collect().toSet == expect)
  }
}
