package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** SnapshotDiff classification on hand-computed frames: added / removed /
  * changed, null-safe value compare, unchanged rows suppressed, composite
  * keys, and schema-drift tolerance (only shared non-key columns compared).
  */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies added, removed, changed; drops unchanged") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "s", "n")
    val next = Seq((2L, "b", 20), (3L, "C", 30), (4L, "d", 40))
      .toDF("id", "s", "n")
    val out = SnapshotDiff.diff(old, next, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("null-safe compare: null==null is unchanged, null vs value is changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Option("x")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val next = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("y")))
      .toDF("id", "s")
    val out = SnapshotDiff.diff(old, next, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "changed", 3L -> "changed"))
  }

  test("composite keys survive to the output columns") {
    val old = Seq(("a", 1L, 10), ("a", 2L, 20)).toDF("part", "id", "n")
    val next = Seq(("a", 1L, 11), ("b", 2L, 20)).toDF("part", "id", "n")
    val out = SnapshotDiff.diff(old, next, Seq("part", "id"))
      .orderBy(col("part"), col("id"))
      .as[(String, Long, String)].collect().toSeq
    assert(out === Seq(("a", 1L, "changed"), ("a", 2L, "removed"), ("b", 2L, "added")))
  }

  test("a column present on only one side is ignored, not compared") {
    val old = Seq((1L, "a", 99)).toDF("id", "s", "old_only")
    val next = Seq((1L, "a")).toDF("id", "s")
    assert(SnapshotDiff.diff(old, next, Seq("id")).count() === 0L)
  }

  test("type drift in a shared column compares in the new type instead of throwing") {
    // ordinary schema widening between releases: int -> bigint
    val old = Seq((1L, 5), (2L, 7)).toDF("id", "n")
    val next = Seq((1L, 5L), (2L, 8L)).toDF("id", "n")
    val out = SnapshotDiff.diff(old, next, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out === Array((2L, "changed")))
  }

  test("requires a key column") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(Seq((1, 2)).toDF("a", "b"), Seq((1, 2)).toDF("a", "b"), Nil)
    }
  }

  // ── changeFeed: the row-valued (pre/post image) rendering ───────────────

  test("changeFeed emits insert, delete, and both update images; drops no-ops") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "s", "n")
    val next = Seq((2L, "b", 20), (3L, "C", 30), (4L, "d", 40))
      .toDF("id", "s", "n")
    val out = SnapshotDiff.changeFeed(old, next, Seq("id"))
      .as[(Long, String, Int, String)].collect().toSet
    assert(out === Set(
      (1L, "a", 10, "delete"),
      (3L, "c", 30, "update_pre"),
      (3L, "C", 30, "update_post"),
      (4L, "d", 40, "insert")))
  }

  test("changeFeed null-safe values: null==null suppressed, null-to-value is an update") {
    val old = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("id", "s")
    val next = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "s")
    val out = SnapshotDiff.changeFeed(old, next, Seq("id"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(out === Set(
      (2L, Option("x"), "update_pre"),
      (2L, Option.empty[String], "update_post")))
  }

  test("changeFeed refuses mismatched column sets") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.changeFeed(
        Seq((1L, "a", 9)).toDF("id", "s", "old_only"),
        Seq((1L, "a")).toDF("id", "s"), Seq("id"))
    }
  }

  test("changeFeed widens drifted column types to the new side") {
    val old = Seq((1L, 5), (2L, 7)).toDF("id", "n")
    val next = Seq((1L, 5L), (2L, 8L)).toDF("id", "n")
    val out = SnapshotDiff.changeFeed(old, next, Seq("id"))
      .as[(Long, Long, String)].collect().toSet
    assert(out === Set((2L, 7L, "update_pre"), (2L, 8L, "update_post")))
  }
}
