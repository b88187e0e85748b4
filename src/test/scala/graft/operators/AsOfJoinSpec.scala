package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** As-of join semantics on a hand-computed frame: latest-at-or-before match,
  * inclusive equal-time boundary, max-id tie-break among equal-time anchors,
  * null when no anchor precedes, and key isolation.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("asOf picks the latest anchor at-or-before each probe, per key") {
    // anchors: user 1 at minute 10 (id 100) and 30 (id 101); user 2 at 20 (id 200)
    val anchors = Seq(
      (1L, ts(10), 100L), (1L, ts(30), 101L), (2L, ts(20), 200L))
      .toDF("user_id", "ts", "event_id")
    val probes = Seq(
      (10L, 1L, ts(5)),   // before any anchor -> null
      (11L, 1L, ts(10)),  // equal-time -> inclusive match 100
      (12L, 1L, ts(25)),  // between -> 100
      (13L, 1L, ts(40)),  // after both -> 101
      (14L, 2L, ts(25)),  // other key -> 200, never user 1's anchors
      (15L, 3L, ts(50)))  // key with no anchors -> null
      .toDF("event_id", "user_id", "ts")

    val out = AsOfJoin.asOf(probes, anchors, Seq("user_id"), "ts", "ts",
        "event_id", "last_purchase_id")
      .select(col("event_id"), col("last_purchase_id"))
      .as[(Long, Option[Long])].collect().toMap

    assert(out === Map(
      10L -> None, 11L -> Some(100L), 12L -> Some(100L), 13L -> Some(101L),
      14L -> Some(200L), 15L -> None))
  }

  test("equal-time anchors tie-break to the max value") {
    val anchors = Seq((1L, ts(10), 7L), (1L, ts(10), 9L), (1L, ts(10), 8L))
      .toDF("user_id", "ts", "event_id")
    val probes = Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(probes, anchors, Seq("user_id"), "ts", "ts",
        "event_id", "a").select("a").as[Long].collect()
    assert(out.toSeq === Seq(9L))
  }

  test("asOfTolerance nulls stale anchors, keeps fresh ones, boundary inclusive") {
    val anchors = Seq((1L, ts(10), 100L), (2L, ts(20), 200L))
      .toDF("user_id", "ts", "event_id")
    val probes = Seq(
      (10L, 1L, ts(12)),  // 2 min old, within 5 min -> 100
      (11L, 1L, ts(15)),  // exactly 5 min -> inclusive boundary, 100
      (12L, 1L, ts(16)),  // 6 min old -> stale, null
      (13L, 1L, ts(5)),   // before any anchor -> null
      (14L, 2L, ts(24)))  // other key, fresh -> 200
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfTolerance(probes, anchors, Seq("user_id"),
        "ts", "ts", "event_id", "a", toleranceSeconds = 300)
      .select("event_id", "a").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(10L -> Some(100L), 11L -> Some(100L),
      12L -> None, 13L -> None, 14L -> Some(200L)))
  }

  test("asOfTolerance equal-time anchor ties carry one consistent (time, value) pair") {
    // two anchors at the same instant: value tie-breaks to max, and the
    // age test must use THAT anchor's time (not a mix of the two carries)
    val anchors = Seq((1L, ts(10), 7L), (1L, ts(10), 9L))
      .toDF("user_id", "ts", "event_id")
    val probes = Seq((10L, 1L, ts(12))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfTolerance(probes, anchors, Seq("user_id"),
        "ts", "ts", "event_id", "a", toleranceSeconds = 300)
      .select("a").as[Option[Long]].collect()
    assert(out.toSeq === Seq(Some(9L)))
  }

  test("property: asOfTolerance == brute-force model (seeded random, 10 rounds)") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 10) {
      val nA = 1 + rnd.nextInt(12)
      val nP = 1 + rnd.nextInt(12)
      val tol = 60L * (1 + rnd.nextInt(8)) // 1..8 minutes in seconds
      // minute-resolution times over few keys force boundary ties often
      val anchors = (1 to nA).map(i =>
        (1L + rnd.nextInt(3), ts(rnd.nextInt(50)), 100L + i))
      val probes = (1 to nP).map(i =>
        (i.toLong, 1L + rnd.nextInt(3), ts(rnd.nextInt(50))))
      val out = AsOfJoin.asOfTolerance(
          probes.toDF("event_id", "user_id", "ts"),
          anchors.toDF("user_id", "ts", "event_id"),
          Seq("user_id"), "ts", "ts", "event_id", "a", tol)
        .select("event_id", "a").as[(Long, Option[Long])].collect().toMap
      val model = probes.map { case (pid, key, pt) =>
        val eligible = anchors.filter(a => a._1 == key && !a._2.after(pt))
        val best = eligible.sortBy(a => (a._2.getTime, a._3)).lastOption
        val v = best.filter(a => pt.getTime - a._2.getTime <= tol * 1000)
          .map(_._3)
        pid -> v
      }.toMap
      assert(out == model, s"round $round diverged (tol=$tol s)")
    }
  }

  test("plan shuffles once on the key (no range-join explosion)") {
    val anchors = Seq((1L, ts(10), 100L)).toDF("user_id", "ts", "event_id")
    val probes = Seq((10L, 1L, ts(5))).toDF("event_id", "user_id", "ts")
    val plan = AsOfJoin.asOf(probes, anchors, Seq("user_id"), "ts", "ts",
      "event_id", "a").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // one exchange for the window partitioning (plus AQE reads), no join node
    assert(!plan.contains("SortMergeJoin"))
  }

  test("asOfForward picks the earliest anchor at-or-after, inclusive, per key") {
    val anchors = Seq(
      (1L, ts(10), 100L), (1L, ts(30), 101L), (2L, ts(20), 200L))
      .toDF("user_id", "ts", "event_id")
    val probes = Seq(
      (10L, 1L, ts(5)),   // before both -> nearest ahead is 100
      (11L, 1L, ts(10)),  // equal-time -> inclusive match 100
      (12L, 1L, ts(25)),  // between -> 101
      (13L, 1L, ts(40)),  // after the last anchor -> null
      (14L, 2L, ts(15)),  // other key -> 200
      (15L, 3L, ts(1)))   // key with no anchors -> null
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfForward(probes, anchors, Seq("user_id"), "ts", "ts",
        "event_id", "next_id")
      .select(col("event_id"), col("next_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      10L -> Some(100L), 11L -> Some(100L), 12L -> Some(101L), 13L -> None,
      14L -> Some(200L), 15L -> None))
  }

  test("asOfForward equal-time anchors tie-break to the max value, like asOf") {
    val anchors = Seq((1L, ts(10), 7L), (1L, ts(10), 9L), (1L, ts(10), 8L))
      .toDF("user_id", "ts", "event_id")
    val probes = Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfForward(probes, anchors, Seq("user_id"), "ts", "ts",
        "event_id", "next_id")
      .select(col("next_id")).as[Long].collect().toSeq
    assert(out === Seq(9L))
  }
}
