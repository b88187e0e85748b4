package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Rolling-window operators on hand-computed fixtures: trailing-window
  * distinct actors (coverage merge, gap handling, max-day clipping, null
  * drops) and the exact-decimal truncated EWMA.
  */
class RollingSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.toDF("actor", "d").select(col("actor"), col("d").cast("timestamp").as("ts"))

  test("rollingDistinct: trailing-3-day window, interval merge and gaps") {
    // actor 1 active on d1, d2 (merged run covers d1..d4);
    // actor 2 active on d1 only (covers d1..d3); nothing after d4 → grid
    // clips at max event day d4 (actor 3's only event)
    val df = ev(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"),
      (2L, "2024-01-01 23:59:59"),
      (3L, "2024-01-04 00:00:00"))
    val out = Rolling.rollingDistinct(df, "actor", "ts", windowDays = 3)
      .select(col("day").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toMap
    assert(out === Map(
      "2024-01-01" -> 2L, // 1, 2
      "2024-01-02" -> 2L, // 1, 2
      "2024-01-03" -> 2L, // 1 (active 01-02), 2 (active 01-01)
      "2024-01-04" -> 2L)) // 1 (01-02 + 2 days), 3
  }

  test("rollingDistinct: a gap wider than the window breaks coverage") {
    val df = ev((1L, "2024-01-01 00:00:00"), (1L, "2024-01-10 00:00:00"))
    val out = Rolling.rollingDistinct(df, "actor", "ts", windowDays = 2)
      .select(col("day").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toMap
    // covered: 01, 02 (from the first event) and 10 (clipped at max day)
    assert(out === Map("2024-01-01" -> 1L, "2024-01-02" -> 1L, "2024-01-10" -> 1L))
  }

  test("rollingDistinct: adjacent runs merge without double counting") {
    // window 2: day 1 covers {1,2}, day 3 covers {3,4} — adjacent; the
    // merged run must still count the actor ONCE per day
    val df = ev((1L, "2024-01-01 00:00:00"), (1L, "2024-01-03 00:00:00"),
      (9L, "2024-01-04 00:00:00"))
    val out = Rolling.rollingDistinct(df, "actor", "ts", windowDays = 2)
      .select(col("day").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toMap
    assert(out === Map(
      "2024-01-01" -> 1L, "2024-01-02" -> 1L, "2024-01-03" -> 1L,
      "2024-01-04" -> 2L))
  }

  test("rollingDistinct: null actors and timestamps are dropped") {
    val df = Seq(
      (Option(1L), Option("2024-01-01 00:00:00")),
      (Option.empty[Long], Option("2024-01-01 00:00:00")),
      (Option(2L), Option.empty[String]))
      .toDF("actor", "d")
      .select(col("actor"), col("d").cast("timestamp").as("ts"))
    val out = Rolling.rollingDistinct(df, "actor", "ts", windowDays = 1)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(out.values.toSeq === Seq(1L))
  }

  test("ewma: hand-computed exact decimal values") {
    val df = Seq((1L, 1, 8.0), (1L, 2, 4.0), (1L, 3, 2.0))
      .toDF("actor", "seq", "v")
    val out = Rolling.ewma(df, "actor", "seq", "seq", "v", terms = 8)
      .select(col("seq"), col("ewma"))
      .as[(Int, Double)].collect().toMap
    // row1: 8*0.5 = 4; row2: 4*0.5 + 8*0.25 = 4; row3: 2*0.5+4*0.25+8*0.125 = 3
    assert(out === Map(1 -> 4.0, 2 -> 4.0, 3 -> 3.0))
  }

  test("ewma: truncation at `terms` and per-actor isolation") {
    val df = ((1 to 10).map(i => (1L, i, 1.0)) :+ ((2L, 1, 100.0)))
      .toDF("actor", "seq", "v")
    val out = Rolling.ewma(df, "actor", "seq", "seq", "v", terms = 4)
      .select(col("actor"), col("seq"), col("ewma"))
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // steady state for constant 1s with 4 terms: 1/2+1/4+1/8+1/16 = 0.9375
    assert(out((1L, 10)) === 0.9375)
    assert(out((1L, 1)) === 0.5) // only its own term
    assert(out((2L, 1)) === 50.0) // actor 2 unaffected by actor 1
  }

  test("ewma: partition-count invariance") {
    val rows = (1 to 50).map(i => (i % 5L, i, (i * 7 % 23) + 0.25))
    val one = Rolling.ewma(rows.toDF("actor", "seq", "v").repartition(1),
      "actor", "seq", "seq", "v")
      .select(col("actor"), col("seq"), col("ewma"))
      .as[(Long, Int, Double)].collect().toSet
    val many = Rolling.ewma(rows.toDF("actor", "seq", "v").repartition(7),
      "actor", "seq", "seq", "v")
      .select(col("actor"), col("seq"), col("ewma"))
      .as[(Long, Int, Double)].collect().toSet
    assert(one === many)
  }

  test("rollingDistinct: a null-actor row must not extend the clip bound") {
    // actor 1 active Jan 1 (window 3 covers 01..03); the null-actor event
    // on Jan 2 is dropped by contract and must NOT extend the grid: the
    // last contract-valid event day is Jan 1, so output stops there
    val df = Seq(
      (Option(1L), Option("2024-01-01 00:00:00")),
      (Option.empty[Long], Option("2024-01-02 00:00:00")))
      .toDF("actor", "d")
      .select(col("actor"), col("d").cast("timestamp").as("ts"))
    val out = Rolling.rollingDistinct(df, "actor", "ts", windowDays = 3)
      .select(col("day").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toMap
    assert(out === Map("2024-01-01" -> 1L))
  }
}
