package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProvenanceSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, 10, "en"),   // kept
    (2L, 3, "en"),    // fails len
    (3L, 10, "zh"),   // fails lang
    (4L, 3, "zh"),    // fails BOTH -> attributed to len (first stage)
    (5L, 10, null)    // null lang -> lang predicate NULL -> fails lang
  ).toDF("id", "n", "lang")

  private val stages = Seq(
    Provenance.Stage("len", col("n") >= 5),
    Provenance.Stage("lang", col("lang") === "en"))

  test("disposition attributes to the FIRST failing stage; null predicate = fail") {
    val d = Provenance.disposition(df, stages)
      .select("id", Provenance.DispositionCol).as[(Long, String)]
      .collect().toMap
    assert(d == Map(1L -> "kept", 2L -> "len", 3L -> "lang", 4L -> "len",
      5L -> "lang"))
  }

  test("funnel telescopes exactly: surviving(i) == entering(i+1), last surviving == kept") {
    val f = Provenance.funnel(df, stages)
      .orderBy("stage_idx")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(f.toSeq == Seq(
      (0L, "len", 5L, 2L, 3L),
      (1L, "lang", 3L, 2L, 1L)))
    // conservation: total == kept + sum(dropped)
    assert(5L == f.last._5 + f.map(_._4).sum)
  }

  test("stage list hygiene: empty, duplicate names, reserved name all fail loudly") {
    intercept[IllegalArgumentException](Provenance.disposition(df, Nil))
    intercept[IllegalArgumentException](Provenance.disposition(df,
      Seq(Provenance.Stage("a", lit(true)), Provenance.Stage("a", lit(false)))))
    intercept[IllegalArgumentException](Provenance.disposition(df,
      Seq(Provenance.Stage("kept", lit(true)))))
  }

  test("a stage that drops nothing still appears with dropped = 0") {
    val f = Provenance.funnel(df, stages :+ Provenance.Stage("noop", lit(true)))
      .orderBy("stage_idx").as[(Long, String, Long, Long, Long)].collect()
    assert(f.last == ((2L, "noop", 1L, 0L, 1L)))
  }
}
