package graft.operators

import graft.SparkTestBase

/** Planted-violation tests for the one-pass data-quality checker. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._
  import Quality._

  private val rows = Seq(
    (1L, Option(5.0), "ok"),
    (1L, Option(6.0), "ok"),   // duplicate key
    (2L, None, "ok"),          // null value
    (3L, Option(99.0), "bad"), // out of range AND bad status
    (4L, Option(-1.0), "ok")   // below range
  ).toDF("id", "value", "status")

  test("check counts planted violations per rule in one pass") {
    val got = check(rows, Seq(
      Unique(Seq("id")),
      NotNull("value"),
      InRange("value", 0.0, 50.0),
      InSet("status", Seq("ok"))))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("unique(id)") === ((1L, 5L, false)))
    assert(got("not_null(value)") === ((1L, 5L, false)))
    assert(got("in_range(value)") === ((2L, 5L, false))) // NULL is not a range violation
    assert(got("in_set(status)") === ((1L, 5L, false)))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, Option(1.0), "ok"), (2L, Option(2.0), "ok"))
      .toDF("id", "value", "status")
    val got = check(clean, Seq(
      Unique(Seq("id")), NotNull("value"),
      InRange("value", 0.0, 50.0), InSet("status", Seq("ok"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(_._4), got.mkString(", "))
    assert(got.forall(_._3 == 2L))
  }

  test("NULL keys all count as uniqueness violations (SQL distinct semantics)") {
    val df = Seq(Option(1L), None, None).toDF("id")
    val got = check(df, Seq(Unique(Seq("id"))))
      .as[(String, Long, Long, Boolean)].collect().head
    // count(*) - count(DISTINCT id) = 3 - 1: both NULL-key rows violate
    assert(got === (("unique(id)", 2L, 3L, false)))
  }

  test("an empty table reports zero violations and passes, never NULLs") {
    val empty = Seq.empty[(Long, Option[Double], String)]
      .toDF("id", "value", "status")
    val got = check(empty, Seq(
      Unique(Seq("id")), NotNull("value"),
      InRange("value", 0.0, 50.0), InSet("status", Seq("ok"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.length === 4)
    assert(got.forall(r => r._2 == 0L && r._3 == 0L && r._4))
  }

  test("rule arguments are validated") {
    intercept[IllegalArgumentException](check(rows, Seq.empty))
    intercept[IllegalArgumentException](InRange("v", 5.0, 1.0))
    intercept[IllegalArgumentException](Unique(Seq.empty))
    intercept[IllegalArgumentException](InSet("s", Seq.empty))
    intercept[IllegalArgumentException](quarantine(rows, Seq.empty))
  }

  test("quarantine annotates each row with the sorted rules it breaks") {
    val got = quarantine(rows, Seq(
      Unique(Seq("id")), NotNull("value"),
      InRange("value", 0.0, 10.0), InSet("status", Seq("ok"))))
      .select("id", "value", "violated", "pass")
      .as[(Long, Option[Double], Seq[String], Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // BOTH rows of the duplicated key flag (enforcement can't pick one)
    assert(got((1L, Some(5.0))) == ((Seq("unique(id)"), false)))
    assert(got((1L, Some(6.0))) == ((Seq("unique(id)"), false)))
    assert(got((2L, None)) == ((Seq("not_null(value)"), false)))
    // multi-violation row: names sorted ascending
    assert(got((3L, Some(99.0))) ==
      ((Seq("in_range(value)", "in_set(status)"), false)))
    assert(got((4L, Some(-1.0))) == ((Seq("in_range(value)"), false)))
  }

  test("quarantine passes a clean table untouched and splits cleanly") {
    val clean = Seq((1L, Option(1.0), "ok"), (2L, Option(2.0), "ok"))
      .toDF("id", "value", "status")
    val q = quarantine(clean, Seq(Unique(Seq("id")), NotNull("value")))
    assert(q.filter(!org.apache.spark.sql.functions.col("pass")).count() == 0)
    assert(q.count() == 2)
    // quarantine totals agree with check()'s counted violations where
    // semantics coincide (scalar rules)
    val counted = check(rows, Seq(NotNull("value"))).collect()(0).getLong(1)
    val flagged = quarantine(rows, Seq(NotNull("value")))
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("violated")) > 0).count()
    assert(counted == flagged)
  }

  test("suggestRules derives exactly the constraints the data satisfies") {
    val df = Seq(
      (1L, Option(5.0), "a", "x"),
      (2L, Option(7.0), "b", "x"),
      (3L, None, "a", "y"),
      (4L, Option(9.0), "b", "y")
    ).toDF("id", "v", "tag", "grp")
    val s = suggestRules(df, Seq("id", "v", "tag", "grp"))
    val byKey = s.map(x => (x.column, x.rule.getClass.getSimpleName) -> x).toMap
    // id: all non-null, unique, numeric range
    assert(byKey.contains(("id", "NotNull")) && byKey.contains(("id", "Unique")))
    assert(byKey(("id", "InRange")).lo === Some(1.0))
    assert(byKey(("id", "InRange")).hi === Some(4.0))
    // v has a NULL: no not_null, no unique, but range over observed values
    assert(!byKey.contains(("v", "NotNull")) && !byKey.contains(("v", "Unique")))
    assert(byKey(("v", "InRange")).lo === Some(5.0))
    assert(byKey(("v", "InRange")).hi === Some(9.0))
    // tag/grp: low-card strings → sorted accepted sets; not unique
    assert(byKey(("tag", "InSet")).vals === Some(Seq("a", "b")))
    assert(byKey(("grp", "InSet")).vals === Some(Seq("x", "y")))
    assert(!byKey.contains(("tag", "Unique")))
    // the suggested contract HOLDS on the profiled data by construction
    val report = check(df, s.map(_.rule)).collect()
    assert(report.forall(_.getBoolean(3)), report.mkString("; "))
  }

  test("suggestRules: a high-cardinality string gets no in_set; empty input suggests nothing") {
    val wide = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val s = suggestRules(wide, Seq("s"), inSetMaxNdv = 8)
    assert(!s.exists(_.rule.isInstanceOf[InSet]))
    assert(s.exists(_.rule.isInstanceOf[NotNull])) // still fully non-null
    val empty = suggestRules(
      Seq.empty[(Long, String)].toDF("id", "s"), Seq("id", "s"))
    assert(empty.isEmpty, s"empty table must suggest nothing: $empty")
  }
}
