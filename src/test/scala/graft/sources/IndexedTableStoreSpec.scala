package graft.sources

import graft.SparkTestBase
import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Secondary index: lookup equals the filtered snapshot after every
  * mutation, old values leave the index when a row's value moves, NULL
  * values are unindexed, and rebuildIndex recovers from a stale index.
  */
class IndexedTableStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = TableSpec(
    "public.ix",
    StructType(Seq(StructField("id", IntegerType), StructField("seg", StringType),
      StructField("v", StringType))),
    Seq("id"))

  private def newStore() =
    new IndexedTableStore(spark, tmpDir("ixstore"), spec, "seg", numBuckets = 4)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.select("id").collect().map(_.getInt(0)).toSet

  test("lookup matches the filtered snapshot through init, update, delete") {
    val s = newStore()
    s.init(Seq((1, "A", "x"), (2, "B", "y"), (3, "A", "z"), (4, null, "n"))
      .toDF("id", "seg", "v"))
    assert(ids(s.lookup(Seq("A"))) == Set(1, 3))
    assert(ids(s.lookup(Seq("A", "B"))) == Set(1, 2, 3))
    // move 1 from A to B, delete 3, insert 5 into A
    s.merge(CompactedBatch(
      deletes = Seq(3).toDF("id"),
      upserts = Seq((1, "B", "x"), (5, "A", "w")).toDF("id", "seg", "v")))
    assert(ids(s.lookup(Seq("A"))) == Set(5), "old A entry for id 1 must leave the index")
    assert(ids(s.lookup(Seq("B"))) == Set(1, 2))
    // the null-segment row is findable by snapshot, never via the index
    assert(ids(s.snapshot().filter(col("seg").isNull)) == Set(4))
  }

  test("a row gaining a value from NULL enters the index; going NULL leaves it") {
    val s = newStore()
    s.init(Seq((1, Option.empty[String], "x")).toDF("id", "seg", "v"))
    s.merge(CompactedBatch(Seq.empty[Int].toDF("id"),
      Seq((1, Option("A"), "x")).toDF("id", "seg", "v")))
    assert(ids(s.lookup(Seq("A"))) == Set(1))
    s.merge(CompactedBatch(Seq.empty[Int].toDF("id"),
      Seq((1, Option.empty[String], "x")).toDF("id", "seg", "v")))
    assert(ids(s.lookup(Seq("A"))).isEmpty)
  }

  test("rebuildIndex recovers a manually staled index") {
    val s = newStore()
    s.init(Seq((1, "A", "x"), (2, "B", "y")).toDF("id", "seg", "v"))
    // simulate the documented crash window: mutate ONLY the primary
    s.primary.merge(CompactedBatch(Seq.empty[Int].toDF("id"),
      Seq((2, "A", "y")).toDF("id", "seg", "v")))
    // stale index misses id 2 under A (lost-entry window)…
    assert(ids(s.lookup(Seq("A"))) == Set(1))
    // …but the re-verification filter keeps stale-extra entries harmless
    assert(ids(s.lookup(Seq("B"))).isEmpty)
    s.rebuildIndex()
    assert(ids(s.lookup(Seq("A"))) == Set(1, 2))
  }

  test("randomized differential: lookup == snapshot filter over 4 rounds") {
    val s = newStore()
    val segs = Array("A", "B", "C", "D")
    val rnd = new scala.util.Random(11)
    s.init((1 to 30).map(i => (i, segs(rnd.nextInt(4)), s"v$i"))
      .toDF("id", "seg", "v"))
    for (round <- 1 to 4) {
      val dels = rnd.shuffle((1 to 30).toList).take(3)
      val ups = rnd.shuffle((1 to 34).toList).take(5).filterNot(dels.contains)
        .map(i => (i, segs(rnd.nextInt(4)), s"r$round"))
      s.merge(CompactedBatch(dels.toDF("id"), ups.toDF("id", "seg", "v")))
      val want = ids(s.snapshot().filter(col("seg") === "A"))
      assert(ids(s.lookup(Seq("A"))) == want, s"diverged at round $round")
    }
  }

  private val numSpec = TableSpec(
    "public.ixr",
    StructType(Seq(StructField("id", IntegerType),
      StructField("bal", DoubleType), StructField("v", StringType))),
    Seq("id"))

  test("lookupRange: inclusive bounds, value moves, deletes, null exclusion") {
    val s = new IndexedTableStore(spark, tmpDir("ixrstore"), numSpec, "bal",
      numBuckets = 4)
    s.init(Seq((1, Option(10.0), "a"), (2, Option(20.0), "b"),
      (3, Option(30.0), "c"), (4, Option(40.0), "d"),
      (5, Option.empty[Double], "e")).toDF("id", "bal", "v"))
    assert(ids(s.lookupRange(20.0, 30.0)) == Set(2, 3), "bounds are inclusive")
    assert(ids(s.lookupRange(20.0, 20.0)) == Set(2), "point range works")
    // move 2 out of range, 4 in; delete 3
    s.merge(CompactedBatch(
      deletes = Seq(3).toDF("id"),
      upserts = Seq((2, Option(99.0), "b"), (4, Option(25.0), "d"))
        .toDF("id", "bal", "v")))
    assert(ids(s.lookupRange(20.0, 30.0)) == Set(4),
      "moved-out and deleted rows must leave the band; moved-in must appear")
    intercept[IllegalArgumentException](s.lookupRange(null, 1.0))
  }

  test("lookupRange randomized differential vs snapshot filter") {
    val s = new IndexedTableStore(spark, tmpDir("ixrstore2"), numSpec, "bal",
      numBuckets = 4)
    val rnd = new scala.util.Random(29)
    s.init((1 to 40).map(i => (i, Option(rnd.nextInt(100).toDouble), s"v$i"))
      .toDF("id", "bal", "v"))
    for (round <- 1 to 3) {
      val dels = rnd.shuffle((1 to 40).toList).take(4)
      val ups = rnd.shuffle((1 to 44).toList).take(6).filterNot(dels.contains)
        .map(i => (i, Option(rnd.nextInt(100).toDouble), s"r$round"))
      s.merge(CompactedBatch(dels.toDF("id"), ups.toDF("id", "bal", "v")))
      val want = ids(s.snapshot()
        .filter(col("bal") >= 25.0 && col("bal") <= 75.0))
      assert(ids(s.lookupRange(25.0, 75.0)) == want, s"diverged at round $round")
    }
  }
}
