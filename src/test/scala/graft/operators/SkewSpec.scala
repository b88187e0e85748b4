package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // A skewed fact: key 0 owns 90% of the rows.
  private def skewedFact = (0 until 2000).map { i =>
    (if (i < 1800) 0L else (i % 10).toLong, i.toLong)
  }.toDF("k", "v")

  private def dim = (0L until 10L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin equals the plain join, including duplicate dim keys") {
    val dupDim = dim.unionByName(dim.filter(col("k") === 3L)) // key 3 twice
    val plain = skewedFact.join(dupDim, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val salted = Skew.saltedJoin(skewedFact, dupDim, Seq("k"), salt = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(salted.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
  }

  test("saltedJoin scatters a hot key across salt partitions") {
    // With broadcast off (force a shuffled join) and AQE off (it would
    // coalesce this tiny shuffle back into one partition), the join
    // partitions by (k, salt): the hot key's rows must land in >1 partition.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Skew.saltedJoin(skewedFact, dim, Seq("k"), salt = 8)
      val parts = joined.filter(col("k") === 0L)
        .select(spark_partition_id().as("p")).distinct().count()
      assert(parts > 1, s"hot key stayed in $parts partition(s)")
      // FULL-duplicate rows share one content salt by default (the
      // retry-deterministic contract); spreadDuplicates opts into
      // position-mixing for scan-deterministic inputs and must scatter them
      val dupFact = (0 until 1000).map(_ => (0L, 7L)).toDF("k", "v")
      val dupDefault = Skew.saltedJoin(dupFact, dim, Seq("k"), salt = 8)
        .select(spark_partition_id().as("p")).distinct().count()
      assert(dupDefault === 1L,
        s"content salt must be duplicate-invariant, got $dupDefault partitions")
      val dupSpread = Skew.saltedJoin(dupFact, dim, Seq("k"), salt = 8,
          spreadDuplicates = true)
        .select(spark_partition_id().as("p")).distinct().count()
      assert(dupSpread > 1, s"identical hot rows stayed in $dupSpread partition(s)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("saltedAgg equals the direct aggregate") {
    val direct = skewedFact.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"), max(col("v")).as("mx"))
    val salted = Skew.saltedAgg(skewedFact, Seq("k"), salt = 8,
      partials = Seq(count(lit(1)).as("_n"), sum(col("v")).as("_sv"),
        max(col("v")).as("_mx")),
      combine = Seq(sum(col("_n")).as("n"), sum(col("_sv")).as("sv"),
        max(col("_mx")).as("mx")))
    assert(salted.orderBy("k").collect().toSeq ==
      direct.orderBy("k").collect().toSeq)
  }

  test("property: saltedJoin == plain join (seeded random, 20 rounds)") {
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 20) {
      val fact = Seq.fill(1 + rnd.nextInt(300))(
        (rnd.nextInt(20).toLong, rnd.nextLong())).toDF("k", "v")
      val d = Seq.fill(rnd.nextInt(30))(
        (rnd.nextInt(20).toLong, rnd.nextInt(5))).toDF("k", "attr")
      val salt = 1 + rnd.nextInt(8)
      val got = Skew.saltedJoin(fact, d, Seq("k"), salt)
        .as[(Long, Long, Int)].collect().sorted.toSeq
      val want = fact.join(d, Seq("k")).as[(Long, Long, Int)]
        .collect().sorted.toSeq
      assert(got == want, s"round $round salt=$salt")
    }
  }

  test("salt must be positive") {
    intercept[IllegalArgumentException](Skew.saltedJoin(dim, dim, Seq("k"), 0))
    intercept[IllegalArgumentException](
      Skew.saltedAgg(dim, Seq("k"), -1, Seq(count(lit(1))), Seq(count(lit(1)))))
  }

  test("content salt tolerates map columns and stays partition-invariant") {
    // xxhash64 rejects MapType — the content salt must skip such columns
    val fact = (0 until 100).map(i => ((i % 10).toLong, Map("a" -> s"v$i")))
      .toDF("k", "attrs")
    val joined = Skew.saltedJoin(fact, dim, Seq("k"), salt = 4)
    assert(joined.count() === 100L)
    // the salt is a pure function of row content: any input partitioning
    // yields the identical aggregate result
    val a = Skew.saltedAgg(skewedFact.repartition(3), Seq("k"), 8,
      Seq(count(lit(1)).as("c")), Seq(sum("c").as("n")))
      .as[(Long, Long)].collect().toMap
    val b = Skew.saltedAgg(skewedFact.repartition(11), Seq("k"), 8,
      Seq(count(lit(1)).as("c")), Seq(sum("c").as("n")))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a(0L) === 1820L) // 1800 head rows + the tail's i % 10 == 0 rows
  }

  test("keyProfile surfaces hot keys with exact ppm shares, ties broken by key") {
    // 1000 rows: key "hot" owns 500 (500000 ppm), "warm" 300, "a"/"b" 100
    // each (tie → ordered by key)
    val df = (Seq.fill(500)("hot") ++ Seq.fill(300)("warm") ++
      Seq.fill(100)("a") ++ Seq.fill(100)("b")).toDF("k")
    val got = Skew.keyProfile(df, "k", topK = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("hot", 500L, 500000L), ("warm", 300L, 300000L),
      ("a", 100L, 100000L)))
  }

  test("keyProfile truncates shares with integer div (never rounds up past total)") {
    val df = Seq("x", "x", "y").toDF("k") // x: 2/3 → 666666 ppm floor
    val got = Skew.keyProfile(df, "k").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("x", 2L, 666666L), ("y", 1L, 333333L)))
  }
}
