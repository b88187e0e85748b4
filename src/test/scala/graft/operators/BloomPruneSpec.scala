package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  test("mightMatch keeps a superset of true matches and prunes most non-matches") {
    val large = (0L until 10000L).toDF("k")
    val small = (0L until 10000L by 100).toDF("j") // 100 keys
    val pruned = BloomPrune.mightMatch(large, col("k"), small, col("j"),
      expectedItems = 1000)
    val kept = pruned.select("k").as[Long].collect().toSet
    val truth = (0L until 10000L by 100).toSet
    assert(truth.subsetOf(kept), "bloom must never drop a true match")
    // At fpp ~3% the false-positive overhead should be far below the input.
    assert(kept.size < 2000,
      s"bloom pruned too little: kept ${kept.size} of 10000 for 100 true keys")
  }

  test("semiJoin is exact despite bloom false positives") {
    val large = (0L until 5000L).map(i => (i, i % 7)).toDF("k", "payload")
    val small = Seq(3L, 14L, 4999L, 77777L).toDF("j")
    val got = BloomPrune.semiJoin(large, "k", small, "j")
      .orderBy("k").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((3L, 3L), (14L, 0L), (4999L, 1L)))
  }

  test("type-mismatched keys are rejected instead of silently dropping matches") {
    import spark.implicits._
    val large = (1 to 10).map(i => (i.toLong, i)).toDF("k", "v")     // k: bigint
    val small = (1 to 5).map(i => i).toDF("k")                        // k: int
    val e = intercept[IllegalArgumentException](
      BloomPrune.semiJoin(large, "k", small, "k"))
    assert(e.getMessage.contains("data type"), e.getMessage)
  }

  test("empty build side prunes everything") {
    val large = (0L until 100L).toDF("k")
    val small = Seq.empty[Long].toDF("j")
    assert(BloomPrune.semiJoin(large, "k", small, "j").count() == 0)
    assert(BloomPrune.mightMatch(large, col("k"), small, col("j")).count() == 0)
  }

  test("property: semiJoin == plain left_semi (seeded random, 25 rounds)") {
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 25) {
      val largeN = 1 + rnd.nextInt(400)
      val keySpace = 1 + rnd.nextInt(50)
      val large = Seq.fill(largeN)(rnd.nextInt(keySpace).toLong).toDF("k")
      val small = Seq.fill(rnd.nextInt(20))(rnd.nextInt(keySpace).toLong).toDF("j")
      val got = BloomPrune.semiJoin(large, "k", small, "j", expectedItems = 64)
        .as[Long].collect().sorted.toSeq
      val want = large.join(small, large("k") === small("j"), "left_semi")
        .as[Long].collect().sorted.toSeq
      assert(got == want, s"round $round")
    }
  }

  test("probe rides the scan: no shuffle before the bloom filter") {
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate
    // the probe at optimization time and leave a bare LocalTableScan.
    val large = spark.range(1000).toDF("k")
    val small = Seq(1L, 2L).toDF("j")
    val pruned = BloomPrune.mightMatch(large, col("k"), small, col("j"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"expected a bloom probe in the plan:\n$plan")
    assert(!plan.toLowerCase.contains("exchange"),
      s"bloom probe must not introduce a shuffle:\n$plan")
  }
}
