package graft.operators

import graft.SparkTestBase
import graft.functions.TextHash

/** packByBudget must reproduce a single-threaded prefix sum exactly, for any
  * partition count (the two-phase offsets are invisible in the result), and
  * keep every shard inside the budget envelope.
  */
class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  private def expected(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    val ordered = rows.sortBy { case (id, _) => (TextHash.md5Hash60(id.toString), id) }
    var cum = 0L
    ordered.map { case (id, w) =>
      val start = cum; cum += w; id -> start / budget
    }.toMap
  }

  test("packByBudget matches a single-threaded prefix sum for any partition count") {
    val rows = (1 to 500).map(i => (i.toLong, (i % 37 + 1).toLong))
    val df = rows.toDF("doc_id", "w")
    for (p <- Seq(1, 3, 7)) {
      val got = Sharding.packByBudget(df, "doc_id", "w", budget = 100, partitions = p)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(got === expected(rows, 100), s"partitions=$p")
    }
  }

  test("every shard's total weight stays within budget + its largest row") {
    val rows = (1 to 300).map(i => (i.toLong, (i % 29 + 1).toLong))
    val got = Sharding.packByBudget(rows.toDF("doc_id", "w"), "doc_id", "w",
      budget = 64, partitions = 5).as[(Long, Long, Long)].collect()
    got.groupBy(_._3).foreach { case (shard, rs) =>
      val tot = rs.map(_._2).sum
      // a row that STARTS inside a shard may overhang its end
      assert(tot <= 64 + rs.map(_._2).max, s"shard $shard overfull: $tot")
    }
    assert(got.map(_._3).distinct.length > 1, "expected multiple shards")
  }

  test("negative weights fail loudly instead of corrupting the prefix sum") {
    val rows = Seq((1L, 10L), (2L, -3L), (3L, 5L)).toDF("doc_id", "n_tokens")
    val e = intercept[org.apache.spark.SparkException](
      Sharding.packByBudget(rows, "doc_id", "n_tokens", budget = 8L).collect())
    assert(e.getMessage.contains("non-negative") ||
      Option(e.getCause).exists(_.getMessage.contains("non-negative")))
  }

  test("budget must be positive") {
    intercept[IllegalArgumentException] {
      Sharding.packByBudget(Seq((1L, 1L)).toDF("doc_id", "w"), "doc_id", "w", 0)
    }
  }
}
