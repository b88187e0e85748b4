package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BlockingReportSpec extends SparkTestBase {
  import spark.implicits._

  test("reduction and completeness from a hand-computed example") {
    // entity 1: ids 1,2 in block A, id 3 in block B -> truth 3, captured 1
    // entity 2: ids 4,5 in block A                 -> truth 1, captured 1
    // entity 3: id 6, NULL block                   -> truth 0
    val recs = Seq(
      (1L, "A", 1L), (2L, "A", 1L), (3L, "B", 1L),
      (4L, "A", 2L), (5L, "A", 2L),
      (6L, null.asInstanceOf[String], 3L)).toDF("id", "blk", "ent")
    val r = EntityResolution.blockingReport(recs, "id", col("blk"), col("ent"))
      .collect().head
    val m = r.getValuesMap[Long](Seq("n_records", "n_blocks", "max_block",
      "candidate_pairs", "all_pairs", "reduction_ppm", "truth_pairs",
      "captured_pairs", "completeness_ppm"))
    assert(m("n_records") == 6 && m("n_blocks") == 2 && m("max_block") == 4)
    // block A: 4*3/2 = 6 pairs; block B: 0; null block: none
    assert(m("candidate_pairs") == 6 && m("all_pairs") == 15)
    assert(m("reduction_ppm") == (15L - 6L) * 1000000L / 15L)
    assert(m("truth_pairs") == 4 && m("captured_pairs") == 2)
    assert(m("completeness_ppm") == 500000L)
  }

  test("perfect blocking: every entity in one block -> completeness 1.0") {
    val recs = Seq((1L, "A", 1L), (2L, "A", 1L), (3L, "B", 2L))
      .toDF("id", "blk", "ent")
    val r = EntityResolution.blockingReport(recs, "id", col("blk"), col("ent"))
      .collect().head
    assert(r.getAs[Long]("completeness_ppm") == 1000000L)
  }

  test("degenerate single block: zero reduction, still exact") {
    val recs = (1L to 5L).map(i => (i, "X", i)).toDF("id", "blk", "ent")
    val r = EntityResolution.blockingReport(recs, "id", col("blk"), col("ent"))
      .collect().head
    assert(r.getAs[Long]("candidate_pairs") == 10 &&
      r.getAs[Long]("reduction_ppm") == 0L &&
      r.getAs[Long]("truth_pairs") == 0L)
  }
}
