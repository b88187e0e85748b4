package graft.operators

import graft.SparkTestBase

/** Grid-blocked radius join: hand-planted neighborhoods, boundary
  * inclusivity, cross-cell pairs, single emission, and a brute-force
  * differential on a seeded random point set.
  */
class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  test("radiusJoin finds exactly the in-radius pairs, boundary inclusive, once each") {
    val l = Seq((1L, 1000L, 1000L), (2L, 5000L, 5000L)).toDF("id", "x", "y")
    val r = Seq(
      (10L, 1000L, 1100L), // 100 away from 1 -> hit
      (11L, 1000L, 1500L), // exactly radius away -> inclusive hit
      (12L, 1000L, 1501L), // 1 past the boundary -> miss
      (13L, 1400L, 1300L), // cross-cell diagonal: sqrt(400^2+300^2)=500 -> hit
      (14L, 9000L, 9000L)) // far from both -> miss
      .toDF("id", "x", "y")
    val out = Spatial.radiusJoin(l, r, "id", "x", "y", radius = 500L)
      .select("id_l", "id_r").as[(Long, Long)].collect()
    assert(out.length == out.distinct.length, "pairs must be emitted once")
    assert(out.toSet == Set((1L, 10L), (1L, 11L), (1L, 13L)))
  }

  test("radiusJoin matches brute force on a seeded random set") {
    val rnd = new scala.util.Random(31)
    val pts = (1L to 120L).map(i =>
      (i, rnd.nextInt(3000).toLong, rnd.nextInt(3000).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Spatial.radiusJoin(df, df, "id", "x", "y", radius = 400L)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val want = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts
      if (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= 400L * 400L
    } yield (i, j)).toSet
    assert(got == want)
  }

  test("negative coordinates fail loudly instead of losing pairs") {
    val l = Seq((1L, -5L, 10L)).toDF("id", "x", "y")
    val e = intercept[Exception] {
      Spatial.radiusJoin(l, l, "id", "x", "y", 100L).collect()
    }
    assert(e.getMessage.contains(">= 0"))
  }
}
