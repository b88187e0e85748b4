package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Graph operators on hand-built graphs: edge extraction (weights, group
  * cap, null drops), degree/triangle counts against enumerable truth, and
  * BFS hop distances (path graph, bound, disconnection, deep-loop lineage).
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def edgeDf(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  test("cooccurrenceEdges: pair weights count distinct shared groups") {
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), // group 10: pairs (1,2),(1,3),(2,3)
      (20L, 1L), (20L, 2L), // group 20: pair (1,2) again
      (30L, 5L) // singleton group: no pairs
    ).toDF("g", "n")
    val out = Graph.cooccurrenceEdges(df, "g", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("cooccurrenceEdges: minWeight filters, duplicate rows don't inflate") {
    val df = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L), // duplicate (10,1) row
      (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 3L)
    ).toDF("g", "n")
    val out = Graph.cooccurrenceEdges(df, "g", "n", minWeight = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 2L)))
  }

  test("cooccurrenceEdges: oversized groups are dropped whole, nulls dropped") {
    val big = (1L to 5L).map(n => (99L, Some(n)))
    val df = (big ++ Seq((10L, Some(1L)), (10L, Some(2L)), (10L, None)))
      .toDF("g", "n")
    val out = Graph.cooccurrenceEdges(df, "g", "n", maxGroupSize = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 1L))) // group 99 (5 nodes) dropped entirely
  }

  test("cooccurrenceEdges: non-integral nodes take the generic path, same answer") {
    // string nodes route through the self-join fallback; weights must match
    // the integral fast path's semantics exactly
    val df = Seq(
      (10L, "x"), (10L, "y"), (10L, "z"),
      (20L, "x"), (20L, "y"),
      (30L, "q")
    ).toDF("g", "n")
    val out = Graph.cooccurrenceEdges(df, "g", "n")
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 1L)))
  }

  test("cooccurrenceEdges: integral fast path preserves the input node type") {
    val df = Seq((10, 1), (10, 2)).toDF("g", "n") // Int nodes
    val out = Graph.cooccurrenceEdges(df, "g", "n")
    assert(out.schema("a").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.as[(Int, Int, Long)].collect().toSet === Set((1, 2, 1L)))
  }

  test("triangles: K4 plus pendant — every K4 node in C(3,2)=3 triangles") {
    // K4 over 1..4 (4 triangles total, 3 through each node); 5 hangs off 1
    val e = edgeDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
    val out = Graph.triangles(e)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out === Map(
      1L -> ((4L, 3L)), 2L -> ((3L, 3L)), 3L -> ((3L, 3L)), 4L -> ((3L, 3L)),
      5L -> ((1L, 0L))))
  }

  test("triangles: star graph has none — hub degree doesn't fabricate") {
    val e = edgeDf((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val out = Graph.triangles(e).agg(sum("n_tri")).head().getLong(0)
    assert(out === 0L)
  }

  test("triangles: count is orientation-invariant vs brute force") {
    // deterministic pseudo-random sparse graph, brute-force ground truth
    val rnd = new scala.util.Random(7)
    val edges = (1 to 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val expect = (for {
      i <- nodes; j <- nodes if j > i && es((i, j))
      k <- nodes if k > j && es((j, k)) && es((i, k))
    } yield 1).size * 3L // each triangle counted at 3 nodes
    val got = Graph.triangles(edges.toDF("a", "b")).agg(sum("n_tri")).head().getLong(0)
    assert(got === expect)
  }

  test("bfsHops: path graph distances, bound, and disconnection") {
    // path 1-2-3-4-5-6-7-8 plus isolated edge 100-101: 8 hops needed for
    // the full path — deep enough to prove the per-level lineage cut holds
    val e = edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (100L, 101L))
    val scope = new CacheScope
    val out = Graph.bfsHops(e, source = 1L, maxDepth = 10, scope)
      .as[(Long, Int)].collect().toMap
    scope.release()
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 5, 7L -> 6, 8L -> 7))

    val bounded = Graph.bfsHops(e, source = 1L, maxDepth = 3)
      .as[(Long, Int)].collect().toMap
    assert(bounded === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsHops: undirected — source on the b side is still reached") {
    val e = edgeDf((1L, 5L), (2L, 5L)) // 5 never appears as a
    val out = Graph.bfsHops(e, source = 5L, maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(5L -> 0, 1L -> 1, 2L -> 1))
  }

  test("bfsHops: maxDepth 0 returns only the source") {
    val e = edgeDf((1L, 2L))
    val out = Graph.bfsHops(e, source = 1L, maxDepth = 0)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0))
  }

  test("pagerankInt: one hand-computed round on a path graph") {
    // path 1-2-3, scale 1000: deg = (1,2,1), r0 = 1000 each.
    // contrib: node1 <- r(2) div 2 = 500; node2 <- 1000 + 1000; node3 <- 500
    // r1 = 150 + (85 * x) div 100 -> (575, 1850, 575)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graph.pagerankInt(e, iterations = 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 575L, 2L -> 1850L, 3L -> 575L))
  }

  test("pagerankInt: symmetric graph stays symmetric over iterations") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b") // 4-cycle
    val out = Graph.pagerankInt(e, iterations = 5, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet.size === 1) // all nodes identical by symmetry
  }

  test("pagerankInt: partition-count invariance") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 40).map(_ => (rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val one = Graph.pagerankInt(edges.toDF("a", "b").repartition(1), 3)
      .as[(Long, Long)].collect().toSet
    val many = Graph.pagerankInt(edges.toDF("a", "b").repartition(7), 3)
      .as[(Long, Long)].collect().toSet
    assert(one === many)
  }

  test("pagerankInt: broadcastRanks fast path equals the distributed plan") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val dist = Graph.pagerankInt(edges.toDF("a", "b"), 4)
      .as[(Long, Long)].collect().toSet
    val bcast = Graph.pagerankInt(edges.toDF("a", "b"), 4, broadcastRanks = true)
      .as[(Long, Long)].collect().toSet
    assert(dist === bcast)
  }

  test("ccLargeSmallStar: hand graph — two components plus a chain") {
    // components: {1,2,3,4} (chain 1-2-3 + edge 2-4), {7,9}
    val cc = Graph.ccLargeSmallStar(edgeDf((2L, 1L), (3L, 2L), (2L, 4L), (9L, 7L)))
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("ccLargeSmallStar: long path converges (diameter >> log rounds)") {
    // a 40-node path: O(diameter) propagation needs 40 rounds, star
    // contraction must land inside the default 30
    val path = (1L until 40L).map(i => (i, i + 1))
    val cc = Graph.ccLargeSmallStar(path.toDF("a", "b"))
      .as[(Long, Long)].collect()
    assert(cc.length == 40 && cc.forall(_._2 == 1L))
  }

  test("ccLargeSmallStar: differential vs label propagation on a random graph") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 50).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val star = Graph.ccLargeSmallStar(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("kCore: triangle with a pendant chain — chain peels, triangle stays") {
    // triangle {1,2,3} (2-core) + chain 3-4-5 hanging off it
    val out = Graph.kCore(
      edgeDf((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), k = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: cascading peel — removing a leaf drops its support below k") {
    // path 1-2-3-4: every node eventually peels at k=2 (ends have degree 1,
    // and each removal exposes the next) — multi-round convergence to empty
    val out = Graph.kCore(edgeDf((1L, 2L), (2L, 3L), (3L, 4L)), k = 2)
    assert(out.isEmpty)
  }

  test("kCore: K4 with k=3 survives whole; k=4 empties it") {
    val k4 = edgeDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val core3 = Graph.kCore(k4, k = 3).as[(Long, Long)].collect().toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Graph.kCore(k4, k = 4).isEmpty)
  }

  test("kCore: duplicate and reversed edges don't inflate degrees") {
    // (1,2) listed twice + reversed: still a single edge — k=2 must peel it
    val out = Graph.kCore(edgeDf((1L, 2L), (2L, 1L), (1L, 2L)), k = 2)
    assert(out.isEmpty)
  }

  test("kCore: differential vs iterated brute peel on a random graph") {
    val rnd = new scala.util.Random(43)
    val edges = (1 to 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    def brutePeel(es: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val alive = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => alive(e._1) && alive(e._2))
      if (next == es) es else brutePeel(next, k)
    }
    for (k <- 2 to 5) {
      val want = brutePeel(edges.toSet, k).toSeq
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val got = Graph.kCore(edges.toDF("a", "b"), k)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"k=$k")
    }
  }
}
