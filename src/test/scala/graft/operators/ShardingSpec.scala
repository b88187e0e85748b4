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
      val got = Sharding.packByBudget(df, "doc_id", "w", budget = 100, segments = p)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(got === expected(rows, 100), s"segments=$p")
    }
  }

  test("prefix sums survive cache loss under a coalescing consumer") {
    // Regression: the old formulation stamped TaskContext.getPartitionId()
    // into the cached scan; dropping the cache (cross-query unpersist,
    // executor loss) and consuming through coalesce(1) replayed every
    // partition inside ONE task — pid 0 everywhere, all offsets collapsed,
    // every row in shard 0. The segmented scan derives everything from the
    // data, so the same abuse must change nothing.
    val rows = (1 to 500).map(i => (i.toLong, (i % 37 + 1).toLong))
    val got = Sharding.packByBudget(rows.toDF("doc_id", "w"), "doc_id", "w",
      budget = 100, segments = 7)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val out = got.coalesce(1).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    assert(out === expected(rows, 100))
  }

  test("every shard's total weight stays within budget + its largest row") {
    val rows = (1 to 300).map(i => (i.toLong, (i % 29 + 1).toLong))
    val got = Sharding.packByBudget(rows.toDF("doc_id", "w"), "doc_id", "w",
      budget = 64, segments = 5).as[(Long, Long, Long)].collect()
    got.groupBy(_._3).foreach { case (shard, rs) =>
      val tot = rs.map(_._2).sum
      // a row that STARTS inside a shard may overhang its end
      assert(tot <= 64 + rs.map(_._2).max, s"shard $shard overfull: $tot")
    }
    assert(got.map(_._3).distinct.length > 1, "expected multiple shards")
  }

  test("negative weights fail loudly instead of corrupting the prefix sum") {
    val rows = Seq((1L, 10L), (2L, -3L), (3L, 5L)).toDF("doc_id", "n_tokens")
    // raise_error surfaces as SparkRuntimeException (local) or wrapped in a
    // SparkException task failure (cluster) — accept either carrier
    val e = intercept[Exception](
      Sharding.packByBudget(rows, "doc_id", "n_tokens", budget = 8L).collect())
    assert(e.getMessage.contains("non-negative") ||
      Option(e.getCause).exists(_.getMessage.contains("non-negative")))
  }

  test("null ids fail loudly instead of NPEing the driver totals") {
    val rows = Seq((java.lang.Long.valueOf(1L), 10L),
      (null.asInstanceOf[java.lang.Long], 5L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception](
      Sharding.packByBudget(rows, "doc_id", "n_tokens", budget = 8L).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("null or not castable"),
      s"expected the id guard to fire, got: $chain")
  }

  test("duplicate ids assign deterministically (weight joins the sort key)") {
    // two rows share id 7 with different weights: (h, id) ties, so without
    // the weight tie-break their start values could swap between runs
    val rows = Seq((7L, 100L), (7L, 900L), (1L, 50L)).toDF("doc_id", "n_tokens")
    val runs = (1 to 3).map { _ =>
      Sharding.packByBudget(rows.repartition(4), "doc_id", "n_tokens", budget = 500L)
        .orderBy("doc_id", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(runs.distinct.size == 1, s"nondeterministic assignment: $runs")
  }

  test("budget must be positive") {
    intercept[IllegalArgumentException] {
      Sharding.packByBudget(Seq((1L, 1L)).toDF("doc_id", "w"), "doc_id", "w", 0)
    }
    intercept[IllegalArgumentException] {
      Sharding.packSequences(Seq((1L, 1L)).toDF("doc_id", "w"), "doc_id", "w", 0)
    }
  }

  /** Single-threaded reference for packSequences slices. */
  private def expectedSlices(
      rows: Seq[(Long, Long)], seqLen: Long): Set[(Long, Long, Long, Long, Long)] = {
    val ordered = rows.sortBy { case (id, _) => (TextHash.md5Hash60(id.toString), id) }
    var cum = 0L
    ordered.flatMap { case (id, w) =>
      val start = cum; cum += w
      if (w == 0) Seq.empty
      else (start / seqLen to (start + w - 1) / seqLen).map { s =>
        val from = math.max(start, s * seqLen)
        val to = math.min(start + w, (s + 1) * seqLen)
        (id, s, from - start, to - start, from - s * seqLen)
      }
    }.toSet
  }

  test("packSequences matches a single-threaded slicer for any partition count") {
    val rows = (1 to 200).map(i => (i.toLong, (i % 23).toLong)) // includes w=0
    val df = rows.toDF("doc_id", "w")
    for (p <- Seq(1, 4, 9)) {
      val got = Sharding.packSequences(df, "doc_id", "w", seqLen = 16, segments = p)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expectedSlices(rows, 16), s"segments=$p")
    }
  }

  test("packSequences slices tile every sequence exactly: no gaps, no overlap, full coverage") {
    val rows = (1 to 120).map(i => (i.toLong, (i % 40 + 1).toLong))
    val total = rows.map(_._2).sum
    val got = Sharding.packSequences(rows.toDF("doc_id", "w"), "doc_id", "w",
      seqLen = 32, segments = 5).as[(Long, Long, Long, Long, Long)].collect()
    // per-doc slices cover [0, w) contiguously
    got.groupBy(_._1).foreach { case (id, slices) =>
      val spans = slices.sortBy(_._3).map(s => (s._3, s._4))
      assert(spans.head._1 === 0L, s"doc $id first slice starts at ${spans.head._1}")
      spans.sliding(2).foreach {
        case Array((_, aTo), (bFrom, _)) => assert(aTo === bFrom, s"doc $id gap at $aTo")
        case _ => ()
      }
      assert(spans.last._2 === rows(id.toInt - 1)._2, s"doc $id not fully covered")
    }
    // per-sequence slices tile [0, 32) except the final partial sequence
    val lastSeq = (total - 1) / 32
    got.groupBy(_._2).foreach { case (seq, slices) =>
      val lens = slices.map(s => s._4 - s._3).sum
      val want = if (seq == lastSeq) total - seq * 32 else 32L
      assert(lens === want, s"seq $seq holds $lens of $want tokens")
      val offs = slices.sortBy(_._5)
      assert(offs.head._5 === 0L, s"seq $seq starts at ${offs.head._5}")
    }
  }
}
