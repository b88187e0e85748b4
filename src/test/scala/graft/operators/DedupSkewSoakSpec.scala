package graft.operators

import java.util.concurrent.atomic.AtomicLong

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Skew-adversarial soak for the dedup family: plant the two 100 TB
  * pathologies — a boilerplate shingle shared by (nearly) every document
  * and one giant near-dup cluster — and assert the df/bucket caps actually
  * bound per-task shuffle input, not just produce the right answer. A
  * Spark listener measures the largest shuffle read of any task; without
  * the guards the hot key's full posting list (every flood row) funnels
  * through one task and the candidate join goes quadratic in it.
  *
  * Dropped volume is counted from the PUBLIC signature/posting APIs and
  * logged (the no-silent-caps rule): a cap that silently eats data reads
  * as "covered everything" when it did not.
  */
class DedupSkewSoakSpec extends SparkTestBase {
  import spark.implicits._

  /** (max per-task, total) shuffle-read records while `body` runs. AQE
    * coalesces small shuffles into few tasks, so the per-task number alone
    * cannot separate "skew guard worked" from "everything in one task";
    * the TOTAL is the quadratic-vs-linear discriminator — an unguarded
    * flood pushes the hot key's n² candidate rows through the pair
    * dedup shuffle.
    */
  private def shuffleReadStats(body: => Unit): (Long, Long) = {
    val maxRead = new AtomicLong(0L)
    val total = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { tm =>
          val r = tm.shuffleReadMetrics.recordsRead
          maxRead.getAndUpdate(math.max(_, r))
          total.addAndGet(r)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener delivery is async — poll until the counters settle
      var last = -1L
      var same = 0
      val deadline = System.currentTimeMillis() + 10000
      while (same < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        val cur = total.get()
        if (cur == last) same += 1 else { same = 0; last = cur }
      }
      (maxRead.get(), total.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // 20 tokens → 18 3-gram shingles: one replaced mid-doc token changes 3
  // shingles, giving inter=15 / uni=21 ≈ 0.714 — safely INSIDE the 3/5
  // acceptance region (a 14-token doc would land exactly ON the 9/15 = 3/5
  // boundary, making every planted-pair assertion hostage to tokenizer or
  // comparison-strictness changes)
  private def uniqueDoc(i: Int): String =
    s"article $i covers story$i event$i place$i person$i detail$i " +
      s"aspect$i angle$i summary$i outcome$i followup$i remark$i " +
      s"context$i source$i region$i season$i impact$i verdict$i"

  test("boilerplate shingle flood: df cap bounds per-task input; planted pair survives; drop volume logged") {
    val floodN = 2000
    val footer = "all rights reserved by the site operations team worldwide"
    // every flood doc: unique body + the SAME footer => footer 3-grams have
    // df ≈ floodN while body shingles stay unique
    val flood = (1 to floodN).map(i => (i.toLong, s"${uniqueDoc(i)} $footer"))
    // planted near-dup pair WITHOUT the footer
    val planted = Seq(
      (500001L, uniqueDoc(900001)),
      (500002L, uniqueDoc(900001).replace("story900001", "CHANGED")))
    val df = (flood ++ planted).toDF("doc_id", "text")

    val cap = 100
    var pairs: Set[(Long, Long)] = Set.empty
    val (maxRead, totalRead) = shuffleReadStats {
      pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", maxShingleDf = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }

    // correctness under the flood: exactly the planted pair
    assert(pairs === Set((500001L, 500002L)))
    // the guard's point: shuffle volume stays LINEAR in the corpus (distinct
    // shingles + kept postings, ~tens of k here). Unguarded, each footer
    // shingle emits floodN^2 = 4M candidate rows into the pair-dedup
    // shuffle — two orders of magnitude above this bound.
    info(s"flood run: maxTaskRead=$maxRead totalRead=$totalRead")
    assert(totalRead < 500000L,
      s"shuffle volume $totalRead looks quadratic — the df cap did not " +
        s"keep the footer shingles (floodN^2 = ${floodN.toLong * floodN}) " +
        "out of the candidate join")

    // no-silent-caps: count and LOG what the df cap dropped, from the same
    // public posting derivation the operator uses
    val docs = df.select(
      org.apache.spark.sql.functions.col("doc_id").cast("long").as("id"),
      org.apache.spark.sql.functions.col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val toks = graft.functions.TextHash.tokens(text)
          if (toks.isEmpty) None
          else Some((id, graft.functions.TextHash.hashedShingles(toks, md)))
        }
      }.toDF("id", "hs")
    val dropped = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("hs")).as("h"))
      .groupBy("h").count()
      .filter(org.apache.spark.sql.functions.col("count") > cap)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("shingles"),
        org.apache.spark.sql.functions.sum("count").as("postings"))
      .collect()(0)
    info(s"df cap dropped ${dropped.getLong(0)} boilerplate shingles " +
      s"carrying ${dropped.getLong(1)} postings (of $floodN flood docs)")
    assert(dropped.getLong(0) >= 1,
      "the planted footer shingles must exceed the df cap")
  }

  test("giant near-dup cluster: bucketCap drops the flood bucket wholesale and stays bounded") {
    val clusterN = 1500
    // one giant cluster: identical text => identical signature => all
    // clusterN ids land in the SAME band bucket in every band
    val giant = (1 to clusterN).map(i => (i.toLong, uniqueDoc(7777)))
    val planted = Seq(
      (600001L, uniqueDoc(900002)),
      (600002L, uniqueDoc(900002).replace("event900002", "ALTERED")))
    val df = (giant ++ planted).toDF("doc_id", "text")

    val cap = 100
    var pairs: Set[(Long, Long)] = Set.empty
    val (maxRead, totalRead) = shuffleReadStats {
      pairs = Dedup.minhashPairs(df, "doc_id", "text", bucketCap = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }

    // the flood cluster is dropped WHOLESALE (cap², not clusterN², work);
    // the planted pair outside it must survive
    assert(pairs === Set((600001L, 600002L)))
    // unguarded, 16 bands x clusterN^2 = 36M candidate rows hit the pair
    // dedup shuffle; guarded volume is linear in ids x bands (~tens of k)
    info(s"cluster run: maxTaskRead=$maxRead totalRead=$totalRead")
    assert(totalRead < 500000L,
      s"shuffle volume $totalRead looks quadratic — the bucket cap did " +
        s"not drop the ${clusterN}-doc cluster (would be " +
        s"${16L * clusterN * clusterN} banded candidates)")

    // no-silent-caps: log the dropped bucket volume via the public index API
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
    val droppedBuckets = sigs
      .select(org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.col("bkeys")).as(Seq("band", "bkey")))
      .groupBy("band", "bkey").count()
      .filter(org.apache.spark.sql.functions.col("count") > cap)
    val n = droppedBuckets.count()
    info(s"bucketCap dropped $n flooded band buckets " +
      s"(cluster of $clusterN identical docs)")
    assert(n >= 1, "the giant cluster must overflow at least one band bucket")
  }

  test("semantic dedup clusterCap: an oversized k-means cell is capped, not quadratic") {
    // embeddings: one dense blob of identical vectors (the oversized cell)
    // plus a few distinct points; clusterCap must bound within-cell pairs
    val dim = 8
    val blobN = 400
    val blob = (1 to blobN).map { i =>
      (i.toLong, Array.fill(dim)(1.0f))
    }
    val rest = (1 to 5).map { i =>
      (10000L + i, Array.tabulate(dim)(d => if (d == i % dim) 10.0f else -5.0f))
    }
    val df = (blob ++ rest).toDF("doc_id", "embedding")
    val cap = 50
    val pairs = Clustering.semanticPairs(df, "doc_id", "embedding",
      k = 4, iters = 2, threshold = 0.9, clusterCap = cap)
    // the blob cell holds blobN > cap members: it must be dropped wholesale
    // (zero pairs from it), not expanded into blobN² comparisons
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.forall { case (a, b) => a > blobN || b > blobN },
      s"pairs leaked from the capped cell: ${got.take(5).toSeq}")
    info(s"clusterCap=$cap dropped the $blobN-member cell wholesale " +
      s"(${got.length} pairs from uncapped cells remain)")
  }
}
