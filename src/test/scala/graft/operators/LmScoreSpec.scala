package graft.operators

import graft.SparkTestBase

/** Hand-computed pins for the bigram-dictionary scorer: exact counts,
  * cutoff tie-break, zero-bigram documents, and partition invariance.
  */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  // Bigram inventory:
  //   "the cat sat"      → "the cat", "cat sat"
  //   "the cat ran"      → "the cat", "cat ran"
  //   "a dog sat"        → "a dog",  "dog sat"
  // Global counts: "the cat"×2; "a dog","cat ran","cat sat","dog sat" ×1.
  private val ref = Seq(
    (1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog sat"))

  test("scores are the exact hand-computed counts") {
    val got = LmScore.bigramDictScore(
        ref.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        "doc_id", "text", vocab = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // every bigram is in the (uncut) dictionary; freq_sum adds global counts
    assert(got(1L) === ((2L, 2L, 3L))) // "the cat"(2) + "cat sat"(1)
    assert(got(2L) === ((2L, 2L, 3L))) // "the cat"(2) + "cat ran"(1)
    assert(got(3L) === ((2L, 2L, 2L))) // "a dog"(1) + "dog sat"(1)
  }

  test("vocab cutoff keeps top-count bigrams, ties broken lexicographically") {
    // vocab=2 keeps "the cat"(2) and then the lexicographically smallest
    // count-1 bigram: "a dog". "cat sat"/"cat ran"/"dog sat" fall out.
    val got = LmScore.bigramDictScore(
        ref.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        "doc_id", "text", vocab = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 2L)))
    assert(got(2L) === ((2L, 1L, 2L)))
    assert(got(3L) === ((2L, 1L, 1L)))
  }

  test("documents with fewer than two tokens score (0, 0, 0) but stay present") {
    val df = (ref :+ (9L, "solo") :+ (10L, "")).toDF("doc_id", "text")
    val got = LmScore.bigramDictScore(df, ref.toDF("doc_id", "text"),
        "doc_id", "text", vocab = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 9L, 10L))
    assert(got(9L) === ((0L, 0L, 0L)))
    assert(got(10L) === ((0L, 0L, 0L)))
  }

  test("scores are partition-count invariant") {
    val big = (1L to 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7} w${i % 5}"))
    val a = LmScore.bigramDictScore(big.toDF("doc_id", "text"),
        big.toDF("doc_id", "text"), "doc_id", "text", vocab = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = LmScore.bigramDictScore(big.toDF("doc_id", "text").repartition(13),
        big.toDF("doc_id", "text").repartition(3), "doc_id", "text", vocab = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b)
    assertThrows[IllegalArgumentException] {
      LmScore.bigramDictScore(ref.toDF("doc_id", "text"),
        ref.toDF("doc_id", "text"), "doc_id", "text", vocab = 0)
    }
  }

  /** The compiled twin of the operator's md5-60-bit column expression,
    * itself pinned by TextHashSpec's differential test.
    */
  private def md5h60(s: String): Long = graft.functions.TextHash.md5Hash60(s)

  test("hashedLinearScore matches weights recomputed from the seed") {
    val docs = Seq((1L, "The cat SAT"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = LmScore.hashedLinearScore(docs, "doc_id", "text", buckets = 64)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def w(tok: String): Long = md5h60("w_" + (md5h60(tok) % 64)) % 17 - 8
    assert(got(1L) === ((3L, w("the") + w("cat") + w("sat"))))
    assert(got(2L) === ((0L, 0L)), "token-less doc keeps a zero row")
    assert(got(3L) === ((0L, 0L)), "null-text doc keeps a zero row")
  }

  test("hashedLinearScore is partition-count invariant and validates buckets") {
    val big = (1L to 150L).map(i => (i, s"tok${i % 11} tok${i % 7} shared"))
    val a = LmScore.hashedLinearScore(big.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val b = LmScore.hashedLinearScore(big.toDF("doc_id", "text").repartition(13),
        "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
    assertThrows[IllegalArgumentException] {
      LmScore.hashedLinearScore(big.toDF("doc_id", "text"), "doc_id", "text",
        buckets = 0)
    }
  }

  test("topCooccurrence: hand-computed counts, rank order, tie-break") {
    // "a b a" → d1: (a,b),(a,b); d2: (a,a). "b c" → d1: (b,c).
    // Counts: (a,b)=2, then ties at 1 break lexicographically: (a,a) before (b,c).
    val df = Seq("a b a", "b c").toDF("text")
    val got = LmScore.topCooccurrence(df, "text")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a", "b", 2L), (2L, "a", "a", 1L), (3L, "b", "c", 1L)))
  }

  test("topCooccurrence: topK cuts deterministically; window=1 is adjacent only") {
    val df = Seq("a b a", "b c").toDF("text")
    val cut = LmScore.topCooccurrence(df, "text", topK = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(cut === Seq((1L, "a", "b", 2L), (2L, "a", "a", 1L)))
    // window=1 drops the distance-2 (a,a) pair from "a b a"
    val adj = LmScore.topCooccurrence(df, "text", window = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(adj === Seq((1L, "a", "b", 2L), (2L, "b", "c", 1L)))
  }

  test("topCooccurrence: empty/null/one-token docs contribute nothing; args validated") {
    val df = Seq("solo", "", null.asInstanceOf[String]).toDF("text")
    assert(LmScore.topCooccurrence(df, "text").count() === 0L)
    assertThrows[IllegalArgumentException] {
      LmScore.topCooccurrence(df, "text", window = 0)
    }
    assertThrows[IllegalArgumentException] {
      LmScore.topCooccurrence(df, "text", topK = 0)
    }
  }

  test("topCooccurrence is partition-count invariant") {
    val big = (1 to 120).map(i => s"w${i % 5} w${i % 3} w${i % 7} w${i % 5}")
    def run(parts: Int): Seq[(Long, String, String, Long)] =
      LmScore.topCooccurrence(big.toDF("text").repartition(parts), "text", topK = 10)
        .as[(Long, String, String, Long)].collect().toSeq
    assert(run(1) === run(13))
  }
}
