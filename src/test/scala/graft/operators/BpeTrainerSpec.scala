package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE merge trainer: hand-verifiable merge orders, the lexicographic
  * tie-break, the documented two-pass-replace run semantics, and
  * partitioning invariance (the learned table is the graded artifact, so
  * its determinism is the contract).
  */
class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  private def learned(texts: Seq[String], merges: Int): Seq[(Int, String, String, Long)] =
    BpeTrainer.train(texts.toDF("text"), "text", merges)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

  test("hand corpus: the classic low/lower/lowest merge order") {
    // words: low x5, lower x2, lowest x1 → pair counts over chars:
    // (l,o)=8, (o,w)=8, (w,e)=3, (e,r)=2, (e,s)=1, (s,t)=1
    // tie (l,o) vs (o,w) at 8 → lexicographic: (l,o) first.
    // after merging lo: (lo,w)=8; then (low,e)=3; then — e now lives
    // inside "lowe" — (lowe,r)=2 beats (lowe,s)/(s,t)=1.
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq("lowest")
    val got = learned(texts, 4)
    assert(got == Seq(
      (1, "l", "o", 8L), (2, "lo", "w", 8L),
      (3, "low", "e", 3L), (4, "lowe", "r", 2L)), got.toString)
  }

  test("overlapping pairs count per occurrence; run semantics are the documented variant") {
    // one word "aaaa" x3: pairs (a,a) counted 3 per word = 9.
    // after merge: two-pass replace on a 4-run gives (aa)(aa) — next
    // iteration counts (aa,aa)=3 and wins over nothing else.
    val got = learned(Seq.fill(3)("aaaa"), 2)
    assert(got == Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)), got.toString)
  }

  test("six-run divergence from canonical greedy is pinned (aa a aa a)") {
    // "aaaaaa": two-pass replace yields aa a aa a (canonical greedy would
    // give aa aa aa). Next round's top pair over symbols [aa,a,aa,a] is
    // (a,aa)=1 vs (aa,a)=2 → (aa,a) wins with count 2.
    val got = learned(Seq("aaaaaa"), 2)
    assert(got.head == ((1, "a", "a", 5L)), got.toString) // 5 overlapping pairs
    assert(got(1) == ((2, "aa", "a", 2L)), got.toString)
  }

  test("word frequency weights the counts; split regex drops punctuation") {
    val got = learned(Seq("go go go!", "ha"), 1)
    // (g,o) = 3 beats (h,a) = 1
    assert(got == Seq((1, "g", "o", 3L)), got.toString)
  }

  test("partition invariance: same table from 1 and 13 partitions") {
    val rnd = new scala.util.Random(5)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val texts = (1 to 300).map(_ =>
      (1 to 5).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val a = BpeTrainer.train(texts.toDF("text").repartition(1), "text", 6)
      .as[(Int, String, String, Long)].collect().toSet
    val b = BpeTrainer.train(texts.toDF("text").repartition(13), "text", 6)
      .as[(Int, String, String, Long)].collect().toSet
    assert(a == b && a.size == 6)
  }

  test("segmentCounts: tokens and counts after applying learned merges") {
    // low x5, lower x2, lowest x1 with 4 merges (l,o)(lo,w)(low,e)(lowe,r):
    // low → [low]; lower → [lower]... wait: lower = l o w e r → lo w e r →
    // low e r → lowe r → merge4 gives [lower]; lowest → lowe s t.
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq("lowest")
    val got = BpeTrainer.segmentCounts(texts.toDF("text"), "text", 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("low" -> 5L, "lower" -> 2L, "lowe" -> 1L,
      "s" -> 1L, "t" -> 1L), got.toString)
  }

  test("merges beyond exhaustion stop early instead of emitting junk") {
    // single word "ab" x4 → merge1 (a,b); then every word is one symbol,
    // no pairs remain → the trainer stops at 1 row even when asked for 5
    val got = learned(Seq.fill(4)("ab"), 5)
    assert(got == Seq((1, "a", "b", 4L)), got.toString)
  }
}
