package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Word-level byte-pair-encoding merge TRAINER (Sennrich et al., ACL'16):
  * learn the top-N symbol merges from a corpus — the vocabulary-building
  * pass every tokenizer pipeline runs before training. Everything is
  * deterministic and engine-replayable: ties in pair counts break
  * lexicographically, and the merge application is plain (non-regex)
  * leftmost-non-overlapping string replace, which Spark and DuckDB (and
  * any SQL engine) implement identically.
  *
  * Representation: a word's segmentation is the string
  * `" s1 s2 ... sk "` — symbols joined and bracketed by single spaces
  * (safe: words are [a-z0-9]+ after the split regex, so a space can never
  * appear inside a symbol). Merging pair (l, r) replaces `" l r "` with
  * `" lr "`, applied in TWO passes: a match consumes its boundary spaces,
  * so one pass skips alternating occurrences of a contiguous chain and
  * the second pass catches them (a pass can never create a NEW (l, r)
  * adjacency — replacements only produce `lr` symbols — so extra passes
  * are safe, and after two no match remains except inside same-symbol
  * runs). DEFINED SEMANTIC: this two-pass-replace application equals
  * canonical greedy left-to-right BPE everywhere except same-symbol runs
  * of length ≥ 5, where the skip pattern differs (6 a's under (a,a) give
  * `aa a aa a`, greedy gives `aa aa aa`). Both engines evaluate the same
  * replace chain, so the learned table is still bit-identical
  * cross-engine — the variant trades canonical run handling for an
  * application step every SQL engine reproduces exactly.
  *
  * Pair counting: adjacent symbol pairs per word, weighted by word
  * frequency, OVERLAPPING occurrences included ("aaa" counts (a,a)
  * twice) — the standard counting whose argmax drives each merge. One
  * aggregate job per merge over the cached word-frequency table (vocab-
  * sized, not corpus-sized: the corpus scan happens ONCE to build word
  * counts; every iteration after that touches only distinct words — the
  * property that makes BPE training feasible at 100 TB, where the vocab
  * is millions of rows while the corpus is billions).
  *
  * Output: (merge_rank, lhs, rhs, pair_count) — the learned merge table,
  * 1-based in learn order. Driver state per iteration is ONE (pair,
  * count) row; the merge table itself (N rows) ships back as a literal
  * DataFrame, like k-means centroids.
  */
object BpeTrainer {

  def train(df: DataFrame, textCol: String, merges: Int): DataFrame =
    trainWithSeg(df, textCol, merges, needSeg = false)._1

  /** [[train]] plus the FINAL segmentation table (word, f, seg) — shared
    * by [[segmentCounts]] so the encode side never re-applies merges from
    * scratch. Every iteration's table stays cached until the last (each
    * feeds its successor's pair count AND would otherwise be recomputed
    * through the whole replace chain); all are released at the end except
    * the returned final stage, whose blocks the ContextCleaner reclaims
    * once the caller's plan is dropped.
    */
  private def trainWithSeg(df: DataFrame, textCol: String,
      merges: Int, needSeg: Boolean): (DataFrame, DataFrame) = {
    require(merges >= 1 && merges <= 64,
      s"merges must be in [1, 64], got $merges")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
    val seg0 = words.withColumn("seg",
      concat(lit(" "), concat_ws(" ", split(col("word"), "")), lit(" ")))
    var cur = seg0.persist(StorageLevel.MEMORY_AND_DISK)
    val stages = scala.collection.mutable.ArrayBuffer(cur)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= merges && !exhausted) {
      // adjacent symbol pairs (overlapping), weighted by word frequency;
      // this action also materializes cur's cache for the next stage
      val top = cur
        .select(col("f"),
          expr("filter(split(seg, ' '), x -> x <> '')").as("sym"))
        .where(size(col("sym")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(0, size(sym) - 2), " +
            "j -> struct(element_at(sym, j + 1) AS lhs, " +
            "element_at(sym, j + 2) AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        learned += ((i, l, r, c))
        val pat = s" $l $r "
        val rep = s" $l$r "
        cur = cur.withColumn("seg",
            expr(s"replace(replace(seg, '${sqlLit(pat)}', '${sqlLit(rep)}'), " +
              s"'${sqlLit(pat)}', '${sqlLit(rep)}')"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        stages += cur
        i += 1
      }
    }
    if (needSeg) {
      cur.count() // pin the final stage before its parents' caches drop
      stages.dropRight(1).foreach(_.unpersist(blocking = false))
    } else stages.foreach(_.unpersist(blocking = false))
    import spark.implicits._
    (learned.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count"), cur)
  }

  /** Escape a string for a single-quoted SQL literal (symbols are
    * [a-z0-9]+ so this is belt-and-braces only).
    */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** ENCODE side: train `merges` merges, apply them in rank order, and
    * return the resulting token-usage table (token, cnt) — cnt the total
    * occurrence count across the corpus (word occurrences × per-word
    * occurrences of the token). The vocabulary-coverage artifact: what the
    * tokenizer would actually emit, and how often, after adopting the
    * learned vocab. Same cost shape as [[train]] plus one final
    * vocab-sized explode — the corpus is never rescanned.
    */
  def segmentCounts(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val (_, segged) = trainWithSeg(df, textCol, merges, needSeg = true)
    segged
      .select(col("f"),
        explode(expr("filter(split(seg, ' '), x -> x <> '')")).as("token"))
      .groupBy(col("token"))
      .agg(sum(col("f")).as("cnt"))
  }
}
