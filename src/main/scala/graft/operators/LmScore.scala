package graft.operators

import graft.functions.{TextFunctions, TextHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model-flavored quality scoring without a language model: score
  * each document by how much of it is made of the reference corpus's most
  * common bigrams (the CCNet/Gopher idea — fluent prose reuses the
  * reference distribution's mass; gibberish, boilerplate, and wrong-language
  * text do not). Deliberately transcendental-free: a log-prob perplexity
  * score would hang cross-engine verification on libm's last ulp, so the
  * signal is integer counts — callers derive whatever ratio they filter on.
  */
object LmScore {

  /** Per-document dictionary hit statistics against the top-`vocab` bigram
    * dictionary of `ref`:
    *
    *  - `n_bigrams` — the document's bigram count (its token count − 1);
    *  - `hits` — how many of those bigrams are dictionary members,
    *    multiplicity counted;
    *  - `freq_sum` — the sum of the dictionary's GLOBAL counts over the
    *    matched bigrams (weights common bigrams above rare ones — the
    *    integer stand-in for Σ log p).
    *
    * Shape for 100 TB: pass 1 is the textbook wordcount (map-side partial
    * counts, one shuffle keyed by bigram) closed by a top-`vocab`
    * TakeOrdered — the dictionary is bounded by structure, ties at the
    * cutoff break lexicographically so the boundary is deterministic.
    * Pass 2 broadcasts the dictionary; scoring is a broadcast left join on
    * the exploded bigrams and a per-document aggregate whose map-side
    * partials collapse each document's bigrams (colocated by the explode)
    * to one row before the exchange. No vector of corpus size ever reaches
    * the driver; no UDFs.
    */
  def bigramDictScore(
      df: DataFrame, ref: DataFrame,
      idCol: String, textCol: String, vocab: Int = 1000): DataFrame = {
    require(vocab > 0, s"bigramDictScore: vocab must be positive, got $vocab")
    // underscore-prefixed internals: an idCol named "bg"/"cnt" would
    // otherwise collide into an ambiguous-reference AnalysisException
    val dict = ref
      .select(explode(TextFunctions.bigrams(col(textCol))).as("_bg"))
      .groupBy(col("_bg")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("_bg"))
      .limit(vocab)
    df.select(col(idCol),
        explode_outer(TextFunctions.bigrams(col(textCol))).as("_bg"))
      .join(broadcast(dict), Seq("_bg"), "left")
      .groupBy(col(idCol))
      .agg(count(col("_bg")).as("n_bigrams"),
        count(col("_cnt")).as("hits"),
        coalesce(sum(col("_cnt")), lit(0L)).as("freq_sum"))
  }

  /** Hashed-feature linear scorer — the fastText-shaped quality classifier
    * at serving time: each token hashes into one of `buckets` feature
    * slots, the document's score is the sum of the matched slot weights.
    * Here the weight table is derived deterministically from `seed`
    * (md5-folded into [−8, 8] integers) so verification is seed-stable; a
    * real deployment swaps in learned weights with the same shape. Scores
    * are INTEGER sums — transcendental-free like [[bigramDictScore]], so
    * the sigmoid/threshold stays caller-side and cross-engine checks are
    * exact.
    *
    * Shape for 100 TB: the weight table is `buckets` rows built from a
    * driver `range` and BROADCAST — scoring is one map-side hash join on
    * the exploded tokens plus a per-document aggregate whose map-side
    * partials collapse each document (colocated by the explode) before the
    * exchange. No per-token shuffle of text, no UDFs, no driver loop.
    */
  def hashedLinearScore(
      df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 1024, seed: String = "w"): DataFrame = {
    require(buckets > 0, s"hashedLinearScore: buckets must be positive, got $buckets")
    val weights = df.sparkSession.range(buckets.toLong).select(
      col("id").as("_b"),
      (TextFunctions.md5Hash60(
        concat(lit(seed + "_"), col("id").cast("string"))) % 17 - 8).as("_w"))
    df.select(col(idCol),
        explode_outer(TextFunctions.tokens(col(textCol))).as("_t"))
      .withColumn("_b",
        when(col("_t").isNotNull, TextFunctions.md5Hash60(col("_t")) % buckets))
      .join(broadcast(weights), Seq("_b"), "left")
      .groupBy(col(idCol))
      .agg(count(col("_t")).as("n_tokens"),
        coalesce(sum(col("_w")), lit(0L)).as("score"))
  }

  /** Corpus-wide token co-occurrence heavy hitters: unordered token pairs
    * occurring within `window` positions of each other, counted with
    * multiplicity, top `topK` by count — the collocation table behind PMI
    * association scores and phrase induction. The counts are the exact
    * integer PMI numerators; the log stays caller-side, outside the
    * verified surface (see [[bigramDictScore]] for why).
    *
    * Shape for 100 TB: pair emission is one compiled pass per document
    * (≤ window × tokens rows, nothing quadratic — window is a small
    * constant), collapsed by a map-side-combined count aggregate keyed on
    * the pair; the global top-K closes with a bounded TakeOrdered. Ties at
    * the cutoff break lexicographically, so the reported boundary is
    * deterministic; the rank column is computed over the ≤ topK surviving
    * rows only (a one-partition window over a bounded set, not over the
    * corpus).
    *
    * Output: (rank, tok_a, tok_b, cnt) with tok_a ≤ tok_b and rank ordered
    * by (cnt desc, tok_a, tok_b). Tokens are [a-z0-9]+ by the
    * [[graft.functions.TextHash.tokens]] contract, so the lexicographic
    * tie-break is pure-ASCII and engine-independent.
    */
  def topCooccurrence(
      df: DataFrame, textCol: String, window: Int = 2, topK: Int = 100): DataFrame = {
    require(window > 0, s"topCooccurrence: window must be positive, got $window")
    require(topK > 0, s"topCooccurrence: topK must be positive, got $topK")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(textCol).cast("string").as("text")).as[String]
      .mapPartitions { it =>
        it.flatMap { text =>
          val toks = TextHash.tokens(text)
          (0 until toks.length).iterator.flatMap { i =>
            (1 to math.min(window, toks.length - 1 - i)).iterator.map { d =>
              if (toks(i) <= toks(i + d)) (toks(i), toks(i + d))
              else (toks(i + d), toks(i))
            }
          }
        }
      }
      .toDF("tok_a", "tok_b")
    val top = pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
    // rank over the ≤ topK survivors WITHOUT a window: orderBy+limit plans
    // as TakeOrderedAndProject, whose output RDD is already globally
    // sorted, so zipWithIndex numbers it directly. A global window here
    // emits the WindowExec all-to-one warning (a literal partitionBy gets
    // constant-folded away before execution, so it can't silence it), and
    // every log reader would have to re-derive the post-limit boundedness.
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        top.schema.fields)
    spark.createDataFrame(
      top.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq((i + 1L) +: r.toSeq) },
      schema)
      .select("rank", "tok_a", "tok_b", "cnt")
  }
}
