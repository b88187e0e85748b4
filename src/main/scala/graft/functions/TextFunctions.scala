package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, all as
  * pure (codegen-friendly) column expressions — no UDFs, so every operator
  * here runs inside whole-stage codegen and scales with the scan.
  *
  * These extend the engine beyond the reference's CDC surface (driver
  * mandate, SURVEY.md §7.1.8): language ID, quality scoring, token counting,
  * fingerprinting, SimHash/MinHash signatures for near-dedup.
  *
  * Determinism contract: everything derives from the input string via md5 /
  * xxhash64 / integer arithmetic, so results are reproducible across runs and
  * (for the md5-based ops) recomputable by other engines for verification.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens; empty strings filtered out. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are not lowercase-alphanumeric or space. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", "")) /
      nullif(length(text), lit(0))

  /** Fraction of tokens found in `stopwords` (duplicates counted). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    val toks = tokens(text)
    aggregate(toks, lit(0),
      (acc, t) => acc + when(array_contains(stops, t), 1).otherwise(0)) /
      nullif(size(toks), lit(0))
  }

  /** Mean token length (null for token-less docs). */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0), (acc, t) => acc + length(t)) /
      nullif(size(toks), lit(0))
  }

  /** Deterministic document-quality heuristic in [0,1]: rewards length (up
    * to 50 tokens), low punctuation noise, and stopword presence — the
    * standard cheap pre-filter shape for web-scale corpus cleaning.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    // tokenCount(NULL) is NULL (ANSI size-of-null), and least() SKIPS nulls —
    // unguarded, a NULL document would collect the full 0.4 length reward
    // while the empty string scores 0, inverting the filter for exactly the
    // rows it most needs to drop
    lit(0.4) * least(coalesce(tokenCount(text), lit(0)) / lit(50.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - coalesce(punctRatio(text), lit(1.0))) +
      lit(0.3) * coalesce(stopwordRatio(text, stopwords), lit(0.0))

  /** Tiny per-language function-word lists for the n-gram/stopword language
    * heuristic. Deliberately small and fixed: the point is a deterministic,
    * cheap, vectorizable scorer, not linguistic accuracy.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "se", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "en"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "ein"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men"))

  /** Language ID: argmax of marker-word hit counts; ties resolve to the
    * earlier list ('und' = no hits anywhere).
    *
    * Shape: every subexpression is evaluated ONCE per row by binding it to
    * a lambda variable (`transform` over a 1-element array). Higher-order-
    * function columns are interpreted with no codegen subexpression
    * elimination, so the naive when-chain over `greatest(scores)` re-ran
    * the tokenizer and every language's aggregate once per REFERENCE —
    * ~30 interpreted passes per row for 5 languages (the same re-inlining
    * pathology the NOTE at the bottom of this file documents). Here:
    * 1 tokenization + 5 score aggregates + 1 array_max per row.
    * Tie-break parity with the original when-chain: array_max compares the
    * (score, -index) struct lexicographically, so equal scores resolve to
    * the EARLIEST declared language.
    */
  def langId(text: Column): Column =
    element_at(transform(array(tokens(text)), toks => {
      def score(words: Seq[String]): Column = {
        val ws = array(words.map(lit): _*)
        aggregate(toks, lit(0),
          (acc, t) => acc + when(array_contains(ws, t), 1).otherwise(0))
      }
      val entries = array(langMarkers.zipWithIndex.map { case ((lang, ws), i) =>
        struct(score(ws).as("s"), lit(-i).as("negIdx"), lit(lang).as("lang"))
      }: _*)
      element_at(transform(array(array_max(entries)), top =>
        when(top.getField("s") > 0, top.getField("lang")).otherwise(lit("und"))), 1)
    }), 1)

  /** Adjacent token pairs ("w1 w2") — the unit for repetition scoring. */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of tokens that repeat an earlier token (0 for token-less
    * docs) — the word-level half of the Gopher-style repetition filter.
    * Exact integer-ratio division so an external oracle reproduces the
    * double bit-for-bit.
    */
  def dupTokenFraction(text: Column): Column = {
    // NULL text behaves as token-less (documented "0 for token-less docs"):
    // without the coalesce the null propagates and a `<= threshold` filter
    // silently drops null-text rows — sibling topBigramFraction already
    // returns 0.0 for the same input via bigrams()'s otherwise-branch
    val toks = coalesce(tokens(text), array().cast("array<string>"))
    when(size(toks) === 0, lit(0.0))
      .otherwise((size(toks) - size(array_distinct(toks))) / size(toks))
  }

  /** Longest run of equal adjacent elements in a SORTED array = the highest
    * multiplicity of any element — a per-row mode count with zero shuffle
    * (sort + one linear fold inside the row; the explode/groupBy alternative
    * shuffles every n-gram of the corpus).
    */
  private def maxRunLength(sortedArr: Column): Column =
    aggregate(sortedArr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (st, x) => {
        val run = when(st.getField("prev").isNotNull && (x === st.getField("prev")),
          st.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Share of all bigrams taken by the single most frequent bigram (0 when
    * the doc has no bigram) — boilerplate and spam text score high, prose
    * scores near 1/n. The other half of the repetition filter.
    */
  def topBigramFraction(text: Column): Column = {
    val b = bigrams(text)
    when(size(b) === 0, lit(0.0))
      .otherwise(maxRunLength(array_sort(b)) / size(b))
  }

  /** BPE-ish token-count estimate — the budgeting number an LLM-data
    * pipeline actually wants (whitespace words under-count code/punctuation
    * heavy text badly). Every alphanumeric word costs ceil(len/6) subword
    * pieces (long words split like BPE merges run out) and every
    * non-alphanumeric, non-space character is its own token (the GPT-2-style
    * pattern's punctuation runs, simplified to per-char). Pure integer
    * arithmetic over md5-free primitives, so an external engine reproduces
    * it exactly.
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + floor((length(t) + lit(5)) / lit(6.0)).cast("long")) +
      length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("long")

  /** Shared deterministic 60-bit word hash both Spark and DuckDB can compute:
    * first 15 hex chars of md5, as a long. Used where an external oracle must
    * reproduce the value; xxhash64 is faster but Spark-only. Evaluated by
    * the native codegen'd [[org.apache.spark.sql.graft.Md5Hash60]]
    * expression (digest → long, no per-row hex string); the historical
    * `conv(substring(md5(c),1,15),16,10)` chain is value-identical and
    * remains the DuckDB oracle spelling.
    */
  def md5Hash60(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.Md5Hash60(
        org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("binary"))))

  /** Domain-separated key hash: `md5Hash60("<domain>:" + key)`. THE shared
    * convention for every operator that makes an independent per-key random
    * decision (sampling, splits, shuffles) — distinct domains give distinct,
    * independent hash streams over the same keys, so stacked operators never
    * correlate (a sampler reusing a split's stream would empty its tail
    * range). Oracles prepend the same literal prefix. Change the formula
    * here and nowhere else.
    */
  def domainHash(domain: String, key: Column): Column =
    md5Hash60(concat(lit(domain + ":"), key.cast("string")))

  /** Rolling polynomial document fingerprint over tokens (order-sensitive,
    * whitespace-insensitive): fold acc = (acc*31 + md5Hash60(token)) mod 2^40.
    * The modulus keeps the fold inside exact int64 range in any engine.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31 + md5Hash60(t)) % lit(1L << 40))

  /** PII patterns, ordered most-specific-first (SSN before phone so
    * `123-45-6789` never half-matches as a phone). RE2-compatible — no
    * backreferences or lookaround — so an external engine (DuckDB, Go, Rust)
    * applies the identical automaton; Java's regex engine reads the same
    * syntax with the same leftmost-first semantics here (every quantifier is
    * fixed-width or greedy-safe against these inputs).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("phone", """\b\d{3}-\d{3}-\d{4}\b""", "<PHONE>"),
    ("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"))

  /** Redact all PII patterns in order — a chain of codegen'd regexp_replace
    * calls, zero shuffle, rides the scan.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Per-pattern match counts on the ORIGINAL text (each pattern counted
    * independently, before any redaction).
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, pat, _) =>
      (s"n_$name", regexp_count(text, lit(pat)).cast("long"))
    }

  /** Word k-shingles (k consecutive tokens joined by a space); documents
    * with fewer than k tokens contribute their whole token sequence as one
    * shingle, so every non-empty doc has ≥1 shingle. NULL text behaves as
    * empty (the coalesce below), matching the compiled twin
    * `TextHash.shingles` — without it the column form yields [NULL] where
    * the JVM form yields [""], breaking the differential anchor.
    * CAUTION: a TOKEN-LESS document (non-Latin script or pure punctuation
    * under the [a-z0-9] tokenizer) yields the single shingle [""], which
    * is shingle-identical to every other token-less document — a Jaccard
    * pass fed such docs directly would collapse them into one. The dedup
    * operators guard this by DROPPING token-less docs before signing
    * ([[graft.functions.TextHash]] callers); do the same in any new
    * consumer.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = coalesce(tokens(text), array().cast("array<string>"))
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)), j =>
        concat_ws(" ", (0 until k).map(d => element_at(toks, j + d)): _*)))
      .otherwise(array(array_join(toks, " ")))
  }
  // NOTE: per-document SimHash/MinHash signatures deliberately have NO
  // column-expression form here — higher-order-function columns are
  // interpreted and re-inlined by projection collapse (the round-3 q31
  // pathology). Signature passes live in [[TextHash]] (compiled) and are
  // driven from graft.operators.Dedup via mapPartitions; `shingles` above
  // stays as the column-semantics anchor for TextHash's differential tests.
}
