package graft.queries

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators as driver-verifiable queries over
  * `documents.parquet` / `embeddings.parquet` (driver mandate, SURVEY.md
  * §7.1.8). The corpus has no natural duplicates, so dedup queries first
  * union in deterministic synthetic copies (exact copies for md5 dedup,
  * 80%-prefix copies for near-dedup) — the oracle, or the rows-only check,
  * then validates that the operator finds exactly the planted pairs plus
  * whatever true near-dups exist.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents ∪ exact copies of every 10th doc (id+10⁶). */
  private def withExactDups(d: DataFrame): DataFrame =
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))

  /** documents ∪ 80%-prefix near-copies of every 5th doc (id+10⁶). */
  private def withNearDups(d: DataFrame): DataFrame =
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .withColumn("text", substring(col("text"), lit(1), (col("n_chars") * 4 / 5).cast("int")))
      .withColumn("doc_id", col("doc_id") + 1000000L))

  private val stops = TextFunctions.langMarkers.head._2 // the "en" list

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Exact dedup: hash aggregate on content digest.
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(withExactDups(docs(s, dir)), "doc_id", "text")
    }),

    // ── MinHash-LSH near-dedup: banded signature join, no all-pairs.
    "q31_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashPairs(withNearDups(docs(s, dir)), "doc_id", "text")
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"))
    }),

    // ── SimHash near-dedup: Hamming-band blocking.
    "q32_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(withNearDups(docs(s, dir)), "doc_id", "text")
    }),

    // ── Per-document text statistics (all codegen column expressions).
    "q33_text_stats" -> ((s, dir) => {
      val text = col("text")
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(text).as("n_tokens"),
        TextFunctions.charCount(text).as("n_chars_m"),
        TextFunctions.punctRatio(text).as("punct_ratio"),
        TextFunctions.stopwordRatio(text, stops).as("stop_ratio"),
        TextFunctions.avgTokenLen(text).as("avg_tok_len"),
        TextFunctions.qualityScore(text, stops).as("quality"))
    }),

    // ── Language ID heuristic (marker-word argmax).
    "q34_lang_id" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))
    }),

    // ── Order-sensitive rolling-hash fingerprint (md5-based so the oracle
    // can recompute it exactly).
    "q35_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
    }),

    // ── Exact cosine top-10 for 8 query vectors (broadcast + windowed rank).
    "q36_ann_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding")
    }),

    // ── LSH-bucketed ANN: the 100 TB path (bucket join + exact rescoring).
    "q37_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding")
    }),

    // ── Multimodal plumbing: binary payload + partition-batched decode stub
    // + digest-derived feature vector.
    "q38_multimodal" -> ((s, dir) => {
      val assets = docs(s, dir).select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"))
      val meta = Multimodal.decode(assets).toDF()
      val feats = Multimodal.features(assets)
      meta.join(feats, "asset_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS copies
        |FROM corpus GROUP BY md5(text)""".stripMargin,

    "q33_text_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  length(text) AS n_chars_m,
        |  length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
        |    / nullif(length(text), 0) AS punct_ratio,
        |  len(list_filter(toks, t -> list_contains(
        |      ['the','and','of','to','a','in','is','it'], t)))
        |    / nullif(len(toks), 0) AS stop_ratio,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
        |    / nullif(len(toks), 0) AS avg_tok_len,
        |  0.4 * least(len(toks) / 50.0, 1.0)
        |    + 0.3 * (1.0 - coalesce(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
        |                              / nullif(length(text), 0), 1.0))
        |    + 0.3 * coalesce(len(list_filter(toks, t -> list_contains(
        |          ['the','and','of','to','a','in','is','it'], t)))
        |        / nullif(len(toks), 0), 0.0) AS quality
        |FROM tok""".stripMargin,

    "q34_lang_id" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS s_en,
        |    len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los','se','un'], t))) AS s_es,
        |    len(list_filter(toks, t -> list_contains(['le','la','de','et','un','les','des','en'], t))) AS s_fr,
        |    len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','von','den','ein'], t))) AS s_de,
        |    len(list_filter(toks, t -> list_contains(['de','shi','le','zai','you','wo','ta','men'], t))) AS s_zh
        |  FROM tok)
        |SELECT doc_id, lang,
        |  CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en'
        |       WHEN s_es > 0 AND s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es'
        |       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr'
        |       WHEN s_de > 0 AND s_de = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'de'
        |       WHEN s_zh > 0 AND s_zh = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'zh'
        |       ELSE 'und' END AS lang_pred
        |FROM scored""".stripMargin,

    "q35_fingerprint" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(toks) = 0 THEN 0 ELSE list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(toks,
        |        t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))),
        |    (a, h) -> (a * 31 + h) % 1099511627776) END AS fp
        |FROM tok""".stripMargin,

    "q36_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM q, c WHERE query_id <> neighbor_id)
        |WHERE rank <= 10""".stripMargin,

    "q38_multimodal" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    ['image', 'audio', 'video'][(doc_id % 3 + 1)] AS modality,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    md5(text) AS digest
        |  FROM documents)
        |SELECT asset_id, modality, byte_len,
        |  CAST(byte_len % 512 + 32 AS INT) AS width,
        |  CAST(byte_len // 7 % 512 + 32 AS INT) AS height,
        |  CASE WHEN modality = 'image' THEN 0 ELSE byte_len * 3 END AS duration_ms,
        |  CAST(CASE WHEN modality = 'image' THEN 1
        |            ELSE byte_len * 3 // 1000 + 1 END AS INT) AS n_frames,
        |  CAST(('0x' || substr(digest, 1, 8)) AS BIGINT) / 4294967295.0 AS feat_0,
        |  CAST(('0x' || substr(digest, 9, 8)) AS BIGINT) / 4294967295.0 AS feat_1,
        |  CAST(('0x' || substr(digest, 17, 8)) AS BIGINT) / 4294967295.0 AS feat_2,
        |  CAST(('0x' || substr(digest, 25, 8)) AS BIGINT) / 4294967295.0 AS feat_3
        |FROM a""".stripMargin
  )
}
