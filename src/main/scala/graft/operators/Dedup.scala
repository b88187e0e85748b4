package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora, designed for the
  * 100 TB shape: every variant is a hash-bucketed shuffle (groupBy on a
  * digest or an LSH band key), never an all-pairs comparison.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct text with the
    * canonical (minimum) id and the duplicate count. A single hash aggregate:
    * partial aggregation runs map-side, the shuffle carries one row per
    * distinct digest.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: word-3-gram shingles → k-wide MinHash signature → split into
    * `bands` bands of `rowsPerBand` positions → explode to (band, bandKey)
    * and shuffle-join on the band key (candidate generation is linear in
    * corpus size, not quadratic) → verify candidates with exact Jaccard over
    * distinct shingles → keep pairs ≥ `threshold`.
    *
    * Band math: P(candidate) = 1 - (1 - j^r)^b — with 16×4 the s-curve
    * midpoint sits near j ≈ 0.5, standard for 0.6-0.8 thresholds.
    *
    * Scale note: the band join's key cardinality ≈ corpus size × bands; a
    * pathological bucket (many docs sharing a band key) is quadratic within
    * the bucket only — cap it upstream with a `bucketCap` skew guard if the
    * corpus has boilerplate floods.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPerBand = k / bands

    val sigs = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol))).as("sh"),
      minhashSignature(shingles(col(textCol)), k).as("sig"))
      .filter(size(col("sh")) > 0)

    val banded = sigs.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bkey")))).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bkey"))

    val l = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup candidate pairs: docs whose 63-bit SimHash matches on
    * at least one of four 16-bit bands (Hamming-distance blocking — two docs
    * within Hamming distance 3 of each other share a band by pigeonhole).
    * Verified by full-fingerprint Hamming distance ≤ `maxHamming`.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .filter(tokenCount(col(textCol)) > 0)
    val banded = fp.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("bkey"))): _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bkey"))
    val l = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
