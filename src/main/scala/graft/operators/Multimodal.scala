package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, and decode/feature-extract
  * steps run as partition-batched transforms so a real codec (libjpeg,
  * ffmpeg, …) would amortize per-batch setup.
  *
  * The actual byte decoding is STUBBED — this container has no media
  * libraries — with a deterministic fake ([[FakeCodec]]) so the Spark-side
  * plumbing (schema, batch shape, partitioning, lazy iterators) is real and
  * testable end-to-end. Swap [[MediaCodec]]'s implementation to integrate a
  * native decoder; nothing else changes.
  */
object Multimodal {

  /** One decoded-asset metadata record (the fixed output schema of decode). */
  final case class DecodedMeta(
      asset_id: Long,
      modality: String,
      byte_len: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_frames: Int)

  /** The codec seam: batch-in, batch-out over raw payloads. */
  trait MediaCodec extends Serializable {
    def decode(assetId: Long, modality: String, payload: Array[Byte]): DecodedMeta
  }

  /** Deterministic stand-in for a real decoder: metadata derived from the
    * payload length alone, matching what a SQL oracle can recompute. A real
    * implementation would parse the container header instead.
    */
  object FakeCodec extends MediaCodec {
    def decode(assetId: Long, modality: String, payload: Array[Byte]): DecodedMeta = {
      val n = payload.length.toLong
      val isImage = modality == "image"
      DecodedMeta(
        asset_id = assetId,
        modality = modality,
        byte_len = n,
        width = (n % 512 + 32).toInt,
        height = (n / 7 % 512 + 32).toInt,
        duration_ms = if (isImage) 0L else n * 3,
        n_frames = if (isImage) 1 else (n * 3 / 1000 + 1).toInt)
    }
  }

  /** Decode a DataFrame of (asset_id long, modality string, payload binary)
    * partition-by-partition. The iterator stays lazy — payload batches are
    * never materialized per-partition, so executor memory is bounded by one
    * row regardless of blob size.
    */
  def decode(assets: DataFrame, codec: MediaCodec = FakeCodec): Dataset[DecodedMeta] = {
    val enc = Encoders.product[DecodedMeta]
    assets.select(col("asset_id"), col("modality"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          codec.decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
        }
      }(enc)
  }

  /** Feature extraction stub: a fixed-width float vector per asset, derived
    * deterministically from the payload digest (a real pipeline would run a
    * model forward pass here; the batch shape is what matters).
    */
  def features(assets: DataFrame, dims: Int = 4): DataFrame = {
    // md5 hex is 32 chars = 4 × 8-char slices; a 5th slice would read an
    // empty substring and conv('') yields NULL features with no error
    require(dims >= 1 && dims <= 4,
      s"features: dims must be in [1, 4] (md5 yields 4 exact 8-hex slices), got $dims")
    val digest = md5(col("payload"))
    val feats = (0 until dims).map { i =>
      (conv(substring(digest, i * 8 + 1, 8), 16, 10).cast("long") /
        lit(4294967295.0)).as(s"feat_$i")
    }
    assets.select(col("asset_id") +: feats: _*)
  }

  /** Evenly spaced frame-sample indices for a decoded video — the standard
    * keyframe sampling step before per-frame featurization.
    */
  def frameSampleIndices(meta: Dataset[DecodedMeta], every: Int = 10): DataFrame =
    meta.toDF().withColumn("sample_frames",
      when(col("n_frames") > 1,
        sequence(lit(0), col("n_frames") - 1,
          greatest(lit(1), (col("n_frames") / lit(every)).cast("int"))))
        .otherwise(array(lit(0))))

  /** Fit-within-`maxSide` resize plan: target dimensions preserving aspect
    * ratio, integer math only (floor division in both engines) so an
    * external oracle reproduces them exactly. The pixel transform itself is
    * the codec seam's job; the engine's part is the metadata arithmetic and
    * the partition-batched pass shape, like [[decode]].
    */
  def resizeMeta(meta: DataFrame, maxSide: Int = 224): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    def fit(c: org.apache.spark.sql.Column) =
      when(longest <= maxSide, c)
        .otherwise((c * maxSide / longest).cast("int"))
    meta.withColumn("resized_w", fit(col("width")))
      .withColumn("resized_h", fit(col("height")))
  }
}
