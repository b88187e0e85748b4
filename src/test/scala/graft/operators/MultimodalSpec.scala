package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def assets = Seq(
    (1L, "image", Array.fill[Byte](700)(7)),
    (2L, "video", Array.fill[Byte](2000)(1)),
    (3L, "audio", Array.fill[Byte](100)(2)))
    .toDF("asset_id", "modality", "payload")

  test("decode emits deterministic metadata with the fixed schema") {
    val meta = Multimodal.decode(assets).collect().map(m => m.asset_id -> m).toMap
    val img = meta(1L)
    assert(img.byte_len == 700 && img.n_frames == 1 && img.duration_ms == 0)
    assert(img.width == 700 % 512 + 32 && img.height == (700 / 7 % 512 + 32).toInt)
    val vid = meta(2L)
    assert(vid.duration_ms == 6000 && vid.n_frames == 7)
  }

  test("frameSampleIndices: images get [0], videos evenly spaced covering frame 0") {
    val df = Multimodal.frameSampleIndices(Multimodal.decode(assets))
      .select(col("asset_id"), col("sample_frames"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(df(1L) == Seq(0))
    val frames = df(2L) // 7 frames, step max(1, 7/10)=1 → all
    assert(frames == (0 until 7))
  }

  test("resizeMeta fits within the max side preserving aspect, integer math") {
    val meta = Multimodal.resizeMeta(Multimodal.decode(assets).toDF())
      .select(col("asset_id"), col("width"), col("height"),
        col("resized_w"), col("resized_h"))
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    meta.values.foreach { case (_, w, h, rw, rh) =>
      assert(rw <= math.max(w, 224) && rh <= math.max(h, 224))
      if (math.max(w, h) <= 224) assert(rw == w && rh == h)
      else {
        assert(math.max(rw, rh) == 224 || math.max(rw, rh) == w * 224 / math.max(w, h)
          || math.max(rw, rh) == h * 224 / math.max(w, h))
        // aspect preserved under floor division
        assert(rw == w * 224 / math.max(w, h) && rh == h * 224 / math.max(w, h))
      }
    }
  }
}
