package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaFromDocuments(spark,
    Seq((0L, "hello world"), (1L, "abc"), (2L, "")).toDF("doc_id", "text"))

  test("mediaFromDocuments produces the canonical schema") {
    assert(media.columns.toSeq == Seq("media_id", "modality", "content", "meta"))
    val mods = media.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mods == Map(0L -> "image", 1L -> "audio", 2L -> "video"))
  }

  test("extractFeatures: deterministic features, byte counts") {
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r).toMap
    assert(f(0L).n_bytes == 11L)
    assert(f(1L).n_bytes == 3L)
    assert(f(2L).n_bytes == 0L)
    assert(f(0L).features.length == 8)
    // deterministic: rerun equals
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(f2(0L) == f(0L).features.toSeq)
  }

  test("resizePayload truncates to budget") {
    val out = Multimodal.resizePayload(media, 5).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content").length).toMap
    assert(out == Map(0L -> 5, 1L -> 3, 2L -> 0))
  }

  test("sampleFrames: every k-th fixed-size slice") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 2, everyK = 2)
      .filter(col("media_id") === 0L).collect()
    // 11 bytes → 6 frames (0..5), sampled 0,2,4 → 3 frames
    assert(frames.length == 3)
    assert(frames.map(_.getInt(1)).toSet == Set(0, 2, 4))
  }
}
