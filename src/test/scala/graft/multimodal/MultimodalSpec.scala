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

  test("decodePpm: real P6 parse — dims, channel means, reject non-PPM") {
    // 2×2 image: red, green, blue, white
    val header = "P6\n# test\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    val ppm = header ++ raster
    val f = Multimodal.decodePpm(ppm).get
    assert(f(0) == 2.0f && f(1) == 2.0f)               // width, height
    assert(math.abs(f(2) - 127.5f) < 0.01)             // mean R
    assert(math.abs(f(3) - 127.5f) < 0.01)             // mean G
    assert(math.abs(f(4) - 127.5f) < 0.01)             // mean B
    assert(f(6) == 255.0f)                             // maxval
    assert(Multimodal.decodePpm("P6 but not really an image".getBytes).isEmpty)
    assert(Multimodal.decodePpm(header ++ raster.take(9)).isEmpty) // short raster
  }

  test("decodeWav: real RIFF/WAVE PCM parse — rate, frames, RMS") {
    // mono 16-bit PCM, 8000 Hz, 4 samples: full-scale square wave
    val samples = Array[Short](32767, 32767, -32768, -32768)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    val f = Multimodal.decodeWav(bb.array()).get
    assert(f(0) == 8000.0f && f(1) == 4.0f && f(2) == 1.0f)
    assert(math.abs(f(3) - 1.0f) < 0.001)              // full-scale RMS
    assert(Multimodal.decodeWav("RIFFxxxxNOPE".getBytes).isEmpty)
  }

  test("decode sniffing: PPM/WAV payloads route to real decoders, text to fallback") {
    val text = "plain utf-8 payload".getBytes("UTF-8")
    assert(Multimodal.decode(text).sameElements(Multimodal.fakeDecode(text)))
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decode(ppm)(0) == 1.0f) // width → real decoder ran
  }
}
