package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image /
  * audio / video payloads ride as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as `mapPartitions` batch transforms (the Scala analog of
  * `mapInPandas` — one JVM call per partition, vectorizable batch
  * inside).
  *
  * Decode is format-sniffed: binary PPM (P6) images and RIFF/WAVE PCM
  * audio decode for real (pure byte parsing — no codec libraries
  * needed); any other payload falls back to `fakeDecode`, a
  * deterministic byte-statistics stand-in, so the distributed plumbing —
  * schema, partitioning, batch shape, joins back to metadata — runs
  * end-to-end even on the synthetic fixture corpus. Compressed formats
  * (JPEG/MP3/H.264) would slot into `decode` the same way but need
  * libraries this container doesn't ship.
  */
object Multimodal {

  /** Canonical multimodal schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  final case class MediaRow(media_id: Long, modality: String,
                            content: Array[Byte])
  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, features: Array[Float])

  /** Binary PPM (P6) decode: ASCII header `P6 <w> <h> <maxval>` with
    * `#` comments, then w·h RGB byte triples. Features:
    * [width, height, mean R, mean G, mean B, mean luma (BT.601),
    *  maxval, aspect]. Returns None unless the header parses AND the
    * payload length matches exactly (so text payloads can't misfire).
    */
  private[multimodal] def decodePpm(b: Array[Byte], dim: Int = 8): Option[Array[Float]] = {
    if (b == null || b.length < 12 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def nextInt(): Int = {
      while (i < b.length &&
             (b(i).toChar.isWhitespace || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = -1
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val mx = nextInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 65535 || i >= b.length ||
        !b(i).toChar.isWhitespace) return None
    i += 1 // single whitespace after maxval, then raster
    if (b.length - i != w * h * 3) return None
    var (r, g, bl) = (0.0, 0.0, 0.0)
    var p = i
    while (p + 2 < b.length) {
      r += (b(p) & 0xff); g += (b(p + 1) & 0xff); bl += (b(p + 2) & 0xff)
      p += 3
    }
    val n = (w * h).toDouble
    val (mr, mg, mb) = (r / n, g / n, bl / n)
    val out = new Array[Float](dim)
    val feats = Array(w.toFloat, h.toFloat, mr.toFloat, mg.toFloat, mb.toFloat,
      (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat, mx.toFloat,
      w.toFloat / h.toFloat)
    System.arraycopy(feats, 0, out, 0, math.min(dim, feats.length))
    Some(out)
  }

  /** RIFF/WAVE PCM decode (16-bit, any channel count): walks the chunk
    * list for `fmt ` and `data`. Features: [sample_rate, n_frames,
    * channels, RMS amplitude (normalized), zero-crossing rate,
    * duration_sec, bits, 0]. None unless the RIFF/WAVE magic and a
    * PCM fmt chunk check out.
    */
  private[multimodal] def decodeWav(b: Array[Byte], dim: Int = 8): Option[Array[Float]] = {
    def u16(o: Int) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8))
    def u32(o: Int) = ((b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
      ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24))
    if (b == null || b.length < 44 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
        !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int, Long, Int)] = None // (audioFmt, ch, rate, bits)
    var data: Option[(Int, Int)] = None           // (offset, len)
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val len = u32(off + 4).toInt
      if (id == "fmt " && off + 8 + 16 <= b.length)
        fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12), u16(off + 22)))
      else if (id == "data")
        data = Some((off + 8, math.min(len, b.length - off - 8)))
      off += 8 + len + (len & 1)
    }
    (fmt, data) match {
      case (Some((1, ch, rate, 16)), Some((doff, dlen))) if ch > 0 && rate > 0 =>
        val nSamples = dlen / 2
        val nFrames = nSamples / ch
        var sumSq = 0.0
        var zc = 0
        var prev = 0
        var s = 0
        while (s < nSamples) {
          val v = (u16(doff + s * 2) << 16) >> 16 // sign-extend
          sumSq += v.toDouble * v
          if (s > 0 && ((v >= 0) != (prev >= 0))) zc += 1
          prev = v
          s += 1
        }
        val rms = if (nSamples > 0) math.sqrt(sumSq / nSamples) / 32768.0 else 0.0
        val zcr = if (nSamples > 1) zc.toDouble / (nSamples - 1) else 0.0
        val out = new Array[Float](dim)
        val feats = Array(rate.toFloat, nFrames.toFloat, ch.toFloat,
          rms.toFloat, zcr.toFloat,
          (nFrames.toDouble / rate).toFloat, 16.0f, 0.0f)
        System.arraycopy(feats, 0, out, 0, math.min(dim, feats.length))
        Some(out)
      case _ => None
    }
  }

  /** Format-sniffing decode: real PPM/WAV parsing when the payload is
    * one of those containers, byte-statistics fallback otherwise.
    */
  private[multimodal] def decode(bytes: Array[Byte], dim: Int = 8): Array[Float] =
    decodePpm(bytes, dim)
      .orElse(decodeWav(bytes, dim))
      .getOrElse(fakeDecode(bytes, dim))

  /** Deterministic fallback for payloads in formats this container has
    * no codec for: 8 features derived from byte statistics.
    */
  private[multimodal] def fakeDecode(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(dim)(0.0f)
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out.map(x => x / bytes.length * dim)
  }

  /** Batch feature extraction over the payload column: one
    * `mapPartitions` pass (batch-shaped; a real implementation would
    * hand each partition's byte buffers to a native codec in bulk).
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "content").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val nb = if (r.content == null) 0L else r.content.length.toLong
          MediaFeatures(r.media_id, r.modality, nb, decode(r.content, dim))
        }
      }
  }

  /** "Resize" stub: trims/pads payloads to a target byte budget per row
    * and records the new meta — demonstrates a payload-rewriting
    * transform whose output schema and partitioning are production-real.
    */
  def resizePayload(media: DataFrame, maxBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "content").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val c = Option(r.content).getOrElse(Array.emptyByteArray)
          MediaRow(r.media_id, r.modality, c.take(maxBytes))
        }
      }.toDF()
  }

  /** Frame sampling stub for video: every k-th `frameBytes` slice of the
    * payload becomes a frame row (media_id, frame_no, frame).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "content").as[MediaRow]
      .flatMap { r =>
        val c = Option(r.content).getOrElse(Array.emptyByteArray)
        val frames = c.grouped(frameBytes).zipWithIndex
        frames.collect { case (f, i) if i % everyK == 0 => (r.media_id, i, f) }
      }.toDF("media_id", "frame_no", "frame")
  }

  /** Synthesize a deterministic media table from the documents fixture
    * (payload = utf-8 text bytes) so the plumbing is exercisable on the
    * driver-provided data without real codecs.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10L).as("duration_ms"),
        lit("fake").as("codec")).as("meta"))
}
