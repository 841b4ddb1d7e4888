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
  * The actual codec step is a STUB (this container ships no image/audio
  * libraries): `fakeDecode` derives a deterministic feature vector from
  * the payload bytes so the distributed plumbing — schema, partitioning,
  * batch shape, joins back to metadata — is real and testable; swap
  * `decodeBatch`'s body for a real codec in production.
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

  /** Deterministic stand-in for a codec: 8 features derived from byte
    * statistics. Replace with a real decoder (??? boundary).
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
          MediaFeatures(r.media_id, r.modality, nb, fakeDecode(r.content, dim))
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
