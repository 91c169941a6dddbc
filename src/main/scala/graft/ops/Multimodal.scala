package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The Spark-side machinery — schema, partitioning, batch shape, the
  * `mapPartitions` feature-extraction hook — is real and tested. The codec
  * itself is a STUB (`FakeCodec`): this container has no image/audio
  * libraries, so decode produces deterministic fake features derived from
  * the bytes. Swapping in a real decoder (JNI/javacpp ffmpeg, ImageIO) only
  * replaces the function passed to [[extractFeatures]]; none of the plan
  * shape changes.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("sha256", StringType, nullable = false))), nullable = false)))

  /** Wrap any (id, text) table into the media shape — the test stand-in for
    * real image/audio payload ingestion (payload = utf-8 bytes). */
  def packBinary(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 mime: String = "text/plain"): DataFrame = {
    val content = encode(col(textCol), "utf-8")
    docs.select(
      col(idCol).cast("long").as("media_id"),
      content.as("content"),
      struct(
        lit(mime).as("mime"),
        length(content).cast("long").as("byte_len"),
        sha2(content, 256).as("sha256")).as("meta"))
  }

  /** STUBBED media codec. Deterministic fake features standing in for a real
    * image/audio decode — byte-derived so tests are stable. A production
    * build would replace `decode` with e.g. an ImageIO/ffmpeg call; the
    * signature (bytes → features) and everything downstream stay as-is. */
  object FakeCodec {
    case class MediaFeatures(width: Int, height: Int, nFrames: Int, meanByte: Double)

    def decode(bytes: Array[Byte]): MediaFeatures = {
      // ??? <- real decoder goes here; deterministic fake below
      val n = bytes.length
      val mean = if (n == 0) 0.0 else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
      MediaFeatures(width = 64 + n % 576, height = 64 + (n * 31) % 416,
        nFrames = 1 + n % 16, meanByte = math.rint(mean * 1e6) / 1e6)
    }
  }

  case class MediaMeta(mime: String, byte_len: Long, sha256: String)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaWithFeatures(media_id: Long, content: Array[Byte], meta: MediaMeta,
                               width: Int, height: Int, n_frames: Int, mean_byte: Double)

  /** Partition-wise feature extraction: the batch shape a heavyweight codec
    * needs (amortized per-partition init — one decoder context per task,
    * mirroring `mapInPandas` batch semantics). Typed Dataset map, so the
    * row↔object bridge is a compiled Encoder, not reflection per row. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init of the (stub) codec happens once here
      rows.map { r =>
        val bytes = Option(r.content).getOrElse(Array.emptyByteArray)
        val f = FakeCodec.decode(bytes)
        MediaWithFeatures(r.media_id, r.content, r.meta, f.width, f.height, f.nFrames, f.meanByte)
      }
    }.toDF()
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `stride`-th frame index up to `nFrames` — pure column math so the frame
    * list is computed without touching payload bytes. */
  def sampleFrames(media: DataFrame, nFramesCol: String = "n_frames", stride: Int = 4): DataFrame =
    media.withColumn("sampled_frames",
      sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride)))
}
