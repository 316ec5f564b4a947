package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.6): image/audio/video content is
  * carried as an opaque `binary` column with typed metadata, exactly like
  * the reference carries geometry as an opaque column it never computes on
  * (/root/reference/src/wins_transform_staging.py — geometry flows through
  * copies/appends untouched, SURVEY §0).
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, feature
  * extraction over `mapPartitions` — is real and tested. The actual codec
  * work is STUBBED behind [[StubCodec]] (this container has no image/audio
  * libraries): a deterministic fake that derives "decoded" dimensions from
  * the content hash, so tests are reproducible. Swap `StubCodec` for a real
  * decoder (JNI/javacpp) in production; nothing else changes.
  */
object MultiModal {

  /** One media row: opaque payload + routing metadata. */
  case class Media(media_id: Long, modality: String, content: Array[Byte])

  /** Extracted features: what a decode+feature pass would emit per item. */
  case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg.
    * Derives plausible dimensions from a 64-bit FNV-1a of the payload. */
  object StubCodec {
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
    def decode(m: Media): MediaFeatures = {
      val cs = checksum(m.content)
      val w = 64 + (math.abs(cs) % 1024).toInt
      val h = 64 + (math.abs(cs >> 10) % 1024).toInt
      val frames = m.modality match {
        case "video" => 1 + (math.abs(cs >> 20) % 300).toInt
        case "audio" => 1 + (math.abs(cs >> 20) % 10000).toInt
        case _ => 1
      }
      MediaFeatures(m.media_id, m.modality, m.content.length, w, h, frames, cs)
    }
  }

  /** Feature extraction over partitions: the decode loop runs once per
    * partition (codec init amortized across the batch — the expensive part
    * with a real codec), never on the driver. Repartition upstream by
    * media_id if payload sizes are skewed. */
  def extractFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init codec context here, reuse across the partition
      it.map(StubCodec.decode)
    }
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index, as
    * an exploded (media_id, frame_idx) table — the shape a real frame
    * extractor consumes. Pure column expressions. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Build a Media dataset from any table with an id and a string payload —
    * used by tests and the fixture-backed verification query (text bytes
    * stand in for image bytes; the plumbing is identical). */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      modality: String = "image"): Dataset[Media] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), lit(modality), col(textCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, m, b) => Media(id, m, b) }
  }
}
