package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration, typed
  * output — is real and tested. The actual media DECODE step is a
  * deterministic STUB (`decodeStub`): the image/audio codecs aren't in this
  * container, so it derives fake-but-stable "features" from the bytes.
  * Swapping in a real decoder means replacing only `decodeStub`'s body; the
  * distributed plumbing is unchanged.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      declared_frames: Int)

  /** Extracted features per asset (shape of a real decode output). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: Long,
      magic: String, // first bytes, hex — format sniffing
      feature: Array[Float]) // stub "embedding" of the payload

  /** Sampled frame reference (video path). */
  final case class FrameSample(media_id: Long, frame_index: Int, frame_hash: Long)

  /** Build a media table from any table with an id + string column: payload
    * = UTF-8 bytes (stand-in for real image/audio bytes), kind assigned
    * deterministically by id. */
  def packFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(col(idCol), lit(48)) + 2).cast("int").as("declared_frames"))

  /** ??? REAL DECODER GOES HERE ??? — deterministic stand-in: a real
    * implementation would parse the codec, decode pixels/samples and run a
    * feature extractor. This stub derives stable pseudo-features from the
    * raw bytes so the distributed pipeline is fully exercisable. */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    val feature = Array.tabulate(8) { j =>
      val hj = h ^ (0x9e3779b97f4a7c15L * (j + 1))
      (hj % 1000) / 1000.0f
    }
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong, h, magic, feature)
  }

  /** Decode / feature-extract every asset, batch-wise per partition (the
    * shape a vectorized decode batch would take). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { it => it.map(decodeStub) }
  }

  /** Uniform frame sampling for video assets: every `stride`-th declared
    * frame, as (media_id, frame_index, frame_hash) — generated with a
    * distributed explode, no driver loops. */
  def sampleFrames(media: DataFrame, stride: Int = 8): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("declared_frames") - 1, lit(stride))).as("frame_index"))
      .select(col("media_id"), col("frame_index"),
        xxhash64(col("payload"), col("frame_index")).as("frame_hash"))
}
