package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The decode step is a clearly marked STUB (media codec libraries are
  * not in this container): `fakeDecode` derives a deterministic
  * fixed-shape feature vector from the payload bytes. Everything
  * Spark-side — schema, partition-preserving batch iteration, typed
  * Encoders, output shape — is real and tested; swapping the stub for a
  * JNI/FFI codec keeps the pipeline unchanged.
  *
  * Scale: `mapPartitions` keeps per-batch decode state (a real codec's
  * native context) per partition, preserves partitioning, and never
  * collects media to the driver.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String,
      content: Array[Byte], width: Int, height: Int, duration_s: Double)

  case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Int, features: Array[Float])

  case class Frame(media_id: Long, frame_index: Int, offset_s: Double,
      content: Array[Byte])

  val FeatureDim = 16

  /** Build a media table from any (id, text) frame — payload = UTF-8
    * bytes standing in for encoded media, metadata derived
    * deterministically. */
  def syntheticMediaTable(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("content"),
      (pmod(col(idCol), lit(4)) * 64 + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(3)) * 64 + 64).cast("int").as("height"),
      (pmod(col(idCol), lit(30)) + lit(1)).cast("double")
        .as("duration_s"))

  /** STUB decode: deterministic feature vector from payload bytes.
    * Replace with a real codec (??? boundary) — signature and batch shape
    * stay identical. */
  def fakeDecode(content: Array[Byte]): Array[Float] = {
    // ??? real implementation would decode pixels/samples here
    val out = Array.ofDim[Float](FeatureDim)
    var i = 0
    while (i < content.length) {
      out(i % FeatureDim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    if (content.length > 0) {
      var j = 0
      while (j < FeatureDim) { out(j) /= content.length; j += 1 }
    }
    out
  }

  /** Feature extraction over media batches: one decoder context per
    * partition, rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (native context)
      rows.map { r =>
        MediaFeatures(r.media_id, r.modality, r.content.length,
          fakeDecode(r.content))
      }
    }
  }

  /** Frame sampling for video rows: emit `fps`-spaced frame stubs up to
    * `maxFrames` (payload slices stand in for decoded frames). */
  def sampleFrames(media: Dataset[MediaRow], fps: Double = 1.0,
      maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      val n = math.min(maxFrames, math.max(1,
        (r.duration_s * fps).toInt))
      (0 until n).iterator.map { i =>
        val offset = i / fps
        val sliceStart = if (r.content.isEmpty) 0
          else (i * 7) % math.max(1, r.content.length - 1)
        Frame(r.media_id, i, offset,
          r.content.slice(sliceStart,
            math.min(r.content.length, sliceStart + 16)))
      }
    }
  }

  /** Resize metadata transform (decode-free): records the target size a
    * real resize kernel would produce. */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.withColumn("target_width", lit(targetW))
      .withColumn("target_height", lit(targetH))
      .withColumn("scale_x", lit(targetW) / col("width"))
      .withColumn("scale_y", lit(targetH) / col("height"))
}
