package graft.llmdata

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque
  * `binary` columns with a typed metadata struct beside them; decode /
  * feature-extraction runs as a partition-local batch operator
  * (`mapPartitions`) so a real codec drops in without touching the
  * plumbing — schema, partitioning, batch shape, and the operator
  * boundary are the real, tested parts.
  *
  * STUB NOTE: the actual image/audio decoding below is a deterministic
  * fake (this container ships no codec libraries). `decodeBatch` is the
  * single seam to replace with JNI/FFmpeg/javax.imageio calls.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            format: String, n_bytes: Long)

  final case class MediaFeatures(doc_id: Long, format: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 channels: Int, frames: Int,
                                 checksum: String)

  /** Wrap a text corpus as binary media rows (payload + typed meta). */
  def ingest(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("fake/"), col("source")).as("format"),
      length(col("text")).cast("long").as("n_bytes"))

  /** STUB decoder — deterministic fake dimensions derived from the
    * payload bytes. Replace the body with a real codec; the operator
    * contract (Iterator-batched, partition-local, no shuffle) stays.
    */
  private def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
      val b1 = if (r.payload.length > 1) r.payload(1) & 0xff else 0
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(r.doc_id, r.format, r.n_bytes,
        width = 100 + b0 % 64, height = 100 + b1 % 64, channels = 3,
        frames = (r.n_bytes / 100).toInt, checksum = md)
    }

  /** Partition-local decode/feature-extract (the mapInPandas analog). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions(decodeBatch)
  }

  /** STUB resize: aspect-preserving downscale of the decoded
    * dimensions to fit `maxDim` — pure plan-side arithmetic over the
    * metadata; a real scaler replaces the payload transform, the
    * dimension bookkeeping stays.
    */
  def resize(features: DataFrame, maxDim: Int): DataFrame =
    features
      .withColumn("__scale", least(lit(1.0),
        lit(maxDim) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("resized_width",
        floor(col("width") * col("__scale")).cast("int"))
      .withColumn("resized_height",
        floor(col("height") * col("__scale")).cast("int"))
      .drop("__scale")

  /** Frame sampling: keep every `stride`-th frame index per media row —
    * pure plan-side arithmetic over the decoded frame count. Zero-frame
    * assets contribute zero rows. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride)))
          .as("frame_idx"))
}
