package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted by a partition-wise stub decoder.
  *
  * The Spark-side plumbing is real — schema (binary + struct metadata),
  * partition-wise batch iteration via `mapPartitions` with product
  * encoders, deterministic feature output — while the actual codec is a
  * STUB (this container ships no image/audio libraries): features are
  * derived from the raw bytes with a fixed formula. Swapping in a real
  * decoder changes only [[decodeStub]]'s body.
  *
  * At 100 TB the mapPartitions boundary is the right interface: decode
  * batches stay executor-local, binary blobs never shuffle, and the
  * downstream feature table is columnar/compact.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** Builds a media table from documents: utf-8 bytes stand in for an
    * encoded image payload; metadata travels alongside the blob. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("img-stub").as("format"))

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would parse the codec header here. */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val n = m.media.length.toLong
    MediaFeatures(
      doc_id = m.doc_id,
      format = m.format,
      n_bytes = n,
      width = (64 + n % 512).toInt,
      height = (64 + (n * 7) % 512).toInt,
      n_frames = (1 + n % 16).toInt)
  }

  /** Partition-wise decode: binary in, typed features out. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val ds: Dataset[MediaRow] = media.as(Encoders.product[MediaRow])
    ds.mapPartitions(_.map(decodeStub))(Encoders.product[MediaFeatures]).toDF()
  }
}
