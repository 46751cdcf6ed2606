package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` payload columns with typed metadata, processed per-partition
  * in batches (the Scala analog of `mapInPandas` batch processing).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces deterministic fake features derived
  * only from the bytes. Everything around it — schema, typed rows,
  * per-partition batching, partition sizing — is real and tested, so a
  * real decoder drops in by replacing one function.
  */
object Multimodal {

  /** An opaque media payload + metadata. */
  final case class MediaRow(
      media_id: Long, modality: String, payload: Array[Byte],
      source: String)

  /** Decoded/extracted features per media item. */
  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  /** Wrap any table into media rows (payload = a binary column). */
  def toMediaRows(df: DataFrame, idCol: String, binCol: String,
      modality: String, sourceCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("payload"),
      col(sourceCol).cast("string").as("source")).as[MediaRow]
  }

  /** STUB decoder: deterministic pseudo-decode per partition batch.
    * A real implementation decodes `payload` with an image/audio codec
    * here — one partition at a time, codec instantiated once per
    * partition (not per row), which is the whole point of the
    * mapPartitions shape.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init would go here
      rows.map { r =>
        val n = r.payload.length.toLong
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
        // fake dimensions derived from content — stands in for ???
        MediaFeatures(r.media_id, r.modality, n,
          width = (math.abs(sum) % 1920).toInt + 1,
          height = (math.abs(sum / 7) % 1080).toInt + 1,
          checksum = sum)
      }
    }
  }

  /** End-to-end stub pipeline over `documents` (text bytes as the fake
    * payload): partition by id for even batches, decode, return features.
    */
  def documentFeatures(spark: SparkSession, documents: DataFrame, partitions: Int = 32): DataFrame = {
    val media = toMediaRows(
      documents, idCol = "doc_id", binCol = "text",
      modality = "image", sourceCol = "source")
      .repartition(partitions, col("media_id"))
    decodeStub(media).toDF()
  }
}
