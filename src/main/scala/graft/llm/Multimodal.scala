package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as partition-batched imperative code — the Scala
  * analogue of a Pandas-UDF-over-`mapInPandas` stage.
  *
  * The DECODE ITSELF IS A STUB (no image/audio codecs ship in this
  * environment): [[decodeStub]] derives deterministic fake features from
  * the bytes. Everything around it — the binary schema, the typed
  * Dataset boundary, the per-partition batch loop, partitioning — is the
  * real plumbing a codec would drop into.
  */
object Multimodal {

  /** One media row: payload is opaque bytes + enough metadata to route
    * it without decoding.
    */
  final case class MediaRow(
      doc_id: Long, modality: String, byte_len: Int, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit: dimensions,
    * duration, embedding...; here: deterministic byte statistics).
    */
  final case class MediaFeatures(
      doc_id: Long, modality: String, byte_len: Int,
      checksum: Long, ascii_ratio: Double)

  /** Synthesize a media table from `documents`: the text bytes stand in
    * for an opaque payload; modality fans out deterministically so the
    * routing code paths all execute.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      length(col("text")).cast("int").as("byte_len"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: a real implementation would hand `payload` to a codec
    * (JPEG decode, PCM resample, keyframe extraction) inside this same
    * per-partition batch loop. The fake features are pure functions of
    * the bytes, so tests and the rows-only driver check are
    * deterministic.
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    var sum = 0L
    var ascii = 0
    var i = 0
    while (i < m.payload.length) {
      val b = m.payload(i)
      sum = sum * 31 + (b & 0xff)
      if (b >= 0x20 && b < 0x7f) ascii += 1
      i += 1
    }
    val ratio =
      if (m.payload.length == 0) 0.0
      else ascii.toDouble / m.payload.length.toDouble
    MediaFeatures(m.doc_id, m.modality, m.byte_len, sum, ratio)
  }

  /** Partition-batched feature extraction: one iterator pass per
    * partition (the `mapInPandas` shape — batch in, batch out, no
    * per-row task overhead), typed end to end.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** End-to-end: documents → opaque media rows → decoded features,
    * repartitioned by modality so a real codec stage gets homogeneous
    * batches (one codec init per partition, not per row).
    */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(docs)
      .repartition(col("modality"))
      .as[MediaRow]
    extractFeatures(media).toDF().orderBy("doc_id")
  }
}
