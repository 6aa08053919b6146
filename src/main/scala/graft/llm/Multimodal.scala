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
      // BYTE length (octet_length), not character length — the payload
      // is opaque bytes and multi-byte UTF-8 would skew a char count
      octet_length(col("text")).cast("int").as("byte_len"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: a real implementation would hand `payload` to a codec
    * (JPEG decode, PCM resample, keyframe extraction) inside this same
    * per-partition batch loop. The fake features are pure functions of
    * the bytes — checksum is the 60-bit md5 prefix of the payload and
    * ascii_ratio counts printable-ASCII bytes — both chosen to be
    * recomputable in plain SQL, so the imperative decode stage sits
    * under the driver's hard oracle instead of a rows-only check.
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(m.payload).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
    val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    var ascii = 0
    var i = 0
    while (i < m.payload.length) {
      val b = m.payload(i)
      if (b >= 0x20 && b < 0x7f) ascii += 1
      i += 1
    }
    val ratio =
      if (m.payload.length == 0) 0.0
      else math.rint(ascii.toDouble / m.payload.length.toDouble * 1e6) / 1e6
    MediaFeatures(m.doc_id, m.modality, m.byte_len, checksum, ratio)
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

  /** One sampled-and-resized "frame" of a video payload (what a real
    * keyframe extractor emits: frame position, timestamp, dimensions
    * before/after resize, content digest).
    */
  final case class VideoFrame(
      doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
      n_units_frame: Int, n_units_resized: Int, checksum: Long)

  /** Frame-sample + resize STUB over the video-modality payloads: `k`
    * evenly spaced windows of `window` units per payload (a keyframe
    * sampler's shape), each "resized" by keeping every 2nd unit (a 2:1
    * downsample's shape), digested with the engine's 60-bit md5 prefix.
    *
    * A real codec reads byte offsets; this stub reads CODE-POINT
    * offsets of the UTF-8 payload instead — deliberately, because code
    * points are the one unit both Spark's `substring`/`length` and
    * DuckDB's agree on (neither can slice raw blobs), which puts the
    * imperative partition loop under the driver's hard value oracle:
    * frame boundary `⌊i·n/k⌋`, resized length `⌈len/2⌉`, and the
    * digest of the resized window are all recomputable in plain SQL.
    * The loop itself is the real plumbing — typed Dataset in, one
    * iterator pass per partition, 0..k outputs per row (flatMap, like
    * a keyframe extractor emitting a variable frame count).
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 4,
      window: Int = 64): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val text =
          if (m.payload == null) "" else new String(m.payload, "UTF-8")
        val cps = text.codePoints.toArray
        val n = cps.length
        if (n == 0) Iterator.empty
        else (0 until k).iterator.map { i =>
          val start = (i.toLong * n / k).toInt
          val end = math.min(start + window, n)
          val frame = java.util.Arrays.copyOfRange(cps, start, end)
          val resized = Array.tabulate((frame.length + 1) / 2)(j => frame(2 * j))
          val rs = new String(resized, 0, resized.length)
          md.reset()
          val hex = md.digest(rs.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          VideoFrame(m.doc_id, i, i * 1000L, frame.length, resized.length,
            java.lang.Long.parseLong(hex.substring(0, 15), 16))
        }
      }
    }
  }

  /** One audio "chunk": overlapping frame/hop windowing (the log-mel
    * front-end's shape — frame=400 units, hop=160), with per-chunk unit
    * count and the digest of the chunk's content.
    */
  final case class AudioChunk(
      doc_id: Long, chunk_idx: Int, start_unit: Int, n_units: Int,
      checksum: Long)

  /** Frame/hop chunking STUB over the audio-modality payloads — the
    * third multimodal verb (decode → features, video → frame-sample,
    * audio → overlapped windowing). Same contract as [[sampleFrames]]:
    * the loop reads CODE-POINT units so every emitted value (chunk
    * count `1 + ⌊(n−frame)/hop⌋` for n ≥ frame, start offsets `i·hop`,
    * lengths, digests of `substr` windows) is recomputable in plain
    * SQL, putting the imperative stage under the hard oracle. A real
    * PCM front-end drops its sample array into this exact iterator.
    */
  def chunkAudio(media: Dataset[MediaRow], frame: Int = 400,
      hop: Int = 160): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val text =
          if (m.payload == null) "" else new String(m.payload, "UTF-8")
        val cps = text.codePoints.toArray
        val n = cps.length
        val k = if (n < frame) 0 else 1 + (n - frame) / hop
        (0 until k).iterator.map { i =>
          val start = i * hop
          val chunk = java.util.Arrays.copyOfRange(cps, start, start + frame)
          val cs = new String(chunk, 0, chunk.length)
          md.reset()
          val hex = md.digest(cs.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          AudioChunk(m.doc_id, i, start, frame,
            java.lang.Long.parseLong(hex.substring(0, 15), 16))
        }
      }
    }
  }

  /** End-to-end audio chunking: route the audio modality, window per
    * partition, roll up per doc (chunk count + order-independent sum
    * of chunk digests) so the output stays bounded.
    */
  def audio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(
      docs.filter(col("text").isNotNull && length(col("text")) > 0))
      .filter(col("modality") === "audio")
      .repartition(col("modality"))
      .as[MediaRow]
    chunkAudio(media).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        min("start_unit").as("first_start"),
        max("start_unit").as("last_start"),
        sum(col("checksum")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .cast("string").as("chunks_checksum"))
      .orderBy("doc_id")
  }

  /** End-to-end frame sampling: route the video modality (a partition-
    * pruning filter in a real layout), sample + resize per partition.
    */
  def frames(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(
      docs.filter(col("text").isNotNull && length(col("text")) > 0))
      .filter(col("modality") === "video")
      .repartition(col("modality"))
      .as[MediaRow]
    sampleFrames(media).toDF().orderBy("doc_id", "frame_idx")
  }

  /** Per-modality payload dedup audit — image/audio/video dedup is a
    * first-class training-data pass (duplicate media inflate exactly
    * like duplicate text): payloads group by their md5, and the
    * per-modality readout is rows vs distinct payloads, the largest
    * duplicate group, and the byte savings a dedup pass would bank
    * (Σ(group−1)·len). One fingerprint hash-agg — the payload bytes
    * themselves never shuffle, only 32-hex fingerprints.
    */
  def dedupAudit(docs: DataFrame): DataFrame = {
    val g = mediaFromDocuments(docs)
      .select(col("modality"), col("byte_len"),
        md5(col("payload")).as("fp"))
      .groupBy("modality", "fp")
      .agg(count(lit(1)).as("sz"), max("byte_len").as("bl"))
    g.groupBy("modality").agg(
        sum("sz").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        (sum("sz") - count(lit(1))).as("dup_rows"),
        max("sz").as("max_group"),
        sum((col("sz") - 1) * col("bl")).as("dup_bytes"),
        sum(col("sz") * col("bl")).as("total_bytes"))
      .orderBy("modality")
  }
}
