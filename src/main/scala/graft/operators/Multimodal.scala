package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §0 north star): image/audio/
  * video travel as opaque `binary` payloads with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-
  * local typed transformations.
  *
  * The DECODE KERNEL IS A STUB: this container has no image/audio codec
  * libraries, so [[MediaCodecStub.decode]] derives deterministic fake
  * features from the payload bytes. Everything around it — the schema
  * contract, the Dataset[T] encoder plumbing, the mapPartitions batch
  * shape, partition sizing — is the real production design: swap
  * `MediaCodecStub` for a JNI/codec-backed implementation and nothing
  * else changes.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is a
  * narrow mapPartitions directly over the scan, so Tungsten never copies
  * the blobs across the network. Feature vectors (small) are what joins/
  * aggregations downstream see. Partition sizing for 100 TB of media:
  * cap `spark.sql.files.maxPartitionBytes` so one partition's payloads
  * fit the executor (blobs are row-sized, not columnar-compressible).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Int],
      format: Option[String])

  /** Decoded per-item features (fixed-width, shuffle-friendly). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      mean_byte: Double,
      feature: Array[Float]) // FEATURE_DIM-dim embedding (stub)

  val FeatureDim = 8

  /** The stub decode kernel — deterministic, pure function of the bytes.
    * A real implementation decodes pixels/samples here; the contract
    * (one MediaFeatures per MediaRow, no I/O, partition-local) is what
    * the pipeline depends on.
    */
  object MediaCodecStub {
    def decode(m: MediaRow): MediaFeatures = {
      val bytes = m.payload
      var crc = 1125899906842597L // deterministic FNV-ish rolling hash
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        crc = crc * 31 + (bytes(i) & 0xff)
        sum += (bytes(i) & 0xff)
        i += 1
      }
      val feat = new Array[Float](FeatureDim)
      var d = 0
      while (d < FeatureDim) {
        // spread the checksum into a fake unit-scale embedding
        feat(d) = (((crc >>> (d * 7)) & 0xff).toFloat / 255f) - 0.5f
        d += 1
      }
      MediaFeatures(m.media_id, m.kind, bytes.length.toLong, crc,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, feat)
    }
  }

  /** Partition-local decode + feature extraction: the media analogue of
    * a vectorized Python `mapInPandas` stage — batched per partition, no
    * shuffle of payload bytes.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodecStub.decode))
  }

  /** Resize planning (pure column math, no decode): target dims that fit
    * `maxSide` preserving aspect ratio — computed before the expensive
    * decode so undersized items skip the kernel entirely.
    */
  def withResizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h))
    media
      .withColumn("target_width",
        when(w.isNotNull && h.isNotNull, floor(w * scale).cast("int")))
      .withColumn("target_height",
        when(w.isNotNull && h.isNotNull, floor(h * scale).cast("int")))
      .withColumn("needs_resize",
        coalesce(greatest(w, h) > maxSide, lit(false)))
  }

  /** Frame-sample planning for video rows: evenly spaced sample offsets
    * (ms) as an array column — the downstream decode explodes this and
    * seeks, never decoding the full stream.
    */
  def withFrameSamples(media: DataFrame, nFrames: Int): DataFrame =
    media.withColumn("frame_offsets_ms",
      when(col("kind") === "video" && col("duration_ms").isNotNull,
        transform(sequence(lit(0), lit(nFrames - 1)),
          i => (i * col("duration_ms") / nFrames).cast("int"))))

  /** Demo media table (deterministic synthetic payloads). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = Array.tabulate[Byte]((id % 64 + 16).toInt)(j => ((id * 31 + j * 7) % 256).toByte)
      MediaRow(id, kind, payload,
        width = if (kind == "image") Some((id % 5000 + 100).toInt) else None,
        height = if (kind == "image") Some((id % 3000 + 100).toInt) else None,
        sample_rate = if (kind == "audio") Some(44100) else None,
        duration_ms = if (kind == "video") Some((id % 90000 + 1000).toInt) else None,
        format = Some(if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4"))
    }
  }
}
