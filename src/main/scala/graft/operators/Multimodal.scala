package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §0 north star): image/audio/
  * video travel as opaque `binary` payloads with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-
  * local typed transformations.
  *
  * IMAGE DECODE IS REAL: [[MediaCodecImageIO.decode]] decodes image
  * payloads with pure-JVM `javax.imageio` (PNG/BMP/GIF readers ship in
  * the JDK — no native codec dependency), reporting the DECODED
  * width/height and per-channel pixel means, with a corrupt or
  * unreadable payload degrading to `decode_ok = false` instead of
  * failing the partition. Audio/video have no JVM-built-in codec, so
  * their rows keep byte-level stats only; the kernel seam
  * ([[decodeFeatures]]'s `kernel` parameter) is where a JNI/codec-backed
  * implementation slots in without touching the plumbing. Decoded
  * metadata is reported SEPARATELY from the declared catalog metadata
  * (`width`/`height` on [[MediaRow]]) on purpose: at scale the two
  * disagree, and the disagreement is a data-quality signal.
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

  /** Decoded per-item features (fixed-width, shuffle-friendly).
    * `decode_ok`/`decoded_*`/`mean_*` come from a REAL codec pass and
    * are None wherever no JVM codec applies (audio/video) or the
    * payload is corrupt; byte-level stats are always present.
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      mean_byte: Double,
      decode_ok: Boolean,
      decoded_width: Option[Int],
      decoded_height: Option[Int],
      mean_r: Option[Double],
      mean_g: Option[Double],
      mean_b: Option[Double],
      feature: Array[Float]) // FEATURE_DIM-dim embedding (byte-stat stub)

  val FeatureDim = 8

  private def byteStats(bytes: Array[Byte]): (Long, Double, Array[Float]) = {
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
    (crc, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, feat)
  }

  /** The byte-stat kernel — deterministic, pure function of the bytes,
    * never attempts a codec. Kept as the baseline kernel for payloads
    * with no JVM decoder and for tests that pin the plumbing without a
    * codec in the loop.
    */
  object MediaCodecStub {
    def decode(m: MediaRow): MediaFeatures = {
      val (crc, mean, feat) = byteStats(m.payload)
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, crc, mean,
        decode_ok = false, None, None, None, None, None, feat)
    }
  }

  /** The real image kernel: `javax.imageio` decode (PNG/BMP/GIF readers
    * are part of the JDK) for `kind == "image"`, byte stats otherwise.
    * A corrupt/unreadable payload yields `decode_ok = false` with the
    * byte stats intact — ONE bad blob must degrade to a flagged row,
    * never fail the partition (at 100 TB some payloads are always
    * broken). Partition-local and allocation-bounded: one BufferedImage
    * at a time, no temp-file cache (`ImageIO.setUseCache(false)`).
    */
  object MediaCodecImageIO {
    javax.imageio.ImageIO.setUseCache(false)

    def decode(m: MediaRow): MediaFeatures = {
      val base = MediaCodecStub.decode(m)
      if (m.kind != "image") base
      else {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          catch { case _: Exception => null }
        if (img == null) base
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          base.copy(decode_ok = true,
            decoded_width = Some(w), decoded_height = Some(h),
            mean_r = Some(sr.toDouble / n), mean_g = Some(sg.toDouble / n),
            mean_b = Some(sb.toDouble / n))
        }
      }
    }
  }

  /** Partition-local decode + feature extraction: the media analogue of
    * a vectorized Python `mapInPandas` stage — batched per partition, no
    * shuffle of payload bytes. The kernel is the swappable seam; the
    * default is the real [[MediaCodecImageIO]].
    */
  def decodeFeatures(media: Dataset[MediaRow],
                     kernel: MediaRow => MediaFeatures = MediaCodecImageIO.decode)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(kernel))
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

  /** Every syntheticMedia image id ≡ [[CorruptImageId]] (mod 60) ships a
    * deliberately unreadable payload (still claiming `format = "png"`),
    * so the corrupt-blob degradation path is exercised by every caller.
    */
  val CorruptImageId = 57L

  /** Deterministic pixel channels for synthetic image (id, x, y) — pure
    * integer arithmetic, so an engine WITHOUT a codec (the SQL oracle)
    * can predict the decoded channel means of the lossless PNG exactly.
    */
  def synthR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def synthG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 5 + y * 11) % 256).toInt
  def synthB(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 3 + y * 19) % 256).toInt
  def synthW(id: Long): Int = (id % 7 + 2).toInt
  def synthH(id: Long): Int = (id % 5 + 2).toInt

  /** Demo media table. Image payloads are REAL PNGs (encoded with the
    * JDK's ImageIO writer) of [[synthW]]×[[synthH]] pixels filled by the
    * [[synthR]]/[[synthG]]/[[synthB]] formulas — PNG is lossless, so the
    * decode kernel recovers the formula values exactly. Audio/video
    * payloads stay formula-derived raw bytes (no JVM codec to decode
    * them anyway). The declared catalog width/height deliberately
    * DISAGREE with the encoded pixel dims (catalog metadata lies at
    * scale; q33 surfaces both sides).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload =
        if (kind == "image" && id % 60 != CorruptImageId % 60) {
          val w = synthW(id); val h = synthH(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (synthR(id, x, y) << 16) | (synthG(id, x, y) << 8) | synthB(id, x, y))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        } else
          Array.tabulate[Byte]((id % 64 + 16).toInt)(j => ((id * 31 + j * 7) % 256).toByte)
      MediaRow(id, kind, payload,
        width = if (kind == "image") Some((id % 5000 + 100).toInt) else None,
        height = if (kind == "image") Some((id % 3000 + 100).toInt) else None,
        sample_rate = if (kind == "audio") Some(44100) else None,
        duration_ms = if (kind == "video") Some((id % 90000 + 1000).toInt) else None,
        format = Some(if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4"))
    }
  }
}
