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

  /** Decoded audio features (fixed-width, shuffle-friendly). All decoded
    * fields are None when the payload is not parseable PCM WAV;
    * `mean_abs_amp` is the exact integer-ratio mean of |sample| over all
    * frames×channels (unrounded — callers round for reporting).
    */
  case class AudioFeatures(
      media_id: Long,
      decode_ok: Boolean,
      sample_rate: Option[Int],
      channels: Option[Int],
      bits: Option[Int],
      n_samples: Option[Long],
      duration_ms: Option[Long],
      mean_abs_amp: Option[Double])

  /** The real audio kernel: pure-JVM RIFF/WAVE container parsing for
    * 16-bit PCM — the audio half of the decode seam [[MediaCodecImageIO]]
    * fills for stills. Walks the chunk list (chunks pad to even length),
    * reads `fmt ` (PCM only) and `data`, validates that the declared
    * data length actually fits the payload (a TRUNCATED blob — the
    * commonest corruption in a crawled corpus — must degrade to
    * `decode_ok = false`, never fail the partition), and reports sample
    * rate / channels / bit depth / frame count / exact integer-division
    * duration and the mean absolute amplitude. Compressed codecs
    * (non-PCM format tags, non-16-bit depths) are out of JVM-built-in
    * scope and degrade the same way; a JNI codec slots into the same
    * kernel seam via [[decodeAudioFeatures]]'s parameter.
    */
  object MediaCodecWav {

    /** Canonical 44-byte-header PCM-16 mono/stereo WAV writer — the
      * encoder dual of [[decode]], used by [[syntheticAudio]] so specs
      * and the oracle can predict every decoded field from the sample
      * formula.
      */
    def encodePcm16(sampleRate: Int, channels: Int,
                    samples: Array[Short]): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0)
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort) // block align
        .putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    def decode(m: MediaRow): AudioFeatures = {
      val b = m.payload
      val fail = AudioFeatures(m.media_id, decode_ok = false,
        None, None, None, None, None, None)
      try {
        if (b.length < 44) return fail
        val buf = java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def str4(off: Int) = new String(b, off, 4, "US-ASCII")
        if (str4(0) != "RIFF" || str4(8) != "WAVE") return fail
        var off = 12
        var fmt = -1; var channels = -1; var rate = -1; var bits = -1
        var dataOff = -1; var dataLen = -1
        while (off + 8 <= b.length && (fmt < 0 || dataOff < 0)) {
          val cid = str4(off); val clen = buf.getInt(off + 4)
          if (clen < 0) return fail
          if (cid == "fmt ") {
            if (off + 24 > b.length) return fail
            fmt = buf.getShort(off + 8) & 0xffff
            channels = buf.getShort(off + 10) & 0xffff
            rate = buf.getInt(off + 12)
            bits = buf.getShort(off + 22) & 0xffff
          } else if (cid == "data") {
            dataOff = off + 8; dataLen = clen
          }
          off += 8 + clen + (clen & 1) // chunks pad to even length
        }
        if (fmt != 1 || bits != 16 || channels < 1 || rate <= 0) return fail
        // the truncation check: a declared data chunk that outruns the
        // actual bytes is a cut-off upload, not a smaller file
        if (dataOff < 0 || dataLen < 0 ||
          dataOff.toLong + dataLen > b.length) return fail
        val bytesPerFrame = channels * 2
        if (dataLen % bytesPerFrame != 0) return fail
        val nFrames = dataLen / bytesPerFrame
        var s = 0L; var i = 0
        while (i < nFrames * channels) {
          s += math.abs(buf.getShort(dataOff + i * 2).toLong); i += 1
        }
        val mean =
          if (nFrames == 0) 0.0 else s.toDouble / (nFrames.toLong * channels)
        AudioFeatures(m.media_id, decode_ok = true, Some(rate),
          Some(channels), Some(bits), Some(nFrames.toLong),
          Some(nFrames.toLong * 1000L / rate), Some(mean))
      } catch { case _: Exception => fail }
    }
  }

  /** Partition-local audio decode — same narrow no-payload-shuffle shape
    * as [[decodeFeatures]], with [[MediaCodecWav]] as the default kernel.
    */
  def decodeAudioFeatures(media: Dataset[MediaRow],
                          kernel: MediaRow => AudioFeatures = MediaCodecWav.decode)
      : Dataset[AudioFeatures] = {
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

  /** Every [[syntheticAudio]] id ≡ this (mod 60) ships a TRUNCATED WAV
    * (the header survives, the data chunk is cut short — the crawl
    * corruption mode), so the degradation path is exercised by every
    * caller.
    */
  val CorruptAudioId = 13L

  /** Deterministic PCM sample formula for synthetic audio (id, j) —
    * pure integer arithmetic in [-2048, 2047], so a codec-less engine
    * (the SQL oracle) predicts the decoded amplitude stats exactly.
    */
  def synthSample(id: Long, j: Int): Int =
    ((id * 37 + j * 11) % 4096).toInt - 2048
  def synthNSamples(id: Long): Int = (id % 50 + 20).toInt
  val SynthAudioRate = 8000

  /** Demo audio table: REAL mono PCM-16 WAV payloads (encoded with
    * [[MediaCodecWav.encodePcm16]]) of [[synthNSamples]] samples filled
    * by [[synthSample]] — PCM is lossless, so [[MediaCodecWav.decode]]
    * recovers the formula values exactly. The corrupt id's payload is
    * truncated after the header.
    */
  def syntheticAudio(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val samples =
        Array.tabulate(synthNSamples(id))(j => synthSample(id, j).toShort)
      val full = MediaCodecWav.encodePcm16(SynthAudioRate, 1, samples)
      val payload =
        if (id % 60 == CorruptAudioId % 60) full.take(48) else full
      MediaRow(id, "audio", payload, None, None,
        sample_rate = Some(SynthAudioRate), duration_ms = None,
        format = Some("wav"))
    }
  }
}
