package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private lazy val media = syntheticMedia(spark, 30)

  test("decodeFeatures: one feature row per media row, deterministic") {
    val feats = decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 30)
    assert(feats.forall(_.feature.length == FeatureDim))
    // determinism: same payload → same checksum/features on a second run
    val again = decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
    // features are payload-dependent, not constant
    assert(feats.map(_.checksum).distinct.length > 1)
  }

  test("decode plan is narrow: no shuffle over the payload bytes") {
    val plan = decodeFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("resize plan: aspect preserved, small items skip the kernel") {
    val planned = withResizePlan(media.toDF(), maxSide = 512)
      .filter(col("kind") === "image")
      .select("width", "height", "target_width", "target_height", "needs_resize")
      .collect()
    assert(planned.nonEmpty)
    planned.foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(tw, th) <= 512)
      if (!r.getBoolean(4)) assert(tw == w && th == h)
      // aspect ratio preserved within integer-floor tolerance
      assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.1)
    }
  }

  test("frame sampling: n evenly spaced offsets within duration, video only") {
    val sampled = withFrameSamples(media.toDF(), nFrames = 4)
    val video = sampled.filter(col("kind") === "video")
      .select("duration_ms", "frame_offsets_ms").collect()
    video.foreach { r =>
      val dur = r.getInt(0)
      val offs = r.getSeq[Int](1)
      assert(offs.length == 4)
      assert(offs.head == 0 && offs.forall(o => o >= 0 && o < dur))
      assert(offs == offs.sorted)
    }
    assert(sampled.filter(col("kind") =!= "video")
      .filter(col("frame_offsets_ms").isNotNull).count() == 0)
  }

  test("imageio kernel: decoded dims and channel means match the pixel formula") {
    val feats = decodeFeatures(syntheticMedia(spark, 12)).collect()
      .filter(f => f.kind == "image").sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.media_id
      assert(f.decode_ok, s"image $id must decode")
      val (w, h) = (synthW(id), synthH(id))
      assert(f.decoded_width.contains(w) && f.decoded_height.contains(h))
      // PNG is lossless: the decoded means equal the formula means exactly
      val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      def mean(c: (Long, Int, Int) => Int) =
        px.map { case (x, y) => c(id, x, y) }.sum.toDouble / (w * h)
      assert(f.mean_r.contains(mean(synthR)), s"mean_r mismatch for $id")
      assert(f.mean_g.contains(mean(synthG)), s"mean_g mismatch for $id")
      assert(f.mean_b.contains(mean(synthB)), s"mean_b mismatch for $id")
    }
  }

  test("corrupt payload degrades to decode_ok=false, never fails the partition") {
    // n=60 includes CorruptImageId (57): an image row whose payload is
    // junk bytes still claiming format=png
    val feats = decodeFeatures(syntheticMedia(spark, 60)).collect()
    val bad = feats.find(_.media_id == CorruptImageId).get
    assert(bad.kind == "image" && !bad.decode_ok)
    assert(bad.decoded_width.isEmpty && bad.mean_r.isEmpty)
    assert(bad.n_bytes > 0) // byte-level stats survive the failed decode
    // every OTHER image row decoded fine in the same pass
    assert(feats.count(f => f.kind == "image" && f.decode_ok) ==
      feats.count(_.kind == "image") - 1)
    // non-image rows never claim a codec decode
    assert(feats.filter(_.kind != "image").forall(f => !f.decode_ok))
  }

  test("wav kernel: encode/decode roundtrip recovers the sample formula") {
    val feats = decodeAudioFeatures(syntheticAudio(spark, 60))
      .collect().sortBy(_.media_id)
    assert(feats.length == 60)
    for (f <- feats if f.media_id != CorruptAudioId) {
      val id = f.media_id
      val n = synthNSamples(id)
      assert(f.decode_ok, s"id $id must decode")
      assert(f.sample_rate.contains(SynthAudioRate) &&
        f.channels.contains(1) && f.bits.contains(16))
      assert(f.n_samples.contains(n.toLong))
      assert(f.duration_ms.contains(n.toLong * 1000 / SynthAudioRate))
      val expMean = (0 until n).map(j => math.abs(synthSample(id, j))).sum
        .toDouble / n
      assert(f.mean_abs_amp.contains(expMean), s"amplitude mismatch for $id")
    }
  }

  test("wav kernel: truncated payload degrades to decode_ok=false, " +
    "never fails the partition") {
    // CorruptAudioId ships a WAV cut 4 bytes into its data chunk: the
    // declared data length outruns the payload, the corruption mode a
    // crawled corpus actually produces
    val feats = decodeAudioFeatures(syntheticAudio(spark, 60)).collect()
    val bad = feats.find(_.media_id == CorruptAudioId).get
    assert(!bad.decode_ok && bad.sample_rate.isEmpty &&
      bad.n_samples.isEmpty && bad.mean_abs_amp.isEmpty)
    assert(feats.count(_.decode_ok) == 59,
      "every intact row in the same pass must decode")
    // defense in depth: junk bytes, short buffers, and a non-PCM format
    // tag all degrade instead of throwing
    def row(payload: Array[Byte]) = MediaRow(99L, "audio", payload,
      None, None, None, None, Some("wav"))
    assert(!MediaCodecWav.decode(row(Array.empty[Byte])).decode_ok)
    assert(!MediaCodecWav.decode(row(Array.fill[Byte](100)(7))).decode_ok)
    val nonPcm = MediaCodecWav.encodePcm16(8000, 1,
      Array.tabulate(8)(_.toShort))
    nonPcm(20) = 3 // format tag -> IEEE float: no JVM kernel, degrade
    assert(!MediaCodecWav.decode(row(nonPcm)).decode_ok)
  }

  test("features join embeddings-style downstream ops (cosine over stub vectors)") {
    import graft.functions.GraftFunctions.cosine
    val f = decodeFeatures(media).toDF()
    val self = f.select(col("media_id").as("id_b"), col("feature").as("fb"))
    val sim = f.select(col("media_id").as("id_a"), col("feature").as("fa"))
      .join(self, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("fa"), col("fb")))
    assert(sim.filter(col("cos").isNull).count() == 0)
    assert(sim.count() == 30L * 29 / 2)
  }
}
