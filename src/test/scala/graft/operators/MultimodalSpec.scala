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
