package graft.operators

import graft.SparkSpec

/** [[QualityProbe]]: hand-checked GD arithmetic, separation on
  * separable seeds, and determinism of the frozen-weight scoring.
  */
class QualityProbeSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("trainLinear: two GD rounds match the hand-computed updates") {
    // rows ([1,1], y=1) and ([1,0], y=0), lr=0.5, w starts [0,0]:
    // round 1: errs (-1, 0) → grads (-0.5, -0.5)   → w [0.25, 0.25]
    // round 2: errs (-0.5, 0.25) → grads (-0.125, -0.25)
    //                                              → w [0.3125, 0.375]
    val seed = Seq((Seq(1.0, 1.0), 1.0), (Seq(1.0, 0.0), 0.0)).toDF("x", "y")
    val w1 = QualityProbe.trainLinear(seed, "x", "y", dims = 2, iters = 1, lr = 0.5)
    assert(w1.toSeq == Seq(0.25, 0.25), s"after 1 round: ${w1.toSeq}")
    val w2 = QualityProbe.trainLinear(seed, "x", "y", dims = 2, iters = 2, lr = 0.5)
    assert(w2.toSeq == Seq(0.3125, 0.375), s"after 2 rounds: ${w2.toSeq}")
  }

  test("separable seeds: positives score above negatives after training") {
    // positives have high x1, negatives low — a separating direction
    val seed = Seq(
      (Seq(1.0, 0.9), 1.0), (Seq(1.0, 0.8), 1.0), (Seq(1.0, 0.95), 1.0),
      (Seq(1.0, 0.1), 0.0), (Seq(1.0, 0.2), 0.0), (Seq(1.0, 0.05), 0.0)
    ).toDF("x", "y")
    val w = QualityProbe.trainLinear(seed, "x", "y", dims = 2, iters = 10, lr = 0.5)
    val scores = Seq(Tuple1(Seq(1.0, 0.9)), Tuple1(Seq(1.0, 0.1))).toDF("x")
      .select(QualityProbe.scoreCol($"x", w.toSeq).as("s"))
      .collect().map(_.getDouble(0))
    assert(scores(0) > scores(1),
      s"positive-like must outscore negative-like: ${scores.toSeq}")
  }

  test("deterministic: same seeds give identical weights across runs and partitionings") {
    val rows = (0 until 40).map { i =>
      (Seq(1.0, i / 40.0, (i % 7) / 7.0), if (i % 2 == 0) 1.0 else 0.0)
    }
    val w1 = QualityProbe.trainLinear(rows.toDF("x", "y"),
      "x", "y", dims = 3, iters = 3, lr = 0.5)
    val w8 = QualityProbe.trainLinear(rows.toDF("x", "y").repartition(8),
      "x", "y", dims = 3, iters = 3, lr = 0.5)
    assert(w1.toSeq == w8.toSeq,
      s"decimal-exact gradients must not depend on partitioning: ${w1.toSeq} vs ${w8.toSeq}")
  }
}
