package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs (1, 2) speak "ml data train"; doc 3 parrots the target
  // vocabulary, doc 4 speaks off-domain vocabulary only
  private def docs = Seq(
    (1L, "tgt", "ml data train ml data"),
    (2L, "tgt", "train ml data train"),
    (3L, "raw", "ml data train"),
    (4L, "raw", "cooking recipe flour sugar butter")
  ).toDF("doc_id", "source", "text")

  private def weights(buckets: Int = 256, seed: Int = 7) =
    Dsir.importanceWeights(docs, "doc_id", "text",
      isTarget = $"source" === "tgt", buckets = buckets, seed = seed)

  test("target-vocabulary doc outweighs the off-domain doc") {
    val w = weights().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 4, "every doc gets a weight")
    assert(w(3L) > w(4L),
      s"doc 3 resembles the target, doc 4 does not: $w")
    // off-domain grams never occur in the target model → every one of
    // doc 4's bucket ratios is the smoothed-zero penalty → negative sum
    assert(w(4L) < 0.0, s"pure off-domain weight must be negative: $w")
  }

  test("per-gram weighting: repeating target vocabulary scales the weight") {
    // the target model needs enough gram mass that its vocabulary's
    // smoothed share EXCEEDS the raw share (tiny targets are
    // smoothing-dominated and every ratio goes negative): one long
    // target doc + heavy off-domain raw mass gives the target buckets
    // positive log-ratios, so 3x the occurrences → ~3x the weight
    val rep = Seq(
      (1L, "tgt", Seq.fill(8)("ml data").mkString(" ")),
      (2L, "raw", "ml data"),
      (3L, "raw", "ml data ml data ml data"),
      (4L, "raw", ("cooking recipe flour sugar butter oven whisk salt " +
        "pepper stir bake pan cool serve taste garnish slice dice chop " +
        "boil simmer roast grill steam fry blend knead proof glaze"))
    ).toDF("doc_id", "source", "text")
    val w = Dsir.importanceWeights(rep, "doc_id", "text",
        isTarget = $"source" === "tgt", buckets = 64, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(3L) > w(2L) && w(2L) > 0.0,
      s"more target-gram occurrences → higher weight: $w")
  }

  test("selectTopN: rank is dense, ordered by weight then id, cut at n") {
    val top = Dsir.selectTopN(weights(), "doc_id", n = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(top.map(_._1) == Seq(1L, 2L, 3L), s"dense 1-based rank: $top")
    assert(top.map(_._3) == top.map(_._3).sorted.reverse,
      s"descending by weight: $top")
    assert(!top.map(_._2).contains(4L), s"the off-domain doc is cut: $top")
  }

  test("weights are reproducible across runs (pure hash + count arithmetic)") {
    val a = weights().collect().map(_.toSeq).toSet
    val b = weights().collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
