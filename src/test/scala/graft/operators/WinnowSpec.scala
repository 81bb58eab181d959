package graft.operators

import graft.SparkSpec

/** [[Dedup.winnowFingerprints]] / [[Dedup.winnowPairs]]: the winnowing
  * guarantee (a shared run of w+k−1 tokens ⇒ a shared fingerprint),
  * the short-document edge, the boilerplate df cap, and the storage
  * bound.
  */
class WinnowSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val K = 4; private val W = 5; private val Seed = 11

  private def fps(texts: (Long, String)*) =
    texts.toDF("doc_id", "text").select($"doc_id",
      Dedup.winnowFingerprints(split($"text", " "), K, W, Seed).as("fps"))

  test("winnowing guarantee: any shared (w+k-1)-token run yields a shared fingerprint") {
    // W + K - 1 = 8 shared tokens embedded in otherwise-disjoint docs,
    // at different offsets (position-robustness is the point vs q10)
    val run = (0 until 8).map(i => s"shared$i").mkString(" ")
    val a = (0 until 30).map(i => s"a$i").mkString(" ") + " " + run
    val b = run + " " + (0 until 30).map(i => s"b$i").mkString(" ")
    val out = Dedup.winnowPairs(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      "doc_id", "text", K, W, Seed, minShared = 1L, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)),
      "an 8-token shared run must surface at least one shared fingerprint")
  }

  test("disjoint documents share nothing") {
    val a = (0 until 40).map(i => s"a$i").mkString(" ")
    val b = (0 until 40).map(i => s"b$i").mkString(" ")
    val out = Dedup.winnowPairs(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      "doc_id", "text", K, W, Seed, minShared = 1L, maxDf = 10L)
    assert(out.count() == 0L)
  }

  test("documents without a complete window fingerprint to the empty set") {
    // w+k-1 = 8 tokens is the minimum carrying one full window
    val out = fps((1L, (0 until 7).map(i => s"t$i").mkString(" ")),
        (2L, "a b"), (3L, (0 until 8).map(i => s"t$i").mkString(" ")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).size).toMap
    assert(out(1L) == 0 && out(2L) == 0, "below w+k-1 tokens → no fingerprints")
    assert(out(3L) == 1, "exactly w+k-1 tokens → exactly one window")
  }

  test("df cap drops boilerplate fingerprints") {
    val boiler = (0 until 20).map(i => s"x$i").mkString(" ")
    val docs = (1L to 4L).map(id => (id, boiler)).toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(docs, "doc_id", "text", K, W, Seed,
      minShared = 1L, maxDf = 3L)
    assert(capped.count() == 0L,
      "fingerprints held by > maxDf docs are boilerplate, not matches")
    val uncapped = Dedup.winnowPairs(docs, "doc_id", "text", K, W, Seed,
      minShared = 1L, maxDf = 4L)
    assert(uncapped.count() == 6L, "all C(4,2) pairs once the cap admits df=4")
  }

  test("storage bound: fingerprints are a fraction of the shingle count") {
    val text = (0 until 200).map(i => s"w${i * 7 % 131}").mkString(" ")
    val n = fps((1L, text)).collect().head.getSeq[Long](1).size
    val shingleCount = 200 - K + 1
    assert(n <= shingleCount * 2 / (W + 1) + W,
      s"winnowing must select ~2/(w+1) of shingles, got $n of $shingleCount")
  }
}
