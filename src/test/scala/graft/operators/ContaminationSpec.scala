package graft.operators

import graft.SparkSpec

/** [[Contamination.cut]]: contaminated documents removed at the
  * threshold, clean and unshingleable (short) documents kept, schema
  * preserved, and the threshold boundary exact.
  */
class ContaminationSpec extends SparkSpec {

  import spark.implicits._

  // test set: one benchmark doc; corpus: a verbatim copy (100% overlap),
  // a doc sharing exactly one of its 8 shingles, a clean doc, a 2-token
  // doc (unshingleable)
  private val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    .toDF("doc_id", "text")
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy
    (2L, "one two three alpha beta gamma four five six seven"),       // 1 shared shingle
    (3L, "totally unrelated words nothing shared here at all now"),   // clean
    (4L, "too short")                                                 // < 3 tokens
  ).toDF("doc_id", "text")

  test("cut removes overlap >= threshold, keeps clean and short docs") {
    val kept = Contamination.cut(corpus, bench, "doc_id", "text",
      minOverlapFrac = 0.5).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L),
      s"only the verbatim copy crosses 50% overlap, got $kept")

    // doc 2: 1 shared of 8 shingles = 0.125 — a 0.1 threshold cuts it too
    val strict = Contamination.cut(corpus, bench, "doc_id", "text",
      minOverlapFrac = 0.1).collect().map(_.getLong(0)).toSet
    assert(strict == Set(3L, 4L), strict)
  }

  test("scores reports the exact overlap fractions") {
    val s = Contamination.scores(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s(1L) == ((8L, 8L)), "verbatim copy shares all 8 shingles")
    assert(s(2L) == ((1L, 8L)), "one 3-gram window matches")
    assert(!s.contains(3L) && !s.contains(4L),
      "clean/short docs produce no score row at all")
  }

  test("cut preserves the corpus schema") {
    val kept = Contamination.cut(corpus, bench, "doc_id", "text", 0.5)
    assert(kept.schema == corpus.schema)
  }
}
