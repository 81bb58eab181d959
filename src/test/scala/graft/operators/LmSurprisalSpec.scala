package graft.operators

import graft.SparkSpec

/** [[TextAnalysis.lmSurprisal]]: corpus-counted bigram surprisal —
  * repeated transitions score low, novel ones high, sub-bigram docs are
  * excluded, and the score is a pure function of the corpus (re-run
  * stable).
  */
class LmSurprisalSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (3L, "zq xv qj vx jq"), // transitions seen nowhere else
    (4L, "single"), // no bigram -> excluded
    (5L, "the cat sat on the mat") // exact dup of 1: identical score
  ).toDF("doc_id", "text")

  test("repeated transitions score lower than corpus-unique ones; dups tie") {
    val got = TextAnalysis.lmSurprisal(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L), got.toSeq)
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == byId(5L), "identical docs must score identically")
    assert(byId(3L) > byId(1L),
      s"gibberish must out-surprise common transitions: $byId")
    assert(got.find(_._1 == 1L).get._2 == 5L, "6 tokens -> 5 bigrams")
  }

  test("score is re-run deterministic (no float-order dependence)") {
    val a = TextAnalysis.lmSurprisal(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.getDouble(2)).toSeq
    val b = TextAnalysis.lmSurprisal(docs.repartition(7), "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.getDouble(2)).toSeq
    assert(a == b, s"$a vs $b")
  }
}
