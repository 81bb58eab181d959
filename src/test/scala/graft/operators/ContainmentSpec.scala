package graft.operators

import graft.SparkSpec

/** [[Dedup.containmentPairs]]: the doc-inside-doc case — full
  * containment detected at low jaccard (where the minhash path's
  * recall vanishes), directional scores, the df cap, and determinism.
  */
class ContainmentSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  // 12-token snippet quoted whole inside a 120-token article:
  // jaccard ≈ 10/118 ≈ 0.08, containment(snippet) = 1.0
  private val snippet = (0 until 12).map(i => s"q$i").mkString(" ")
  private val article =
    (0 until 110).map(i => s"body$i").mkString(" ") + " " + snippet

  test("full containment at low jaccard is found; jaccard confirms it is low") {
    val docs = Seq((1L, snippet), (2L, article)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
        minShared = 2L, maxDf = 10L, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq.map(t => (t._1, t._2, t._3)) == Seq((1L, 2L, 1.0)),
      s"the snippet's shingles are all in the article: ${out.toSeq}")
    assert(out.head._4 < 0.15, s"direction matters: ${out.head}")
    // the motivating gap: this pair's jaccard is far below the q11/q36
    // threshold, so the jaccard path would never pair them
    val sh = docs.select($"doc_id",
      array_distinct(Dedup.shingleHashes3(
        Dedup.wordHashes(split($"text", " ")))).as("sh"))
    val jac = sh.as("a").join(sh.as("b"),
        $"a.doc_id" < $"b.doc_id")
      .select(Dedup.jaccard($"a.sh", $"b.sh").as("j"))
      .collect().head.getDouble(0)
    assert(jac < 0.15, s"containment must catch what jaccard ($jac) misses")
  }

  test("disjoint and sub-threshold pairs excluded; deterministic") {
    val docs = Seq(
      (1L, snippet),
      (2L, article),
      (3L, (0 until 40).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    def run() = Dedup.containmentPairs(docs, "doc_id", "text", 2L, 10L, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run() == Seq((1L, 2L)))
    assert(run() == run())
  }

  test("df cap drops boilerplate shingles before pairing") {
    // the same text in 5 docs: every shingle has df 5 > maxDf 4 → no pairs
    val docs = (1L to 5L).map(id => (id, snippet + " " + ("x" * 3)))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", 2L, 4L, 0.9)
    assert(capped.count() == 0L)
    val uncapped = Dedup.containmentPairs(docs, "doc_id", "text", 2L, 5L, 0.9)
    assert(uncapped.count() == 10L, "C(5,2) identical pairs once df admits 5")
  }
}
