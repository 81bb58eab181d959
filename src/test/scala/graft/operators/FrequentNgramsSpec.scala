package graft.operators

import graft.SparkSpec

/** [[TextAnalysis.frequentNgrams]]: counts are DOCUMENT frequency (a doc
  * repeating its own n-gram counts once), the minDf cut is exact, and
  * short docs contribute nothing.
  */
class FrequentNgramsSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "terms of service apply here"),
    (2L, "terms of service apply now"),
    (3L, "terms of service terms of service"), // repeats its own 3-gram
    (4L, "unique words only in this document"),
    (5L, "of service")                         // < 3 tokens: no n-grams
  ).toDF("doc_id", "text")

  test("df not tf; minDf cut exact") {
    val out = TextAnalysis.frequentNgrams(docs, "text", n = 3, minDf = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs 1, 2, 3 all contain it; doc 3's double occurrence counts once
    assert(out("terms of service") == 3L, out)
    // "of service apply" appears in docs 1 and 2
    assert(out("of service apply") == 2L, out)
    // nothing from the df=1 tail survives the cut
    assert(out.values.forall(_ >= 2L), out)
    assert(!out.keySet.exists(_.contains("unique")), out)
  }

  test("plan: partial aggregation before the shuffle") {
    val p = TextAnalysis.frequentNgrams(docs, "text", 3, 2L)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_"), p)
  }
}
