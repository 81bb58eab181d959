package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs with known term statistics: "rare" appears only in doc 1,
  // "common" in all four; doc 4 holds gamma ONCE like doc 2 but is 3×
  // longer (pure filler), isolating the length penalty from tf.
  private def docs = Seq(
    (1L, "rare common alpha beta"),
    (2L, "alpha common alpha gamma"),
    (3L, "beta gamma common delta"),
    (4L, "alpha common alpha gamma pad pad pad pad pad pad pad pad")
  ).toDF("doc_id", "text")

  private def topFor(terms: (Int, String)*): Seq[(Long, Long, Long, Double)] = {
    val q = terms.toDF("query_id", "term")
      .select($"query_id".cast("long").as("query_id"), $"term")
    Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 4)
      .as[(Long, Long, Long, Double)].collect().toSeq
  }

  test("rare term outranks a corpus-wide term for the only doc holding it") {
    val hits = topFor(1 -> "rare", 1 -> "common")
    assert(hits.head._3 == 1L, s"doc 1 holds the rare term: $hits")
    // every other doc matches only 'common', whose idf is the
    // all-docs floor ln(0.5/4.5 + 1) — strictly below doc 1's score
    assert(hits.tail.forall(_._4 < hits.head._4), hits.toString)
  }

  test("length normalization: same tf in a 3x longer doc scores lower") {
    // docs 2 and 4 both hold 'gamma' exactly once; the b·len/avgdl
    // penalty must rank the concise doc above the padded one
    val hits = topFor(1 -> "gamma")
    val byDoc = hits.map(h => h._3 -> h._4).toMap
    assert(byDoc(2L) > byDoc(4L),
      s"padded doc must not outrank the concise one: $hits")
  }

  test("multi-term scores sum per doc; k bounds each query independently") {
    val hits = topFor(1 -> "alpha", 1 -> "beta", 2 -> "delta")
    val q1 = hits.filter(_._1 == 1L)
    assert(q1.map(_._2) == (1L to q1.size).toSeq, s"dense 1-based rn: $q1")
    // doc 1 matches alpha+beta, doc 3 matches only beta → doc 1 above
    val byDoc = q1.map(h => h._3 -> h._4).toMap
    assert(byDoc(1L) > byDoc(3L), q1.toString)
    // query 2: only doc 3 contains delta
    assert(hits.filter(_._1 == 2L).map(_._3) == Seq(3L), hits.toString)
  }

  test("k truncates: top-1 keeps exactly one row per query") {
    val q = Seq(1 -> "common").toDF("query_id", "term")
      .select($"query_id".cast("long").as("query_id"), $"term")
    val hits = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 1).collect()
    assert(hits.length == 1 && hits.head.getLong(1) == 1L, hits.mkString(","))
  }

  private def ranking(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rn")

  test("rrfFuse: a doc on both lists outranks the same rank on one") {
    // doc 10 is rank 2 on both lists; docs 11/12 are rank 1 on one
    // list only: 2/(60+2) > 1/(60+1), so consensus wins
    val a = ranking((1L, 11L, 1L), (1L, 10L, 2L))
    val b = ranking((1L, 12L, 1L), (1L, 10L, 2L))
    val out = Retrieval.rrfFuse(Seq(a, b), c = 60, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.head._2 == 10L, s"consensus doc first: ${out.toSeq}")
    val byDoc = out.map(r => r._2 -> r._3).toMap
    val one = BigDecimal(1.0 / 61.0).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val two = BigDecimal(2 * BigDecimal(1.0 / 62.0).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(10L) == two && byDoc(11L) ==
      BigDecimal(one).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"rrf arithmetic must match the rounded reciprocals: ${out.toSeq}")
  }

  test("rrfFuse: queries fuse independently and k truncates each") {
    val a = ranking((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
    val b = ranking((1L, 11L, 1L), (2L, 21L, 1L))
    val out = Retrieval.rrfFuse(Seq(a, b), c = 60, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // q1: doc 11 holds ranks 2+1 > doc 10's single rank 1; q2 ties on
    // score (both rank 1 on one list) → doc_id breaks the tie
    assert(out.toSeq == Seq((1L, 11L), (2L, 20L)), out.toSeq.toString)
  }

  test("bm25 index round-trip: probe equals the direct ranking exactly") {
    val q = Seq(1 -> "rare", 1 -> "common", 2 -> "gamma")
      .toDF("query_id", "term")
      .select($"query_id".cast("long").as("query_id"), $"term")
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 4)
      .collect().map(_.toSeq).toSeq
    Retrieval.writeBm25Index(docs, "doc_id", "text",
      "graft_spec_bm25", buckets = 2)
    val probed = Retrieval.probeBm25Index(spark, "graft_spec_bm25",
      "doc_id", q, k = 4).collect().map(_.toSeq).toSeq
    assert(probed == direct,
      s"index must lose nothing:\n index: $probed\n direct: $direct")
  }

  test("bm25 index: new query batches answer without rebuilding") {
    // the index written by the round-trip test (or here) serves a
    // DIFFERENT query set — the build-once-probe-many contract
    Retrieval.writeBm25Index(docs, "doc_id", "text",
      "graft_spec_bm25b", buckets = 2)
    val q2 = Seq(7 -> "delta").toDF("query_id", "term")
      .select($"query_id".cast("long").as("query_id"), $"term")
    val hits = Retrieval.probeBm25Index(spark, "graft_spec_bm25b",
      "doc_id", q2, k = 4).collect()
    assert(hits.map(_.getLong(2)).toSeq == Seq(3L),
      s"only doc 3 holds delta: ${hits.mkString(",")}")
  }

  test("rrfFuse: invalid arguments rejected") {
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq.empty) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(ranking((1L, 1L, 1L))), c = -1)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(ranking((1L, 1L, 1L))), k = 0)
    }
  }
}
