package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Structural oracles for the round-15 recall harness (DuckDB parity
  * runs separately via Verify at three scales).
  */
class Queries22Spec extends SparkSpec {

  import spark.implicits._

  // 80 docs (>= 12 tokens each, distinct vocab per doc plus a shared
  // tail so rung-1 candidates exist) + 80 deterministic pseudo-random
  // unit-ish embeddings — enough rows for the harness's 64-doc test cut
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-q22s").toString
    val docs = (0 until 80).map { i =>
      val own = (0 until 10).map(w => s"w${i}x$w").mkString(" ")
      (i.toLong, s"$own common tail words here", "en", "s1")
    }
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val embs = (0 until 80).map { i =>
      val v = Array.tabulate(64) { k =>
        (math.sin(i * 64 + k + 1) * 0.3).toFloat
      }
      (i.toLong, v, i % 3)
    }
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val rows: Map[String, (Long, Long, Long, Double)] =
    SparkEntry.queries("q165_decontam_recall")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("one row per rung, hits bounded by possible and candidates") {
    assert(rows.keySet == Set("r1_verbatim", "r2_edited",
      "r3_semantic_np1", "r3_semantic_np2", "r3_semantic_npfull",
      "r3_semantic_multi", "r4_span_embedded"), rows.keySet)
    rows.foreach { case (rung, (cand, hits, possible, recall)) =>
      assert(hits <= possible, s"$rung: hits $hits > possible $possible")
      assert(hits <= cand, s"$rung: hits $hits > candidates $cand")
      assert(possible == 64L, s"$rung: possible $possible")
      assert(math.abs(recall - hits.toDouble / 64) < 1e-9, s"$rung: $recall")
    }
  }

  test("verbatim plants are always caught — the harness's sanity anchor") {
    assert(rows("r1_verbatim")._4 == 1.0, rows("r1_verbatim"))
  }

  test("span plants are always caught — coverage is host-length-" +
    "invariant, so the right detector needs no dial") {
    assert(rows("r4_span_embedded")._4 == 1.0, rows("r4_span_embedded"))
  }

  test("the nprobe dial is monotone in both recall and candidate cost") {
    val np1 = rows("r3_semantic_np1")
    val np2 = rows("r3_semantic_np2")
    val full = rows("r3_semantic_npfull")
    assert(np1._2 <= np2._2 && np2._2 <= full._2,
      s"hits not monotone: ${np1._2}, ${np2._2}, ${full._2}")
    assert(np1._1 <= np2._1 && np2._1 <= full._1,
      s"candidates not monotone: ${np1._1}, ${np2._1}, ${full._1}")
  }

  test("q168: the table dial is monotone in both recall and candidate " +
    "cost, and the 8-table row agrees with q165's multi row") {
    val dial = SparkEntry.queries("q168_semantic_table_dial")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(dial.keySet == Set(2L, 4L, 8L), dial.keySet)
    assert(dial(2L)._1 <= dial(4L)._1 && dial(4L)._1 <= dial(8L)._1,
      s"candidates not monotone: $dial")
    assert(dial(2L)._2 <= dial(4L)._2 && dial(4L)._2 <= dial(8L)._2,
      s"hits not monotone: $dial")
    // the 8-table sweep point IS q165's r3_semantic_multi configuration
    // on the identical fixture — the two relations must agree exactly
    val multi = rows("r3_semantic_multi")
    assert(dial(8L) == ((multi._1, multi._2)),
      s"q168@8 ${dial(8L)} != q165 multi row (${multi._1}, ${multi._2})")
  }

  test("the multi-table rung reports its own cost/recall row (hits " +
    "within bounds, candidates charge per-table agreements)") {
    val m = rows("r3_semantic_multi")
    // with 8 tables a pair may be counted up to 8 times on the cost
    // side, so candidates can exceed pair count but never fall below
    // hits; the at-scale recall assertion lives in the 100x receipt
    // (BASELINE.md), not this 80-row fixture
    assert(m._2 >= 1L, s"the planted copies must produce some hits: $m")
  }
}
