package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hand-computed oracles for the round-11 part-6 queries (DuckDB
  * parity runs separately via Verify): LOO influence on symmetric
  * sources, bitext margin on axis-aligned duplicates, the
  * Iglewicz–Hoaglin MAD gate on a constructed outlier, and Heaps' fit
  * on an all-new-types corpus.
  */
class Queries12Spec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-q12s").toString

  private def writeDocs(dir: String,
                        rows: Seq[(Long, String, String, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("q120: symmetric sources have zero influence and equal LOO slopes") {
    val dir = tmp()
    // s1 and s2 hold identical (x, y) point sets, so removing either
    // leaves the same regression -> influence exactly 0 for both
    writeDocs(dir, Seq(
      (1L, "a b", "en", "s1", 3L),
      (2L, "a b c d a b c d", "en", "s1", 15L),
      (3L, "a b", "en", "s2", 3L),
      (4L, "a b c d a b c d", "en", "s2", 15L)))
    val out = SparkEntry.queries("q120_loo_influence")(spark, dir).collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(3) == 0.0), out.mkString("; "))
    assert(out(0).getDouble(2) == out(1).getDouble(2), "equal LOO slopes")
  }

  test("q121: axis-aligned duplicates mine with margin 4 at k=4") {
    import spark.implicits._
    val dir = tmp()
    def axis(i: Int): Seq[Float] =
      Seq.tabulate(4)(d => if (d == i) 1f else 0f)
    val vecs = (0 until 4).map(i => (i + 1L, axis(i), 0)) ++
      (0 until 4).map(i => (i + 11L, axis(i), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q121_bitext_margin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    // each a_i's only cosine-1 partner is its twin b_i; both
    // neighborhood means are (1+0+0+0)/4 = 0.25 -> margin 1/0.25 = 4
    assert(out.toSeq == (1L to 4L).map(i => (i, i + 10L, 1.0, 4.0)),
      out.mkString("; "))
  }

  test("q122: Iglewicz-Hoaglin gate flags the single constructed outlier") {
    val dir = tmp()
    val rows = (1 to 9).map(i =>
      (i.toLong, "t", "xx", "s1", i.toLong)) :+ (10L, "t", "xx", "s1", 1000L)
    writeDocs(dir, rows)
    val out = SparkEntry.queries("q122_mad_outliers")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // lengths 1..9,1000: median 5.5; |v-med| medians -> MAD 2.5;
    // threshold 3.5*2.5/0.6745 = 12.97 -> only the 1000 row exceeds it
    assert(r.getString(0) == "xx" && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 5.5 && r.getDouble(3) == 2.5)
    assert(r.getLong(4) == 1L)
  }

  test("q123: a corpus where every token is a new type fits beta = 1") {
    val dir = tmp()
    writeDocs(dir, Seq(
      (1L, "w1 w2", "en", "s1", 5L),
      (2L, "w3 w4", "en", "s1", 5L),
      (3L, "w5 w6", "en", "s1", 5L)))
    val out = SparkEntry.queries("q123_heaps_fit")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L, "n_points")
    assert(r.getLong(2) == 6L, "total_tokens")
    assert(r.getLong(3) == 6L, "vocab")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-5, s"beta ${r.getDouble(4)}")
  }
}
