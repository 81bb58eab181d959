package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hand-computed oracles for the round-11 part-9 audit queries (DuckDB
  * parity runs separately via Verify): a constructed lang-ID confusion,
  * a three-doc snapshot diff, an exact-probability entropy, and a
  * one-shared-shingle overlap matrix.
  */
class Queries15Spec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q15s").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q132: mislabeled doc lands in the guessed row with its share") {
    // 'table row' are the en markers; the de-labeled doc using them is
    // the confusion cell (de -> en), share 1.0 of the de row
    val dir = docsDir(Seq(
      (1L, "table row table", "en", "s1"),
      (2L, "table row", "de", "s1"),
      (3L, "batch merge merge", "de", "s1")))
    val out = SparkEntry.queries("q132_langid_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("de", "de", 1L, 0.5), ("de", "en", 1L, 0.5),
      ("en", "en", 1L, 1.0)), out.mkString("; "))
  }

  test("q133: mod-3 snapshots diff into retained/added/removed + churn") {
    // old = {1,2} (A,B), new = {2,3} (B,C): retained B, removed A,
    // added C, churn (1+1)/(2+2) = 0.5
    val dir = docsDir(Seq(
      (1L, "text alpha", "en", "s1"),
      (2L, "text beta", "en", "s1"),
      (3L, "text gamma", "en", "s1")))
    val out = SparkEntry.queries("q133_corpus_diff")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getDouble(6)) == ((2L, 2L, 1L, 1L, 1L, 0.5)),
      r.toString)
  }

  test("q134: exact dyadic distribution gives the closed-form entropy") {
    // counts 4,2,1,1 over 8 tokens: p = .5,.25,.125,.125 ->
    // H = 1.75 bits = 1.213008 nats (round-9 ln terms), norm = H/ln(4)
    val dir = docsDir(Seq((1L, "a a a a b b c d", "en", "s1")))
    val out = SparkEntry.queries("q134_token_entropy")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 8L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 1.213008, s"H ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.875, s"norm ${r.getDouble(4)}")
  }

  test("q135: one shared shingle yields jaccard 1/3") {
    // s1 grams {abc,bcd}, s2 grams {bcd,cde}: shared 1, union 3
    val dir = docsDir(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "b c d e", "en", "s2")))
    val out = SparkEntry.queries("q135_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("s1", "s2", 1L, 0.333333)),
      out.mkString("; "))
  }
}
