package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hand-computed and structural oracles for the round-11 part-12
  * queries (DuckDB parity runs separately via Verify).
  */
class Queries18Spec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q18s").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q144: a duplicated pair shows as one size-2 component") {
    val txt = "alpha beta gamma delta epsilon zeta eta"
    val dir = docsDir(Seq(
      (1L, txt, "en", "s1"), (2L, txt, "en", "s2"),
      (3L, "one two three four five six seven", "en", "s1")))
    val out = SparkEntry.queries("q144_cluster_histogram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 1L, 1L)), out.mkString("; "))
  }

  test("q145: tiny vocab saturates every coverage point at 1.0") {
    val dir = docsDir(Seq((1L, "a a a b b c", "en", "s1")))
    val out = SparkEntry.queries("q145_vocab_coverage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (100L, 3L, 6L, 6L, 1.0), (500L, 3L, 6L, 6L, 1.0),
      (2000L, 3L, 6L, 6L, 1.0)), out.mkString("; "))
  }

  test("q146: shared opening 3-gram is reported with its source spread") {
    val dir = docsDir(Seq(
      (1L, "intro template words then body one", "en", "s1"),
      (2L, "intro template words then other text", "en", "s2"),
      (3L, "completely different opening here now", "en", "s1")))
    val out = SparkEntry.queries("q146_prefix_dup")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 2L)), out.mkString("; "))
  }

  test("q147: correlations are bounded, null only for constant features") {
    val out = SparkEntry.queries("q147_feature_corr")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 6)
    assert(out.forall(r => r.isNullAt(2) ||
      (r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)),
      out.mkString("; "))
    val names = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(names == Seq(("f1", "f2"), ("f1", "f3"), ("f1", "f4"),
      ("f2", "f3"), ("f2", "f4"), ("f3", "f4")))
  }
}
