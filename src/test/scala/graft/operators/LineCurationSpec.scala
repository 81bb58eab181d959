package graft.operators

import graft.SparkSpec

/** [[TextAnalysis.dedupLines]] / [[TextAnalysis.scrubBoilerplateLines]]:
  * the line-level curation rewrites (RefinedWeb's repeated-line removal
  * and the cross-document boilerplate scrub).
  */
class LineCurationSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("dedupLines keeps the FIRST occurrence of each line, in order — " +
    "the array_distinct ordering contract the operator depends on") {
    val df = Seq(
      (1L, "b\na\nb\nc\na"),
      (2L, "x\nx\nx"),
      (3L, "only")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextAnalysis.dedupLines($"text").as("clean"),
        TextAnalysis.dupLineCount($"text").as("n"))
      .orderBy($"doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("b\na\nc", 2L), ("x", 2L), ("only", 0L)),
      s"first-occurrence order must be preserved: ${out.toSeq}")
  }

  test("dedupLines with a custom separator treats the separator " +
    "literally (regex metacharacters quoted)") {
    val df = Seq((1L, "a|b|a")).toDF("doc_id", "text")
    val out = col1[String](df.select(
      TextAnalysis.dedupLines($"text", sep = "|")))
    assert(out == Seq("a|b"), s"got $out")
  }

  test("scrubBoilerplateLines: lines above maxDf scrub everywhere, " +
    "df == maxDf survives (strict >), untouched docs pass through " +
    "byte-identical with n_scrubbed = 0") {
    // banner in 3 docs, shared pair-line in exactly 2, signatures unique
    val df = Seq(
      (1L, "BANNER\nkeep one\nPAIR\nsig 1"),
      (2L, "BANNER\nPAIR\nsig 2"),
      (3L, "BANNER\nsig 3\nBANNER"),
      (4L, "sig 4\nuntouched line")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplateLines(df, "doc_id", "text",
        maxDf = 2L)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "keep one\nPAIR\nsig 1", 1L),
      (2L, "PAIR\nsig 2", 1L),
      // within-doc repeats scrub at every position (df counted once
      // per doc, but the REWRITE removes all copies)
      (3L, "sig 3", 2L),
      (4L, "sig 4\nuntouched line", 0L)
    ), s"got ${out.toSeq}")
  }

  test("scrubBoilerplateLines: a doc that is ALL boilerplate rewrites " +
    "to the empty string, not a dropped row") {
    val df = Seq(
      (1L, "AD"), (2L, "AD"), (3L, "AD"), (4L, "AD\ncontent")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplateLines(df, "doc_id", "text",
        maxDf = 3L)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 4, "the scrub is a rewrite, never a row filter")
    assert(out(0) == ((1L, "", 1L)) && out(3) == ((4L, "content", 1L)),
      s"got ${out.toSeq}")
  }

  test("scrubBoilerplateLines composes with dedupLines: within-doc " +
    "copies do not inflate document frequency") {
    // "SPAM" appears 5 times but only in 2 documents — df = 2 <= maxDf,
    // so the scrub must NOT fire even though raw occurrences exceed it
    val df = Seq(
      (1L, "SPAM\nSPAM\nSPAM\nSPAM\na"),
      (2L, "SPAM\nb"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplateLines(df, "doc_id", "text",
        maxDf = 2L)
      .agg(sum($"n_scrubbed")).collect()(0).getLong(0)
    assert(out == 0L,
      "document frequency counts each line once per doc; " +
        "within-doc repeats are dedupLines' job")
  }
}
