package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The extractor-output parse ladder (llm_parse.py:78-94): fence strip →
  * {...} boundary slice → wrap-in-braces fallback for fence-less
  * key:value text → trailing-comma fixup.
  */
class EnrichFallbackSpec extends SparkSpec {

  import spark.implicits._

  private def run(raw: String): (Option[String], Long) = {
    val articles = Seq(("u1", "T")).toDF("url", "title")
    val bodies = Seq(("u1", "some body text")).toDF("url", "body")
    val llmRaw = Seq(("u1", raw)).toDF("url", "raw")
    val (accepted, rejects) = Stages.enrichSplit(articles, bodies, llmRaw)
    val company = accepted.select("company_name").collect()
      .headOption.map(_.getString(0))
    (company, rejects.count())
  }

  test("fenced JSON parses via the boundary slice") {
    val (c, r) = run("```json\n{\"company_name\": \"Acme\"}\n```")
    assert(c.contains("Acme") && r == 0)
  }

  test("brace-less key:value output is wrapped in braces and parsed") {
    // the reference wraps `"k": "v"` text in {} when no brace span exists
    val (c, r) = run("\"company_name\": \"Borg\", \"funding_round\": \"Seed\"")
    assert(c.contains("Borg") && r == 0)
  }

  test("brace-less output with a trailing comma still parses") {
    val (c, r) = run("\"company_name\": \"Ceres\",")
    assert(c.contains("Ceres") && r == 0)
  }

  test("fenced brace-less output is unfenced before wrapping") {
    val (c, r) = run("```json\n\"company_name\": \"Delta\"\n```")
    assert(c.contains("Delta") && r == 0)
  }

  test("unparseable prose is rejected as no_company, not an error") {
    val (c, r) = run("I could not find any funding information.")
    assert(c.isEmpty && r == 1)
  }

  test("the parse ladder is identical through the Extractor interface") {
    // FixtureExtractor — the hermetic default — produces the same
    // accepted/rejected split as passing the raw table directly
    val articles = Seq(("u1", "T"), ("u2", "U")).toDF("url", "title")
    val bodies = Seq(("u1", "body one"), ("u2", "body two")).toDF("url", "body")
    val llmRaw = Seq(
      ("u1", "```json\n{\"company_name\": \"Acme\"}\n```"),
      ("u2", "no json here")).toDF("url", "raw")
    val ex: Extractor = new FixtureExtractor(llmRaw)
    val (accepted, rejects) =
      Stages.enrichSplit(articles, bodies, ex.rawOutputs(articles, bodies))
    assert(col1[String](accepted.select("company_name")) == Seq("Acme"))
    assert(col1[String](rejects.select("reason")) == Seq("no_company"))
  }

  test("UdfExtractor builds the reference prompt and survives transport failure") {
    // transport echoes JSON derived from the prompt it received, so the
    // assertion proves the {context} substitution happened; for one url
    // it throws, which must become a null raw → reject, not an error
    val transport: String => String = { prompt =>
      assert(prompt.contains("precise financial data extraction model"))
      if (prompt.contains("explode please")) throw new RuntimeException("boom")
      val ctx = prompt.substring(prompt.indexOf("TEXT:") + 6).trim
      s"""{"company_name": "FROM:$ctx"}"""
    }
    val articles = Seq(("u1", "T"), ("u2", "U"), ("u3", "V")).toDF("url", "title")
    val bodies = Seq(("u1", "alpha body"), ("u2", "explode please"))
      .toDF("url", "body") // u3 has NO body → empty_body reject
    val ex = new UdfExtractor(transport, limiterName = "testExtract", perSecond = 1000.0)
    val (accepted, rejects) =
      Stages.enrichSplit(articles, bodies, ex.rawOutputs(articles, bodies))
    assert(col1[String](accepted.select("company_name")) == Seq("FROM:alpha body"))
    assert(rejects.count() == 2) // transport failure + missing body
  }
}
