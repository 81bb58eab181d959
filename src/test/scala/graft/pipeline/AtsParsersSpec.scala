package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AtsParsersSpec extends SparkSpec {

  private def parse(provider: String, payload: String,
                    base: String = "https://x.example/careers"): Seq[Row] = {
    import spark.implicits._
    Seq((provider, payload, base)).toDF("provider", "payload", "base")
      .select(explode(AtsParsers.parseJobs(col("provider"), col("payload"), col("base"))).as("j"))
      .select("j.*").collect().toSeq
  }

  test("Greenhouse: jobs array, location.name, updated_at ?? created_at") {
    val payload =
      """{"jobs": [
        |  {"title": " Senior Software Engineer ", "location": {"name": "Remote"},
        |   "absolute_url": "https://boards.greenhouse.io/x/jobs/1",
        |   "updated_at": "2026-08-05T00:00:00Z", "created_at": "2026-08-01T00:00:00Z"},
        |  {"title": "ML Engineer", "location": null,
        |   "absolute_url": "https://boards.greenhouse.io/x/jobs/2",
        |   "updated_at": null, "created_at": "2026-07-01T09:30:00Z"}
        |]}""".stripMargin
    val rows = parse("Greenhouse", payload)
    assert(rows.map(_.getString(0)) == Seq("Senior Software Engineer", "ML Engineer"))
    assert(rows.head.getString(1) == "Remote")
    assert(rows.head.getTimestamp(3).toString == "2026-08-05 00:00:00.0")
    assert(rows(1).getTimestamp(3).toString == "2026-07-01 09:30:00.0") // created fallback
  }

  test("Lever: text/categories.location/hostedUrl, epoch-millis createdAt ?? listedAt") {
    val createdMs = java.time.Instant.parse("2026-08-10T00:00:00Z").toEpochMilli
    val listedMs = java.time.Instant.parse("2026-08-02T00:00:00Z").toEpochMilli
    val payload =
      s"""[{"text": "iOS Developer", "categories": {"location": "Paris"},
         |  "hostedUrl": "https://jobs.lever.co/x/1", "createdAt": $createdMs},
         | {"text": "Designer", "categories": {},
         |  "applyUrl": "https://jobs.lever.co/x/2/apply", "listedAt": $listedMs}]""".stripMargin
    val rows = parse("Lever", payload)
    assert(rows.head.getString(0) == "iOS Developer")
    assert(rows.head.getTimestamp(3).toString == "2026-08-10 00:00:00.0")
    assert(rows(1).getString(2) == "https://jobs.lever.co/x/2/apply") // applyUrl fallback
    assert(rows(1).getTimestamp(3).toString == "2026-08-02 00:00:00.0") // listedAt fallback
  }

  test("Ashby: JSON-LD JobPosting, single object and list forms") {
    val payload =
      """<html><head>
        |<script type="application/ld+json">
        |{"@type": "JobPosting", "title": "Platform Engineer",
        | "datePosted": "2026-08-09", "hiringOrganization": {"sameAs": "https://x.example"}}
        |</script>
        |<script type='application/ld+json'>
        |[{"@type": "JobPosting", "title": "Data Scientist", "datePosted": "2026-08-01",
        |  "url": "https://x.example/ds"},
        | {"@type": "Organization", "title": "not a job"}]
        |</script>
        |</head><body></body></html>""".stripMargin
    val rows = parse("Ashby", payload)
    assert(rows.map(_.getString(0)) == Seq("Platform Engineer", "Data Scientist"))
    assert(rows.head.getString(2) == "https://x.example") // sameAs wins
    assert(rows(1).getString(2) == "https://x.example/ds") // url fallback
    assert(rows.head.getTimestamp(3).toString == "2026-08-09 00:00:00.0")
  }

  test("Ashby fallback anchors exclude 'software' keyword; Internal includes it") {
    val payload =
      """<html><a href="/j1">Software Architect</a>
        |<a href="/j2">ML Wizard</a><a href="/j3">Accountant</a></html>""".stripMargin
    assert(parse("Ashby", payload).map(_.getString(0)) == Seq("ML Wizard"))
    assert(parse("Internal", payload).map(_.getString(0)) ==
      Seq("Software Architect", "ML Wizard"))
  }

  test("Workable: /j/ anchors only on apply.workable.com boards") {
    val payload =
      """<html><a href="/acme/j/ABC123/">Backend Developer</a>
        |<a href="/about">About</a></html>""".stripMargin
    val rows = parse("Workable", payload, "https://apply.workable.com/acme/")
    assert(rows.map(_.getString(0)) == Seq("Backend Developer"))
    assert(rows.head.getString(2) == "https://apply.workable.com/acme/j/ABC123/")
    // not a workable board → nothing
    assert(parse("Workable", payload, "https://elsewhere.example/x").isEmpty)
  }

  test("BambooHR: keyword anchors with url_join") {
    val payload = """<html><a href="jobs/12">Data Engineer</a><a href="x">HR Lead</a></html>"""
    val rows = parse("BambooHR", payload, "https://x.bamboohr.com/careers/")
    assert(rows.map(_.getString(0)) == Seq("Data Engineer"))
    assert(rows.head.getString(2) == "https://x.bamboohr.com/careers/jobs/12")
  }

  test("null or garbage payloads yield no jobs") {
    import spark.implicits._
    val rows = Seq(("Greenhouse", null.asInstanceOf[String], "b"),
      ("Lever", "not json", "b"), ("Internal", "<html></html>", "b"))
      .toDF("provider", "payload", "base")
      .select(size(AtsParsers.parseJobs(col("provider"), col("payload"), col("base"))).as("n"))
      .collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(0, 0, 0))
  }
}
