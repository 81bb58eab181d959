package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic hermetic fixtures (FIXTURES.md A1-A8) exercising every
  * edge of the pipeline:
  *
  *  - F1: strong-keyword hit, context+money hit (incl. en-dash
  *    normalization), non-match, context-without-money;
  *  - F2: stale article dropped, null-date article kept (conf 0.5);
  *  - J1: one URL already in the store;
  *  - F5: empty body, missing body, null company;
  *  - K3: one company per resolution level — llm_explicit (0.98),
  *    press_release (0.92, after blocklist/social/relative anchors),
  *    search (0.85, uddg unwrap), guess (0.60, slug and embedded-TLD
  *    variants), failed (0.0);
  *  - K2: LinkedIn candidate scoring (company page +50/+30 vs /in/ -30);
  *  - hiring: careers-link priorities 1/2/3, Greenhouse/Lever/Internal
  *    providers, tier A (recent tech job), B (stale tech job), C
  *    (no tech roles / no careers link / no domain);
  *  - J5 (run 2): same natural key re-upserted — COALESCE vs overwrite vs
  *    store-wins columns, and a NULL-valued natural-key column that must
  *    insert a second row (SQLite UNIQUE-NULL fidelity).
  *
  * `asOf` = 2026-08-12 12:00 UTC, daysBack = 7 → cutoff 2026-08-05 12:00.
  */
object DemoFixtures {
  val AsOf = "2026-08-12 12:00:00"
  val AsOf2 = "2026-08-13 12:00:00"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val feedA = "https://feeds.example.com/alpha"
  private val feedB = "https://feeds.example.com/beta"

  val urlAcme = "https://news.example.com/acme-raises"
  val urlBorg = "https://press.example.org/borg-seed"
  val urlEcho = "https://news.example.com/echo-raises"
  val urlGolf = "https://news.example.com/golf-round"
  val urlFox = "https://news.example.com/foxtrot-bags"
  val urlHotel = "https://news.example.com/hotel-angel"
  val urlKilo = "https://news.example.com/kilo-series-b"
  val urlLima = "https://news.example.com/lima-valuation"
  val urlMike = "https://news.example.com/mike-seed"
  val urlNova = "https://news.example.com/nova-raises"
  val urlAcme2 = "https://other.example.com/acme-more-coverage"

  def apply(spark: SparkSession): Pipeline.Fixtures = {
    import spark.implicits._

    val feedEntries = Seq(
      // (feed_url, ord, title, link, published_at)
      (feedA, 0, "Acme Labs raises $12M Series A", urlAcme, Some(ts("2026-08-10 08:00:00"))),
      (feedA, 1, "Borg Systems – seed round of $3 million", urlBorg, None),
      (feedA, 2, "Cobalt Q3 earnings beat expectations", "https://news.example.com/cobalt", Some(ts("2026-08-11 00:00:00"))),
      (feedA, 3, "Delta AI secures ₹20 Cr funding", "https://news.example.com/delta", Some(ts("2026-08-01 00:00:00"))),
      (feedA, 4, "Echo Robotics lands $5M to expand", urlEcho, Some(ts("2026-08-11 09:00:00"))),
      (feedA, 5, "Nova.ai raises $4M", urlNova, Some(ts("2026-08-10 10:00:00"))),
      (feedB, 0, "Foxtrot bags seed money", urlFox, Some(ts("2026-08-09 00:00:00"))),
      (feedB, 1, "Golf.io closes round at $40 million valuation", urlGolf, Some(ts("2026-08-08 00:00:00"))),
      (feedB, 2, "Hotel Analytics nabs angel investment of $2 million", urlHotel, Some(ts("2026-08-12 06:00:00"))),
      (feedB, 3, "India fintech Kilo invests in growth, raises $8M", urlKilo, Some(ts("2026-08-07 00:00:00"))),
      (feedB, 4, "Lima Corp equity valuation hits $1 billion", urlLima, Some(ts("2026-08-06 00:00:00"))),
      (feedB, 5, "Mike Ventures raises seed", urlMike, Some(ts("2026-08-09 12:00:00")))
    ).toDF("feed_url", "ord", "title", "link", "published_at")

    val articleBodies = Seq(
      (urlAcme, "Acme Labs, a devtools startup, announced a $12M Series A led by Alpha Cap." + " filler" * 400),
      (urlBorg, "Borg Systems closed a seed round. Visit https://www.borgsystems.com for details."),
      (urlFox, ""), // F5: empty body → dropped
      (urlGolf, "Golf.io raised $40M."), // F5: extractor returns no company
      (urlHotel, "Hotel Analytics raised an angel round."),
      (urlKilo, "Kilo raised $8M Series B."),
      (urlLima, "Lima Corp reached a $1B valuation."),
      (urlNova, "Nova.ai raised $4M seed."),
      (urlEcho, "Echo Robotics raised $5M.")
      // urlMike: no body row → dropped
    ).toDF("url", "body")

    // Raw extractor output, as an LLM would emit it: markdown fences,
    // leading prose, trailing commas, null fields, and one malformed
    // response. The ENGINE does all the parsing (Stages.enrich).
    val llmExtractions = Seq(
      // fenced output + trailing comma inside the object
      (urlAcme, """```json
{"company_name": "Acme Labs", "website_url": "https://acme-labs.com", "linkedin_url": "https://linkedin.com/company/acme-labs", "amount_raised": "$12M", "funding_round": "Series A", "investors": ["Alpha Cap", "Beta Fund"], "lead_investor": "Alpha Cap", "headquarter_country": "USA",}
```"""),
      (urlBorg, """{"company_name": "Borg Systems Inc.", "website_url": "https://borgsys.example", "linkedin_url": null, "amount_raised": "$3 million", "funding_round": "Seed", "investors": [], "lead_investor": null, "headquarter_country": "Germany"}"""),
      // extractor found no company → F5 drop
      (urlGolf, """{"company_name": null, "website_url": null, "linkedin_url": null, "amount_raised": "$40M", "funding_round": null, "investors": [], "lead_investor": null, "headquarter_country": null}"""),
      // leading prose before the JSON (boundary slice)
      (urlHotel, """Sure! Here is the extraction: {"company_name": "Hotel Analytics", "website_url": null, "linkedin_url": null, "amount_raised": "$2,000,000", "funding_round": "Angel", "investors": ["Gamma"], "lead_investor": "Gamma", "headquarter_country": null}"""),
      // INR crore amount — exercises the currency conversion
      (urlKilo, """{"company_name": "Kilo", "website_url": null, "linkedin_url": null, "amount_raised": "₹67 Cr", "funding_round": "Series B", "investors": ["Delta P"], "lead_investor": null, "headquarter_country": "India"}"""),
      (urlLima, """{"company_name": "Lima Corp", "website_url": null, "linkedin_url": null, "amount_raised": "Undisclosed", "funding_round": null, "investors": [], "lead_investor": null, "headquarter_country": "UK"}"""),
      (urlNova, """{"company_name": "Nova.ai", "website_url": null, "linkedin_url": null, "amount_raised": "$4M", "funding_round": "Seed", "investors": ["Zeta"], "lead_investor": "Zeta", "headquarter_country": "France"}"""),
      (urlEcho, """{"company_name": "Echo Robotics", "website_url": null, "linkedin_url": null, "amount_raised": "$5M", "funding_round": "Series A", "investors": [], "lead_investor": null, "headquarter_country": "USA"}""")
    ).toDF("url", "raw")

    val urlStatus = Seq(
      ("https://acme-labs.com", 200, "https://acme-labs.com/"),
      ("https://borgsys.example", 500, "https://borgsys.example/"), // HEAD fails → fallback
      ("https://kilo.io", 200, "https://kilo.io/"),
      ("https://nova.ai", 200, "https://www.nova.ai/"),
      ("https://lima.com", 404, "https://lima.com/")
    ).toDF("url", "status", "final_url")

    val pageAnchors = Seq(
      // Borg article page (press-release resolution, F8 chain)
      (urlBorg, 0, "/about", "About us"),
      (urlBorg, 1, "https://twitter.com/borgsystems", "Twitter"),
      (urlBorg, 2, "https://sedo.com/buy-this-domain", "Buy"),
      (urlBorg, 3, "https://www.borgsystems.com/product", "Borg Systems"),
      (urlBorg, 4, "https://example-vc.com", "The VC"),
      // Kilo article page: only a self-host anchor → press-release misses
      (urlKilo, 0, "https://news.example.com/other-story", "More news"),
      // Acme homepage: priority-1 ATS anchor after a non-careers anchor
      ("https://acme-labs.com", 0, "/about", "About"),
      ("https://acme-labs.com", 1, "https://boards.greenhouse.io/acmelabs", "We're hiring"),
      // Borg homepage: priority-2 careers-path anchor
      ("https://borgsystems.com", 0, "/careers", "Work at Borg"),
      // Hotel homepage: priority-3 text anchor
      ("https://hotelanalytics.io", 0, "/join", "Join Us"),
      // Nova homepage: priority-1 Lever anchor
      ("https://nova.ai", 0, "https://jobs.lever.co/nova", "Jobs")
      // Kilo homepage (https://kilo.io): no anchors → no careers link
    ).toDF("page_url", "ord", "href", "text")

    // RAW provider payloads (API JSON / page HTML) — the engine parses
    // them (AtsParsers). Greenhouse board JSON, Lever postings JSON,
    // internal-careers HTML anchors, and an empty internal page.
    val atsPayloads = Seq(
      ("https://boards.greenhouse.io/acmelabs", "Greenhouse",
        """{"jobs": [
  {"title": "Senior Software Engineer", "location": {"name": "Remote"},
   "absolute_url": "https://boards.greenhouse.io/acmelabs/jobs/1",
   "updated_at": "2026-08-05T00:00:00Z", "created_at": "2026-08-01T00:00:00Z"},
  {"title": "Sales Lead", "location": {"name": "NYC"},
   "absolute_url": "https://boards.greenhouse.io/acmelabs/jobs/2",
   "updated_at": "2026-08-01T00:00:00Z", "created_at": null},
  {"title": "ML Engineer", "location": null,
   "absolute_url": "https://boards.greenhouse.io/acmelabs/jobs/3",
   "updated_at": null, "created_at": "2026-07-01T00:00:00Z"}
]}"""),
      ("https://borgsystems.com/careers", "Internal",
        """<html><body>
<a href="/careers/1">Backend Developer</a>
<a href="/careers/2">Office Manager</a>
</body></html>"""),
      ("https://hotelanalytics.io/join", "Internal",
        """<html><body><a href="/about">About us</a></body></html>"""),
      ("https://jobs.lever.co/nova", "Lever",
        """[{"text": "iOS Developer", "categories": {"location": "Paris"},
  "hostedUrl": "https://jobs.lever.co/nova/1",
  "createdAt": 1786320000000}]""")
    ).toDF("careers_url", "provider", "payload")

    val searchResults = Seq(
      // (query, rank, href, title) — Hotel: uddg-wrapped official-site hit
      ("Hotel Analytics official site", 1,
        "https://duckduckgo.com/l/?uddg=https%3A%2F%2Fhotelanalytics.io%2F&rut=abc",
        "Hotel Analytics — home"),
      // Kilo: top hit is linkedin → rejected (F9), falls through to guess
      ("Kilo official site", 1, "https://linkedin.com/company/kilo", "Kilo | LinkedIn"),
      // Borg LinkedIn fallback (query template 0)
      ("\"Borg Systems Inc.\" site:linkedin.com/company", 1,
        "https://www.linkedin.com/company/borg-systems/?trk=similar", "Borg Systems Inc. | LinkedIn"),
      ("\"Borg Systems Inc.\" site:linkedin.com/company", 2,
        "https://linkedin.com/in/john-borg", "John Borg - Founder")
    ).toDF("query", "rank", "href", "title")

    Pipeline.Fixtures(feedEntries, articleBodies, llmExtractions, urlStatus,
      pageAnchors, atsPayloads, searchResults)
  }

  /** Store state before run 1: Echo's article URL already ingested. */
  def initialStore(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = Pipeline.emptyStore(spark).schema
    val rows = Seq(Row("Echo Robotics", "https://echorobotics.com", null,
      5000000L, "Series A", Seq("Old Fund"), null, "USA",
      java.sql.Date.valueOf("2026-08-01"), "B", 1, null, null,
      urlEcho, ts("2026-08-01 00:00:00")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  /** Run-2 fixtures: a NEW article URL for Acme with the same natural key
    * (company, round, announcement date) carrying partial updates — and a
    * second Lima article with the same null funding_round (must insert a
    * new row, never match). Everything else unchanged.
    */
  def secondRun(spark: SparkSession): Pipeline.Fixtures = {
    import spark.implicits._
    val fx = apply(spark)

    val urlLima2 = "https://other.example.com/lima-again"
    val feedEntries2 = Seq(
      (feedA, 0, "Acme Labs raises $12M Series A - expanded coverage", urlAcme2, Some(ts("2026-08-10 09:30:00"))),
      (feedB, 0, "Lima Corp equity valuation hits $1 billion", urlLima2, Some(ts("2026-08-06 13:00:00")))
    ).toDF("feed_url", "ord", "title", "link", "published_at")

    val bodies2 = Seq(
      (urlAcme2, "Expanded coverage of the Acme Labs round."),
      (urlLima2, "More on Lima Corp.")
    ).toDF("url", "body")

    val extractions2 = Seq(
      // amount "Undisclosed" (must COALESCE-keep 12M), investors
      // overwritten, country "Canada" must NOT replace store-wins "USA",
      // linkedin null must COALESCE-keep the run-1 value.
      (urlAcme2, """{"company_name": "Acme Labs", "website_url": "https://acme-labs.com", "linkedin_url": null, "amount_raised": "Undisclosed", "funding_round": "Series A", "investors": ["New Fund"], "lead_investor": "New Fund", "headquarter_country": "Canada"}"""),
      (urlLima2, """{"company_name": "Lima Corp", "website_url": null, "linkedin_url": null, "amount_raised": null, "funding_round": null, "investors": [], "lead_investor": null, "headquarter_country": "UK"}""")
    ).toDF("url", "raw")

    fx.copy(feedEntries = feedEntries2, articleBodies = bodies2,
      llmExtractions = extractions2)
  }
}
