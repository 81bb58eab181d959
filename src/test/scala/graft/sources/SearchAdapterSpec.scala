package graft.sources

import java.net.{InetSocketAddress, URLDecoder}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The live search adapter against a local DDG-shaped result page, the
  * parser's edge cases, and fixture/live interchangeability through the
  * resolver stage.
  */
class SearchAdapterSpec extends SparkSpec {

  private val page =
    """<html><body>
      |<div class="result"><h2>
      |  <a rel="nofollow" class="result__a" href="https://acme-labs.com/">Acme <b>Labs</b> — Home</a>
      |</h2></div>
      |<div class="result"><h2>
      |  <a class="result__a other" href="https://duckduckgo.com/l/?uddg=https%3A%2F%2Facme.example%2F">Acme mirror</a>
      |</h2></div>
      |<a class="result__snippet" href="https://ignored.example/">snippet link, wrong class</a>
      |</body></html>""".stripMargin

  test("parseHits: ranks, hrefs, stripped titles, class filter, cap") {
    val hits = HtmlSearchAdapter.parseHits(page, maxResults = 5)
    assert(hits == Seq(
      SearchHit(1, "https://acme-labs.com/", "Acme Labs — Home"),
      SearchHit(2, "https://duckduckgo.com/l/?uddg=https%3A%2F%2Facme.example%2F", "Acme mirror")))
    assert(HtmlSearchAdapter.parseHits(page, maxResults = 1).size == 1)
    assert(HtmlSearchAdapter.parseHits(null, 5).isEmpty) // fetch failure
  }

  test("live adapter fetches per query through a real endpoint and emits the relation") {
    import spark.implicits._
    val served = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/html/", (x: HttpExchange) => {
      val q = URLDecoder.decode(
        x.getRequestURI.getRawQuery.stripPrefix("q="), "UTF-8")
      served.add(q)
      val body = if (q.contains("missing")) "<html>no results</html>" else page
      val bytes = body.getBytes("UTF-8")
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes); x.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/html/?q="
      val adapter = new HtmlSearchAdapter(
        endpointFor = q => base + java.net.URLEncoder.encode(q, "UTF-8"),
        limiterName = "testSearch", perSecond = 1000.0)
      val out = adapter.results(
        Seq("Acme Labs official site", "missing co official site").toDF("query"))
      val rows = out.orderBy("query", "rank").collect()
      // the no-hit query contributes zero rows; the other, two ranked hits
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "Acme Labs official site" &&
        rows(0).getInt(1) == 1 &&
        rows(0).getString(2) == "https://acme-labs.com/" &&
        rows(0).getString(3) == "Acme Labs — Home")
      assert(served.asScala.toSet ==
        Set("Acme Labs official site", "missing co official site"))
    } finally server.stop(0)
  }

  test("fixture and live adapters are interchangeable through the resolver") {
    import spark.implicits._
    import graft.pipeline.{DemoFixtures, Pipeline}
    val fx = DemoFixtures(spark)
    val asOf = to_timestamp(lit(DemoFixtures.AsOf))
    val base = Pipeline.run(fx, DemoFixtures.initialStore(spark), asOf)
    // serve the FIXTURE's rows through the adapter interface instead of
    // passing the table directly — the report must be identical
    val viaAdapter = Pipeline.run(fx, DemoFixtures.initialStore(spark), asOf,
      search = new FixtureSearchAdapter(fx.searchResults))
    val a = base.report.orderBy("company").collect().toSeq
    val b = viaAdapter.report.orderBy("company").collect().toSeq
    assert(a == b)
  }
}
