package graft.sources

import java.net.URLEncoder

import scala.util.chaining._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One parsed search hit (1-based rank within its query's result page). */
case class SearchHit(rank: Int, href: String, title: String)

/** Pluggable web-search adapter — the S11/S12 twin of the reference's
  * DuckDuckGo calls (`app/resolve/domain_resolver.py:108-133` html
  * scrape, `app/resolve/find_linkedin.py:50-89` DDGS text search). The
  * ENGINE consumes search results as a relation `(query, rank, href,
  * title)` — [[graft.pipeline.Stages.resolveDomain]] takes rank 1 per
  * query, [[graft.pipeline.Stages.resolveLinkedIn]] scores the top 5 —
  * so an adapter only answers "what does the engine's query set
  * return?".
  *
  * Implementations:
  *  - [[FixtureSearchAdapter]] — a pre-recorded table; the hermetic
  *    default (offline build, no live search traffic).
  *  - [[HtmlSearchAdapter]] — the live skeleton: GETs an html-results
  *    endpoint per query (DDG-shaped by default, pluggable for any
  *    engine serving anchor-list result pages) through the shared
  *    per-JVM rate limiter at the reference's 1 req/s politeness
  *    (domain_resolver.py:110), parses result anchors, emits up to
  *    `maxResults` hits. Nondeterministic UDF: Catalyst never reorders
  *    it across the filters that cap the query fan-out.
  */
trait SearchAdapter extends Serializable {

  /** Results for a one-column `query` DataFrame, as the fixture-shaped
    * relation `(query, rank, href, title)`; queries that fail or match
    * nothing simply have no rows (downstream joins are left/inner —
    * exactly the reference's empty-candidate-list behavior).
    */
  def results(queries: DataFrame): DataFrame
}

/** Pre-recorded search results (DemoFixtures.searchResults is one). */
final class FixtureSearchAdapter(table: DataFrame) extends SearchAdapter {
  override def results(queries: DataFrame): DataFrame =
    table.select(col("query"), col("rank"), col("href"), col("title"))
}

object HtmlSearchAdapter {
  /** The reference's endpoint shape (domain_resolver.py:112). */
  def ddgEndpoint(query: String): String =
    "https://duckduckgo.com/html/?q=" + URLEncoder.encode(query, "UTF-8")

  /** Result anchors: `<a ... class="...result__a..." ... href="...">title</a>`
    * — attribute order independent, title tags stripped.
    */
  private[sources] val AnchorRe =
    "(?is)<a\\b[^>]*class=\"[^\"]*result__a[^\"]*\"[^>]*>(.*?)</a>".r
  private[sources] val HrefRe = "(?is)href=\"([^\"]*)\"".r
  private val TagRe = "(?s)<[^>]*>".r

  private[sources] def parseHits(body: String, maxResults: Int): Seq[SearchHit] =
    if (body == null) Seq.empty
    else AnchorRe.findAllMatchIn(body).flatMap { m =>
      HrefRe.findFirstMatchIn(m.group(0)).map { h =>
        (h.group(1), TagRe.replaceAllIn(m.group(1), "").trim)
      }
    }.take(maxResults).zipWithIndex
      .map { case ((href, title), i) => SearchHit(i + 1, href, title) }
      .toSeq
}

final class HtmlSearchAdapter(
    endpointFor: String => String = HtmlSearchAdapter.ddgEndpoint,
    limiterName: String = "search",
    perSecond: Double = 1.0,
    timeoutSec: Int = 10,
    maxResults: Int = 5) extends SearchAdapter {

  override def results(queries: DataFrame): DataFrame = {
    val search = udf { (q: String) =>
      if (q == null) Seq.empty[SearchHit]
      else HtmlSearchAdapter.parseHits(
        HttpAdapters.getBody(endpointFor(q), timeoutSec,
          HttpAdapters.limiterFor(limiterName, perSecond)),
        maxResults)
    }.asNondeterministic()
    // pin the wave eagerly: the result relation is consumed by joins in
    // several plan branches, and each recomputation would re-fetch every
    // query (cost + politeness); a live wave is a side effect, fetched
    // once
    queries
      .select(col("query"), explode(search(col("query"))).as("_h"))
      .select(col("query"), col("_h.rank").as("rank"),
        col("_h.href").as("href"), col("_h.title").as("title"))
      .pipe(graft.operators.Checkpoints.pin)
  }
}
