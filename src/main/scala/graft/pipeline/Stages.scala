package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import Vocab._

/** The reference pipeline's six stages as pure relational operators.
  *
  * Every network/LLM side effect of the reference (RSS fetch, article GET,
  * Gemini call, HEAD probes, homepage/ATS crawls, DuckDuckGo search) is
  * replaced by a join against a fixture table (FIXTURES.md A1-A8), so the
  * whole pipeline is a deterministic relational program — the SURVEY §5.2
  * hermetic-fixture strategy. Live adapters would slot in by swapping the
  * fixture joins for rate-limited nondeterministic UDF stages with the
  * same output schemas.
  *
  * Scale notes: all stages are narrow (filters/projections) or key-local
  * joins on the article URL / company key. Fixture joins are broadcast-
  * sized in tests; at production scale the bodies/extraction joins are
  * shuffle hash joins on the URL key, and the store merge is the only
  * stateful shuffle.
  */
object Stages {

  /** Lowercased, `www.`-stripped host (reference lowercases netloc and
    * strips every "www." occurrence — domain_resolver.py:58).
    */
  private def refHost(u: Column): Column =
    regexp_replace(lower(parse_url(u, lit("HOST"))), "www\\.", "")

  private def withScheme(u: Column): Column =
    when(u.rlike("^https?://"), u).otherwise(concat(lit("https://"), u))

  /** `normalize_domain` (domain_resolver.py:50-61): canonical
    * `https://host`, null when unparseable or the host hits the parked-
    * domain blocklist.
    */
  def refNormDomain(u: Column): Column = {
    val host = refHost(withScheme(u))
    when(host.isNull || host === "" || containsAny(host, DomainBlocklist), lit(null))
      .otherwise(concat(lit("https://"), host))
  }

  // ------------------------------------------------------------------ S1+F1+F2
  /** Ingest filter: keyword gate (strong OR (context AND money)) over the
    * dash-normalized lowercase title, then the recency window — entries
    * without a parseable date are KEPT with confidence 0.5
    * (rss_ingest.py:43-81). `source` is renamed `feed_source` to avoid
    * the reference's name collision with resolution provenance.
    */
  def ingestFilter(feedEntries: DataFrame, asOf: Column, daysBack: Int): DataFrame = {
    val title = trim(col("title"))
    val nt = normTitle(title)
    feedEntries
      .filter(
        kwAny(nt, StrongKeywords) ||
        (kwAny(nt, ContextKeywords) && kwAny(nt, MoneyIndicators)))
      .filter(col("published_at").isNull ||
        col("published_at") >= asOf - make_interval(lit(0), lit(0), lit(0), lit(daysBack)))
      .select(
        title.as("title"),
        col("link").as("url"),
        col("published_at"),
        when(col("published_at").isNotNull, 1.0).otherwise(0.5).as("date_confidence"),
        col("feed_url").as("feed_source"),
        col("ord"))
  }

  // ---------------------------------------------------------------------- J1
  /** Pre-flight dedup: drop articles whose URL is already in the store
    * (main.py:49-58 — the SELECT..IN probe + set anti-filter, as a
    * broadcast-able LEFT ANTI join). F3 non-null-URL filter included.
    */
  def dedupAgainstStore(articles: DataFrame, store: DataFrame): DataFrame =
    articles
      .filter(col("url").isNotNull)
      .join(store.select(col("source_url")), col("url") === col("source_url"), "left_anti")

  // ---------------------------------------------------------------------- T1
  /** Safety limit (main.py:60-63). The reference takes the first N in
    * feed-iteration order; for determinism under distributed execution we
    * order by (feed_source, ord) — the same order when feeds are
    * processed in listed order. Documented deviation: feed list order ≡
    * lexicographic feed_source order in fixtures.
    */
  def safetyLimit(articles: DataFrame, n: Int): DataFrame =
    articles.orderBy(col("feed_source"), col("ord")).limit(n)

  // ------------------------------------------------------------ S2+J2+F5 (+P2)
  /** Schema of one extractor record (the LLM prompt contract,
    * llm_parse.py:51-62 — amount kept as the raw string; the engine
    * normalizes it).
    */
  val ExtractionSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("company_name", StringType),
      StructField("website_url", StringType),
      StructField("linkedin_url", StringType),
      StructField("amount_raised", StringType),
      StructField("funding_round", StringType),
      StructField("investors", ArrayType(StringType)),
      StructField("lead_investor", StringType),
      StructField("headquarter_country", StringType)))
  }

  /** Enrichment: attach article body (truncated to 1800 chars,
    * llm_parse.py:20-34), drop empty bodies (llm_parse.py:115-117), parse
    * the extractor's RAW output — markdown fences / prose stripped via
    * the `{…}` boundary slice (llm_parse.py:78-87), trailing commas fixed
    * up, tolerant `from_json` (null on failure — llm_parse.py:89-94) —
    * then drop rows without a company (llm_parse.py:122-124,
    * main.py:76-78) and normalize the money string with the native
    * parse_money expression (the prompt contract, llm_parse.py:44-48).
    */
  def enrich(articles: DataFrame, bodies: DataFrame, llmRaw: DataFrame): DataFrame =
    enrichSplit(articles, bodies, llmRaw)._1

  /** Like [[enrich]], but also returns the rejected rows with a reason —
    * the reference prints-and-skips per row (llm_parse.py:115-124); a
    * distributed engine routes them to a side output instead (SURVEY
    * §2.11 W1 note: badRecords over swallow).
    */
  def enrichSplit(articles: DataFrame, bodies: DataFrame,
                  llmRaw: DataFrame): (DataFrame, DataFrame) = {
    // Fence strip + JSON boundary slice (llm_parse.py:78-83); when the
    // output has no {...} span at all, the reference wraps the fence-less
    // key:value text in braces and retries (llm_parse.py:84-87) — without
    // the fallback such rows would be wrongly rejected as no_company.
    val cleaned = trim(regexp_replace(col("raw"), "```json|```", ""))
    val sliced = regexp_extract(cleaned, "(?s)\\{.*\\}", 0)
    val wrapped = concat(lit("{\n"), regexp_replace(cleaned, ",+\\s*$", ""), lit("\n}"))
    val parsed = articles
      .join(bodies, Seq("url"), "left")
      .withColumn("body", substring(col("body"), 1, 1800))
      .join(llmRaw, Seq("url"), "left")
      .withColumn("_json",
        when(sliced =!= "", sliced)
          .when(cleaned.isNotNull && cleaned =!= "", wrapped))
      .withColumn("_ex", from_json(
        regexp_replace(col("_json"), ",\\s*([}\\]])", "$1"), ExtractionSchema))
      .select(col("*"), col("_ex.*"))
      .drop("raw", "_json", "_ex")
      .withColumn("_reject_reason",
        when(col("body").isNull || length(col("body")) === 0, "empty_body")
          .when(col("company_name").isNull, "no_company"))

    val accepted = parsed
      .filter(col("_reject_reason").isNull)
      .drop("_reject_reason")
      .withColumn("amount_raised_usd", parse_money(col("amount_raised")))
      .drop("amount_raised")
    val rejects = parsed
      .filter(col("_reject_reason").isNotNull)
      .select(col("url"), col("title"), col("_reject_reason").as("reason"))
    (accepted, rejects)
  }

  // ------------------------------------------------------------------- K3 etc.
  /** Domain resolution — the reference's 4-level fallback chain
    * (main.py:80-87 + domain_resolver.py:154-168) as a coalesce of four
    * candidate structs:
    *   1. llm_explicit (0.98): the extractor's website_url, if the HEAD
    *      probe passes (raw URL, NOT normalized — main.py:82-84).
    *   2. press_release (0.92): first qualifying anchor of the article
    *      page (F8 filter chain, doc order).
    *   3. search (0.85): top search hit for "<company> official site",
    *      uddg-unwrapped, minus linkedin/crunchbase.
    *   4. guess (0.60): first reachable "https://slug.tld" candidate.
    * Adds `domain`, `confidence`, `resolution_source` columns.
    */
  def resolveDomain(
      enriched: DataFrame,
      urlStatus: DataFrame,
      pageAnchors: DataFrame,
      searchResults: DataFrame): DataFrame = {

    val candStruct = (d: Column, conf: Double, src: String) =>
      when(d.isNotNull, struct(d.as("domain"), lit(conf).as("confidence"), lit(src).as("source")))

    // -- 1. llm_explicit: HEAD-probe the extractor's website_url (F12/S13)
    val probe = urlStatus.select(
      col("url").as("website_url"), col("status").as("_llm_status"))
    val withLlm = enriched
      .join(probe, Seq("website_url"), "left")
      .withColumn("_c_llm",
        candStruct(when(col("_llm_status") < 400, col("website_url")), 0.98, "llm_explicit"))
      .drop("_llm_status")

    // -- 2. press_release: F8 anchor filter chain, first match by doc order
    val href = trim(col("href"))
    val norm = refNormDomain(href)
    val candHost = refHost(norm)
    val anchorOk =
      href.startsWith("http") &&
      !containsAny(href, DomainBlocklist) &&
      !containsAny(href, SocialDomains) &&
      norm.isNotNull &&
      candHost =!= col("_article_host") &&
      !containsAny(candHost, SocialDomains) &&
      !containsAny(candHost, DomainBlocklist) &&
      !href.contains("mailto:")
    val prWin = Window.partitionBy(col("page_url")).orderBy(col("ord"))
    val prFirst = pageAnchors
      .withColumn("_article_host", refHost(col("page_url")))
      .filter(anchorOk)
      .withColumn("_pr_domain", norm)
      .withColumn("_rn", row_number().over(prWin))
      .filter(col("_rn") === 1)
      .select(col("page_url").as("url"), col("_pr_domain"))
    val withPr = withLlm
      .join(prFirst, Seq("url"), "left")
      .withColumn("_c_pr", candStruct(col("_pr_domain"), 0.92, "press_release"))
      .drop("_pr_domain")

    // -- 3. search: first hit for "<company> official site" (S11/F9)
    val sr = searchResults
      .filter(col("rank") === 1)
      .select(col("query").as("_q"), col("href").as("_sr_href"))
    val unwrapped = when(col("_sr_href").contains("uddg="), uddgUnwrap(col("_sr_href")))
      .otherwise(col("_sr_href"))
    val withSearch = withPr
      .join(sr, concat(col("company_name"), lit(" official site")) === col("_q"), "left")
      .withColumn("_sr_dom",
        when(containsAny(unwrapped, SearchRejects), lit(null))
          .otherwise(refNormDomain(unwrapped)))
      .withColumn("_c_search", candStruct(col("_sr_dom"), 0.85, "search"))
      .drop("_q", "_sr_href", "_sr_dom")

    // -- 4. guess: slug+TLD candidates, first reachable (S13 probe fixture)
    val name = trim(col("company_name"))
    val stripped = trim(regexp_replace(name, "(?i)\\b(inc|corp|co|llc|ltd|gmbh|ag|sas|bv)\\b\\.?$", ""))
    val embSlug = regexp_extract(lower(stripped), "([a-z0-9\\-]+)\\.([a-z]{2,})$", 1)
    val embTld = regexp_extract(lower(stripped), "([a-z0-9\\-]+)\\.([a-z]{2,})$", 2)
    val plainSlug = regexp_replace(lower(stripped), "[ .,]", "")
    val candidates = when(embTld =!= "",
      array(concat(lit("https://"), embSlug, lit("."), embTld)))
      .otherwise(array(GuessTlds.map(t => concat(lit("https://"), plainSlug, lit(t))): _*))
    val exploded = withSearch
      .select(col("url").as("_g_url"), col("company_name"), posexplode(candidates).as(Seq("_pos", "_cand")))
      .join(urlStatus.select(col("url").as("_cand"), col("status"), col("final_url")), Seq("_cand"), "left")
      .filter(col("status") < 400 && !containsAny(lower(col("final_url")), DomainBlocklist))
    val gWin = Window.partitionBy(col("_g_url")).orderBy(col("_pos"))
    val guessFirst = exploded
      .withColumn("_rn", row_number().over(gWin))
      .filter(col("_rn") === 1)
      .select(col("_g_url").as("url"), refNormDomain(lower(col("final_url"))).as("_guess_dom"))
    val withGuess = withSearch
      .join(guessFirst, Seq("url"), "left")
      .withColumn("_c_guess", candStruct(col("_guess_dom"), 0.60, "guess"))
      .drop("_guess_dom")

    // -- K3 coalesce with the 'failed' terminal
    val failed = struct(
      lit(null).cast("string").as("domain"),
      lit(0.0).as("confidence"),
      lit("failed").as("source"))
    withGuess
      .withColumn("_res", coalesce(col("_c_llm"), col("_c_pr"), col("_c_search"), col("_c_guess"), failed))
      .withColumn("domain", col("_res.domain"))
      .withColumn("confidence", col("_res.confidence"))
      .withColumn("resolution_source", col("_res.source"))
      .drop("_c_llm", "_c_pr", "_c_search", "_c_guess", "_res")
  }

  // ---------------------------------------------------------------- J6/K2/T2
  /** LinkedIn fallback (find_linkedin.py:50-97, env-gated main.py:91-96):
    * for rows with no linkedin_url, gather candidates from three search
    * queries, dedup by canonical URL (first occurrence wins), score with
    * the additive heuristic, keep the top positive score.
    */
  /** The three LinkedIn search queries (find_linkedin.py:55-59) as an
    * array of (qord, q) structs — shared by [[resolveLinkedIn]] and
    * [[searchQueries]] so live and fixture modes issue byte-identical
    * query strings.
    */
  private[pipeline] def linkedInQueries(name: Column, domain: Column): Column = {
    val domainHost = parse_url(domain, lit("HOST"))
    array(
      struct(lit(0).as("qord"),
        concat(lit("\""), name, lit("\" site:linkedin.com/company")).as("q")),
      struct(lit(1).as("qord"),
        when(domain.isNotNull,
          concat(lit("\""), name, lit("\" \""), domainHost, lit("\" site:linkedin.com"))).as("q")),
      struct(lit(2).as("qord"), concat(name, lit(" linkedin company")).as("q")))
  }

  /** The S11 "official site" query set for a batch — what a live
    * [[graft.sources.SearchAdapter]] must answer BEFORE domain
    * resolution. Derived with the same expression [[resolveDomain]]
    * joins on, so a live run requests exactly the strings the join
    * will look up. (The reference searches sequentially per row,
    * main.py:80-87; here the whole wave is one relation.)
    */
  def officialSiteQueries(enriched: DataFrame): DataFrame =
    enriched
      .select(concat(col("company_name"), lit(" official site")).as("query"))
      .filter(col("query").isNotNull)
      .distinct()

  /** The S12 LinkedIn query set — needs the RESOLVED domain, so this
    * second search wave runs after [[resolveDomain]], exactly the
    * reference's ordering (find_linkedin.py is called with the
    * resolved domain, main.py:91-96).
    */
  def linkedInSearchQueries(resolved: DataFrame): DataFrame =
    resolved.filter(col("linkedin_url").isNull)
      .select(explode(linkedInQueries(col("company_name"), col("domain"))).as("_qq"))
      .select(col("_qq.q").as("query"))
      .filter(col("query").isNotNull)
      .distinct()

  def resolveLinkedIn(resolved: DataFrame, searchResults: DataFrame): DataFrame = {
    val name = col("company_name")
    val queries = linkedInQueries(name, col("domain"))

    val needs = resolved.filter(col("linkedin_url").isNull)
      .select(col("url").as("_lk_url"), name.as("_lk_name"), col("domain").as("_lk_domain"),
        explode(queries).as("_qq"))
      .select(col("_lk_url"), col("_lk_name"), col("_lk_domain"),
        col("_qq.qord").as("_qord"), col("_qq.q").as("_q"))
      .filter(col("_q").isNotNull)

    val hits = needs.join(searchResults, col("_q") === col("query"))
      .filter(col("href").contains("linkedin.com"))
      .withColumn("_clean", regexp_replace(element_at(split(col("href"), "\\?"), 1), "/+$", ""))
      .withColumn("_ord", col("_qord") * 100 + col("rank"))

    // first occurrence per (row, clean url) — reference's seen_urls set
    val dedupWin = Window.partitionBy(col("_lk_url"), col("_clean")).orderBy(col("_ord"))
    val deduped = hits.withColumn("_rn", row_number().over(dedupWin)).filter(col("_rn") === 1)

    val urlL = lower(col("_clean"))
    val titleL = lower(coalesce(col("title"), lit("")))
    val normName = regexp_replace(lower(col("_lk_name")), "\\W+", "")
    val slugNorm = regexp_replace(lower(parse_url(col("_clean"), lit("PATH"))), "\\W+", "")
    val hostNorm = regexp_replace(lower(parse_url(col("_lk_domain"), lit("HOST"))), "\\W+", "")
    val score =
      when(urlL.contains("linkedin.com/company/"), 50).otherwise(0) +
      when(titleL.contains(lower(col("_lk_name"))), 30).otherwise(0) +
      when(normName =!= "" && slugNorm.contains(normName), 20).otherwise(0) +
      when(col("_lk_domain").isNotNull && urlL.contains(hostNorm), 10).otherwise(0) +
      when(urlL.contains("linkedin.com/in/"), -30).otherwise(0) +
      when(urlL.contains("/jobs/") || urlL.contains("/job/"), -20).otherwise(0) +
      when(urlL.contains("redirector") || urlL.contains("trk=") || urlL.contains("/posts/"), -10)
        .otherwise(0)

    val bestWin = Window.partitionBy(col("_lk_url")).orderBy(col("_score").desc, col("_ord"))
    val best = deduped
      .withColumn("_score", score)
      .filter(col("_score") > 0)
      .withColumn("_rn2", row_number().over(bestWin))
      .filter(col("_rn2") === 1)
      .select(col("_lk_url").as("url"), col("_clean").as("_best_linkedin"))

    resolved
      .join(best, Seq("url"), "left")
      .withColumn("linkedin_url", coalesce(col("linkedin_url"), col("_best_linkedin")))
      .drop("_best_linkedin")
  }

  // ------------------------------------------- S3..S9/K1/K4/K6/F6/F7/A1-A3/T3
  /** Hiring signal (detect_ats.py:291-336): find the careers link on the
    * homepage (3-priority first-match), identify the ATS provider, parse
    * the provider's raw payload into job rows ([[AtsParsers]] — the K5
    * dispatch), filter tech titles, tier by recency.
    */
  def hiringSignal(
      resolved: DataFrame,
      pageAnchors: DataFrame,
      atsPayloads: DataFrame,
      asOf: Column): DataFrame = {

    // S4-S9: provider-specific payload → normalized job rows
    val atsJobs = atsPayloads.select(
      col("careers_url"),
      explode(AtsParsers.parseJobs(col("provider"), col("payload"), col("careers_url"))).as("_j"))
      .select(col("careers_url"), col("_j.title").as("title"),
        col("_j.location").as("location"), col("_j.url").as("url"),
        col("_j.posted_dt").as("posted_dt"))

    // careers-link discovery over the homepage anchors (page_url = domain)
    val absHref = url_join(col("page_url"), trim(col("href")))
    val absHost = lower(parse_url(absHref, lit("HOST")))
    val hrefL = lower(trim(col("href")))
    val textL = lower(trim(col("text")))
    val priority =
      when(containsAny(absHost, AtsPatterns.map(_._1)), 1)
        .when(containsAny(hrefL, CareersHints), 2)
        .when(textL.isin(CareersTexts: _*), 3)
    val cWin = Window.partitionBy(col("page_url")).orderBy(col("_prio"), col("ord"))
    val careers = pageAnchors
      .withColumn("_prio", priority)
      .filter(col("_prio").isNotNull)
      .withColumn("_rn", row_number().over(cWin))
      .filter(col("_rn") === 1)
      .select(col("page_url").as("domain"), absHref.as("careers_url"))

    // K4 provider identification from the careers-URL host
    val careersHost = lower(parse_url(col("careers_url"), lit("HOST")))
    val provider = AtsPatterns.foldRight(lit("Internal")) { case ((pat, prov), acc) =>
      when(careersHost.contains(pat), prov).otherwise(acc)
    }

    // job stats per careers_url (F6 tech filter, F7 recency, A1-A3)
    val isTech = kwAny(col("title"), TechTitleKeywords)
    val recentCutoff = asOf - make_interval(lit(0), lit(0), lit(0), lit(RecentDays))
    val jobAgg = atsJobs
      .filter(isTech)
      .groupBy(col("careers_url"))
      .agg(
        count(lit(1)).cast("int").as("tech_roles"),
        sum(when(col("posted_dt").isNotNull && col("posted_dt") >= recentCutoff, 1)
          .otherwise(0)).cast("int").as("_n_recent"),
        max(col("posted_dt")).as("_latest_dt"))

    val joined = resolved
      .join(careers, Seq("domain"), "left")
      .withColumn("ats_provider", when(col("careers_url").isNotNull, provider))
      .join(jobAgg, Seq("careers_url"), "left")

    // K1 tier + per-branch details diagnostics (detect_ats.py:299-336)
    val noDomain = col("domain").isNull
    val noCareers = col("careers_url").isNull
    val techRoles = coalesce(col("tech_roles"), lit(0))
    val nRecent = coalesce(col("_n_recent"), lit(0))
    joined
      .withColumn("hiring_tier",
        when(noDomain || noCareers, "C")
          .when(nRecent > 0, "A")
          .when(techRoles > 0, "B")
          .otherwise("C"))
      .withColumn("details",
        when(noDomain, "no_domain")
          .when(noCareers, "no_careers_link_found")
          .when(nRecent > 0, concat(lit("recent_tech_roles="), nRecent, lit(s" (≤${RecentDays}d)")))
          .when(techRoles > 0, "tech_roles_present_but_not_recent")
          .otherwise("no_tech_roles_found"))
      .withColumn("tech_roles", when(noDomain || noCareers, 0).otherwise(techRoles))
      .withColumn("latest_posted_days",
        when(col("_latest_dt").isNotNull,
          greatest(lit(0), datediff(to_date(asOf), to_date(col("_latest_dt")))))
          .otherwise(lit(null).cast("int")))
      .drop("_n_recent", "_latest_dt")
  }

  // ------------------------------------------------------------------ P4 + J5
  /** Project the final batch into the store schema (upsert.py:93-149):
    * website_url = domain ?? website_url, announcement_date from
    * published_at, tech_roles null→0, last_seen = run timestamp.
    * `investors` stays a real array (the reference JSON-encodes for
    * SQLite TEXT — a storage-format detail, not a semantic one).
    */
  def storeProjection(batch: DataFrame, asOf: Column): DataFrame =
    batch.select(
      col("company_name"),
      coalesce(col("domain"), col("website_url")).as("website_url"),
      col("linkedin_url"),
      col("amount_raised_usd"),
      col("funding_round"),
      col("investors"),
      col("lead_investor"),
      col("headquarter_country"),
      to_date(col("published_at")).as("announcement_date"),
      col("hiring_tier"),
      coalesce(col("tech_roles"), lit(0)).as("tech_roles"),
      col("careers_url"),
      col("ats_provider"),
      col("url").as("source_url"),
      asOf.as("last_seen"))

  /** J5 merge into the store with the reference's exact per-column rules
    * (upsert.py:117-126): COALESCE for amount/website/linkedin/lead/tech;
    * unconditional overwrite for investors/tier/careers/ats/last_seen;
    * store-wins for columns absent from DO UPDATE (country, source_url).
    */
  def mergeIntoStore(store: DataFrame, projectedBatch: DataFrame): DataFrame =
    graft.operators.MergeUpsert(
      store, projectedBatch,
      keys = Seq("company_name", "funding_round", "announcement_date"),
      coalesceCols = Seq("amount_raised_usd", "website_url", "linkedin_url",
        "lead_investor", "tech_roles"),
      overwriteCols = Seq("investors", "hiring_tier", "careers_url",
        "ats_provider", "last_seen"),
      keepCols = Seq("headquarter_country", "source_url"))

  // ---------------------------------------------------------------------- P3
  /** The 15-column report projection (to_gsheet.py:84-111). */
  def reportProjection(batch: DataFrame, asOf: Column): DataFrame =
    batch.select(
      col("company_name").as("company"),
      coalesce(col("domain"), col("website_url")).as("domain"),
      col("linkedin_url").as("linkedin"),
      col("amount_raised_usd").as("amount_usd"),
      col("funding_round").as("round"),
      array_join(coalesce(col("investors"), array()), ", ").as("investors"),
      col("lead_investor"),
      col("headquarter_country").as("country"),
      date_format(col("published_at"), "yyyy-MM-dd").as("date_announced"),
      col("hiring_tier"),
      coalesce(col("tech_roles"), lit(0)).as("tech_roles"),
      col("ats_provider"),
      col("careers_url"),
      col("url").as("source_url"),
      date_format(asOf, "yyyy-MM-dd HH:mm:ss").as("last_updated"))

  // ------------------------------------------------------------------ P5 + W4
  /** The per-row console progress line (main.py:99-105 fixed-width
    * format) — cosmetic, but the format_string shape is the operator.
    */
  def consoleLines(batch: DataFrame): DataFrame =
    batch.select(format_string("%-28s | $%s | %s | %s  (conf=%.2f, src=%s)",
      col("company_name"),
      coalesce(col("amount_raised_usd").cast("string"), lit("null")),
      coalesce(col("funding_round"), lit("null")),
      coalesce(col("domain"), lit("null")),
      col("confidence"),
      col("resolution_source")).as("line"))

  // ----------------------------------------------------------------- F10 + W3
  /** Alert rows: tier A/B only, with the Telegram HTML message
    * (telegram_alerts.py:26-36; amount formatted "$5,000,000" or
    * "Undisclosed" — 0 counts as undisclosed, Python truthiness).
    */
  def alertRows(batch: DataFrame): DataFrame = {
    val amountStr = when(
      col("amount_raised_usd").isNotNull && col("amount_raised_usd") =!= 0,
      concat(lit("$"), format_number(col("amount_raised_usd"), 0)))
      .otherwise("Undisclosed")
    batch
      .filter(col("hiring_tier").isin("A", "B"))
      .select(
        col("company_name"),
        col("hiring_tier"),
        concat(
          lit("<b>🔥 New Tier A Lead: "), col("company_name"), lit("</b>\n\n"),
          lit("<b>Amount:</b> "), amountStr, lit("\n"),
          lit("<b>Round:</b> "), coalesce(col("funding_round"), lit("N/A")), lit("\n"),
          lit("<b>Signal:</b> "), coalesce(col("details"), lit("N/A")), lit("\n\n"),
          lit("<a href='"), coalesce(col("domain"), lit("")), lit("'>Visit Website</a>  •  "),
          lit("<a href='"), coalesce(col("careers_url"), lit("")), lit("'>View Careers</a>"))
          .as("message"))
  }
}
