package graft.pipeline

/** The reference pipeline's behavioral constants, reimplemented as data
  * (cited per set). These are semantics, not code: the keyword/blocklist
  * contents define what the filters accept.
  */
object Vocab {

  /** F1 strong funding keywords (reference app/ingest/rss_ingest.py:15-24). */
  val StrongKeywords: Seq[String] = Seq(
    "raises", "secures", "bags", "closes round", "lands", "nabs",
    "funding", "invests")

  /** F1 context keywords (rss_ingest.py:26-38). */
  val ContextKeywords: Seq[String] = Seq(
    "series a", "series b", "series c", "series d", "series e",
    "seed", "pre-seed", "angel", "valuation", "venture capital", "equity")

  /** F1 money indicators (rss_ingest.py:40). */
  val MoneyIndicators: Seq[String] = Seq(
    "$", "million", "mn", "cr", "crore", "billion", "bn")

  /** F8 parked/for-sale domain blocklist (app/resolve/domain_resolver.py:12-16). */
  val DomainBlocklist: Seq[String] = Seq(
    "domains.atom.com", "sedo.com", "godaddy.com", "namecheap.com",
    "dan.com", "hugedomains.com", "afternic.com", "wix.com",
    "squarespace.com", "uniregistry.com", "brandpa.com")

  /** F8 social domains (domain_resolver.py:18-29). */
  val SocialDomains: Seq[String] = Seq(
    "linkedin.com", "twitter.com", "x.com", "facebook.com", "instagram.com",
    "youtube.com", "tiktok.com", "threads.net", "whatsapp.com",
    "api.whatsapp.com")

  /** F9 search-result rejects (domain_resolver.py:127-128). */
  val SearchRejects: Seq[String] = Seq("linkedin.com", "crunchbase.com")

  /** F6 tech-role title keywords (app/hiring/detect_ats.py:23-28). */
  val TechTitleKeywords: Seq[String] = Seq(
    "software", "engineer", "developer", "backend", "front end", "frontend",
    "full stack", "full-stack", "data engineer", "data scientist", "ml",
    "machine learning", "ai", "mle", "platform", "devops", "sre",
    "infra", "infrastructure", "android", "ios", "mobile")

  /** K4 ATS host patterns → provider (detect_ats.py:32-38). */
  val AtsPatterns: Seq[(String, String)] = Seq(
    "boards.greenhouse.io" -> "Greenhouse",
    "jobs.lever.co" -> "Lever",
    "ashbyhq.com" -> "Ashby",
    "apply.workable.com" -> "Workable",
    "bamboohr.com" -> "BambooHR")

  /** Careers-path href hints, priority 2 (detect_ats.py:40,107). */
  val CareersHints: Seq[String] = Seq("/careers", "/jobs", "join-us", "work-with-us")

  /** Careers anchor-text exact matches, priority 3 (detect_ats.py:111-114). */
  val CareersTexts: Seq[String] = Seq("careers", "career", "jobs", "join us", "team")

  /** F7 recency window in days (detect_ats.py:30). */
  val RecentDays = 14

  /** Guess-path TLD candidates in probe order (domain_resolver.py:139). */
  val GuessTlds: Seq[String] = Seq(".com", ".io", ".ai", ".co")
}
