package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.url_join

/** Provider-specific job-payload parsers (S4–S9) — the reference's six
  * fetchers re-expressed as pure column expressions over the RAW payload
  * (API JSON / page HTML). The fixture layer supplies payload bytes; the
  * ENGINE does all parsing, so these run codegen'd and distributed, one
  * narrow pass per payload.
  *
  * Shapes (reference app/hiring/detect_ats.py:120-262):
  *  - Greenhouse: `{jobs:[{title, location.name, absolute_url,
  *    updated_at, created_at}]}` — posted = updated ?? created (ISO).
  *  - Lever: `[{text, categories.location, hostedUrl|applyUrl,
  *    createdAt|listedAt}]` — epoch-millis.
  *  - Ashby / Internal: `<script type=application/ld+json>` JobPosting
  *    blocks (single object OR list), url = hiringOrganization.sameAs ??
  *    url ?? page; fallback to keyword anchors.
  *  - Workable: anchors whose href contains `/j/` on apply.workable.com.
  *  - BambooHR: keyword anchors.
  */
object AtsParsers {

  val JobStruct: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("location", StringType),
    StructField("url", StringType),
    StructField("posted_dt", TimestampType)))

  private def job(title: Column, location: Column, url: Column, posted: Column): Column =
    struct(title.as("title"), location.as("location"), url.as("url"),
      posted.as("posted_dt"))

  private def emptyJobs: Column =
    array().cast(ArrayType(JobStruct))

  // ---- Greenhouse (detect_ats.py:120-138) ---------------------------------
  private val GreenhouseSchema = StructType(Seq(
    StructField("jobs", ArrayType(StructType(Seq(
      StructField("title", StringType),
      StructField("location", StructType(Seq(StructField("name", StringType)))),
      StructField("absolute_url", StringType),
      StructField("updated_at", StringType),
      StructField("created_at", StringType)))))))

  def parseGreenhouse(payload: Column): Column = {
    val parsed = from_json(payload, GreenhouseSchema)
    coalesce(
      transform(parsed.getField("jobs"), j => job(
        trim(coalesce(j.getField("title"), lit(""))),
        j.getField("location").getField("name"),
        j.getField("absolute_url"),
        // _parse_iso_or_none fidelity: malformed dates → null, no error
        coalesce(
          try_to_timestamp(j.getField("updated_at")),
          try_to_timestamp(j.getField("created_at"))))),
      emptyJobs)
  }

  // ---- Lever (detect_ats.py:140-158) --------------------------------------
  private val LeverSchema = ArrayType(StructType(Seq(
    StructField("text", StringType),
    StructField("categories", StructType(Seq(StructField("location", StringType)))),
    StructField("hostedUrl", StringType),
    StructField("applyUrl", StringType),
    StructField("createdAt", LongType),
    StructField("listedAt", LongType))))

  def parseLever(payload: Column): Column =
    coalesce(
      transform(from_json(payload, LeverSchema), p => job(
        trim(coalesce(p.getField("text"), lit(""))),
        p.getField("categories").getField("location"),
        coalesce(p.getField("hostedUrl"), p.getField("applyUrl")),
        timestamp_millis(coalesce(p.getField("createdAt"), p.getField("listedAt"))))),
      emptyJobs)

  // ---- JSON-LD JobPosting blocks (ashby + internal; :160-198, 230-262) ----
  private val JsonLdSchema = ArrayType(StructType(Seq(
    StructField("@type", StringType),
    StructField("title", StringType),
    StructField("datePosted", StringType),
    StructField("url", StringType),
    StructField("hiringOrganization", StructType(Seq(StructField("sameAs", StringType)))))))

  /** All JobPosting entries across every ld+json script block; dict-or-
    * list payloads normalized by wrapping singles in `[...]`.
    */
  def parseJsonLd(payload: Column, baseUrl: Column): Column = {
    val scripts = regexp_extract_all(payload,
      lit("(?is)<script[^>]*type=[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>"), lit(1))
    val perScript = transform(scripts, s => {
      // leading-whitespace strip via regexp (the two-parameter LTRIM
      // signature is deprecated in Spark 4 and warns on every run)
      val wrapped = when(startswith(regexp_replace(s, "^[ \\t\\r\\n]+", ""), lit("[")), s)
        .otherwise(concat(lit("["), s, lit("]")))
      coalesce(
        filter(from_json(wrapped, JsonLdSchema),
          x => x.getField("@type") === "JobPosting"),
        array().cast(JsonLdSchema))
    })
    transform(flatten(coalesce(perScript, array().cast(ArrayType(JsonLdSchema)))),
      j => job(
        trim(coalesce(j.getField("title"), lit(""))),
        lit(null).cast("string"),
        coalesce(j.getField("hiringOrganization").getField("sameAs"),
          j.getField("url"), baseUrl),
        try_to_timestamp(j.getField("datePosted"))))
  }

  // ---- anchor scraping (workable/bamboo/fallbacks; :200-262) --------------
  private val AnchorRe = "(?is)<a[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** All anchors of a page as structs (href, stripped text). */
  def anchors(payload: Column): Column = {
    val raw = coalesce(
      regexp_extract_all(payload, lit(AnchorRe), lit(0)),
      array().cast("array<string>"))
    transform(raw, a => struct(
      regexp_extract(a, "(?is)href=\"([^\"]*)\"", 1).as("href"),
      trim(regexp_replace(regexp_extract(a, "(?is)<a[^>]*>(.*)</a>", 1),
        "<[^>]*>", "")).as("text")))
  }

  private def keywordAnchorJobs(payload: Column, baseUrl: Column,
                                kws: Seq[String]): Column =
    transform(
      filter(anchors(payload), a =>
        a.getField("text") =!= "" &&
        graft.functions.GraftFunctions.containsAny(lower(a.getField("text")), kws)),
      a => job(a.getField("text"), lit(null).cast("string"),
        url_join(baseUrl, a.getField("href")), lit(null).cast("timestamp")))

  /** Workable: `/j/` anchors on apply.workable.com boards (:200-214). */
  def parseWorkable(payload: Column, baseUrl: Column): Column =
    when(baseUrl.contains("apply.workable.com"),
      transform(
        filter(anchors(payload), a =>
          a.getField("text") =!= "" && a.getField("href").contains("/j/")),
        a => job(a.getField("text"), lit(null).cast("string"),
          url_join(baseUrl, a.getField("href")), lit(null).cast("timestamp"))))
      .otherwise(emptyJobs)

  /** BambooHR keyword anchors (:216-228). */
  def parseBamboo(payload: Column, baseUrl: Column): Column =
    keywordAnchorJobs(payload, baseUrl,
      Seq("engineer", "developer", "data", "ml", "ai", "software"))

  /** Ashby: JSON-LD first, else keyword anchors WITHOUT "software"
    * (:160-198 — the fallback keyword list differs from internal's).
    */
  def parseAshby(payload: Column, baseUrl: Column): Column = {
    val ld = parseJsonLd(payload, baseUrl)
    when(size(ld) > 0, ld).otherwise(
      keywordAnchorJobs(payload, baseUrl,
        Seq("engineer", "developer", "data", "ml", "ai")))
  }

  /** Internal careers page: JSON-LD first, else keyword anchors (:230-262). */
  def parseInternal(payload: Column, baseUrl: Column): Column = {
    val ld = parseJsonLd(payload, baseUrl)
    when(size(ld) > 0, ld).otherwise(
      keywordAnchorJobs(payload, baseUrl,
        Seq("engineer", "developer", "data", "ml", "ai", "software")))
  }

  /** K5 — the provider dispatch (detect_ats.py:273-287). */
  def parseJobs(provider: Column, payload: Column, baseUrl: Column): Column =
    when(payload.isNull, emptyJobs)
      .when(provider === "Greenhouse", parseGreenhouse(payload))
      .when(provider === "Lever", parseLever(payload))
      .when(provider === "Ashby", parseAshby(payload, baseUrl))
      .when(provider === "Workable", parseWorkable(payload, baseUrl))
      .when(provider === "BambooHR", parseBamboo(payload, baseUrl))
      .otherwise(parseInternal(payload, baseUrl))
}
