package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.HttpAdapters

/** Pluggable structured-extraction adapter — the S2 twin of the
  * reference's model call (`app/extract/llm_parse.py:69-98`). The
  * ENGINE side of extraction (fence strip, boundary slice, tolerant
  * JSON parse, reject routing) lives in [[Stages.enrichSplit]] and is
  * identical for every implementation; an `Extractor` only answers
  * "given (url, context) rows, what raw text did the model emit?".
  *
  * Implementations:
  *  - [[FixtureExtractor]] — a pre-recorded `(url, raw)` table; the
  *    hermetic default for tests, demos, and offline builds (no
  *    provider, no secrets — deliberately, this library is built
  *    offline from public knowledge).
  *  - [[UdfExtractor]] — the live skeleton: builds the reference's
  *    prompt per row and calls a user-supplied `transport` function
  *    (HTTP client for whatever provider the user runs; NO provider is
  *    baked in) through the shared per-JVM rate-limiter registry, as a
  *    nondeterministic UDF so Catalyst never reorders it across the
  *    dedup/limit stages that cap the spend (the same cost contract as
  *    the fetch adapters, SURVEY §4.1).
  */
trait Extractor extends Serializable {

  /** Raw model output per article: `(url, raw)` — `raw` null/absent on
    * failure (the reference returns `{}` on any exception,
    * llm_parse.py:96-98; enrichSplit routes those to rejects).
    * `articles` provides at least `url`; `bodies` provides `(url,
    * body)` with the ≤1800-char context.
    */
  def rawOutputs(articles: DataFrame, bodies: DataFrame): DataFrame
}

/** Pre-recorded extractor outputs (the default everywhere in this
  * repo: DemoFixtures.llmExtractions is one of these).
  */
final class FixtureExtractor(llmRaw: DataFrame) extends Extractor {
  override def rawOutputs(articles: DataFrame, bodies: DataFrame): DataFrame =
    llmRaw.select(col("url"), col("raw"))
}

object Extractor {

  /** The reference prompt, verbatim (llm_parse.py:36-67); `{context}`
    * is replaced per row exactly as `PROMPT.replace("{context}", ...)`.
    */
  val PromptTemplate: String =
    """
You are a precise financial data extraction model.
Return ONLY valid JSON. No commentary.

RULES:
- Do not guess. If a value is not clearly stated, return null.
- Extract website_url AND linkedin_url ONLY if explicitly mentioned in the text. Do NOT guess.
- Convert funding amounts to integer USD values.
  Examples:
    "$5M" → 5000000
    "₹20 Cr" → ~2400000
    "€2.3M" → convert assuming 1 EUR ≈ 1.1 USD
- Investors must be a list of strings. If none, return [].

Return EXACT JSON structure:

{
  "company_name": string or null,
  "website_url": string or null,
  "linkedin_url": string or null,
  "amount_raised_usd": integer or null,
  "funding_round": string or null,
  "investors": list,
  "lead_investor": string or null,
  "headquarter_country": string or null
}

TEXT:
{context}
"""
}

/** Live extractor skeleton: `transport(prompt)` → raw text (or null on
  * failure — implementations should catch their own transport errors,
  * mirroring the reference's swallow-and-continue). The transport is a
  * plain serializable function so ANY provider client plugs in;
  * politeness is the shared per-executor-JVM token bucket keyed by
  * `limiterName`, so the aggregate rate is `partitions × perSecond` —
  * `repartition(politeParallelism)` the article set before enriching,
  * exactly like the fetch adapters.
  */
final class UdfExtractor(
    transport: String => String,
    limiterName: String = "llmExtract",
    perSecond: Double = 0.5) extends Extractor {

  override def rawOutputs(articles: DataFrame, bodies: DataFrame): DataFrame = {
    val call = udf { (context: String) =>
      if (context == null || context.isEmpty) null
      else {
        HttpAdapters.limiterFor(limiterName, perSecond).acquire()
        try transport(
          Extractor.PromptTemplate.replace("{context}", context))
        catch { case _: Exception => null }
      }
    }.asNondeterministic()
    articles.select(col("url"))
      .join(bodies.select(col("url"), col("body")), Seq("url"), "left")
      .select(col("url"),
        call(substring(col("body"), 1, 1800)).as("raw"))
  }
}
