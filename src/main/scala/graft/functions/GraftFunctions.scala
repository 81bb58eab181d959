package graft.functions

import org.apache.spark.sql.{Column, SparkSession, graftcolumn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** The engine's column-expression library (SURVEY.md §2.7).
  *
  * Everything here composes Spark builtins (codegen'd, pushdown-friendly)
  * — no UDFs. The only two capabilities Spark lacks are implemented as
  * native Catalyst expressions: [[ParseMoney]] and [[UrlJoin]].
  */
object GraftFunctions {

  // ---- custom Catalyst expressions, exposed as Columns --------------------

  /** Normalize a money string ("$5M", "₹20 Cr") to integer USD. */
  def parse_money(c: Column): Column = graftcolumn(ParseMoney(graftcolumn.expr(c)))

  /** RFC 3986 resolve of a possibly-relative href against a base URL. */
  def url_join(base: Column, href: Column): Column =
    graftcolumn(UrlJoin(graftcolumn.expr(base), graftcolumn.expr(href)))

  /** Per-element [[hash64]] of a string array — native fast path,
    * bit-identical to `transform(arr, x => hash64(x, seed))`.
    */
  def hash64_array(arr: Column, seed: Int): Column =
    graftcolumn(Hash64Array(graftcolumn.expr(arr), seed))

  /** All minhash-seed minima in one native pass — value-identical to
    * the per-seed `array_min(transform(...))` composition.
    */
  def minhash_sig(hashes: Column, seeds: Int): Column =
    graftcolumn(MinHashSig(graftcolumn.expr(hashes), seeds))

  /** Rolling 3-gram shingle hashes in one native pass — value-identical
    * to the slice/zip_with composition.
    */
  def shingle_hash3(wordHashes: Column): Column =
    graftcolumn(ShingleHash3(graftcolumn.expr(wordHashes)))

  /** Rolling n-gram window hashes (long-window [[ShingleHash3]]
    * generalization) — the substring-dedup fingerprint pass.
    */
  def ngram_hashes(wordHashes: Column, n: Int): Column =
    graftcolumn(NgramHashes(graftcolumn.expr(wordHashes), n))

  /** SimHash fingerprint from a token-hash array in one native pass —
    * value-identical to the aggregate/zip_with vote-fold composition.
    */
  def simhash_bits(hashes: Column, bits: Int): Column =
    graftcolumn(SimHashBits(graftcolumn.expr(hashes), bits))

  /** Per-set token membership counts in one pass — native fast path,
    * identical to `sets.map(s => size(filter(arr, t => array_contains(s, t))))`.
    */
  def token_set_counts(arr: Column, sets: Seq[Seq[String]]): Column =
    graftcolumn(TokenSetCounts(graftcolumn.expr(arr), sets))

  /** Deterministic subword token count under the fixed shipped merge
    * table — see [[BpeTokenCount]]. The DuckDB-replayable tokenizer the
    * budgeting/packing queries count by.
    */
  def bpe_token_count(text: Column): Column =
    graftcolumn(BpeTokenCount(graftcolumn.expr(text)))

  /** Register the custom expressions for SQL use (`parse_money`, `url_join`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("parse_money", es => ParseMoney(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("url_join", es => UrlJoin(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "scala_udf")
  }

  // ---- exact decimal aggregation helpers ----------------------------------

  /** Cast to exact decimal so sums are order-independent (a float sum over a
    * shuffled 100 TB dataset is not reproducible; a decimal sum is).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent sum of a double column, returned as double.
    * Rounded to 4 places after the cast: the exact decimal sums have
    * scale ≤ 4, but DuckDB's wide-decimal→double conversion can be off
    * by 1 ulp from Java's correctly-rounded one (observed on a scale-8
    * sum at sf0.1), and the round kills that noise losslessly.
    */
  def dsum(c: Column): Column = round(sum(dec(c)).cast("double"), 4)

  // ---- text normalization & keyword machinery (reference F1, §2.7) --------

  /** Dash-normalize + lowercase, as the reference's title normalization
    * (reference: app/ingest/rss_ingest.py:52).
    */
  def normTitle(c: Column): Column = lower(regexp_replace(c, "[-–—]", " "))

  /** True iff any of the keywords occurs in (lowercased) `c` — the
    * reference's keyword-set containment test (app/ingest/rss_ingest.py:54-56).
    */
  def kwAny(c: Column, kws: Seq[String]): Column =
    exists(typedlit(kws), k => contains(lower(c), k))

  /** True iff any pattern occurs in `c` (case-preserving). One `exists`
    * over one array literal, NOT an OR-fold of `c.contains(p)` — the
    * fold duplicates `c`'s whole expression tree per pattern (~20x plan
    * blowup on a 21-entry blocklist over a parse_url chain). Same
    * three-valued null semantics as the fold (null `c` → null).
    */
  def containsAny(c: Column, pats: Seq[String]): Column =
    exists(typedlit(pats), p => c.contains(p))

  /** Count of keyword hits (for scoring). */
  def kwCount(c: Column, kws: Seq[String]): Column =
    aggregate(
      typedlit(kws),
      lit(0),
      (acc, k) => acc + when(contains(lower(c), k), 1).otherwise(0))

  /** Strip legal suffixes from a company name
    * (reference: app/resolve/domain_resolver.py:32,41).
    */
  def stripLegalSuffix(c: Column): Column =
    trim(regexp_replace(lower(c), "\\b(inc|corp|co|llc|ltd|gmbh|ag|sas|bv)\\b\\.?$", ""))

  /** Lowercase, drop spaces/dots/commas (domain_resolver.py:47). */
  def slugify(c: Column): Column = regexp_replace(lower(c), "[ .,]", "")

  // ---- URL functions (reference §2.7) --------------------------------------

  /** Host of a URL, `www.`-stripped (domain_resolver.py:50-61). */
  def hostOf(c: Column): Column =
    regexp_replace(parse_url(c, lit("HOST")), "^www\\.", "")

  /** Canonical `https://host` form of any URL (domain_resolver.py:50-61). */
  def domainNormalize(c: Column): Column =
    concat(lit("https://"), hostOf(c))

  /** First path segment — the ATS board slug (detect_ats.py:122,142). */
  def pathSlug(c: Column): Column =
    element_at(split(parse_url(c, lit("PATH")), "/"), 2)

  /** Unwrap a DuckDuckGo `uddg=` redirect parameter (domain_resolver.py:123-125). */
  def uddgUnwrap(c: Column): Column =
    url_decode(parse_url(c, lit("QUERY"), lit("uddg")))

  /** Canonical URL: strip query string and trailing slash (find_linkedin.py:77). */
  def urlCanon(c: Column): Column =
    regexp_replace(element_at(split(c, "\\?"), 1), "/$", "")

  // ---- portable hashing (dedup / fingerprint machinery) -------------------

  /** Stable 60-bit hash of a string under a seed, built from md5 so the
    * DuckDB oracle can reproduce it bit-for-bit:
    * `conv(substr(md5(seed:s),1,15),16,10)`. 15 hex digits < 2^60 always
    * fits a signed long. Used by minhash / simhash / fingerprint.
    */
  def hash64(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), c)), 1, 15), 16, 10)
      .cast(LongType)

  /** Whitespace word tokens. */
  def words(c: Column): Column = split(c, " ")

  /** Word n-gram shingles: array of space-joined n-grams of `arr`.
    * Inputs shorter than `n` yield an empty array (not a truncated
    * shingle) so short/empty documents are never spuriously similar.
    */
  def shingles(arr: Column, n: Int): Column =
    when(size(arr) >= n,
      transform(
        sequence(lit(0), size(arr) - n),
        i => concat_ws(" ", slice(arr, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  // ---- vector math (similarity search) -------------------------------------

  /** Dot product of two equal-length float/double array columns, computed in
    * double, sequentially in array order (deterministic). Native
    * [[DotProduct]] expression — bit-identical to the
    * `aggregate(zip_with(...))` builtin composition but ~2 orders of
    * magnitude faster per pair (interpreted lambdas vs one codegen'd loop),
    * which is what the within-bucket ANN joins spend their time on.
    */
  def dot(a: Column, b: Column): Column =
    graftcolumn(DotProduct(graftcolumn.expr(a), graftcolumn.expr(b)))

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two vector columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
