package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §0 north
  * star): token counting, quality scoring, language ID. All pure builtin
  * compositions — codegen'd, narrow (no shuffle), scan-fused.
  *
  * The keyword machinery reuses the reference's F1 filter semantics
  * (reference: app/ingest/rss_ingest.py:52-59).
  */
object TextAnalysis {

  /** Punctuation class used by both engines (explicit set — POSIX classes
    * differ between regex dialects).
    */
  val PunctClass = "[.,!?;:'\"()\\-]"

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** The "short document" threshold the dataset-card surfaces share —
    * q79's `pct_short` and [[graft.streaming.StreamingCardStats]]'
    * `n_short` partials must count the same docs or the streaming card
    * drifts from the batch card it claims to equal.
    */
  val ShortDocTokens = 20

  /** BPE-ish subword count estimate: word-boundary pieces plus an extra
    * piece per 6 chars of long words (a cheap deterministic proxy for a
    * real tokenizer's subword splits). Superseded for budgeting/packing
    * by [[subwordCount]], which runs the real merge table.
    */
  def subwordCountEstimate(text: Column): Column =
    aggregate(words(text), lit(0),
      (acc, w) => acc + lit(1) + (length(w) / 6).cast("int"))

  /** Deterministic subword token count under the fixed shipped merge
    * table ([[graft.functions.BpeTokenCount]]) — what token budgeting
    * (q42) and sequence packing (q55) count by; [[tokenCount]]
    * (whitespace) remains the cheap scoring-path proxy.
    */
  def subwordCount(text: Column): Column = bpe_token_count(text)

  /** Fraction of characters that are punctuation, rounded to 6 places. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      round((length(text) - length(regexp_replace(text, PunctClass, "")))
        .cast("double") / length(text), 6))

  /** Fraction of tokens found in `stopwords`, rounded to 6 places. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = words(lower(text))
    val hits = element_at(token_set_counts(toks, Seq(stopwords)), 1)
    when(size(toks) === 0, 0.0)
      .otherwise(round(hits.cast("double") / size(toks), 6))
  }

  /** Mean token length, rounded to 6 places. */
  def avgTokenLen(text: Column): Column = {
    val toks = words(text)
    when(size(toks) === 0, 0.0).otherwise(
      round(aggregate(toks, lit(0), (acc, w) => acc + length(w)).cast("double")
        / size(toks), 6))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents and
    * moderate stopword density, penalizes punctuation soup. Deterministic
    * and oracle-reproducible; the exact weights are a pinned contract, not
    * a claim of linguistic truth.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    round(greatest(lit(0.0),
      lenScore * 0.5 + stopScore * 0.3 - punctPenalty * 0.2 + lit(0.2)), 6)
  }

  /** Statistical (n-gram LM) quality scoring — the CCNet-style signal
    * the heuristic ratios above can't give: score each document by its
    * average bigram SURPRISAL under a bigram model counted from the
    * corpus itself (add-one smoothing over the observed vocabulary).
    * High surprisal = improbable token transitions = gibberish/noise;
    * low = fluent-but-boilerplate; a quality gate cuts both tails.
    *
    * Returns `(id, n_bigrams, score)` for documents with ≥2 tokens,
    * where `score` is the mean surprisal in CENTI-NATS:
    * `round(ln((c(w1) + V) / (c(w1,w2) + 1)) · 100)` summed exactly as
    * integers, then divided once. The integer quantization is the
    * cross-engine determinism contract: `ln` is the one transcendental
    * and libm implementations differ by ulps, but a 1–2 ulp difference
    * flips a `round(x·100)` integer only within ~4e-14 of a half
    * boundary — vanishing at corpus scale — while every downstream sum
    * stays exact. (Summing raw doubles would be shuffle-order-
    * dependent; summing rounded decimals would put the boundary at
    * 1e-12 — ~10⁴× riskier.)
    *
    * Scale shape: two corpus passes (the token scan feeds both the
    * count tables and the probe side — no corpus-sized cache), counts
    * by hash-groupBy with map-side combine, probe joins co-partitioned
    * on the same hash keys, vocabulary size as a broadcast 1-row
    * aggregate (the TF-IDF pattern). At 100 TB the count tables are
    * themselves corpus-derived relations (shuffle carries (hash, count)
    * pairs, never text); a production variant would top-K-prune +
    * broadcast them, trading exactness for a map-only probe.
    */
  def lmSurprisal(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, explode,
      element_at, lit, posexplode, round, size, sum}
    import graft.operators.Dedup.wordHashes
    val toks = df.select(col(idCol), wordHashes(words(col(textCol))).as("_wh"))
    val uni = toks.select(explode(col("_wh")).as("_u"))
      .groupBy(col("_u")).agg(count(lit(1)).as("_c1"))
    val vsz = broadcast(uni.agg(count(lit(1)).as("_vsz")))
    val big = toks.filter(size(col("_wh")) >= 2)
      .select(col(idCol), col("_wh"),
        posexplode(ngram_hashes(col("_wh"), 2)).as(Seq("_off", "_bh")))
      .select(col(idCol), col("_bh"),
        element_at(col("_wh"), col("_off") + 1).as("_u1"))
    val bc = big.groupBy(col("_bh")).agg(count(lit(1)).as("_c12"))
    big.join(bc, Seq("_bh"))
      .join(uni, col("_u1") === col("_u"))
      .crossJoin(vsz)
      .select(col(idCol),
        round(org.apache.spark.sql.functions.log(
          (col("_c1") + col("_vsz")).cast("double") / (col("_c12") + 1)) * 100, 0)
          .cast("long").as("_s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_s")).cast("double") / count(lit(1)), 6).as("score"))
  }

  /** Marker-word language ID. Scores each language by marker-token hits
    * (with multiplicity) and returns the argmax; ties break by the order
    * of `markers` (first wins). A real system would use character n-gram
    * profiles — the operator shape (per-language score → argmax) is the
    * same, and this version is exactly reproducible in the oracle.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = words(lower(text))
    // one native pass over the tokens for ALL marker sets (the composed
    // per-set filter scans were the measured hotspot; CSE shares the
    // counts array across the argmax comparisons)
    val counts = token_set_counts(toks, markers.map(_._2))
    val scores = markers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    // argmax with first-wins tie-break: a score wins iff strictly greater
    // than all earlier scores and >= all later ones.
    val best = scores.zipWithIndex.map { case ((lang, s), i) =>
      val beatsEarlier = scores.take(i).map { case (_, e) => s > e }
        .foldLeft(lit(true))(_ && _)
      val holdsLater = scores.drop(i + 1).map { case (_, l) => s >= l }
        .foldLeft(lit(true))(_ && _)
      (lang, beatsEarlier && holdsLater)
    }
    best.reverse.foldLeft(lit("und")) { case (acc, (lang, cond)) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** Frequent word n-grams by document frequency — the boilerplate /
    * template-text detector (headers, nav bars, license blurbs repeat
    * verbatim across a web corpus; their n-grams have high df). Returns
    * `(ngram, df_count)` for n-grams appearing in at least `minDf`
    * distinct documents.
    *
    * Scale shape: per-doc `array_distinct` (so a doc repeating its own
    * n-gram counts once — df, not tf) → explode → ONE partial-agg
    * count shuffle keyed by the n-gram. Map-side combine absorbs the
    * common n-grams before the wire; the `minDf` cut happens post-agg,
    * so the shuffle width is |distinct n-grams| — at 100 TB shrink it
    * by pre-hashing the n-gram to 64 bits and re-attaching one witness
    * string via `first(ngram)` (collision odds ≪ df noise), or run a
    * count-min pre-pass; the exact relational form is kept here
    * because it is what the oracle can replay.
    */
  def frequentNgrams(df: DataFrame, textCol: String, n: Int,
                     minDf: Long): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minDf >= 1, "minDf must be >= 1")
    df.select(explode(array_distinct(shingles(words(col(textCol)), n)))
        .as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") >= minDf)
  }

  // ---- line-level curation (the RefinedWeb/Gopher rewrite family) ---------

  /** Remove WITHIN-document repeated lines, keeping the FIRST occurrence
    * of each — the standard web-text repetition rewrite (repeated nav
    * fragments, duplicated paragraphs from template glitches). q46
    * SCORES intra-doc repetition; this is the matching rewrite. Exact
    * (byte-equal lines only), order-preserving (`array_distinct` keeps
    * first-occurrence order — spec-pinned, since the whole operator is
    * wrong if that ever changes), and a pure per-row map: linear in
    * document length via the hash-set distinct, no shuffle, scan-fused.
    * Empty lines dedup like any other — callers wanting paragraph
    * separators preserved should scrub before splitting paragraphs.
    */
  def dedupLines(text: Column, sep: String = "\n"): Column = {
    val q = java.util.regex.Pattern.quote(sep)
    array_join(array_distinct(split(text, q)), sep)
  }

  /** Number of lines [[dedupLines]] removes — emitted separately so the
    * score and the rewrite stay one scan.
    */
  def dupLineCount(text: Column, sep: String = "\n"): Column = {
    val q = java.util.regex.Pattern.quote(sep)
    (size(split(text, q)) - size(array_distinct(split(text, q))))
      .cast("long")
  }

  /** CROSS-document boilerplate-line scrub: remove every line whose
    * document frequency exceeds `maxDf` (cookie banners, nav menus,
    * share bars — the lines that appear on every page of a host and
    * would otherwise dominate the token budget). Document frequency
    * counts each line once per document ([[dedupLines]] composes for
    * the within-doc copies). Returns `corpus` with `textCol` rewritten
    * (first-to-last order of the KEPT lines preserved) plus
    * `n_scrubbed` (lines removed, 0 for untouched docs).
    *
    * Scale shape: one corpus-wide line-frequency aggregate (shuffle
    * keyed by the 64-bit line hash, map-side combine absorbs repeats);
    * the `> maxDf` survivor set is BOILERPLATE-sized by construction
    * (distinct lines more frequent than the cap) and broadcasts. The
    * rewrite join is NOT broadcast — boilerplate by definition touches
    * many documents, so the matched-positions relation can be
    * corpus-sized; it exchanges hash-keyed on `idCol` instead
    * (match-sized rows: one per touched doc). Rewrite is linear per
    * document — the [[Contamination.exciseWithPool]] one-`array_except`
    * form, not a per-line membership scan.
    */
  def scrubBoilerplateLines(corpus: DataFrame, idCol: String,
                            textCol: String, maxDf: Long,
                            sep: String = "\n"): DataFrame =
    scrubBoilerplateLinesWithPool(corpus,
      boilerplateLinePool(corpus, textCol, maxDf, sep), idCol, textCol,
      sep)

  /** The banned-line set [[scrubBoilerplateLinesWithPool]] scrubs
    * against: one `lh` (64-bit line hash, seed 17) row per distinct
    * line whose document frequency exceeds `maxDf` — boilerplate-sized
    * by construction. Freeze it ONCE from a reference corpus
    * (`Checkpoints.pin`/`localCheckpoint`) and every stream batch or
    * corpus shard scrubs against the same pool without re-deriving the
    * frequency pass — the [[Contamination.BenchmarkProbes]] discipline
    * applied to boilerplate.
    *
    * COLLISION SEMANTICS, explicit because the consequence here is a
    * destructive rewrite, not a dedup candidate: df is aggregated on
    * the 60-bit md5-prefix hash, so two distinct lines that collide
    * POOL their df counts (a pair of sub-threshold lines could jointly
    * cross `maxDf`), and the scrub join matches on the hash, so an
    * innocent line colliding with a boilerplate line is deleted
    * corpus-wide. This is the band-index hashing discipline
    * ([[Dedup]]) with its usual 2^-60 per-pair odds — a corpus would
    * need ~10⁹ distinct lines for a ~50% chance of ANY collision —
    * accepted deliberately: keying the aggregate on the line VALUE
    * would shuffle full line text corpus-wide where the hash key
    * shuffles 8 bytes, and the verify-on-value alternative doubles the
    * rewrite join's width for a risk the fingerprint family already
    * prices. Callers scrubbing adversarial input where a forced
    * collision matters should screen the pool against known-good lines
    * before freezing it.
    */
  def boilerplateLinePool(corpus: DataFrame, textCol: String, maxDf: Long,
                          sep: String = "\n"): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    val q = java.util.regex.Pattern.quote(sep)
    corpus
      .select(explode(array_distinct(split(col(textCol), q))).as("_l"))
      .groupBy(hash64(col("_l"), 17).as("lh"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDf)
      .select(col("lh"))
  }

  /** [[scrubBoilerplateLines]] against a PRE-BUILT banned-line pool
    * (one `lh` column, [[boilerplateLinePool]]'s relation) — the
    * frozen-pool form for streams and sharded runs. The pool
    * broadcasts; the matched-positions relation exchanges hash-keyed
    * on `idCol` (NOT broadcast — boilerplate touches many documents,
    * so matches can be corpus-sized); the rewrite is the linear
    * one-`array_except` form.
    */
  def scrubBoilerplateLinesWithPool(corpus: DataFrame, pool: DataFrame,
                                    idCol: String, textCol: String,
                                    sep: String = "\n"): DataFrame = {
    val q = java.util.regex.Pattern.quote(sep)
    val id = col(idCol)
    val matched = corpus
      .select(id, posexplode(split(col(textCol), q)).as(Seq("_j", "_l")))
      .select(id, col("_j"), hash64(col("_l"), 17).as("lh"))
      .join(broadcast(pool), "lh")
      .groupBy(id).agg(collect_set(col("_j")).as("_mj"))
    // ONE id-keyed join (round 19): the old shape joined a docLines
    // projection to the matches and then the corpus to THAT — two
    // id-keyed exchanges of text-heavy rows and a third evaluation of
    // the corpus. The rewrite expression is per-row over the staged
    // `_ls` split (staged as a column so the transform lambda reads it
    // from the row instead of re-splitting per element); untouched
    // docs (no match row) keep their text through the `when`.
    val kept = transform(
      array_except(sequence(lit(0), size(col("_ls")) - 1), col("_mj")),
      p => element_at(col("_ls"), p + 1))
    corpus
      .withColumn("_ls", split(col(textCol), q))
      .join(matched, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("_mj").isNotNull, array_join(kept, sep))
          .otherwise(col(textCol)))
      .withColumn("n_scrubbed",
        // size(NULL) is -1 under the legacy default, so guard on the
        // match row's presence rather than coalescing the size
        when(col("_mj").isNotNull, size(col("_mj")).cast("long"))
          .otherwise(lit(0L)))
      .drop("_ls", "_mj")
  }
}
