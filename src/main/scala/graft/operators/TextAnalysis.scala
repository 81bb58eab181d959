package graft.operators

import org.apache.spark.sql.Column
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
}
