package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.words

/** Sequence packing: assign documents to fixed-token-budget training
  * packs ("fill 2048-token context windows with shuffled documents") —
  * the step between corpus selection and batch writing in an LLM data
  * pipeline.
  *
  * Packing contract: documents are laid out in the deterministic
  * hash-shuffled order of [[TokenBudget.take]] and
  * `pack_id = (cumulative tokens BEFORE the document) intdiv packSize` —
  * i.e. a document starts in the pack where its first token lands, and
  * long documents may span pack boundaries (the trainer's
  * concat-then-slice view). This is a pure function of the corpus, the
  * id hash, and `packSize`: reproducible across runs and engines, and
  * O(1) per row on top of the global prefix sum.
  *
  * Scale shape: the prefix sum is TokenBudget's two-phase form (range
  * partitions + per-partition totals + broadcast offsets — never a
  * single-partition window), and the pack assignment is a narrow
  * projection over it. The natural alternative — greedy first-fit
  * bin-packing — is inherently sequential (each decision depends on
  * every earlier bin's fill) and cannot scale past one task; the
  * cumulative-offset contract is the distributable formulation.
  */
object Packing {

  /** @param df       input; must contain `idCol` and `tokenCol`
    * @param idCol    unique id (hash of it fixes the layout order)
    * @param tokenCol per-row token count (integer-typed)
    * @param packSize tokens per pack (context window length)
    * @return input rows plus `cum_tokens` (running total including the
    *         row) and `pack_id` (0-based pack of the row's FIRST token)
    */
  def sequencePack(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      packSize: Long,
      numParts: Int = 32): DataFrame = {
    require(packSize > 0, "packSize must be positive")
    TokenBudget.take(df, idCol, tokenCol, budget = Long.MaxValue, numParts)
      .withColumn("pack_id",
        expr(s"(cum_tokens - $tokenCol) div $packSize"))
  }

  /** Context-window chunking — the per-DOCUMENT companion to
    * [[sequencePack]]'s cross-document layout: split each document's
    * token sequence into windows of at most `maxLen` tokens, a new
    * window starting every `stride` tokens (overlap = maxLen − stride;
    * stride = maxLen is non-overlapping tiling). The standard prep for
    * models whose context is shorter than the documents: every token
    * lands in at least one window, and each window break re-reads the
    * last `maxLen − stride` tokens for continuity.
    *
    * One row per (document, window): `chunk_idx` (0-based), the token
    * `chunk_start` offset, the window's `n_tokens` (< maxLen only on a
    * document's tail), and the window text. Tokenization is the
    * repo-wide whitespace `words()` convention, under which the empty
    * string is ONE empty token — so an empty/whitespace document
    * yields a single empty-text chunk, not zero rows; callers that
    * must not count that token filter empty texts upstream (the
    * synthetic corpora carry none).
    *
    * Scale shape: a narrow per-row explode — no shuffle, no state; the
    * fan-out is ≤ ceil(doc_tokens / stride) rows per document, so
    * output mass is ~(maxLen/stride)× the corpus and each output row is
    * bounded by `maxLen` tokens regardless of document length.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  maxLen: Int, stride: Int): DataFrame = {
    require(maxLen >= 1, "maxLen must be >= 1")
    require(stride >= 1 && stride <= maxLen,
      "stride must be in [1, maxLen] (stride > maxLen would drop tokens)")
    df.withColumn("_w", words(col(textCol)))
      .withColumn("_n", size(col("_w")))
      .filter(col("_n") >= 1)
      .select(col(idCol), col("_w"), col("_n"),
        posexplode(sequence(lit(0), col("_n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(maxLen), col("_n") - col("chunk_start")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", slice(col("_w"), col("chunk_start") + 1, lit(maxLen)))
          .as("chunk_text"))
  }
}
