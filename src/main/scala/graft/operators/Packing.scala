package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
