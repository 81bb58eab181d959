package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hash64, shingles, words}

/** DSIR-style importance weighting — score every document by how much
  * its hashed n-gram distribution looks like a small TARGET domain
  * relative to the raw corpus (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): the standard
  * "select pretraining data that resembles the trusted set" workflow.
  * Reference scope: the reference pipeline has no learned selection;
  * north-star surface alongside the trained quality probe
  * ([[QualityProbe]] scores intrinsic quality; this scores DOMAIN fit).
  *
  * Model: unigram + bigram occurrences hash into `buckets` cells
  * (hashed n-gram features exactly as the paper); target and raw
  * bucket counts fit two add-1-smoothed bag-of-ngrams models; a
  * document's log importance weight is Σ_b count_b · ln(p̂_b / q̂_b).
  * Selection keeps the top-N by weight under a deterministic total
  * order (weight desc, id) — the auditable, re-runnable variant of the
  * paper's Gumbel-top-k resample (a hash-seeded Gumbel column could be
  * added per the q38 deterministic-sampling discipline, but rank
  * selection is what an audited pipeline can replay).
  *
  * Determinism contract: bucket log-ratios round to 9 after the `ln`
  * (libm last-ulp divergence — the q37/q88 discipline; everything
  * before the ln is exact-integer-valued doubles and IEEE division,
  * identical cross-engine), and per-document sums are exact decimal
  * adds of those rounded ratios (order-free), rounded to 6 before
  * ranking.
  *
  * Scale shape: bucket counts are ONE aggregation to `buckets` rows
  * (target and raw counted in the same pass via a conditional count —
  * no second scan, no left join), totals derive from those `buckets`
  * rows, and the ratio table broadcasts everywhere. The hashed gram
  * stream `(id, isTarget, bucket)` feeds both the fit and the scoring
  * pass, so it pins (the tokenize + md5 hash per gram is the dominant
  * cost — re-deriving it doubles the query); the pin is three narrow
  * columns, a fraction of the text it derives from. Cache lifetime
  * follows the winnowing-postings convention ([[Dedup.winnowPairs]]):
  * the returned plan consumes the pin lazily, callers clearCache()
  * between queries or let the ContextCleaner collect it. The
  * production shape for a REUSED target model is to persist the
  * `buckets`-row ratio table and skip the fit entirely; scoring is
  * then explode → broadcast lookup → one sum shuffle on the doc id.
  */
object Dsir {

  /** `(idCol, logw)` — the log importance weight of every document,
    * rounded to 6. `isTarget` marks the target-domain rows inside
    * `docs` (they stay in the raw model too, as in the paper's
    * raw-distribution fit over the full corpus).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int,
                        seed: Int): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    val id = col(idCol)
    val bDbl = buckets.toDouble
    val grams = docs.select(id, isTarget.as("_t"),
        explode(concat(words(col(textCol)),
          shingles(words(col(textCol)), 2))).as("_g"))
      .select(id, col("_t"), (hash64(col("_g"), seed) % buckets).as("_b"))
      .persist()
    val counts = grams.groupBy(col("_b")).agg(
      count(lit(1)).cast("double").as("_cr"),
      count(when(col("_t"), 1)).cast("double").as("_ct"))
    val tot = counts.agg(sum(col("_cr")).as("_tr"), sum(col("_ct")).as("_tt"))
    val ratio = counts.crossJoin(broadcast(tot))
      .select(col("_b"), round(log(
        ((col("_ct") + 1.0) / (col("_tt") + bDbl)) /
          ((col("_cr") + 1.0) / (col("_tr") + bDbl))), 9).as("_lr"))
    grams.join(broadcast(ratio), "_b")
      .groupBy(id)
      .agg(round(sum(col("_lr").cast("decimal(27,12)")).cast("double"), 6)
        .as("logw"))
  }

  /** Deterministic top-`n` resample of [[importanceWeights]]:
    * `(rn, idCol, logw)` ranked by (weight desc, id asc), `rn`
    * 1-based. The cut is `orderBy + limit` — TakeOrderedAndProject, a
    * distributed per-partition top-k merge — NOT an unpartitioned
    * window, which would drag the whole corpus-scale weights frame
    * through one task; the rank window runs over the `n` survivors
    * only. */
  def selectTopN(weights: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1, "n >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("logw").desc, col(idCol).asc)
    weights.orderBy(col("logw").desc, col(idCol).asc).limit(n)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("rn"), col(idCol), col("logw"))
      .orderBy(col("rn"))
  }
}
