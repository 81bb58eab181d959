package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deterministic sampling for training-data pipelines. `sample(rand())`
  * cannot be re-run, audited, or oracle-checked; a key-hash cut can —
  * and it is a narrow scan-adjacent predicate (no shuffle, pushes past
  * nothing it shouldn't), so at 100 TB the sample is priced at one scan.
  * Complements the flat cut in q38 (hash-mod sampling) with per-stratum
  * rates — the "rebalance the language / source mix" primitive.
  */
object Sampling {

  /** Stratified deterministic sample: keep a row iff
    * `hash64(key, seed) % granularity < rate(stratum) · granularity`.
    * `rates` maps stratum values to keep-rates in [0,1]; unlisted
    * strata use `default`. The decision depends only on (key, seed,
    * stratum), so the sample is reproducible across runs/engines and
    * composable: the q38-style flat cut is the single-stratum case.
    * `granularity` bounds rate resolution (1/granularity).
    */
  def stratifiedByHash(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double], default: Double,
                       seed: Int, granularity: Int = 10000): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    require((rates.values.toSeq :+ default).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    // rates is a tiny literal table: a CASE chain keeps the predicate
    // codegen'd and scan-adjacent (a broadcast-join rate table would
    // put a join between the scan and the filter)
    val cut = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(default * granularity))) { case (acc, (k, r)) =>
      when(stratum === k, lit(math.round(r * granularity))).otherwise(acc)
    }
    df.filter(hash64(key, seed) % granularity < cut)
  }
}
