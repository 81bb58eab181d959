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

  /** Rebalance a corpus to a target stratum mixture ("the training mix
    * should be 40% en / 15% each of the rest") by deterministic
    * hash-downsampling of the over-represented strata.
    *
    * Target shares are exact rationals `stratum -> (num, den)`; strata
    * absent from `targets` are dropped (a mixture is a closed set).
    * The achievable corpus size is `T = min_s floor(n_s * den / num_s)`
    * — the largest total for which every stratum can fill its share
    * from its observed `n_s` — and each stratum keeps
    * `floor(T * num_s / den)` rows via a hash cut at
    * `floor(kept_s * granularity / n_s)`. All thresholds are BIGINT
    * arithmetic: bit-identical across engines, no float rounding.
    *
    * Scale shape: ONE partial-agg histogram scan over (stratum) — never
    * the rows — whose result is O(strata) rows by construction (strata
    * are languages/sources, not documents) and is collected to the
    * driver; `T` and the per-stratum cuts are computed there in exact
    * Long arithmetic and broadcast back as a LITERAL threshold table
    * into the final narrow filter. The earlier all-lazy formulation
    * nested the histogram aggregate inside three correlated subtrees
    * (T subquery, threshold projection, final join), so absent exchange
    * reuse the corpus was scanned twice just to derive the tiny
    * thresholds; the driver gather — same documented O(strata) shape as
    * [[TokenBudget]]'s O(numParts) offset gather — makes it exactly one
    * histogram scan plus one filter scan. The row-keep decision depends
    * only on (key, seed, stratum histogram), so the sample is
    * reproducible and auditable. Note the histogram job runs eagerly at
    * plan-build time.
    *
    * The hash cut keeps ≈`kept_s` rows (binomial noise around the rate,
    * exactly reproducible for a fixed corpus) — the contract is the
    * threshold arithmetic, not an exact row count.
    */
  def rebalanceToMix(df: DataFrame, key: Column, stratum: Column,
                     targets: Map[String, (Int, Int)],
                     seed: Int, granularity: Int = 10000): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall { case (n, d) => n > 0 && d >= n },
      "target shares must be rationals in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._

    val hist: Map[String, Long] = df
      .select(stratum.cast("string").as("_stratum"))
      .filter($"_stratum".isin(targets.keys.toSeq: _*))
      .groupBy($"_stratum").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min_s (n_s * den intdiv num_s) over strata PRESENT in the
    // corpus — the largest total every observed stratum can fill its
    // share of. Long (not double) division: counts at 100 TB exceed
    // 2^53, where double arithmetic silently loses exactness.
    val present = targets.toSeq.sortBy(_._1).collect {
      case (k, (num, den)) if hist.contains(k) => (k, num.toLong, den.toLong)
    }
    val cuts = if (present.isEmpty) Seq.empty[(String, Long)] else {
      val t = present.map { case (k, num, den) => hist(k) * den / num }.min
      present.map { case (k, num, den) =>
        (k, t * num / den * granularity / hist(k)) }
    }
    val thresholds = broadcast(cuts.toDF("_stratum", "_cut"))
    df.join(thresholds, stratum === $"_stratum")
      .filter(hash64(key, seed) % granularity < $"_cut")
      .drop("_stratum", "_cut")
  }

  /** Epoch-weighted oversampling: realize a training mixture whose
    * per-stratum weights may EXCEED 1 — "2.5 epochs of src0, 0.3 of
    * src1" — by replicating rows, the step [[stratifiedByHash]] (rates
    * capped at 1) cannot express. A row in a stratum of weight `w`
    * appears `floor(w)` times (epoch ids 0..floor(w)−1) plus once more
    * — as its final epoch — iff `hash64(key, seed) % granularity`
    * falls under the fractional part, so every realized epoch has the
    * expected row mass and the whole layout is a pure function of
    * (key, seed, weights): reproducible, auditable, oracle-checkable.
    * Weight 0 drops the stratum; weights below 1 degrade to exactly
    * the stratified sample.
    *
    * Adds `epoch` (0-based long). Scale shape: narrow per-row explode,
    * fan-out ceil(w) per row, no shuffle — the epoch column is what a
    * downstream [[graft.operators.Packing.sequencePack]] keys on so
    * replicas land in distinct packs.
    */
  def epochMix(df: DataFrame, key: Column, stratum: Column,
               weights: Map[String, Double], default: Double,
               seed: Int, granularity: Int = 10000): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    require((weights.values.toSeq :+ default).forall(_ >= 0.0),
      "weights must be >= 0")
    // exact per-stratum (full epochs, fractional cut) computed driver-side
    def split(w: Double): (Int, Long) = {
      val full = math.floor(w).toInt
      (full, math.round((w - full) * granularity))
    }
    val (dFull, dCut) = split(default)
    val (fullCol, cutCol) = weights.toSeq.sortBy(_._1)
      .foldLeft((lit(dFull), lit(dCut))) { case ((f, c), (k, w)) =>
        val (kf, kc) = split(w)
        (when(stratum === lit(k), lit(kf)).otherwise(f),
         when(stratum === lit(k), lit(kc)).otherwise(c))
      }
    val nCopies = fullCol +
      when(hash64(key, seed) % granularity < cutCol, lit(1)).otherwise(lit(0))
    df.withColumn("_nc", nCopies)
      .filter(col("_nc") >= 1) // sequence(0,-1) would count DOWN, not empty
      .withColumn("epoch", explode(sequence(lit(0L), col("_nc") - 1L)))
      .drop("_nc")
  }

  /** Leakage-safe train/val/test assignment: hashing each ROW into a
    * split leaks when the corpus contains duplicates — two copies of
    * one text can land in train and test, contaminating the eval by
    * construction. The safe rule implemented here: elect each group's
    * canonical member (min `id` — with `group` = a dup-cluster key such
    * as the exact text hash or a q36 component id), and hash the
    * CANONICAL id for the entire group's assignment, so a duplicate
    * set moves between splits as one unit.
    *
    * `bounds` are cumulative percent cut-offs in ascending order, e.g.
    * `("train" → 80, "val" → 90, "test" → 100)`: a group lands in the
    * first label whose bound exceeds `hash64(canon, seed) % 100`. Adds
    * `split` (and keeps `_canon` internal). One shuffle on `group` for
    * the canonical election + one equi-join back; the decision is a
    * pure function of (group contents, seed) — reproducible and
    * auditable like every hash rule in this module.
    */
  def splitByGroupHash(df: DataFrame, group: Column, id: Column,
                       bounds: Seq[(String, Int)], seed: Int): DataFrame = {
    require(bounds.nonEmpty, "bounds must be non-empty")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      "bounds must be ascending cumulative percents")
    require(bounds.last._2 == 100, "last bound must be 100 (cover every hash)")
    val canon = df.groupBy(group.as("_sg")).agg(min(id).as("_canon"))
    val b = hash64(col("_canon").cast("string"), seed) % 100
    val split = bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((label, ub), els) => when(b < ub, lit(label)).otherwise(els)
    }
    // null-safe equality: a null group is a legitimate grouping key
    // (groupBy keeps it), and a plain === join would silently DROP its
    // rows from the assignment — the one failure mode a leakage-safety
    // utility must not have
    df.join(canon, group <=> col("_sg"))
      .withColumn("split", split)
      .drop("_sg", "_canon")
  }

  /** Equal-allocation sampling: keep AT MOST `cap` rows per `group`,
    * chosen in deterministic `hash64(key, seed)` order (ties broken by
    * the key itself) — the "diversity sample" primitive: with `group` =
    * a cluster / language / source id, every group contributes up to
    * the same quota regardless of its natural size, so the head of a
    * skewed distribution can't crowd out its tail. Adds `sample_rank`
    * (1-based within the group).
    *
    * Needs one shuffle on `group` for the within-group rank. That is
    * the right plan while `groups × cap` (the OUTPUT) is the small side
    * — the usual diversity-sampling regime. If a single group's INPUT
    * is itself too large for one task's sort, switch to rate semantics
    * ([[stratifiedByHash]] with rate ≈ cap/n_g): a narrow filter, at
    * the cost of approximate (binomial) per-group counts.
    *
    * `key` must be unique per row WITHIN each group (q66 keys by
    * `vec_id`, a primary key): the order is `(hash64(key), key)`, so
    * rows sharing a key value tie on both terms and their
    * `sample_rank` assignment — hence which of them survives the cap
    * — would depend on partitioning, not on the data.
    */
  def perGroupCapByHash(df: DataFrame, group: Column, key: Column,
                        cap: Int, seed: Int): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(hash64(key, seed), key)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= cap)
  }

  /** Temperature-scaled mixture sampling (the multilingual α-sampling
    * rebalance, fixed at α = 0.5): derive each stratum's target share
    * from its OWN corpus count as `q_s = √c_s / Σ√c`, flattening the
    * head without inverting the order — then realize the mix as a
    * deterministic hash cut sized to a `budgetNum/budgetDen` fraction
    * of the corpus. [[rebalanceToMix]] takes the mixture as GIVEN
    * exact rationals; this DERIVES it from the data, which is how the
    * "don't let English drown the tail languages" dial is actually
    * set. α is fixed at 0.5 because `sqrt` is IEEE-correctly-rounded
    * in every engine while a general `pow` is not (the q60 libm
    * lesson); other temperatures would need the rounding quarantine.
    *
    * Determinism contract: per-stratum counts are exact longs, each
    * √c rounds to 6, their sum is an exact decimal (order-free), the
    * rate `min(1, budget·q_s / c_s)` is pure IEEE arithmetic over
    * identical doubles, and the cut is `floor(rate · granularity)` —
    * integer-compared against the hash, so the oracle derives the
    * identical thresholds from its own GROUP BY.
    *
    * Scale shape: ONE O(strata) histogram collect (the
    * [[rebalanceToMix]] precedent), thresholds return as a LITERAL
    * CASE chain — the keep decision is scan-adjacent, no join. The
    * histogram job runs eagerly at plan-build time.
    */
  def sqrtTemperatureMix(df: DataFrame, key: Column, stratum: Column,
                         budgetNum: Int, budgetDen: Int, seed: Int,
                         granularity: Int = 10000): DataFrame = {
    require(budgetNum > 0 && budgetDen >= budgetNum,
      "budget must be a fraction in (0, 1]")
    require(granularity > 0, "granularity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.select(stratum.cast("string").as("_stratum"))
      .groupBy($"_stratum").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    applyCuts(df, key, stratum,
      temperatureCuts(hist, budgetNum, budgetDen, granularity),
      seed, granularity)
  }

  /** The hash-cut filter under a precomputed threshold table — the
    * literal CASE chain [[stratifiedByHash]] and
    * [[sqrtTemperatureMix]] both compile to, exposed so callers that
    * already hold the histogram (e.g. to echo the cuts in a report)
    * apply it without a second histogram job. Strata absent from
    * `cuts` are dropped (cut 0).
    */
  def applyCuts(df: DataFrame, key: Column, stratum: Column,
                cuts: Seq[(String, Long)], seed: Int,
                granularity: Int): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    val cut = cuts.foldLeft(lit(0L)) { case (acc, (k, c)) =>
      when(stratum === k, lit(c)).otherwise(acc)
    }
    df.filter(hash64(key, seed) % granularity < cut)
  }

  /** The [[sqrtTemperatureMix]] threshold table from a stratum
    * histogram — exposed so reports can echo the cuts they sampled
    * under. `(stratum, floor(min(1, budget·q_s/c_s)·granularity))`.
    */
  def temperatureCuts(hist: Seq[(String, Long)], budgetNum: Int,
                      budgetDen: Int, granularity: Int): Seq[(String, Long)] = {
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = hist.map { case (k, c) => (k, c, round6(math.sqrt(c.toDouble))) }
    val wsum = w.map { case (_, _, wi) => BigDecimal(wi) }
      .foldLeft(BigDecimal(0))(_ + _).toDouble
    val nOut = hist.map(_._2).sum * budgetNum / budgetDen
    w.map { case (k, c, wi) =>
      val rate = math.min(1.0, nOut.toDouble * (wi / wsum) / c.toDouble)
      (k, math.floor(rate * granularity).toLong)
    }
  }

  /** Weighted sampling WITHOUT replacement via the exponential race
    * (Efraimidis & Spirakis 2006, the `-ln(u)/w` formulation): each
    * row draws a deterministic uniform `u` from `hash64(id, seed)`,
    * its race key is `-ln(u) / w`, and the `n` smallest keys win —
    * exactly a weighted draw of `n` rows without replacement, with
    * P(row first) = w/Σw. This is the quality-weighted selection
    * primitive ("sample the corpus proportional to the probe score")
    * that a plain hash cut ([[stratifiedByHash]]) cannot express:
    * there, a row's fate ignores every other row's weight.
    *
    * Fully parallel at 100 TB: the key is a narrow per-row expression
    * (no shuffle), and the cut is `orderBy + limit` —
    * TakeOrderedAndProject, a per-partition top-n merge, never a
    * global sort; the rank window runs over the `n` survivors only.
    *
    * Determinism contract:
    * `u = (hash64(id, seed) mod 10^6 + 1)/(10^6 + 1)` ∈ (0, 1) — never
    * 0 (the ln stays finite) and strictly BELOW 1, so `ln(u)` is
    * strictly negative and the key strictly positive: a key of −0.0/w
    * would round to 0.0 in Spark (BigDecimal normalizes the sign) but
    * stay −0.0 in DuckDB, and the two stringify differently in the
    * hash compare. `ln(u)` rounds to 9 right after the libm call (the
    * q37/q88 discipline), `w` must arrive pre-rounded from the caller,
    * and the key — one IEEE division of two rounded doubles — rounds
    * to 9 before ranking. Ties break on the id. `weight` must be > 0
    * for every row (a zero weight would divide by zero; rows that
    * should never win belong in a filter, not at weight 0).
    *
    * Returns `(rn, idCol, wgt, ekey)` ordered by `rn` 1-based.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     n: Int, seed: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val id = col(idCol)
    val u = ((hash64(id.cast("string"), seed) % 1000000 + 1)
      .cast("double") / 1000001.0)
    val keyed = df.select(id, weight.as("wgt"),
        round(log(u), 9).as("_lnu"))
      .select(id, col("wgt"), round(-col("_lnu") / col("wgt"), 9).as("ekey"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ekey").asc, id.asc)
    keyed.orderBy(col("ekey").asc, id.asc).limit(n)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("rn"), id, col("wgt"), col("ekey"))
      .orderBy(col("rn"))
  }
}
