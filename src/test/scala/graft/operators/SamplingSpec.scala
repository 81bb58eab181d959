package graft.operators

import graft.SparkSpec

/** [[Sampling.stratifiedByHash]]: deterministic (same input → same
  * sample), per-stratum rates honored approximately, rate-0/1 edges
  * exact, and the unlisted-stratum default applied.
  */
class SamplingSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val rows = (0 until 4000).map { i =>
    (i.toLong, Seq("en", "fr", "zh")(i % 3))
  }
  private def df = rows.toDF("id", "lang")

  test("deterministic, rates honored, edges exact") {
    def sample() = Sampling.stratifiedByHash(
      df, key = $"id".cast("string"), stratum = $"lang",
      rates = Map("en" -> 0.25, "fr" -> 0.0), default = 1.0, seed = 7)
    val s1 = sample().collect().map(_.getLong(0)).toSet
    val s2 = sample().collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash sampling must be reproducible")

    val byLang = sample().groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perStratum = rows.size / 3
    assert(!byLang.contains("fr"), "rate 0.0 must drop the stratum entirely")
    assert(byLang("zh") == perStratum, "default 1.0 must keep every row")
    // 25% of ~1334, hash-binomial: allow a generous band, exactness is
    // pinned by the q45 oracle hash-match, not by this distribution check
    val en = byLang("en").toDouble / perStratum
    assert(en > 0.15 && en < 0.35, s"en keep-rate $en far from 0.25")
  }

  test("subsets nest: a lower rate samples a subset of a higher rate") {
    // same key+seed ⇒ the 10% sample is contained in the 30% sample —
    // the property that makes hash sampling auditable across reruns
    def ids(rate: Double) = Sampling.stratifiedByHash(
      df, $"id".cast("string"), $"lang", Map.empty, rate, seed = 7)
      .collect().map(_.getLong(0)).toSet
    assert(ids(0.1).subsetOf(ids(0.3)))
  }

  test("invalid rates rejected") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedByHash(df, $"id", $"lang", Map("en" -> 1.5), 1.0, 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedByHash(df, $"id", $"lang", Map.empty, -0.1, 1)
    }
  }

  test("perGroupCapByHash: exact cap per group, deterministic, dense ranks") {
    def sample() = Sampling.perGroupCapByHash(
      df, group = $"lang", key = $"id".cast("string"), cap = 100, seed = 9)
    val byLang = sample().groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ == 100L),
      s"every 1333-row group must cap at exactly 100, got $byLang")
    assert(sample().collect().map(_.getLong(0)).toSet
      == sample().collect().map(_.getLong(0)).toSet)
    // ranks are 1..cap with no gaps — the quota is filled, not sparse
    val ranks = sample().filter($"lang" === "en")
      .select($"sample_rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to 100L), "ranks must be dense 1..cap")
  }

  test("perGroupCapByHash: groups under the cap keep every row") {
    val small = (0 until 30).map(i => (i.toLong, if (i < 5) "rare" else "common"))
      .toDF("id", "lang")
    val out = Sampling.perGroupCapByHash(small, $"lang", $"id".cast("string"),
      cap = 10, seed = 9)
    val byLang = out.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("rare" -> 5L, "common" -> 10L), byLang)
  }

  test("epochMix: integer weights replicate exactly, epochs dense from 0") {
    val out = Sampling.epochMix(df, $"id".cast("string"), $"lang",
      Map("en" -> 2.0, "fr" -> 0.0), default = 1.0, seed = 7)
    val epochs = out.filter($"lang" === "en").groupBy($"id")
      .agg(sort_array(collect_list($"epoch")).as("e"))
      .select($"e").distinct().collect().map(_.getSeq[Long](0))
    assert(epochs.toSeq == Seq(Seq(0L, 1L)),
      "weight 2.0 must give every row exactly epochs [0, 1]")
    assert(out.filter($"lang" === "fr").count() == 0L, "weight 0 drops the stratum")
    val zh = out.filter($"lang" === "zh").groupBy($"id").count()
      .select($"count").distinct().collect().map(_.getLong(0))
    assert(zh.toSeq == Seq(1L), "default 1.0 keeps one epoch-0 copy")
  }

  test("epochMix: fractional epoch is a hash-selected subset, reproducible") {
    def run() = Sampling.epochMix(df, $"id".cast("string"), $"lang",
      Map("en" -> 1.5), default = 1.0, seed = 7)
    val en = run().filter($"lang" === "en")
    val perEpoch = en.groupBy($"epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = rows.count(_._2 == "en").toLong
    assert(perEpoch(0L) == base, "epoch 0 carries every row of the stratum")
    val frac = perEpoch(1L).toDouble / base
    assert(frac > 0.4 && frac < 0.6, s"fractional epoch keep-rate $frac far from 0.5")
    assert(run().collect().toSet == run().collect().toSet, "must be reproducible")
    // rows granted the fractional epoch have BOTH epochs (it is a replica,
    // not a substitute)
    val maxByRow = en.groupBy($"id").agg(
      count(lit(1)).as("n"), max($"epoch").as("m")).collect()
    assert(maxByRow.forall(r => r.getLong(1) == r.getLong(2) + 1),
      "epochs must be dense 0..n-1 per row")
  }

  test("splitByGroupHash: dup groups never span splits; naive per-row hash does") {
    // 400 distinct texts, each duplicated 3x -> 1200 rows
    val dups = (0 until 1200).map(i => (i.toLong, s"text${i % 400}"))
      .toDF("id", "text")
      .withColumn("th", graft.functions.GraftFunctions.hash64($"text", 5))
    val bounds = Seq("train" -> 80, "val" -> 90, "test" -> 100)
    val safe = Sampling.splitByGroupHash(dups, $"th", $"id", bounds, seed = 19)
    val spanningSafe = safe.groupBy($"th")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(spanningSafe == 0L, "group-hash split must keep dup groups together")
    val bySplit = safe.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit)
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"),
      s"80/10/10 weighting should dominate train: $bySplit")
    // negative control: hashing each ROW (group = id) assigns copies of
    // the same text independently -> leakage the operator exists to stop
    val naive = Sampling.splitByGroupHash(dups, $"id", $"id", bounds, seed = 19)
    val spanningNaive = naive.groupBy($"th")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(spanningNaive > 0L,
      "per-row hashing must demonstrably leak on duplicated data")
  }

  test("splitByGroupHash: a null group is assigned (one unit), not silently dropped") {
    // null text -> null group key; groupBy keeps it as a group, and the
    // null-safe join must carry its rows into exactly one split
    val withNull = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None))
      .toDF("id", "g")
    val bounds = Seq("train" -> 80, "test" -> 100)
    val out = Sampling.splitByGroupHash(withNull, $"g", $"id", bounds, seed = 3)
    assert(out.count() == 4L, "null-group rows must survive the join")
    val nullSplits = out.filter($"g".isNull)
      .select($"split").distinct().collect().map(_.getString(0))
    assert(nullSplits.length == 1, "the null group moves as one unit")
  }

  test("splitByGroupHash: invalid bounds rejected") {
    intercept[IllegalArgumentException] {
      Sampling.splitByGroupHash(df, $"lang", $"id", Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByGroupHash(df, $"lang", $"id",
        Seq("a" -> 90, "b" -> 80), 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByGroupHash(df, $"lang", $"id", Seq("a" -> 99), 1)
    }
  }

  test("epochMix: negative weights rejected") {
    intercept[IllegalArgumentException] {
      Sampling.epochMix(df, $"id", $"lang", Map("en" -> -0.5), 1.0, 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochMix(df, $"id", $"lang", Map.empty, -1.0, 1)
    }
  }

  test("sqrtTemperatureMix: flattens the head, keeps order, honors budget") {
    // 3000 en vs 600 fr vs 400 zh: sqrt-temperature must raise the
    // tail languages' keep-rate above the head's without inverting
    // the kept-count order
    val skewed = (0 until 4000).map { i =>
      (i.toLong, if (i < 3000) "en" else if (i < 3600) "fr" else "zh")
    }.toDF("id", "lang")
    val cuts = Sampling.temperatureCuts(
      Seq("en" -> 3000L, "fr" -> 600L, "zh" -> 400L),
      budgetNum = 1, budgetDen = 2, granularity = 10000).toMap
    assert(cuts("zh") > cuts("fr") && cuts("fr") > cuts("en"),
      s"rarer strata must keep a HIGHER rate: $cuts")
    val kept = Sampling.sqrtTemperatureMix(skewed, $"id".cast("string"),
        $"lang", budgetNum = 1, budgetDen = 2, seed = 9)
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") > kept("fr") && kept("fr") > kept("zh"),
      s"temperature flattens, it must not invert: $kept")
    val total = kept.values.sum.toDouble
    assert(total > 4000 * 0.4 && total < 4000 * 0.6,
      s"half-corpus budget honored approximately: $total")
  }

  test("temperatureCuts: rate capped at 1; tiny stratum cannot overdraw") {
    val cuts = Sampling.temperatureCuts(
      Seq("big" -> 10000L, "tiny" -> 4L),
      budgetNum = 9, budgetDen = 10, granularity = 10000).toMap
    assert(cuts("tiny") == 10000L,
      s"a stratum below its share keeps everything, never more: $cuts")
    intercept[IllegalArgumentException] {
      Sampling.sqrtTemperatureMix(df, $"id".cast("string"), $"lang",
        budgetNum = 3, budgetDen = 2, seed = 1)
    }
  }

  test("weightedSample: deterministic, n rows, dense 1-based rank") {
    def run() = Sampling.weightedSample(
      df, "id", lit(1.0), n = 25, seed = 17)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "exponential race must be reproducible")
    assert(a.length == 25 && a.map(_._1).toSeq == (1L to 25L),
      s"dense 1-based rn over exactly n survivors: ${a.toSeq}")
  }

  test("weightedSample: extreme weights decide the race") {
    // 10 rows at weight 1e9 vs 3990 at 1e-9: a heavy key is
    // -ln(u)/1e9 ≤ ~2e-8, a light key ≥ -ln(1 - 1e-6)/1e-9 ≈ 1e3
    // except when u = 1 exactly (p = 1e-6 per row, and deterministic
    // here: no light row draws it under seed 17) — every winner must
    // be heavy
    val weighted = Sampling.weightedSample(
      df, "id", when($"id" < 10, 1e9).otherwise(1e-9), n = 10, seed = 17)
    val winners = weighted.collect().map(_.getLong(1)).toSet
    assert(winners == (0L until 10L).toSet,
      s"heavy rows must own the top-10: $winners")
  }

  test("weightedSample: short input returns every row, ranked") {
    val out = Sampling.weightedSample(
      df.filter($"id" < 5), "id", lit(2.0), n = 100, seed = 17)
    assert(out.count() == 5L, "limit past the input keeps all rows")
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "id", lit(1.0), n = 0, seed = 17)
    }
  }
}
