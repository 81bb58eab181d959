package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hash64, shingles, words}

/** Round-11 query surface, part 3: corpus observability and
  * distribution audits — drift detection, whitening, mixture
  * reweighting, outlier scoring, shard IID audits, and diversity
  * metrics. Oracle-parity rules as in [[Queries]]/[[Queries2]]; the
  * PCA machinery is shared with [[Queries8]] (q103/q104).
  */
object Queries9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** `0.5 / ln 2` — the bits-per-event scaling of the JS divergence,
    * written as one double literal so both engines multiply by the
    * identical constant.
    */
  private val HalfInvLn2 = 0.7213475204444817

  // ------------------------------------------------------------ q106_js_drift
  /** Distribution-drift monitor: per-category Jensen–Shannon
    * divergence terms between the first and second half of the event
    * timeline — the check a curation pipeline runs before mixing a new
    * crawl snapshot into an old one (did the category mix move?). The
    * timeline midpoint is exact integer-microsecond arithmetic; both
    * halves are counted in ONE map-side-combined pass (no per-half
    * scans), so the operator is O(categories) after a single exchange
    * at any corpus size. Each JS term quantizes its one transcendental
    * (`ln`) at round-9 before the final deterministic multiply-add —
    * the q60 contract that keeps log-based scores bit-identical in
    * DuckDB. Summing `js_bits` over the output rows gives the total
    * divergence in bits (bounded by 1).
    */
  val q106JsDrift = QueryDef(
    "q106_js_drift",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type", unix_micros($"ts").as("_us"))
      val bounds = ev.agg(min($"_us").as("_lo"), max($"_us").as("_hi"))
      val counts = ev.crossJoin(broadcast(bounds))
        .select($"event_type",
          ($"_us" * 2 <= $"_lo" + $"_hi").as("_early"))
        .groupBy($"event_type")
        .agg(sum(when($"_early", 1L).otherwise(0L)).as("n_early"),
          sum(when($"_early", 0L).otherwise(1L)).as("n_late"))
      // totals via an unpartitioned window over the O(categories) counts
      // frame — a second aggregation branch would recompute the corpus
      // subtree (lineage, not a temp table) and double the scan count
      val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      val p = counts
        .withColumn("_te", sum($"n_early").over(all))
        .withColumn("_tl", sum($"n_late").over(all))
        .select($"event_type", $"n_early", $"n_late",
          round($"n_early".cast("double") / $"_te", 9).as("p_early"),
          round($"n_late".cast("double") / $"_tl", 9).as("p_late"))
        .withColumn("_m", ($"p_early" + $"p_late") / 2)
        .withColumn("_l1",
          when($"p_early" > 0, round(log($"p_early" / $"_m"), 9)).otherwise(0.0))
        .withColumn("_l2",
          when($"p_late" > 0, round(log($"p_late" / $"_m"), 9)).otherwise(0.0))
      p.select($"event_type", $"n_early", $"n_late", $"p_early", $"p_late",
          round(($"p_early" * $"_l1" + $"p_late" * $"_l2") * lit(HalfInvLn2), 9)
            .as("js_bits"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
      h AS (
        SELECT event_type,
               SUM(CASE WHEN us * 2 <= lo + hi THEN 1 ELSE 0 END) AS n_early,
               SUM(CASE WHEN us * 2 <= lo + hi THEN 0 ELSE 1 END) AS n_late
        FROM ev, b GROUP BY 1),
      tt AS (SELECT SUM(n_early) AS te, SUM(n_late) AS tl FROM h),
      p AS (
        SELECT event_type, n_early, n_late,
               round(CAST(n_early AS DOUBLE) / te, 9) AS p_early,
               round(CAST(n_late AS DOUBLE) / tl, 9) AS p_late
        FROM h, tt),
      l AS (
        SELECT *, (p_early + p_late) / 2 AS m FROM p),
      j AS (
        SELECT event_type, n_early, n_late, p_early, p_late,
               CASE WHEN p_early > 0 THEN round(ln(p_early / m), 9) ELSE 0 END AS l1,
               CASE WHEN p_late > 0 THEN round(ln(p_late / m), 9) ELSE 0 END AS l2
        FROM l)
      SELECT event_type, CAST(n_early AS BIGINT) AS n_early,
             CAST(n_late AS BIGINT) AS n_late, p_early, p_late,
             round((p_early * l1 + p_late * l2) * $HalfInvLn2, 9) AS js_bits
      FROM j ORDER BY event_type"""))

  // --------------------------------------------------------- q107_abtt_whiten
  /** ABTT whitening APPLY (the transform q104 audits): remove the top
    * principal direction from each centered embedding and report the
    * per-vector effect — norm before, projection magnitude, norm
    * after, and the shrink ratio — over a fixed audit slice
    * (`vec_id < 50`). Reuses the q103 power iteration
    * ([[Queries8.pcaPower]]): training is the corpus-linear part; the
    * apply itself is a narrow per-row map (dot against a broadcast
    * literal + scalar algebra — the `‖y‖²` expansion from q104, no
    * per-element projection array), so the full-corpus transform this
    * slice demonstrates runs shuffle-free at any scale. The ≤50-row
    * collect is the fixed audit slice, not the corpus; the driver
    * finish replays in SQL exactly (round-9 quantization at every
    * transcendental).
    */
  val q107AbttWhiten = {
    val Iters = 3; val Dims = 64
    QueryDef(
      "q107_abtt_whiten",
      (s, dir) => {
        import s.implicits._
        import graft.functions.GraftFunctions.dot
        import Queries8.{pcaPower, r9}
        val (cent, v, _) = pcaPower(s, dir, Iters, Dims)
        val vv = v.map(x => x * x).reduceLeft(_ + _)
        val vLit = typedLit(v.toSeq)
        val rows = cent.filter($"vec_id" < 50)
          .select($"vec_id", graft.functions.GraftFunctions.dot($"cv", $"cv").as("_cc"),
            dot($"cv", vLit).as("_raw"))
          .collect()
          .map { r =>
            val (id, cc, raw) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
            val dtr = r9(raw)
            val nb = r9(math.sqrt(cc))
            val na = r9(math.sqrt((cc - (2.0 * dtr * raw)) + ((dtr * dtr) * vv)))
            (id, nb, dtr, na, r9(na / nb))
          }
          .sortBy(_._1).toSeq
        cent.unpersist()
        rows.toDF("vec_id", "norm_before", "proj", "norm_after", "shrink")
          .orderBy($"vec_id")
      },
      Some(s"""
        WITH ${Queries8.pcaCtes(Iters, Dims)},
        x AS (
          SELECT vec_id,
                 ${Queries8.seqSum(s"list_transform(range(1, ${Dims + 1}), k -> cv[k] * cv[k])")} AS cc,
                 ${Queries8.seqSum(s"list_transform(range(1, ${Dims + 1}), k -> cv[k] * va[k])")} AS rawdot,
                 round(${Queries8.seqSum(s"list_transform(range(1, ${Dims + 1}), k -> cv[k] * va[k])")}, 9) AS dtr,
                 ${Queries8.seqSum(s"list_transform(range(1, ${Dims + 1}), k -> va[k] * va[k])")} AS vv
          FROM cent, v$Iters WHERE vec_id < 50),
        y AS (
          SELECT vec_id, round(sqrt(cc), 9) AS norm_before, dtr AS proj,
                 round(sqrt((cc - (2.0 * dtr * rawdot)) + ((dtr * dtr) * vv)), 9)
                   AS norm_after
          FROM x)
        SELECT vec_id, norm_before, proj, norm_after,
               round(norm_after / norm_before, 9) AS shrink
        FROM y ORDER BY vec_id"""))
  }

  // ---------------------------------------------------------- q108_doremi_mix
  /** DoReMi-style mixture reweighting (Xie et al. 2023, one
    * multiplicative-weights round): per-domain excess proxy loss (mean
    * bigram LM surprisal, the q60 scorer) over the global mean, domains
    * with positive excess upweighted by `exp(η·excess)` from the
    * document-count reference mixture, then renormalized. Everything
    * after the per-doc scoring pass is O(domains): two
    * map-side-combined aggregations plus one-row broadcast scalars —
    * at 100 TB the surprisal scan dominates and the reweighting is
    * free. The two transcendentals (`ln` inside the scorer, `exp`
    * here) are round-9-quantized at the point of evaluation, so the
    * oracle replays the arithmetic exactly.
    */
  val q108DoremiMix = {
    val Eta = 0.5
    QueryDef(
      "q108_doremi_mix",
      (s, dir) => {
        import s.implicits._
        import graft.operators.TextAnalysis
        val docs = t(s, dir, "documents")
        val scored = TextAnalysis.lmSurprisal(docs, "doc_id", "text")
          .join(docs.select($"doc_id", $"source"), "doc_id")
        val bySrc = scored.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            round(sum($"score".cast("decimal(27,12)")).cast("double")
              / count(lit(1)), 9).as("_mean"))
        val glob = scored.agg(
          round(sum($"score".cast("decimal(27,12)")).cast("double")
            / count(lit(1)), 9).as("_gmean"),
          count(lit(1)).as("_n"))
        val w = bySrc.crossJoin(broadcast(glob))
          .select($"source", $"n_docs",
            round($"n_docs".cast("double") / $"_n", 9).as("ref_weight"),
            greatest(lit(0.0), round($"_mean" - $"_gmean", 9)).as("excess_loss"))
          .withColumn("_unnorm",
            round($"ref_weight" * round(exp(round(lit(Eta) * $"excess_loss", 9)), 9), 9))
        val z = w.agg(round(sum($"_unnorm".cast("decimal(27,12)")).cast("double"), 9)
          .as("_z"))
        w.crossJoin(broadcast(z))
          .select($"source", $"n_docs", $"ref_weight", $"excess_loss",
            round($"_unnorm" / $"_z", 6).as("new_weight"))
          .orderBy($"source")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, list_transform(string_split(text, ' '),
                   x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
          FROM documents),
        uni AS (
          SELECT u, count(*) AS c1
          FROM (SELECT unnest(wh) AS u FROM toks) GROUP BY u),
        v AS (SELECT count(*) AS vsz FROM uni),
        big AS (
          SELECT doc_id,
                 list_reduce(list_concat([CAST(0 AS BIGINT)],
                     list_transform(list_slice(wh, i+1, i+2), x -> x % 1073741824)),
                   (a, b) -> (a * 37 + b) % 1073741789) AS bh,
                 wh[i+1] AS u1
          FROM toks, unnest(range(0, len(wh) - 1)) AS t(i)
          WHERE len(wh) >= 2),
        bc AS (SELECT bh, count(*) AS c12 FROM big GROUP BY bh),
        sc AS (
          SELECT big.doc_id,
                 CAST(round(ln(CAST(c1 + vsz AS DOUBLE) / (c12 + 1)) * 100, 0)
                   AS BIGINT) AS s
          FROM big JOIN bc USING (bh) JOIN uni ON uni.u = big.u1 CROSS JOIN v),
        score AS (
          SELECT doc_id, round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS score
          FROM sc GROUP BY doc_id),
        scored AS (
          SELECT d.source, score FROM score JOIN documents d USING (doc_id)),
        bysrc AS (
          SELECT source, count(*) AS n_docs,
                 round(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE)
                   / count(*), 9) AS smean
          FROM scored GROUP BY 1),
        gmn AS (
          SELECT round(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE)
                   / count(*), 9) AS gmean, count(*) AS n
          FROM scored),
        w AS (
          SELECT source, n_docs,
                 round(CAST(n_docs AS DOUBLE) / n, 9) AS ref_weight,
                 greatest(0.0, round(smean - gmean, 9)) AS excess_loss
          FROM bysrc, gmn),
        u AS (
          SELECT *, round(ref_weight
                   * round(exp(round($Eta * excess_loss, 9)), 9), 9) AS unnorm
          FROM w),
        z AS (SELECT round(CAST(SUM(CAST(unnorm AS DECIMAL(27,12))) AS DOUBLE), 9)
                AS z FROM u)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs, ref_weight, excess_loss,
               round(unnorm / z, 6) AS new_weight
        FROM u, z ORDER BY source"""))
  }

  // ------------------------------------------------------ q109_embed_outliers
  /** Embedding outlier scoring by diagonal Mahalanobis distance: per-
    * dimension mean/σ over the corpus (exact decimal sums), then each
    * vector's summed squared z-score; top-20 outliers — the audit that
    * catches corrupt encodes and distribution-breaking inputs before
    * they poison an index or a dedup pass. Two exchanges total at any
    * scale: one 64-group partial agg for the stats (broadcast back)
    * and one per-vector agg for the scores; top-k via the TakeOrdered
    * physical op, never a full sort. σ uses the population form
    * E[x²]−μ² clamped at 0, round-9 before the sqrt.
    */
  val q109EmbedOutliers = {
    val Dims = 64
    QueryDef(
      "q109_embed_outliers",
      (s, dir) => {
        import s.implicits._
        val ex = t(s, dir, "embeddings")
          .select($"vec_id", posexplode($"embedding").as(Seq("_d", "_xf")))
          .select($"vec_id", $"_d", $"_xf".cast("double").as("_x"))
        val st = ex.groupBy($"_d")
          .agg(
            round(sum($"_x".cast("decimal(27,12)")).cast("double")
              / count(lit(1)), 9).as("_mu"),
            round(sum(($"_x" * $"_x").cast("decimal(27,12)")).cast("double")
              / count(lit(1)), 9).as("_m2"))
          .select($"_d", $"_mu",
            round(sqrt(greatest(lit(0.0), round($"_m2" - $"_mu" * $"_mu", 9))), 9)
              .as("_sd"))
        ex.join(broadcast(st), "_d")
          .filter($"_sd" > 0)
          .select($"vec_id", round(($"_x" - $"_mu") / $"_sd", 9).as("_z"))
          .select($"vec_id", round($"_z" * $"_z", 9).as("_z2"))
          .groupBy($"vec_id")
          .agg(round(sum($"_z2".cast("decimal(27,12)")).cast("double"), 6)
            .as("z2_score"))
          .orderBy($"z2_score".desc, $"vec_id")
          .limit(20)
      },
      Some(s"""
        WITH ex AS (
          SELECT vec_id, d, embedding[d]::DOUBLE AS x
          FROM embeddings, unnest(range(1, ${Dims + 1})) AS t(d)),
        st0 AS (
          SELECT d,
                 round(CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                   / COUNT(*), 9) AS mu,
                 round(CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE)
                   / COUNT(*), 9) AS m2
          FROM ex GROUP BY d),
        st AS (
          SELECT d, mu,
                 round(sqrt(greatest(0.0, round(m2 - mu * mu, 9))), 9) AS sd
          FROM st0),
        z AS (
          SELECT vec_id, round(round((x - mu) / sd, 9) * round((x - mu) / sd, 9), 9) AS z2
          FROM ex JOIN st USING (d) WHERE sd > 0)
        SELECT vec_id,
               round(CAST(SUM(CAST(z2 AS DECIMAL(27,12))) AS DOUBLE), 6) AS z2_score
        FROM z GROUP BY vec_id ORDER BY z2_score DESC, vec_id LIMIT 20"""))
  }

  // --------------------------------------------------------- q110_shard_audit
  /** Shard IID audit: per-shard chi-square statistic of the language
    * distribution against the global mix, over the q48 deterministic
    * hash sharding — the check that a training order is free of
    * distribution stratification before it ships (a hot shard full of
    * one language destroys loss curves). O(shards × langs) after one
    * count pass: the expected-count grid is a broadcast cross of two
    * tiny aggregates, missing cells materialize as obs=0 via the left
    * join, and every arithmetic step is round-9-then-exact-decimal.
    */
  val q110ShardAudit = {
    val Shards = 8
    QueryDef(
      "q110_shard_audit",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
          .select($"doc_id", $"lang",
            (hash64($"doc_id".cast("string"), 5) % Shards).cast("long").as("shard"))
        val obs = d.groupBy($"shard", $"lang").agg(count(lit(1)).as("obs"))
        val st = d.groupBy($"shard").agg(count(lit(1)).as("_st"))
        val lt = d.groupBy($"lang").agg(count(lit(1)).as("_lt"))
        val n = d.agg(count(lit(1)).as("_n"))
        val langs = lt.agg(count(lit(1)).as("_l"))
        st.crossJoin(broadcast(lt))
          .join(obs, Seq("shard", "lang"), "left")
          .na.fill(0L, Seq("obs"))
          .crossJoin(broadcast(n))
          .select($"shard", $"_st",
            round(($"_st" * $"_lt").cast("double") / $"_n", 9).as("_e"), $"obs")
          .select($"shard", $"_st",
            round(($"obs" - $"_e") * ($"obs" - $"_e") / $"_e", 9).as("_term"))
          .groupBy($"shard")
          .agg(max($"_st").as("n_docs"),
            round(sum($"_term".cast("decimal(27,12)")).cast("double"), 6).as("chi2"))
          .crossJoin(broadcast(langs))
          .select($"shard", $"n_docs", ($"_l" - 1).cast("long").as("df"), $"chi2")
          .orderBy($"shard")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % $Shards AS shard
          FROM documents),
        stx AS (SELECT shard, COUNT(*) AS st FROM d GROUP BY 1),
        ltx AS (SELECT lang, COUNT(*) AS lt FROM d GROUP BY 1),
        nx AS (SELECT COUNT(*) AS n FROM d),
        lc AS (SELECT COUNT(*) AS l FROM ltx),
        ox AS (SELECT shard, lang, COUNT(*) AS obs FROM d GROUP BY 1, 2),
        cells AS (
          SELECT stx.shard, stx.st, ltx.lt, COALESCE(ox.obs, 0) AS obs
          FROM stx CROSS JOIN ltx
          LEFT JOIN ox ON ox.shard = stx.shard AND ox.lang = ltx.lang),
        terms AS (
          SELECT shard, st,
                 round((obs - e) * (obs - e) / e, 9) AS term
          FROM (SELECT shard, st, obs,
                       round(CAST(st * lt AS DOUBLE) / n, 9) AS e
                FROM cells, nx))
        SELECT shard, CAST(MAX(st) AS BIGINT) AS n_docs,
               CAST((SELECT l - 1 FROM lc) AS BIGINT) AS df,
               round(CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE), 6) AS chi2
        FROM terms GROUP BY shard ORDER BY shard"""))
  }

  // ------------------------------------------------------ q111_distinct_ngrams
  /** Corpus diversity by distinct-n (Li et al. 2016): per source, the
    * distinct-unigram and distinct-bigram ratios — the standard
    * mode-collapse / template-content detector for generated or
    * boilerplate-heavy sources (a source whose distinct-2 collapses is
    * a paraphrase mill). One tokenize pass per n feeding a
    * count-distinct exchange keyed by (source, gram) — partial-agged,
    * never a corpus-wide distinct — then an O(sources) join. Bigrams
    * reuse the [[graft.functions.GraftFunctions.shingles]] contract
    * (docs shorter than n contribute nothing, never a truncated gram).
    */
  val q111DistinctNgrams = QueryDef(
    "q111_distinct_ngrams",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val uni = docs.select($"source", explode(words($"text")).as("_w"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_tokens"), countDistinct($"_w").as("d_tokens"))
      val bi = docs.select($"source", explode(shingles(words($"text"), 2)).as("_g"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_bigrams"), countDistinct($"_g").as("d_bigrams"))
      uni.join(bi, "source")
        .select($"source", $"n_tokens", $"d_tokens",
          round($"d_tokens".cast("double") / $"n_tokens", 6).as("distinct1"),
          $"n_bigrams", $"d_bigrams",
          round($"d_bigrams".cast("double") / $"n_bigrams", 6).as("distinct2"))
        .orderBy($"source")
    },
    Some("""
      WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      uni AS (
        SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS d_tokens
        FROM w GROUP BY 1),
      tk AS (SELECT source, string_split(text, ' ') AS a FROM documents),
      bg AS (
        SELECT source, a[i] || ' ' || a[i+1] AS g
        FROM tk, unnest(range(1, len(a))) AS t(i)
        WHERE len(a) >= 2),
      bi AS (
        SELECT source, COUNT(*) AS n_bigrams, COUNT(DISTINCT g) AS d_bigrams
        FROM bg GROUP BY 1)
      SELECT source, n_tokens, d_tokens,
             round(CAST(d_tokens AS DOUBLE) / n_tokens, 6) AS distinct1,
             n_bigrams, d_bigrams,
             round(CAST(d_bigrams AS DOUBLE) / n_bigrams, 6) AS distinct2
      FROM uni JOIN bi USING (source) ORDER BY source"""))

  def all: Seq[QueryDef] = Seq(q106JsDrift, q107AbttWhiten, q108DoremiMix,
    q109EmbedOutliers, q110ShardAudit, q111DistinctNgrams)
}
