package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine, words}
import graft.operators.{Dedup, Retrieval}

/** Round-11 query surface, part 5: corpus-statistics audits (Zipf fit,
  * ingest novelty), estimator calibration (MinHash vs exact Jaccard),
  * and diversity-aware reranking (MMR). Oracle-parity rules as in
  * [[Queries]]/[[Queries2]].
  */
object Queries11 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------------- q116_zipf_fit
  /** Zipf-law fit per language: OLS slope of `ln freq ~ ln rank` over
    * each language's top-100 terms — the one-number sanity check that a
    * corpus slice is natural language (≈ −1) rather than template spam
    * (flat head) or tag soup (cliff), run per ingest in curation
    * observability. One tokenize pass → (lang, term) partial-agg
    * counts; the rank window partitions by language over the
    * vocab-sized count frame (Heaps-bounded, never corpus-sized); the
    * fit itself is conditional sums in the SAME grouped pass (vocab
    * rides along, no second scan — the q106 no-recompute shape).
    * Determinism: both `ln`s round to 9 right after the transcendental
    * (q37/q60 discipline), per-term products round to 9 (pure IEEE on
    * round-9 inputs), sums fold as exact decimals, the slope's final
    * double algebra is a fixed expression tree on exact-valued sums.
    */
  val q116ZipfFit = QueryDef(
    "q116_zipf_fit",
    (s, dir) => {
      import s.implicits._
      val tc = t(s, dir, "documents")
        .select($"lang", explode(words($"text")).as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1)).as("freq"))
      val xy = tc
        .withColumn("rn", row_number().over(
          Window.partitionBy($"lang").orderBy($"freq".desc, $"w")))
        .select($"lang", $"rn",
          round(log($"rn".cast("double")), 9).as("x"),
          round(log($"freq".cast("double")), 9).as("y"))
      def csum(c: org.apache.spark.sql.Column) =
        round(sum(when($"rn" <= 100, c.cast("decimal(27,12)")))
          .cast("double"), 9)
      xy.groupBy($"lang")
        .agg(count(lit(1)).as("vocab"),
          sum(when($"rn" <= 100, 1L).otherwise(0L)).as("n"),
          csum($"x").as("sx"), csum($"y").as("sy"),
          csum(round($"x" * $"y", 9)).as("sxy"),
          csum(round($"x" * $"x", 9)).as("sxx"))
        .select($"lang", $"vocab",
          // a single-point fit has zero x-variance — null, not 0/0 NaN
          // (the q147 guard pattern)
          when($"n" * $"sxx" - $"sx" * $"sx" > 0,
            round(($"n" * $"sxy" - $"sx" * $"sy")
              / ($"n" * $"sxx" - $"sx" * $"sx"), 6)).as("zipf_slope"))
        .orderBy($"lang")
    },
    Some("""
      WITH w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      tc AS (SELECT lang, w, COUNT(*) AS freq FROM w GROUP BY 1, 2),
      rk AS (
        SELECT lang, freq,
               ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY freq DESC, w) AS rn
        FROM tc),
      xy AS (
        SELECT lang, rn,
               round(ln(CAST(rn AS DOUBLE)), 9) AS x,
               round(ln(CAST(freq AS DOUBLE)), 9) AS y
        FROM rk),
      ag AS (
        SELECT lang, COUNT(*) AS vocab,
               CAST(SUM(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n,
               round(CAST(SUM(CASE WHEN rn <= 100
                 THEN CAST(x AS DECIMAL(27,12)) END) AS DOUBLE), 9) AS sx,
               round(CAST(SUM(CASE WHEN rn <= 100
                 THEN CAST(y AS DECIMAL(27,12)) END) AS DOUBLE), 9) AS sy,
               round(CAST(SUM(CASE WHEN rn <= 100
                 THEN CAST(round(x * y, 9) AS DECIMAL(27,12)) END)
                 AS DOUBLE), 9) AS sxy,
               round(CAST(SUM(CASE WHEN rn <= 100
                 THEN CAST(round(x * x, 9) AS DECIMAL(27,12)) END)
                 AS DOUBLE), 9) AS sxx
        FROM xy GROUP BY lang)
      SELECT lang, CAST(vocab AS BIGINT) AS vocab,
             CASE WHEN n * sxx - sx * sx > 0
               THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             END AS zipf_slope
      FROM ag ORDER BY lang"""))

  // ------------------------------------------------------- q117_ingest_novelty
  /** Marginal novelty per source: the fraction of each source's
    * DISTINCT 3-gram shingles whose FIRST corpus occurrence (min
    * doc_id = ingest order) lands in that source's documents — the
    * "does this crawl add content or re-serve what we have" call made
    * before paying to keep a snapshot, and the incremental twin of
    * q111's distinct-n diversity. Both counts are gram-set-level
    * (COUNT DISTINCT), so within-source repetition (boilerplate,
    * templates) cannot deflate the metric — an internally repetitive
    * but genuinely new crawl still scores 1. The exploded gram frame
    * feeds both the first-seen aggregate and the join-back side and is
    * deliberately NOT persisted: recomputing the narrow codegen'd
    * tokenize+hash pass is cheaper than caching a corpus×grams frame
    * (measured at 100×: persist 45 s vs recompute 23 s — the cache
    * write+read of ~1.5B exploded rows dwarfs the second scan). Gram
    * first-seen partial-aggs vocab-sized; the join back is a hash
    * equi-join — no pairwise anything, corpus-linear at any scale.
    */
  val q117IngestNovelty = QueryDef(
    "q117_ingest_novelty",
    (s, dir) => {
      import s.implicits._
      val g = t(s, dir, "documents")
        .select($"doc_id", $"source",
          explode(array_distinct(
            Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))))).as("h"))
      val first = g.groupBy($"h").agg(min($"doc_id").as("_first"))
      g.join(first, "h")
        .groupBy($"source")
        .agg(countDistinct($"doc_id").as("n_docs"),
          countDistinct($"h").as("n_grams"),
          countDistinct(when($"_first" === $"doc_id", $"h")).as("n_novel"))
        .select($"source", $"n_docs", $"n_grams", $"n_novel",
          round($"n_novel".cast("double") / $"n_grams", 6).as("novelty_frac"))
        .orderBy($"source")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      shf AS (
        SELECT doc_id, source,
               list_transform(range(0, len(w) - 2), i ->
                 ((wh[i+1] % 1073741824) * 37 + (wh[i+2] % 1073741824)) % 1073741789
                   * 41 + (wh[i+3] % 1073741824)) AS sh0
        FROM toks WHERE len(w) >= 3),
      g AS (
        SELECT doc_id, source, unnest(list_distinct(
                 list_transform(sh0, v -> v % 1073741789))) AS h
        FROM shf),
      f AS (SELECT h, min(doc_id) AS fd FROM g GROUP BY h)
      SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT h) AS BIGINT) AS n_grams,
             CAST(count(DISTINCT CASE WHEN fd = doc_id THEN h END) AS BIGINT)
               AS n_novel,
             round(CAST(count(DISTINCT CASE WHEN fd = doc_id THEN h END)
                 AS DOUBLE)
               / count(DISTINCT h), 6) AS novelty_frac
      FROM g JOIN f USING (h)
      GROUP BY source ORDER BY source"""))

  // --------------------------------------------------- q118_minhash_calibration
  /** MinHash estimator calibration: over the q11 LSH candidate pairs,
    * compare the 8-seed signature estimate (matching components / 8)
    * against exact shingle Jaccard, grouped by signature agreement —
    * the audit that tells you whether the dedup threshold you set on
    * the ESTIMATE means what you think in exact-Jaccard terms (and
    * whether 8 seeds are enough before a 100 TB run commits to them).
    * Same scale shape as q11 — banded bucket join, never all-pairs;
    * the calibration grid is O(seeds+1) rows. Estimates are exact
    * dyadic rationals (m/8); the exact Jaccard rounds to 6; means fold
    * as exact decimals.
    */
  val q118MinhashCalibration = QueryDef(
    "q118_minhash_calibration",
    (s, dir) => {
      import s.implicits._
      val shBase = t(s, dir, "documents")
        .select($"doc_id",
          Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
        .filter(size($"sh") > 0)
      // persist-guarded like q11: signature, bands, and both pair sides
      // consume this frame (the write-the-signature-table LSH shape)
      val sh = if (shBase.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        shBase.persist() else shBase
      val sig = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
      val bands = Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)
      val pairs = Dedup.lshCandidatePairs(bands, "doc_id")
      val side = sh.join(sig, "doc_id")
      val cal = pairs
        .join(side.select($"doc_id".as("id_a"), $"sh".as("sh_a"),
          $"sig".as("sig_a")), "id_a")
        .join(side.select($"doc_id".as("id_b"), $"sh".as("sh_b"),
          $"sig".as("sig_b")), "id_b")
        .select(
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
            .cast("long").as("sig_agree"),
          round(Dedup.jaccard($"sh_a", $"sh_b"), 6).as("jac"))
        .select($"sig_agree", $"jac",
          round(abs(round($"sig_agree" / 8.0, 6) - $"jac"), 6).as("err"))
      cal.groupBy($"sig_agree")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"jac".cast("decimal(27,12)")).as("_sj"),
          sum($"err".cast("decimal(27,12)")).as("_se"))
        .select($"sig_agree", $"n_pairs",
          round($"sig_agree" / 8.0, 6).as("mean_est"),
          round($"_sj".cast("double") / $"n_pairs", 6).as("mean_exact"),
          round($"_se".cast("double") / $"n_pairs", 6).as("mean_abs_err"))
        .orderBy($"sig_agree")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      shf AS (
        SELECT doc_id,
               list_transform(range(0, len(w) - 2), i ->
                 ((wh[i+1] % 1073741824) * 37 + (wh[i+2] % 1073741824)) % 1073741789
                   * 41 + (wh[i+3] % 1073741824)) AS sh0
        FROM toks WHERE len(w) >= 3),
      shx AS (SELECT doc_id, list_transform(sh0, v -> v % 1073741789) AS sh FROM shf),
      mh AS (
        SELECT doc_id,
               list_transform([31, 37, 41, 43, 47, 53, 59, 61], a ->
                 list_min(list_transform(sh,
                   h -> (a * (h % 1073741824) + a*7 + 3) % 1073741789))) AS sig
        FROM shx),
      bands AS (
        SELECT doc_id, b,
               md5(b || ':' || sig[2*b+1] || ',' || sig[2*b+2]) AS band_key
        FROM mh, unnest(range(0, 4)) AS tt(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM bands a JOIN bands c USING (b, band_key)
        WHERE a.doc_id < c.doc_id),
      cal AS (
        SELECT CAST(len(list_filter(range(1, 9),
                 i -> ma.sig[i] = mb.sig[i])) AS BIGINT) AS sig_agree,
               round(CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
                     / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jac
        FROM pairs
        JOIN shx sa ON sa.doc_id = id_a
        JOIN shx sb ON sb.doc_id = id_b
        JOIN mh ma ON ma.doc_id = id_a
        JOIN mh mb ON mb.doc_id = id_b),
      cal2 AS (
        SELECT sig_agree, jac,
               round(abs(round(sig_agree / 8.0, 6) - jac), 6) AS err
        FROM cal)
      SELECT sig_agree, CAST(count(*) AS BIGINT) AS n_pairs,
             round(sig_agree / 8.0, 6) AS mean_est,
             round(CAST(SUM(CAST(jac AS DECIMAL(27,12))) AS DOUBLE)
               / count(*), 6) AS mean_exact,
             round(CAST(SUM(CAST(err AS DECIMAL(27,12))) AS DOUBLE)
               / count(*), 6) AS mean_abs_err
      FROM cal2 GROUP BY sig_agree ORDER BY sig_agree"""))

  // ----------------------------------------------------------- q119_mmr_rerank
  /** Diversity-aware rerank ([[graft.operators.Retrieval.mmrRerank]]):
    * exact-cosine top-30 candidates for probe vector 0, then greedy
    * MMR (λ=0.7) picks 10 — relevance alone returns near-copies of the
    * probe's neighborhood; MMR spends the slots on coverage, which is
    * what a training-data selector or RAG context builder actually
    * wants. Candidate generation is the distributed half (map-only
    * cosine scan + TakeOrdered here; the IVF/PQ index paths q61/q71 at
    * 100 TB); the rerank is O(pool²) on a 30-row pool by contract. The
    * oracle replays the greedy exactly: ten unrolled argmax steps over
    * the same round-6 cosine grid, ties on vec_id.
    */
  val q119MmrRerank = {
    val Pool = 30
    val K = 10
    import KmeansSql.sqlCos
    // one unrolled greedy step: scores = λ·rel − (1−λ)·max sim to the
    // already-picked set, argmax by (score, vec_id)
    // every CTE is MATERIALIZED: the picked/sel chain references each
    // predecessor twice, so DuckDB's default inlining would expand the
    // ten-step chain exponentially (observed as fd exhaustion re-opening
    // the parquet once per expanded p0 copy)
    def step(n: Int): String = s"""
      sel$n AS MATERIALIZED (
        SELECT p.vec_id, p.rel, m.ms AS max_sim,
               round(0.7 * p.rel - (1.0 - 0.7) * m.ms, 6) AS score
        FROM p0 p
        JOIN (SELECT a, max(sim) AS ms FROM sims
              WHERE b IN (SELECT vec_id FROM picked${n - 1}) GROUP BY a) m
          ON m.a = p.vec_id
        WHERE p.vec_id NOT IN (SELECT vec_id FROM picked${n - 1})
        ORDER BY score DESC, p.vec_id LIMIT 1),
      picked$n AS MATERIALIZED (SELECT vec_id FROM picked${n - 1}
                   UNION ALL SELECT vec_id FROM sel$n)"""
    val steps = (2 to K).map(step).mkString(",", ",", "")
    val unionAll = (1 to K).map(n =>
      s"SELECT CAST($n AS BIGINT) AS pick_rank, vec_id, rel, max_sim, score FROM sel$n")
      .mkString(" UNION ALL ")
    QueryDef(
      "q119_mmr_rerank",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val qv = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
        val pool = e.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(qv))
          .select($"vec_id", $"embedding",
            round(cosine($"embedding", $"qv"), 6).as("rel"))
          .orderBy($"rel".desc, $"vec_id").limit(Pool)
        Retrieval.mmrRerank(pool, "vec_id", "embedding", "rel",
            k = K, lambda = 0.7)
          .orderBy($"pick_rank")
      },
      Some(s"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        p0 AS MATERIALIZED (
          SELECT vec_id, embedding AS cv,
                 ${sqlCos("embedding", "qv")} AS rel
          FROM embeddings, q WHERE vec_id <> 0
          ORDER BY rel DESC, vec_id LIMIT $Pool),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 ${sqlCos("a.cv", "b.cv")} AS sim
          FROM p0 a JOIN p0 b ON a.vec_id <> b.vec_id),
        sel1 AS MATERIALIZED (
          SELECT vec_id, rel, CAST(0.0 AS DOUBLE) AS max_sim,
                 round(0.7 * rel - (1.0 - 0.7) * 0.0, 6) AS score
          FROM p0 ORDER BY score DESC, vec_id LIMIT 1),
        picked1 AS MATERIALIZED (SELECT vec_id FROM sel1)$steps
        SELECT * FROM ($unionAll) ORDER BY pick_rank"""))
  }

  def all: Seq[QueryDef] = Seq(q116ZipfFit, q117IngestNovelty,
    q118MinhashCalibration, q119MmrRerank)
}
