package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 query surface: corpus-local retrieval, hybrid fusion, and
  * importance-weighted selection. Oracle-parity rules as in
  * [[Queries]]/[[Queries2]].
  */
object Queries7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Shared BM25 oracle chain (the q88 arithmetic, CTE-for-CTE): from a
    * `q (query_id, term)` CTE body to the ranked
    * `r (query_id, doc_id, score, rn)` — idf rounded to 9 after the
    * ln, per-term contributions rounded to 9, decimal contribution
    * sums rounded to 6 before the per-query rank. q88 cuts `r` at its
    * k; q90 cuts at its candidate depth and fuses.
    */
  private[graft] def bm25SqlCtes(qBody: String): String = s"""q AS ($qBody),
        tok AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS len,
                 unnest(string_split(text, ' ')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, len, term, CAST(count(*) AS DOUBLE) AS tf
          FROM tok GROUP BY 1, 2, 3),
        df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
                   AS avgdl
          FROM documents),
        idf AS (
          SELECT term, round(ln((n - df + 0.5) / (df + 0.5) + 1.0), 9) AS idf
          FROM df, stats),
        c AS (
          SELECT query_id, doc_id,
                 round(idf * (tf * (1.2 + 1.0)) /
                       (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)), 9) AS c
          FROM tf JOIN q USING (term) JOIN idf USING (term), stats),
        s AS (
          SELECT query_id, doc_id,
                 round(CAST(SUM(CAST(c AS DECIMAL(27,12))) AS DOUBLE), 6)
                   AS score
          FROM c GROUP BY 1, 2),
        r AS (
          SELECT query_id, doc_id, score,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS BIGINT) AS rn
          FROM s)"""

  // ----------------------------------------------------------------- q88_bm25
  /** BM25 top-5 retrieval ([[graft.operators.Retrieval.bm25TopK]]):
    * three fixed keyword queries ranked against the whole documents
    * table with Lucene-variant BM25 (k1 = 1.2, b = 0.75). The oracle
    * replays the arithmetic CTE-for-CTE ([[bm25SqlCtes]]).
    */
  val q88Bm25 = {
    val queryTerms: Seq[(Int, String)] = Seq(
      1 -> "spark", 1 -> "join", 1 -> "hash",
      2 -> "slow", 2 -> "scan", 2 -> "filter", 2 -> "vector",
      3 -> "customer", 3 -> "order", 3 -> "data")
    val sqlValues = queryTerms
      .map { case (q, w) => s"($q, '$w')" }.mkString(", ")
    QueryDef(
      "q88_bm25",
      (s, dir) => {
        import s.implicits._
        val queries = queryTerms.toDF("query_id", "term")
          .select($"query_id".cast("long"), $"term")
        graft.operators.Retrieval.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text", queries, k = 5)
      },
      Some(s"""
        WITH ${bm25SqlCtes(s"""
          SELECT CAST(query_id AS BIGINT) AS query_id, term
          FROM (VALUES $sqlValues) v(query_id, term)""")}
        SELECT query_id, rn, doc_id, score FROM r WHERE rn <= 5
        ORDER BY query_id, rn"""))
  }

  // ----------------------------------------------------------------- q89_dsir
  /** DSIR importance resampling ([[graft.operators.Dsir]]): hashed
    * unigram+bigram features (64 buckets, seed 89), target model fit on
    * src0 documents, raw model on the whole corpus, per-doc log
    * importance weight Σ count_b · ln(p̂_b/q̂_b) with add-1 smoothing,
    * deterministic top-100 resample. The oracle replays the bucket
    * counts, the smoothed rounded log-ratios, and the decimal per-doc
    * sums.
    */
  val q89Dsir = QueryDef(
    "q89_dsir",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Dsir
      val w = Dsir.importanceWeights(t(s, dir, "documents"),
        "doc_id", "text", isTarget = $"source" === "src0",
        buckets = 64, seed = 89)
      Dsir.selectTopN(w, "doc_id", n = 100)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      grams AS (
        SELECT doc_id, source, g FROM (
          SELECT doc_id, source, unnest(w) AS g FROM toks
          UNION ALL
          SELECT doc_id, source,
                 array_to_string(list_slice(w, i + 1, i + 2), ' ') AS g
          FROM toks, unnest(range(0, len(w) - 1)) AS t(i)
          WHERE len(w) >= 2)),
      b AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5('89:' || g), 1, 15)) AS BIGINT) % 64
                 AS bucket
        FROM grams),
      counts AS (
        SELECT bucket, CAST(count(*) AS DOUBLE) AS cr,
               CAST(count(*) FILTER (WHERE source = 'src0') AS DOUBLE) AS ct
        FROM b GROUP BY 1),
      tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM counts),
      ratio AS (
        SELECT bucket,
               round(ln(((ct + 1.0) / (tt + 64.0)) /
                        ((cr + 1.0) / (tr + 64.0))), 9) AS lr
        FROM counts, tot),
      wgt AS (
        SELECT doc_id,
               round(CAST(SUM(CAST(lr AS DECIMAL(27,12))) AS DOUBLE), 6)
                 AS logw
        FROM b JOIN ratio USING (bucket) GROUP BY 1),
      r AS (
        SELECT doc_id, logw,
               CAST(row_number() OVER (ORDER BY logw DESC, doc_id) AS BIGINT)
                 AS rn
        FROM wgt)
      SELECT rn, doc_id, logw FROM r WHERE rn <= 100 ORDER BY rn"""))

  // ----------------------------------------------------------- q90_hybrid_rrf
  /** Hybrid retrieval with reciprocal-rank fusion
    * ([[graft.operators.Retrieval.rrfFuse]]): query-by-example over
    * three probe documents — the lexical side ranks each probe's
    * distinct terms with q88's BM25 (top-20, self dropped, ranks
    * recomputed), the dense side is q14's exact-cosine top-20 over the
    * probe's embedding (doc_id = vec_id by construction of the
    * testdata), and RRF (c = 60) merges the two candidate lists into a
    * fused top-10 — the standard "lexical recalls what the embedding
    * misses" retrieval stack for RAG and retrieval-based
    * decontamination. The oracle replays both rankings and the fusion
    * arithmetic end to end.
    *
    * Scale shape: probes broadcast on BOTH sides (query terms into the
    * postings cut, probe vectors into the corpus stream); the fusion
    * stage only ever sees (queries × 20 × 2) candidate rows.
    */
  val q90HybridRrf = {
    val Depth = 20; val C = 60; val K = 10
    QueryDef(
      "q90_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        import graft.operators.{Retrieval, Similarity}
        val docs = t(s, dir, "documents")
        val emb = t(s, dir, "embeddings")
        val queries = docs.filter($"doc_id" < 3)
          .select($"doc_id".as("query_id"),
            explode(split($"text", " ")).as("term"))
          .distinct()
        val wLex = Window.partitionBy($"query_id")
          .orderBy($"score".desc, $"doc_id".asc)
        val lex = Retrieval.bm25TopK(docs, "doc_id", "text", queries, Depth)
          .filter($"doc_id" =!= $"query_id")
          .withColumn("rn", row_number().over(wLex).cast("long"))
          .select($"query_id", $"doc_id", $"rn")
        val probes = emb.filter($"vec_id" < 3)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        val corpus = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        val dense = Similarity.knnExact(probes, corpus, Depth)
          .select($"probe_id".as("query_id"), $"cand_id".as("doc_id"),
            $"rn".cast("long").as("rn"))
        Retrieval.rrfFuse(Seq(lex, dense), c = C, k = K)
      },
      Some({
        import KmeansSql.sqlDot
        s"""
        WITH ${bm25SqlCtes("""
          SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id,
                   unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id < 3)""")},
        lr AS (
          SELECT query_id, doc_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS BIGINT) AS rn
          FROM r WHERE rn <= $Depth AND doc_id != query_id),
        p AS (SELECT vec_id AS probe_id, embedding AS pv
              FROM embeddings WHERE vec_id < 3),
        cand AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
        ds AS (
          SELECT probe_id, cand_id,
                 round(${sqlDot("pv", "cv")} /
                       (sqrt(${sqlDot("pv", "pv")}) * sqrt(${sqlDot("cv", "cv")})), 6) AS cos
          FROM p, cand WHERE probe_id != cand_id),
        dr AS (
          SELECT probe_id AS query_id, cand_id AS doc_id, rn FROM (
            SELECT probe_id, cand_id,
                   CAST(row_number() OVER (PARTITION BY probe_id
                     ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
            FROM ds)
          WHERE rn <= $Depth),
        contrib AS (
          SELECT query_id, doc_id, round(1.0 / ($C + rn), 9) AS rc FROM lr
          UNION ALL
          SELECT query_id, doc_id, round(1.0 / ($C + rn), 9) AS rc FROM dr),
        fs AS (
          SELECT query_id, doc_id,
                 round(CAST(SUM(CAST(rc AS DECIMAL(27,12))) AS DOUBLE), 6)
                   AS rrf
          FROM contrib GROUP BY 1, 2),
        fr AS (
          SELECT query_id, doc_id, rrf,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY rrf DESC, doc_id) AS BIGINT) AS rn
          FROM fs)
        SELECT query_id, rn, doc_id, rrf FROM fr WHERE rn <= $K
        ORDER BY query_id, rn"""
      }))
  }

  // ------------------------------------------------------ q91_weighted_sample
  /** Quality-weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedSample]], Efraimidis–Spirakis
    * exponential race): weight each document by `ln(1 + n_chars)` (a
    * stand-in for any positive quality score — the q87 probe slots in
    * unchanged), draw a deterministic uniform from `hash64(doc_id)`,
    * race on `-ln(u)/w`, keep the 100 smallest keys — a true weighted
    * draw, where a plain hash cut (q38) would ignore every other row's
    * weight. The oracle replays the hash-uniform, both rounded lns,
    * and the key rank.
    */
  val q91WeightedSample = QueryDef(
    "q91_weighted_sample",
    (s, dir) => {
      import s.implicits._
      graft.operators.Sampling.weightedSample(
        t(s, dir, "documents"), "doc_id",
        round(log(lit(1.0) + $"n_chars"), 9), n = 100, seed = 91)
    },
    Some("""
      WITH w AS (
        SELECT doc_id, round(ln(1.0 + n_chars), 9) AS wgt,
               round(ln((CAST(('0x' || substr(md5('91:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 1000000 + 1) / 1000001.0), 9) AS lnu
        FROM documents),
      k AS (SELECT doc_id, wgt, round(-lnu / wgt, 9) AS ekey FROM w),
      r AS (
        SELECT doc_id, wgt, ekey,
               CAST(row_number() OVER (ORDER BY ekey, doc_id) AS BIGINT) AS rn
        FROM k)
      SELECT rn, doc_id, wgt, ekey FROM r WHERE rn <= 100 ORDER BY rn"""))

  // -------------------------------------------------------- q92_probe_margin
  /** Margin-based selection on the trained quality probe
    * ([[Queries6.probeScored]] — q87's model, trained identically):
    * rank every document by how CLOSE its frozen-weight score sits to
    * the 0.5 decision boundary and keep the 50 most uncertain — the
    * active-learning routing step ("send boundary documents to a
    * stronger labeler") that turns the probe from a filter into a
    * labeling budget allocator. The margin is
    * `round(abs(score − 0.5), 6)` on the already-rounded score, so the
    * oracle replays it exactly; the cut is orderBy+limit
    * (TakeOrdered), never a corpus-wide window.
    */
  val q92ProbeMargin = {
    import Queries6.ProbeSql
    QueryDef(
      "q92_probe_margin",
      (s, dir) => {
        import s.implicits._
        val scored = Queries6.probeScored(s, dir)
          .withColumn("margin", round(abs($"score" - 0.5), 6))
        val w = Window.orderBy($"margin".asc, $"doc_id".asc)
        scored.orderBy($"margin".asc, $"doc_id".asc).limit(50)
          .withColumn("rn", row_number().over(w).cast("long"))
          .select($"rn", $"doc_id", $"score", $"margin")
          .orderBy($"rn")
      },
      Some(s"""
        WITH ${ProbeSql.ctes},
        scored AS (
          SELECT doc_id, ${ProbeSql.scoreSql} AS score
          FROM f, w${ProbeSql.Iters}),
        m AS (
          SELECT doc_id, score, round(abs(score - 0.5), 6) AS margin
          FROM scored),
        r AS (
          SELECT doc_id, score, margin,
                 CAST(row_number() OVER (ORDER BY margin, doc_id) AS BIGINT)
                   AS rn
          FROM m)
        SELECT rn, doc_id, score, margin FROM r WHERE rn <= 50 ORDER BY rn"""))
  }

  // ------------------------------------------------------- q93_bm25_indexed
  /** BM25 served from a PERSISTED inverted index
    * ([[graft.operators.Retrieval.writeBm25Index]] /
    * `probeBm25Index`): the build pays the tokenize/tf/df passes once
    * into term-bucketed catalog tables (postings + pre-rounded idf),
    * the probe answers a fresh query set from the index with q88's
    * exact arithmetic — the q61/q84 build-once-probe-many shape
    * applied to lexical retrieval. The oracle recomputes the whole
    * ranking from the raw corpus, so a hash match proves the index
    * round-trip loses nothing.
    */
  val q93Bm25Indexed = {
    val queryTerms: Seq[(Int, String)] = Seq(
      1 -> "merge", 1 -> "sort", 1 -> "batch",
      2 -> "stream", 2 -> "window", 2 -> "key", 2 -> "table")
    val sqlValues = queryTerms
      .map { case (q, w) => s"($q, '$w')" }.mkString(", ")
    QueryDef(
      "q93_bm25_indexed",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Retrieval
        Retrieval.writeBm25Index(t(s, dir, "documents"), "doc_id", "text",
          "graft_q93_bm25", buckets = 16)
        val queries = queryTerms.toDF("query_id", "term")
          .select($"query_id".cast("long"), $"term")
        Retrieval.probeBm25Index(s, "graft_q93_bm25", "doc_id", queries, k = 5)
      },
      Some(s"""
        WITH ${bm25SqlCtes(s"""
          SELECT CAST(query_id AS BIGINT) AS query_id, term
          FROM (VALUES $sqlValues) v(query_id, term)""")}
        SELECT query_id, rn, doc_id, score FROM r WHERE rn <= 5
        ORDER BY query_id, rn"""))
  }

  // -------------------------------------------------------- q94_curriculum
  /** Curriculum difficulty bucketing by length quartile — the
    * scale-safe NTILE replacement: a global `ntile(4)` window drags
    * the whole corpus through ONE task, so instead the three quartile
    * THRESHOLDS come from the bounded-memory distributed rank
    * selection ([[graft.operators.Percentiles.exactCont]], the q35
    * machinery, one range exchange) and broadcast onto a narrow
    * per-row CASE — the corpus never re-shuffles to learn its bucket.
    * Report: per-bucket doc count, token mass, and the length range —
    * the "pack easy/short first, hard/long later" curriculum layout
    * feed. At 100 TB the thresholds come from the q43 GK sketch
    * instead (thresholds need not be exact) — and since round 14 that
    * swap is ONE ARGUMENT at the shared operator seam
    * ([[graft.operators.Percentiles.thresholds]]): this query passes
    * `ExactThresholds`, q161_curriculum_sketch ([[Queries21]]) passes
    * `SketchThresholds(10000)` into the SAME code path,
    * rank-window-verified, with no range exchange in its plan. The
    * exact pass here is what the oracle can replay hash-for-hash
    * (`quantile_cont` parity, rounded to 6 before the compare like
    * q35).
    */
  val q94Curriculum = QueryDef(
    "q94_curriculum",
    (s, dir) => {
      import s.implicits._
      import graft.operators.{Percentiles, TextAnalysis}
      val docs = t(s, dir, "documents").select($"doc_id",
        TextAnalysis.tokenCount($"text").cast("double").as("toks"))
      val th = Percentiles.thresholds(docs.withColumn("_g", lit(0)),
          Seq("_g"), "toks", Seq(0.25, 0.5, 0.75),
          Percentiles.ExactThresholds)
        .groupBy($"_g")
        .agg(round(min(when($"p" === 0.25, $"value")), 6).as("t25"),
          round(min(when($"p" === 0.5, $"value")), 6).as("t50"),
          round(min(when($"p" === 0.75, $"value")), 6).as("t75"))
        .drop("_g")
      docs.crossJoin(broadcast(th))
        .select($"doc_id", $"toks",
          when($"toks" <= $"t25", 0L).when($"toks" <= $"t50", 1L)
            .when($"toks" <= $"t75", 2L).otherwise(3L).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"toks".cast("long")).as("token_mass"),
          min($"toks").as("min_toks"), max($"toks").as("max_toks"))
        .orderBy($"bucket")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS toks
        FROM documents),
      th AS (
        SELECT round(quantile_cont(toks, 0.25), 6) AS t25,
               round(quantile_cont(toks, 0.5), 6) AS t50,
               round(quantile_cont(toks, 0.75), 6) AS t75
        FROM d),
      b AS (
        SELECT doc_id, toks,
               CASE WHEN toks <= t25 THEN 0 WHEN toks <= t50 THEN 1
                    WHEN toks <= t75 THEN 2 ELSE 3 END AS bucket
        FROM d, th)
      SELECT CAST(bucket AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(toks AS BIGINT)) AS BIGINT) AS token_mass,
             min(toks) AS min_toks, max(toks) AS max_toks
      FROM b GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------- q95_dedup_recall
  /** Dedup-recall harness — q50's "measure, don't guess" applied to
    * the MinHash-LSH family: a FIXED-size probe set (the 128 smallest
    * (hash, id) docs — a TakeOrdered, so the audit cost is bounded at
    * ANY corpus size, never a fixed fraction whose all-pairs truth
    * would grow quadratically) is scored one-vs-corpus. Exact
    * 3-shingle Jaccard ≥ 0.4 from probe to corpus defines the
    * directional ground-truth pairs (broadcast probes × one corpus
    * stream — the q14 shape), and two bandings of the SAME 8-minhash
    * signature are measured against it via the incremental cross-pair
    * probe ([[graft.operators.Dedup.lshCrossPairs]]): 4 bands × 2
    * rows (the q11 production dial, recall-leaning) vs 2 bands × 4
    * rows (stricter buckets, fewer candidates). Per method: candidate
    * count (the cost side), hits, possible, recall — the numbers the
    * S-curve banding dial should be turned against. A method with
    * zero hits still reports its row; an empty truth set reports
    * recall 0 rather than a null division.
    */
  val q95DedupRecall = {
    val Probes = 128
    val bandSql = (name: String, src: String, bands: Int, rpb: Int) => {
      val entries = (1 to rpb).map(r => s"sig[$rpb*b+$r]")
        .mkString(" || ',' || ")
      s"""$name AS (
        SELECT doc_id, md5(b || ':' || $entries) AS band_key
        FROM $src, unnest(range(0, $bands)) AS t$name(b))"""
    }
    QueryDef(
      "q95_dedup_recall",
      (s, dir) => {
        import s.implicits._
        import graft.functions.GraftFunctions.{hash64, words}
        import graft.operators.Dedup
        val shBase = t(s, dir, "documents").select($"doc_id",
            Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
          .filter(size($"sh") > 0)
        val sh = if (shBase.storageLevel ==
            org.apache.spark.storage.StorageLevel.NONE)
          shBase.persist() else shBase
        val probes = sh
          .withColumn("_h", hash64($"doc_id".cast("string"), 95))
          .orderBy($"_h", $"doc_id").limit(Probes).drop("_h")
        // exact truth WITHOUT a probe × corpus brute force: J ≥ 0.4
        // implies ≥ 1 shared shingle, so the shared-shingle postings
        // equi-join is a LOSSLESS candidate cut (no df cap — a cap
        // would bias the ground truth) and the O(|sh|²) intersect
        // runs on those pairs only. The oracle states the same set as
        // a plain jaccard predicate — identical by the implication.
        val probeSh = broadcast(probes
          .select($"doc_id".as("probe_id"), $"sh".as("sh_a")))
        val sharedPairs = probeSh
          .select($"probe_id", explode($"sh_a").as("_shh")).distinct()
          .join(sh.select($"doc_id".as("cand_id"), explode($"sh").as("_shh"))
            .distinct(), "_shh")
          .select($"probe_id", $"cand_id").distinct()
          .filter($"probe_id" =!= $"cand_id")
        val truth = sharedPairs
          .join(probeSh, "probe_id")
          .join(sh.select($"doc_id".as("cand_id"), $"sh".as("sh_b")),
            "cand_id")
          .filter(round(Dedup.jaccard($"sh_a", $"sh_b"), 6) >= 0.4)
          .select($"probe_id", $"cand_id")
        val sigAll = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
        val sigProbe = probes
          .select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
        def cross(bands: Int, rpb: Int, label: String) =
          Dedup.lshCrossPairs(
              Dedup.lshBands(sigProbe, "doc_id", "sig", bands, rpb),
              Dedup.lshBands(sigAll, "doc_id", "sig", bands, rpb), "doc_id")
            .filter($"id_new" =!= $"id_old")
            .select(lit(label).as("method"), $"id_new".as("probe_id"),
              $"id_old".as("cand_id"))
        val cand = cross(4, 2, "lsh_4x2").unionByName(cross(2, 4, "lsh_2x4"))
        val possible = broadcast(truth.agg(count(lit(1)).as("possible")))
        val methods = Seq("lsh_2x4", "lsh_4x2").toDF("method")
        val candCount = cand.groupBy($"method")
          .agg(count(lit(1)).as("candidates"))
        val hits = cand.join(truth, Seq("probe_id", "cand_id"))
          .groupBy($"method").agg(count(lit(1)).as("hits"))
        methods.join(candCount, Seq("method"), "left")
          .join(hits, Seq("method"), "left")
          .crossJoin(possible)
          .select($"method",
            coalesce($"candidates", lit(0L)).as("candidates"),
            coalesce($"hits", lit(0L)).as("hits"), $"possible",
            when($"possible" === 0, 0.0)
              .otherwise(round(coalesce($"hits", lit(0L)).cast("double")
                / $"possible", 6)).as("recall"))
          .orderBy($"method")
      },
      Some(s"""
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
        shx AS (SELECT doc_id, list_transform(sh0, v -> v % 1073741789) AS sh
                FROM shf),
        pr AS (
          SELECT doc_id, sh FROM (
            SELECT doc_id, sh, row_number() OVER (ORDER BY
              CAST(('0x' || substr(md5('95:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
              doc_id) AS rn
            FROM shx) WHERE rn <= $Probes),
        truth AS (
          SELECT pr.doc_id AS probe_id, c.doc_id AS cand_id
          FROM pr, shx c
          WHERE pr.doc_id != c.doc_id
            AND round(CAST(len(list_distinct(list_intersect(pr.sh, c.sh))) AS DOUBLE)
                      / len(list_distinct(list_concat(pr.sh, c.sh))), 6) >= 0.4),
        mh AS (
          SELECT doc_id,
                 list_transform([31, 37, 41, 43, 47, 53, 59, 61], a ->
                   list_min(list_transform(sh,
                     h -> (a * (h % 1073741824) + a*7 + 3) % 1073741789))) AS sig
          FROM shx),
        mhp AS (SELECT mh.* FROM mh JOIN pr USING (doc_id)),
        ${bandSql("b42c", "mh", 4, 2)},
        ${bandSql("b24c", "mh", 2, 4)},
        ${bandSql("b42p", "mhp", 4, 2)},
        ${bandSql("b24p", "mhp", 2, 4)},
        cand AS (
          SELECT 'lsh_4x2' AS method, probe_id, cand_id FROM (
            SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS cand_id
            FROM b42p p JOIN b42c c USING (band_key)
            WHERE p.doc_id != c.doc_id)
          UNION ALL
          SELECT 'lsh_2x4' AS method, probe_id, cand_id FROM (
            SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS cand_id
            FROM b24p p JOIN b24c c USING (band_key)
            WHERE p.doc_id != c.doc_id)),
        poss AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM truth),
        cc AS (SELECT method, CAST(count(*) AS BIGINT) AS candidates
               FROM cand GROUP BY 1),
        hh AS (SELECT method, CAST(count(*) AS BIGINT) AS hits
               FROM cand JOIN truth USING (probe_id, cand_id) GROUP BY 1),
        methods AS (SELECT unnest(['lsh_2x4', 'lsh_4x2']) AS method)
        SELECT method, coalesce(candidates, 0) AS candidates,
               coalesce(hits, 0) AS hits, possible,
               CASE WHEN possible = 0 THEN 0.0
                    ELSE round(CAST(coalesce(hits, 0) AS DOUBLE) / possible, 6)
               END AS recall
        FROM methods LEFT JOIN cc USING (method) LEFT JOIN hh USING (method),
             poss
        ORDER BY method"""))
  }

  // ----------------------------------------------------- q96_temperature_mix
  /** Temperature-scaled language rebalance
    * ([[graft.operators.Sampling.sqrtTemperatureMix]], α = 0.5): the
    * per-language target shares derive from the corpus's own counts
    * (`√c / Σ√c` — en is flattened, tail languages upweighted), sized
    * to a half-corpus budget and realized as a deterministic hash cut.
    * The report echoes each language's count, its derived threshold,
    * and the kept count — the oracle re-derives the identical
    * thresholds from its own GROUP BY (exact counts, round-6 sqrts,
    * decimal sum, IEEE rate, integer floor) and replays the cut.
    */
  val q96TemperatureMix = {
    val G = 10000
    QueryDef(
      "q96_temperature_mix",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Sampling
        val docs = t(s, dir, "documents")
        val hist = docs.groupBy($"lang").agg(count(lit(1)).as("_n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
        val cuts = Sampling.temperatureCuts(hist, budgetNum = 1,
          budgetDen = 2, granularity = G)
        val kept = Sampling.applyCuts(docs, $"doc_id".cast("string"),
          $"lang", cuts, seed = 96, granularity = G)
        val cutsDf = hist.map(_._2).zip(cuts)
          .map { case (n, (k, c)) => (k, n, c) }
          .toDF("lang", "n_lang", "cut")
        broadcast(cutsDf)
          .join(kept.groupBy($"lang").agg(count(lit(1)).as("n_kept")),
            Seq("lang"), "left")
          .select($"lang", $"n_lang", $"cut",
            coalesce($"n_kept", lit(0L)).as("n_kept"))
          .orderBy($"lang")
      },
      Some(s"""
        WITH h AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents
          GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) * 1 // 2 AS n_out FROM h),
        w AS (SELECT lang, c, round(sqrt(CAST(c AS DOUBLE)), 6) AS wi FROM h),
        ws AS (SELECT CAST(SUM(CAST(wi AS DECIMAL(27,12))) AS DOUBLE) AS wsum
               FROM w),
        cuts AS (
          SELECT lang, c,
                 CAST(floor(least(1.0,
                   CAST(n_out AS DOUBLE) * (wi / wsum) / CAST(c AS DOUBLE))
                   * $G) AS BIGINT) AS cut
          FROM w, ws, tot),
        kept AS (
          SELECT d.lang, d.doc_id FROM documents d JOIN cuts USING (lang)
          WHERE CAST(('0x' || substr(md5('96:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                % $G < cut)
        SELECT cuts.lang, cuts.c AS n_lang, cuts.cut,
               CAST(count(kept.doc_id) AS BIGINT) AS n_kept
        FROM cuts LEFT JOIN kept ON kept.lang = cuts.lang
        GROUP BY 1, 2, 3 ORDER BY 1"""))
  }

  // ------------------------------------------------------- q97_collocations
  /** PMI collocation mining: the top-20 adjacent word pairs by
    * pointwise mutual information `ln(p(ab) / (p(a)·p(b)))` with a
    * min-count floor — the corpus-analysis primitive behind
    * multi-word-expression discovery and tokenizer-merge sanity
    * checks (a BPE merge list q70 induces by frequency; PMI surfaces
    * the pairs frequency alone under-ranks). q63 ranks n-grams by raw
    * document frequency; PMI normalizes by both constituents, so
    * boilerplate words drop out without a df cap.
    *
    * Determinism: all counts are exact integers in doubles (exact up
    * to 2^53, order-free), the probability ratio evaluates in one
    * fixed IEEE tree, the `ln` rounds to 9 (the q37/q88 discipline),
    * ties break on the bigram. Scale shape (round-12 rewrite — the
    * previous version tokenized the corpus FOUR times: unigram agg,
    * unigram total, bigram agg, bigram total): ONE tokenize pass emits
    * every unigram as `(w, null)` and every adjacent pair as
    * `(w, next)` through a single generator, ONE count shuffle builds
    * the combined vocab frame, and that frame persists (vocab-sized —
    * sub-corpus by Heaps, MEMORY_AND_DISK spills) so unigram counts,
    * bigram counts, and BOTH totals derive from it without touching
    * the corpus again. Constituent-count joins run on 64-bit
    * `xxhash64` pre-hashed keys (the q63 lever: fixed 8-byte shuffle
    * keys instead of strings) — never broadcast (a 100 TB vocab
    * outgrows one; AQE may still choose it when small), totals attach
    * as broadcast 1-row aggregates, and the cut is orderBy+limit.
    */
  val q97Collocations = {
    val MinCount = 5; val K = 20
    QueryDef(
      "q97_collocations",
      (s, dir) => {
        import s.implicits._
        import graft.functions.GraftFunctions.words
        val docs = t(s, dir, "documents")
        val ws = words($"text")
        val uniE = transform(ws,
          w => struct(w.as("a"), lit(null).cast("string").as("b")))
        val biE = when(size(ws) >= 2,
            zip_with(slice(ws, lit(1), size(ws) - 1),
              slice(ws, lit(2), size(ws) - 1),
              (a, b) => struct(a.as("a"), b.as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
        val counts = docs
          .select(explode(concat(uniE, biE)).as("e"))
          .select($"e.a".as("a"), $"e.b".as("b"))
          .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
          .persist()
        val uni = counts.filter($"b".isNull)
          .select(xxhash64($"a").as("h"), $"a".as("w"),
            $"cnt".cast("double").as("cw"))
        val uniTot = counts.filter($"b".isNull)
          .agg(sum($"cnt").cast("double").as("t"))
        val biAll = counts.filter($"b".isNotNull)
        val biTot = biAll.agg(sum($"cnt").cast("double").as("tb"))
        val bi = biAll.filter($"cnt" >= MinCount)
          .select($"a", $"b", $"cnt".cast("double").as("cab"))
        // hash-keyed shuffle + word-equality verify: the join SHUFFLES
        // on the fixed 8-byte hash, and the post-join filter drops any
        // 64-bit collision victim (two vocab words sharing a hash would
        // otherwise fan a bigram into two rows with one wrong count —
        // a real risk at the 10^8-vocab scale this is sized for; the
        // true constituent's row always survives the filter)
        val scored = bi
          .withColumn("h1", xxhash64($"a"))
          .withColumn("h2", xxhash64($"b"))
          .join(uni.select($"h".as("h1"), $"w".as("wa"), $"cw".as("ca")),
            "h1")
          .filter($"wa" === $"a")
          .join(uni.select($"h".as("h2"), $"w".as("wb"), $"cw".as("cb")),
            "h2")
          .filter($"wb" === $"b")
          .crossJoin(broadcast(uniTot)).crossJoin(broadcast(biTot))
          .select(concat_ws(" ", $"a", $"b").as("bigram"),
            $"cab".cast("long").as("n_ab"),
            round(log(($"cab" / $"tb") / (($"ca" / $"t") * ($"cb" / $"t"))),
              9).as("pmi"))
        val w = Window.orderBy($"pmi".desc, $"bigram".asc)
        scored.orderBy($"pmi".desc, $"bigram".asc).limit(K)
          .withColumn("rn", row_number().over(w).cast("long"))
          .select($"rn", $"bigram", $"n_ab", $"pmi")
          .orderBy($"rn")
      },
      Some(s"""
        WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        us AS (SELECT unnest(w) AS u FROM toks),
        uni AS (SELECT u AS w, CAST(count(*) AS DOUBLE) AS cw
                FROM us GROUP BY 1),
        ut AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM us),
        bis AS (
          SELECT array_to_string(list_slice(w, i + 1, i + 2), ' ') AS bigram
          FROM toks, unnest(range(0, len(w) - 1)) AS tt(i)
          WHERE len(w) >= 2),
        bt AS (SELECT CAST(count(*) AS DOUBLE) AS tb FROM bis),
        bi AS (SELECT bigram, CAST(count(*) AS DOUBLE) AS cab
               FROM bis GROUP BY 1 HAVING count(*) >= $MinCount),
        sc AS (
          SELECT bigram, CAST(cab AS BIGINT) AS n_ab,
                 round(ln((cab / tb) /
                          ((ua.cw / t) * (ub.cw / t))), 9) AS pmi
          FROM bi
          JOIN uni ua ON ua.w = string_split(bigram, ' ')[1]
          JOIN uni ub ON ub.w = string_split(bigram, ' ')[2], ut, bt),
        r AS (
          SELECT bigram, n_ab, pmi,
                 CAST(row_number() OVER (ORDER BY pmi DESC, bigram)
                   AS BIGINT) AS rn
          FROM sc)
        SELECT rn, bigram, n_ab, pmi FROM r WHERE rn <= $K ORDER BY rn"""))
  }

  def all: Seq[QueryDef] = Seq(
    q88Bm25, q89Dsir, q90HybridRrf, q91WeightedSample, q92ProbeMargin,
    q93Bm25Indexed, q94Curriculum, q95DedupRecall, q96TemperatureMix,
    q97Collocations)
}
