package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.{Dedup, MergeUpsert, Sessionize, Similarity, TextAnalysis}

/** Round-2 query surface: the LLM-training-data-pipeline operators
  * (dedup / similarity / text analysis / events windowing) plus the
  * reference-pipeline relational semantics (merge-upsert, tiering,
  * keyword filter) — each expressed over the driver testdata with a
  * DuckDB oracle. Oracle-parity rules as in [[Queries]]; additionally:
  *  - `hash64` is md5-based so the oracle reproduces it exactly
  *    (`CAST(('0x'||substr(md5(..),1,15)) AS BIGINT)`);
  *  - float reductions (dot products, projections) run sequentially in
  *    array order on BOTH engines (Spark `aggregate`, DuckDB
  *    `list_reduce`) and results are rounded to 6 places;
  *  - integer outputs are cast to BIGINT on both sides (Spark `size`/
  *    `row_number` return int, DuckDB `len`/window funcs return BIGINT).
  */
object Queries2 {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Shared keyword vocabularies (documents use one synthetic vocab). */
  object Vocab {
    val stopwords = Seq("a", "the", "key", "value", "data", "fast")
    val langMarkers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("table", "row"),
      "de" -> Seq("batch", "merge"),
      "fr" -> Seq("query", "column"),
      "es" -> Seq("data", "line"),
      "zh" -> Seq("spark", "vector"))
    val strongKw = Seq("spark", "flink")
    val contextKw = Seq("join", "window")
    val moneyKw = Seq("hash", "merge")
  }

  /** SQL fragment: hash64(expr, seed) as the oracle computes it. */
  private def sqlHash64(expr: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || $expr), 1, 15)) AS BIGINT)"

  // ---------------------------------------------------------- q9_dedup_exact
  /** Exact dedup (hash-groupBy) across a simulated re-crawl: every doc
    * appears twice; dedup keeps the smallest id per content hash.
    */
  val q9DedupExact = QueryDef(
    "q9_dedup_exact",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select($"doc_id", $"text")
      val recrawl = d.select(($"doc_id" + 10000).as("doc_id"), $"text")
      Dedup.exact(d.unionByName(recrawl), $"doc_id", md5($"text"))
        .orderBy($"content_key")
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000, text FROM documents)
      SELECT md5(text) AS content_key, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM corpus GROUP BY 1 ORDER BY content_key"""))

  // --------------------------------------------------------- q10_fingerprint
  /** Prefix-fingerprint dedup: hash of the first 8 tokens; emit only
    * groups with >1 doc (boilerplate-opening clusters).
    */
  val q10Fingerprint = QueryDef(
    "q10_fingerprint",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", Dedup.prefixFingerprint(words($"text"), 8, 3).as("fp"))
        .groupBy($"fp")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
        .filter($"n_docs" > 1)
        .orderBy($"fp")
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id,
               ${sqlHash64("array_to_string(string_split(text, ' ')[1:8], ' ')", 3)} AS fp
        FROM documents)
      SELECT fp, min(doc_id) AS keep_id, count(*) AS n_docs
      FROM f GROUP BY 1 HAVING count(*) > 1 ORDER BY fp"""))

  // --------------------------------------------------------- q11_dedup_near
  /** Near-dup detection: word hashes → rolling 3-gram shingle hashes →
    * 8-seed MinHash → 4×2 banded LSH candidate pairs (bucket join, never
    * all-pairs) → exact Jaccard verification on the candidates only.
    * One md5 pass per word; everything downstream is integer arithmetic
    * (shingle strings are never materialized — see [[Dedup]] notes).
    */
  val q11DedupNear = QueryDef(
    "q11_dedup_near",
    (s, dir) => {
      import s.implicits._
      // Materialize the shingle-hash table once: four plan branches
      // consume it (signature, both jaccard sides, and the self-joined
      // bands) — at production scale this is the standard "write the
      // signature table, then join" LSH shape. persist is guarded by a
      // cache-manager lookup so a re-run of the same plan reuses the
      // existing entry instead of warning "already cached"; callers
      // owning the session lifecycle clear the cache between queries
      // (as Bench/Verify do).
      val shBase = t(s, dir, "documents")
        .select($"doc_id",
          Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
        .filter(size($"sh") > 0)
      val sh = if (shBase.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        shBase.persist() else shBase
      val sig = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
      val bands = Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)
      val pairs = Dedup.lshCandidatePairs(bands, "doc_id")
      pairs
        .join(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), "id_a")
        .join(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), "id_b")
        .select($"id_a", $"id_b",
          round(Dedup.jaccard($"sh_a", $"sh_b"), 6).as("jaccard"))
        .orderBy($"id_a", $"id_b")
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
        WHERE a.doc_id < c.doc_id)
      SELECT id_a, id_b,
             round(CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
      FROM pairs
      JOIN shx sa ON sa.doc_id = id_a
      JOIN shx sb ON sb.doc_id = id_b
      ORDER BY id_a, id_b"""))

  // -------------------------------------------------------------- q12_simhash
  /** 16-bit SimHash fingerprint per document (vectorized per-row; no
    * explode, no shuffle beyond the final ORDER BY).
    */
  val q12Simhash = {
    val bits = 16
    val bitSumsSql = (0 until bits)
      .map(b => s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n               ")
    val simhashSql = (0 until bits)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "q12_simhash",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", Dedup.simhash(words($"text"), bits, 7).as("simhash"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        h AS (SELECT doc_id, ${sqlHash64("word", 7)} AS hv FROM w),
        bits AS (
          SELECT doc_id,
               $bitSumsSql
          FROM h GROUP BY doc_id)
        SELECT doc_id, CAST($simhashSql AS BIGINT) AS simhash
        FROM bits ORDER BY doc_id"""))
  }

  // --------------------------------------------------------- q13_text_quality
  /** Text analysis: token counts, subword estimate, punctuation/stopword
    * ratios, composite quality score, marker-based language ID.
    */
  val q13TextQuality = {
    import Vocab._
    val sqlPunct = TextAnalysis.PunctClass.replace("'", "''")
    def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scoreCols = langMarkers.map { case (lang, ms) =>
      s"CAST(len(list_filter(lw, x -> list_contains(${sqlList(ms)}, x))) AS BIGINT) AS s_$lang"
    }.mkString(",\n               ")
    val langCase = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      val earlier = langMarkers.take(i).map { case (l2, _) => s"s_$lang > s_$l2" }
      val later = langMarkers.drop(i + 1).map { case (l2, _) => s"s_$lang >= s_$l2" }
      val cond = (earlier ++ later).mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString("\n               ")
    QueryDef(
      "q13_text_quality",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(
            $"doc_id",
            TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"),
            TextAnalysis.subwordCountEstimate($"text").cast("long").as("n_subwords"),
            TextAnalysis.avgTokenLen($"text").as("avg_token_len"),
            TextAnalysis.punctRatio($"text").as("punct_ratio"),
            TextAnalysis.stopwordRatio($"text", stopwords).as("stop_ratio"),
            TextAnalysis.qualityScore($"text", stopwords).as("quality"),
            TextAnalysis.langId($"text", langMarkers).as("lang_guess"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, text,
                 string_split(text, ' ') AS w,
                 string_split(lower(text), ' ') AS lw
          FROM documents),
        m AS (
          SELECT doc_id, text, w, lw,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(w, x -> 1 + CAST(floor(length(x) / 6) AS INT))) AS BIGINT) AS n_subwords,
               round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w), 6) AS avg_token_len,
               round(CAST(length(text) - length(regexp_replace(text, '$sqlPunct', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
               round(CAST(len(list_filter(lw, x -> list_contains(${sqlList(stopwords)}, x))) AS DOUBLE) / len(lw), 6) AS stop_ratio,
               $scoreCols
          FROM base)
        SELECT doc_id, n_tokens, n_subwords, avg_token_len, punct_ratio, stop_ratio,
               round(greatest(0.0,
                 least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
                 + least(stop_ratio * 4.0, 1.0) * 0.3
                 - least(punct_ratio * 5.0, 1.0) * 0.2
                 + 0.2), 6) AS quality,
               CASE
               $langCase
               ELSE 'und' END AS lang_guess
        FROM m ORDER BY doc_id"""))
  }

  // ------------------------------------------------------------ q14_knn_exact
  /** Brute-force cosine top-3 for 5 probe vectors: probes broadcast, the
    * corpus streams once — the exact-ANN baseline.
    */
  val q14KnnExact = {
    import KmeansSql.sqlDot
    QueryDef(
      "q14_knn_exact",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val probes = e.filter($"vec_id" < 5)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        val corpus = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        Similarity.knnExact(probes, corpus, 3)
          .select($"probe_id", $"rn".cast("long").as("rn"), $"cand_id", $"cos")
          .orderBy($"probe_id", $"rn")
      },
      Some(s"""
        WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
        s AS (
          SELECT probe_id, cand_id,
                 round(${sqlDot("pv", "cv")} /
                       (sqrt(${sqlDot("pv", "pv")}) * sqrt(${sqlDot("cv", "cv")})), 6) AS cos
          FROM p, c WHERE probe_id != cand_id),
        r AS (
          SELECT probe_id, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
          FROM s)
        SELECT probe_id, rn, cand_id, cos FROM r
        WHERE rn <= 3 ORDER BY probe_id, rn"""))
  }

  // -------------------------------------------------------------- q15_knn_lsh
  /** LSH-bucketed ANN: deterministic random hyperplanes, AUTO-SIZED to
    * the corpus ([[Similarity.autoPlanes]]: smallest p with
    * 64·2^p ≥ n — integer-exact, so the oracle derives the identical p
    * from its own count(*)); top-3 within the probe's bucket only. The
    * join shuffles on the bucket code — corpus-linear, the 100 TB path.
    */
  val q15KnnLsh = {
    // the oracle derives planes from the same shift-compare: smallest
    // p in [1,16] with 64·2^p ≥ count(*) — no float log anywhere; the
    // coalesce mirrors the Scala maxPlanes=16 cap past 64·2^16 rows
    // (min over an empty range is NULL, which would NULL every bucket)
    val sqlPlanes =
      """(SELECT CAST(coalesce(min(p), 16) AS INT) FROM range(1, 17) t(p)
          WHERE 64 * (1 << p) >= (SELECT count(*) FROM embeddings))"""
    def sqlBucket(vec: String) =
      s"""list_sum(list_transform(range(0, $sqlPlanes), p ->
         CASE WHEN round(list_reduce(list_transform(range(0, 64),
           d -> $vec[d+1]::DOUBLE * (CAST(('0x' || substr(md5('0:' || p || ':' || d), 1, 15)) AS BIGINT) % 1000 / 1000.0 - 0.5)),
           (x, y) -> x + y), 6) > 0 THEN (1 << p) ELSE 0 END))"""
    import KmeansSql.sqlDot
    QueryDef(
      "q15_knn_lsh",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val planes = Similarity.autoPlanes(e.count(), targetBucket = 64)
        val probes = e.filter($"vec_id" < 10)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        val corpus = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        Similarity.knnLsh(probes, corpus, dims = 64, planes = planes, k = 3)
          .select($"probe_id", $"bucket".cast("long").as("bucket"),
            $"rn".cast("long").as("rn"), $"cand_id", $"cos")
          .orderBy($"probe_id", $"rn")
      },
      Some(s"""
        WITH p AS (
          SELECT vec_id AS probe_id, embedding AS pv,
                 CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
          FROM embeddings WHERE vec_id < 10),
        c AS (
          SELECT vec_id AS cand_id, embedding AS cv,
                 CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
          FROM embeddings),
        s AS (
          SELECT probe_id, p.bucket AS bucket, cand_id,
                 round(${sqlDot("pv", "cv")} /
                       (sqrt(${sqlDot("pv", "pv")}) * sqrt(${sqlDot("cv", "cv")})), 6) AS cos
          FROM p JOIN c USING (bucket) WHERE probe_id != cand_id),
        r AS (
          SELECT probe_id, bucket, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
          FROM s)
        SELECT probe_id, bucket, rn, cand_id, cos FROM r
        WHERE rn <= 3 ORDER BY probe_id, rn"""))
  }

  // -------------------------------------------------------- q16_window_tumble
  /** Tumbling 1-day event windows with a JSON-typed metadata column:
    * count, exact decimal sum, mean of `props.k` (multimodal metadata
    * surface: `props` is the opaque-payload sidecar).
    */
  val q16WindowTumble = QueryDef(
    "q16_window_tumble",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          dsum($"value").as("sum_value"),
          round(avg(get_json_object($"props", "$.k").cast("long")), 6).as("avg_k"))
        .select(to_date($"window.start").as("day"), $"event_type",
          $"n_events", $"sum_value", $"avg_k")
        .orderBy($"day", $"event_type")
    },
    Some("""
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             COUNT(*) AS n_events,
             round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value,
             round(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""))

  // --------------------------------------------------------- q17_window_slide
  /** Sliding 7-day/1-day windows: each event contributes to 7 windows. */
  val q17WindowSlide = QueryDef(
    "q17_window_slide",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "7 days", "1 day"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .select(to_date($"window.start").as("win_start"), $"event_type",
          $"n_events", $"sum_value")
        .orderBy($"win_start", $"event_type")
    },
    Some("""
      WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) - INTERVAL 6 DAY AS lo,
               CAST(max(ts) AS DATE) AS hi
        FROM events),
      days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS ws FROM bounds)
      SELECT CAST(ws AS DATE) AS win_start, event_type,
             COUNT(*) AS n_events,
             round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
      FROM days JOIN events ON ts >= ws AND ts < ws + INTERVAL 7 DAY
      GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  // ----------------------------------------------------------- q18_sessionize
  /** Gap-based sessionization (30-min inactivity gap): lag to mark
    * session starts, running sum to number them, then per-session stats.
    */
  val q18Sessionize = QueryDef(
    "q18_sessionize",
    (s, dir) => {
      import s.implicits._
      val sessions = Sessionize.assign(
        t(s, dir, "events"), $"user_id", $"ts", $"event_id", gapSeconds = 1800)
      sessions
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          unix_micros(min($"ts")).as("start_us"),
          unix_micros(max($"ts")).as("end_us"))
        .withColumn("duration_sec",
          round(($"end_us" - $"start_us").cast("double") / 1000000L, 6))
        .orderBy($"user_id", $"session_id")
    },
    Some("""
      WITH o AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM o)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
             round(CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000, 6) AS duration_sec
      FROM s GROUP BY 1, 2 ORDER BY user_id, session_id"""))

  // --------------------------------------------------------- q19_merge_upsert
  /** J5 — COALESCE-vs-overwrite merge (reference app/store/upsert.py:96-127)
    * over an orders snapshot: store = keys not divisible by 3; batch =
    * even keys with some NULL updates. o_totalprice/o_orderpriority merge
    * with COALESCE (keep old when new is null); o_custkey/o_orderstatus
    * are overwritten unconditionally — including overwrite-with-NULL
    * (batch keys divisible by 7 null out o_custkey, as the reference does
    * for investors/hiring_tier).
    */
  val q19MergeUpsert = QueryDef(
    "q19_merge_upsert",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice", $"o_orderpriority")
      val store = ord.filter($"o_orderkey" % 3 =!= 0)
      val batch = ord.filter($"o_orderkey" % 2 === 0).select(
        $"o_orderkey",
        when($"o_orderkey" % 7 === 0, lit(null)).otherwise($"o_custkey" + 1000000L).as("o_custkey"),
        lit("U").as("o_orderstatus"),
        when($"o_orderkey" % 5 === 0, lit(null)).otherwise($"o_totalprice" * 2).as("o_totalprice"),
        lit(null).cast("string").as("o_orderpriority"))
      MergeUpsert(store, batch,
        keys = Seq("o_orderkey"),
        coalesceCols = Seq("o_totalprice", "o_orderpriority"),
        overwriteCols = Seq("o_custkey", "o_orderstatus"))
        .orderBy($"o_orderkey")
    },
    Some("""
      WITH store AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 3 != 0),
      batch AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey + 1000000 END AS o_custkey,
               'U' AS o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice * 2 END AS o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0)
      SELECT COALESCE(b.o_orderkey, s.o_orderkey) AS o_orderkey,
             CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_custkey ELSE s.o_custkey END AS o_custkey,
             CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
             COALESCE(b.o_totalprice, s.o_totalprice) AS o_totalprice,
             COALESCE(b.o_orderpriority, s.o_orderpriority) AS o_orderpriority
      FROM store s FULL OUTER JOIN batch b ON s.o_orderkey = b.o_orderkey
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q20_rollup
  /** ROLLUP with grouping_id — subtotals + grand total in one pass. */
  val q20Rollup = QueryDef(
    "q20_rollup",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          dsum($"l_quantity").as("sum_qty"),
          count(lit(1)).as("n_items"))
        .select($"gid", $"l_returnflag", $"l_linestatus", $"sum_qty", $"n_items")
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },
    Some("""
      SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             l_returnflag, l_linestatus,
             round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
             COUNT(*) AS n_items
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  // --------------------------------------------------------------- q21_setops
  /** Set operators in one query: customers active in 1995 vs 1996 —
    * INTERSECT (both), EXCEPT (churned), UNION (either).
    */
  val q21SetOps = QueryDef(
    "q21_setops",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      def active(year: Int) = ord
        .filter($"o_orderdate" >= lit(s"$year-01-01").cast("timestamp") &&
                $"o_orderdate" < lit(s"${year + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      val a95 = active(1995)
      val a96 = active(1996)
      a95.intersect(a96).agg(count(lit(1)).as("n")).select(lit("both").as("cohort"), $"n")
        .unionByName(
          a95.except(a96).agg(count(lit(1)).as("n")).select(lit("churned").as("cohort"), $"n"))
        .unionByName(
          a95.union(a96).distinct().agg(count(lit(1)).as("n")).select(lit("either").as("cohort"), $"n"))
        .orderBy($"cohort")
    },
    Some("""
      WITH a95 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      a96 AS (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
      SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM a95 INTERSECT SELECT * FROM a96)
      UNION ALL
      SELECT 'churned', COUNT(*) FROM (SELECT * FROM a95 EXCEPT SELECT * FROM a96)
      UNION ALL
      SELECT 'either', COUNT(*) FROM (SELECT * FROM a95 UNION SELECT * FROM a96)
      ORDER BY cohort"""))

  // ----------------------------------------------------------- q22_agg_extras
  /** Remaining aggregate shapes in one query: conditional count, min/max,
    * count-distinct, sorted collect_set (stringified for cross-engine
    * comparability).
    */
  val q22AggExtras = QueryDef(
    "q22_agg_extras",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .groupBy($"c_nationkey")
        .agg(
          count(lit(1)).as("n_cust"),
          countDistinct($"c_mktsegment").as("n_segments"),
          concat_ws(",", sort_array(collect_set($"c_mktsegment"))).as("segments"),
          max($"c_acctbal").as("max_bal"),
          min($"c_acctbal").as("min_bal"),
          sum(when($"c_acctbal" < 0, 1).otherwise(0)).cast("long").as("n_negative"))
        .orderBy($"c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n_cust,
             COUNT(DISTINCT c_mktsegment) AS n_segments,
             array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
             max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal,
             CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
      FROM customer GROUP BY 1 ORDER BY c_nationkey"""))

  // ------------------------------------------------------------ q23_user_tier
  /** The reference's K1 tier classification re-expressed over events:
    * tier A = purchased within 7 days of the corpus end, B = purchased
    * ever, C = never; with the A2 conditional count, A3 max-date, K6
    * days-ago and the per-branch `details` diagnostic
    * (reference app/hiring/detect_ats.py:299-336).
    */
  val q23UserTier = QueryDef(
    "q23_user_tier",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val maxTs = ev.agg(max($"ts").as("ref_end"))
      val agg = ev.crossJoin(broadcast(maxTs))
        .groupBy($"user_id", $"ref_end")
        .agg(
          count(lit(1)).as("n_events"),
          sum(when($"event_type" === "purchase", 1).otherwise(0)).cast("long").as("n_purchases"),
          sum(when($"event_type" === "purchase" &&
                   $"ts" >= $"ref_end" - expr("INTERVAL 7 DAYS"), 1).otherwise(0))
            .cast("long").as("n_recent"),
          max(when($"event_type" === "purchase", $"ts")).as("last_purchase"))
      agg.select(
        $"user_id", $"n_events", $"n_purchases", $"n_recent",
        when($"n_recent" > 0, "A")
          .when($"n_purchases" > 0, "B")
          .otherwise("C").as("tier"),
        greatest(lit(0), datediff(to_date($"ref_end"), to_date($"last_purchase")))
          .cast("long").as("days_since"),
        when($"n_recent" > 0, concat(lit("recent purchases: "), $"n_recent"))
          .when($"n_purchases" > 0, concat(lit("purchases: "), $"n_purchases", lit(", none recent")))
          .otherwise("no purchases").as("details"))
        .orderBy($"user_id")
    },
    Some("""
      WITH ref AS (SELECT max(ts) AS ref_end FROM events),
      agg AS (
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN event_type = 'purchase' AND ts >= ref_end - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_recent,
               max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase,
               max(ref_end) AS ref_end
        FROM events, ref GROUP BY user_id, ref_end)
      SELECT user_id, n_events, n_purchases, n_recent,
             CASE WHEN n_recent > 0 THEN 'A'
                  WHEN n_purchases > 0 THEN 'B'
                  ELSE 'C' END AS tier,
             CAST(greatest(0, datediff('day', CAST(last_purchase AS DATE), CAST(ref_end AS DATE))) AS BIGINT) AS days_since,
             CASE WHEN n_recent > 0 THEN 'recent purchases: ' || n_recent
                  WHEN n_purchases > 0 THEN 'purchases: ' || n_purchases || ', none recent'
                  ELSE 'no purchases' END AS details
      FROM agg ORDER BY user_id"""))

  // ------------------------------------------------------- q24_keyword_filter
  /** The reference's F1 ingest filter (strong OR (context AND money)) with
    * dash-normalization and K2-style additive scoring, over documents
    * (reference app/ingest/rss_ingest.py:52-59).
    */
  val q24KeywordFilter = {
    import Vocab._
    def sqlAny(ws: Seq[String]) =
      ws.map(w => s"nt LIKE '%$w%'").mkString("(", " OR ", ")")
    val allKw = strongKw ++ contextKw ++ moneyKw
    val sqlScore = allKw
      .map(w => s"(CASE WHEN nt LIKE '%$w%' THEN 1 ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "q24_keyword_filter",
      (s, dir) => {
        import s.implicits._
        val nt = normTitle($"text")
        t(s, dir, "documents")
          .filter(kwAny(nt, strongKw) || (kwAny(nt, contextKw) && kwAny(nt, moneyKw)))
          .select(
            $"doc_id",
            kwAny(nt, strongKw).as("strong_hit"),
            kwCount(nt, allKw).cast("long").as("kw_score"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH n AS (
          SELECT doc_id, lower(regexp_replace(text, '[-–—]', ' ', 'g')) AS nt
          FROM documents)
        SELECT doc_id,
               ${sqlAny(strongKw)} AS strong_hit,
               CAST($sqlScore AS BIGINT) AS kw_score
        FROM n
        WHERE ${sqlAny(strongKw)} OR (${sqlAny(contextKw)} AND ${sqlAny(moneyKw)})
        ORDER BY doc_id"""))
  }

  // --------------------------------------------------------------- q25_knn_ivf
  /** IVF-style ANN: 8 centroid vectors (deterministic sample: vec_id ≥
    * 990 shifted out of the probe range — a k-means quantizer in
    * production) partition the corpus into inverted lists; probes search
    * only their own cell (nprobe=1). Data-adaptive sibling of the
    * hyperplane-LSH path.
    */
  val q25KnnIvf = {
    import KmeansSql.{sqlCos, sqlDot}
    QueryDef(
      "q25_knn_ivf",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val centroids = e.filter($"vec_id" % 37 === 0 && $"vec_id" >= 100)
          .orderBy($"vec_id").limit(8)
          .select($"vec_id".as("centroid_id"), $"embedding".as("centroid_vec"))
        val probes = e.filter($"vec_id" < 5)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        val corpus = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        Similarity.knnIvf(probes, corpus, centroids, k = 3)
          .select($"probe_id", $"cell", $"rn".cast("long").as("rn"), $"cand_id", $"cos")
          .orderBy($"probe_id", $"rn")
      },
      Some(s"""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid_vec
          FROM embeddings WHERE vec_id % 37 = 0 AND vec_id >= 100
          ORDER BY vec_id LIMIT 8),
        pa AS (
          SELECT probe_id, pv, centroid_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY ${sqlCos("pv", "centroid_vec")} DESC, centroid_id) AS crn
          FROM (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5), cent),
        pc AS (SELECT probe_id, pv, cell FROM pa WHERE crn = 1),
        ca AS (
          SELECT cand_id, cv, centroid_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY cand_id
                   ORDER BY ${sqlCos("cv", "centroid_vec")} DESC, centroid_id) AS crn
          FROM (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings), cent),
        cc AS (SELECT cand_id, cv, cell FROM ca WHERE crn = 1),
        s AS (
          SELECT probe_id, pc.cell AS cell, cand_id, ${sqlCos("pv", "cv")} AS cos
          FROM pc JOIN cc USING (cell) WHERE probe_id != cand_id),
        r AS (
          SELECT probe_id, cell, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
          FROM s)
        SELECT probe_id, cell, rn, cand_id, cos FROM r
        WHERE rn <= 3 ORDER BY probe_id, rn"""))
  }

  // ------------------------------------------------------ q26_dedup_embedding
  /** Embedding-cosine near-dup pairs: LSH-bucketed (same hyperplane
    * family as q15, plane count auto-sized to the corpus via
    * [[Similarity.autoPlanes]] so candidate generation stays
    * corpus-linear at any scale), within-bucket pairs with cosine ≥
    * 0.35 — the semantic-dedup member of the dedup family (exact /
    * minhash / simhash / jaccard / embedding).
    */
  val q26DedupEmbedding = {
    val sqlPlanes =
      """(SELECT CAST(coalesce(min(p), 16) AS INT) FROM range(1, 17) t(p)
          WHERE 64 * (1 << p) >= (SELECT count(*) FROM embeddings))"""
    def sqlBucket(vec: String) =
      s"""list_sum(list_transform(range(0, $sqlPlanes), p ->
         CASE WHEN round(list_reduce(list_transform(range(0, 64),
           d -> $vec[d+1]::DOUBLE * (CAST(('0x' || substr(md5('0:' || p || ':' || d), 1, 15)) AS BIGINT) % 1000 / 1000.0 - 0.5)),
           (x, y) -> x + y), 6) > 0 THEN (1 << p) ELSE 0 END))"""
    import KmeansSql.sqlDot
    QueryDef(
      "q26_dedup_embedding",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
          .select($"vec_id", $"embedding")
        val planes = Similarity.autoPlanes(e.count(), targetBucket = 64)
        Similarity.embeddingNearDupPairs(e, "embedding", "vec_id",
          dims = 64, planes = planes, threshold = 0.35)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket
          FROM embeddings),
        p AS (
          SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                 round(${sqlDot("a.embedding", "c.embedding")} /
                       (sqrt(${sqlDot("a.embedding", "a.embedding")})
                        * sqrt(${sqlDot("c.embedding", "c.embedding")})), 6) AS cos
          FROM b a JOIN b c USING (bucket)
          WHERE a.vec_id < c.vec_id)
        SELECT id_a, id_b, cos FROM p
        WHERE cos >= 0.35 ORDER BY id_a, id_b"""))
  }

  // ----------------------------------------------------- q27_pipeline_report
  /** The ENTIRE reference pipeline end to end (hermetic DemoFixtures —
    * sfDir-independent): ingest filter → store anti-join → enrichment →
    * 4-level domain resolution → LinkedIn scoring → hiring tiers → P3
    * report. Oracle = the hand-derived golden report (every value
    * traceable to a fixture edge; see DemoFixtures/PipelineSpec).
    */
  val q27PipelineReport = QueryDef(
    "q27_pipeline_report",
    (s, dir) => {
      import graft.pipeline.{DemoFixtures, Pipeline}
      val run = Pipeline.run(
        DemoFixtures(s), DemoFixtures.initialStore(s),
        to_timestamp(lit(DemoFixtures.AsOf)))
      run.report.orderBy(col("company"))
    },
    Some("""
      SELECT * FROM (VALUES
        ('Acme Labs', 'https://acme-labs.com', 'https://linkedin.com/company/acme-labs',
         CAST(12000000 AS BIGINT), 'Series A', 'Alpha Cap, Beta Fund', 'Alpha Cap', 'USA',
         '2026-08-10', 'A', 2, 'Greenhouse', 'https://boards.greenhouse.io/acmelabs',
         'https://news.example.com/acme-raises', '2026-08-12 12:00:00'),
        ('Borg Systems Inc.', 'https://borgsystems.com', 'https://www.linkedin.com/company/borg-systems',
         CAST(3000000 AS BIGINT), 'Seed', '', CAST(NULL AS VARCHAR), 'Germany',
         CAST(NULL AS VARCHAR), 'B', 1, 'Internal', 'https://borgsystems.com/careers',
         'https://press.example.org/borg-seed', '2026-08-12 12:00:00'),
        ('Hotel Analytics', 'https://hotelanalytics.io', CAST(NULL AS VARCHAR),
         CAST(2000000 AS BIGINT), 'Angel', 'Gamma', 'Gamma', CAST(NULL AS VARCHAR),
         '2026-08-12', 'C', 0, 'Internal', 'https://hotelanalytics.io/join',
         'https://news.example.com/hotel-angel', '2026-08-12 12:00:00'),
        ('Kilo', 'https://kilo.io', CAST(NULL AS VARCHAR),
         CAST(8040000 AS BIGINT), 'Series B', 'Delta P', CAST(NULL AS VARCHAR), 'India',
         '2026-08-07', 'C', 0, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         'https://news.example.com/kilo-series-b', '2026-08-12 12:00:00'),
        ('Lima Corp', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), '', CAST(NULL AS VARCHAR), 'UK',
         '2026-08-06', 'C', 0, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         'https://news.example.com/lima-valuation', '2026-08-12 12:00:00'),
        ('Nova.ai', 'https://nova.ai', CAST(NULL AS VARCHAR),
         CAST(4000000 AS BIGINT), 'Seed', 'Zeta', 'Zeta', 'France',
         '2026-08-10', 'A', 1, 'Lever', 'https://jobs.lever.co/nova',
         'https://news.example.com/nova-raises', '2026-08-12 12:00:00')
      ) AS t(company, domain, linkedin, amount_usd, round, investors, lead_investor,
             country, date_announced, hiring_tier, tech_roles, ats_provider,
             careers_url, source_url, last_updated)
      ORDER BY company"""))

  /** Registry. */
  def all: Seq[QueryDef] = Seq(
    q9DedupExact, q10Fingerprint, q11DedupNear, q12Simhash, q13TextQuality,
    q14KnnExact, q15KnnLsh, q16WindowTumble, q17WindowSlide, q18Sessionize,
    q19MergeUpsert, q20Rollup, q21SetOps, q22AggExtras, q23UserTier,
    q24KeywordFilter, q25KnnIvf, q26DedupEmbedding, q27PipelineReport)
}
