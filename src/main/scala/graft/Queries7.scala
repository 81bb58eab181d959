package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 query surface: corpus-local retrieval and
  * importance-weighted selection. Oracle-parity rules as in
  * [[Queries]]/[[Queries2]].
  */
object Queries7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ----------------------------------------------------------------- q88_bm25
  /** BM25 top-5 retrieval ([[graft.operators.Retrieval.bm25TopK]]):
    * three fixed keyword queries ranked against the whole documents
    * table with Lucene-variant BM25 (k1 = 1.2, b = 0.75). The oracle
    * replays the arithmetic CTE-for-CTE — idf rounded to 9 after the
    * ln, per-term contributions rounded to 9, decimal contribution
    * sums, score rounded to 6 before the per-query rank.
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
        WITH q AS (
          SELECT CAST(query_id AS BIGINT) AS query_id, term
          FROM (VALUES $sqlValues) v(query_id, term)),
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
          FROM s)
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

  def all: Seq[QueryDef] = Seq(q88Bm25, q89Dsir)
}
