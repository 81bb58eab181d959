package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hash64, words}
import graft.operators.TextAnalysis

/** Round-11 query surface, part 9: classifier and provenance audits —
  * language-ID confusion, snapshot diffing, token-entropy health, and
  * cross-source content overlap. Oracle-parity rules as in
  * [[Queries]]/[[Queries2]].
  */
object Queries15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------ q132_langid_confusion
  /** Confusion matrix for the marker-based language-ID (the q13
    * `lang_guess` column audited against the labeled `lang`): per true
    * language, where do its documents actually land, and with what
    * share — the per-class recall view that a single accuracy number
    * hides (a classifier can be 90% right overall while routing ALL of
    * one minority language to the wrong bucket). One native token pass
    * per doc (the fused [[TextAnalysis.langId]] counts array), then an
    * O(langs²) matrix with row shares via a window — the q128 matrix
    * shape.
    */
  val q132LangidConfusion = {
    import Queries2.Vocab.langMarkers
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
      "q132_langid_confusion",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"lang", TextAnalysis.langId($"text", langMarkers)
            .as("lang_guess"))
          .groupBy($"lang", $"lang_guess").agg(count(lit(1)).as("n"))
          .withColumn("share", round($"n".cast("double")
            / sum($"n").over(Window.partitionBy($"lang")), 6))
          .orderBy($"lang", $"lang_guess")
      },
      Some(s"""
        WITH base AS (
          SELECT lang, string_split(lower(text), ' ') AS lw FROM documents),
        sc AS (
          SELECT lang,
               $scoreCols
          FROM base),
        g AS (
          SELECT lang,
               CASE
               $langCase
               END AS lang_guess
          FROM sc),
        m AS (SELECT lang, lang_guess, COUNT(*) AS n FROM g GROUP BY 1, 2)
        SELECT lang, lang_guess, CAST(n AS BIGINT) AS n,
               round(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY lang), 6) AS share
        FROM m ORDER BY lang, lang_guess"""))
  }

  // ---------------------------------------------------------- q133_corpus_diff
  /** Snapshot diff by content fingerprint: two simulated crawl
    * snapshots (doc_id mod-3 slices with an overlapping third) diffed
    * per source into retained / added / removed distinct contents plus
    * a churn rate — the dataset-versioning release note every corpus
    * refresh should ship (and the cheap pre-check before paying for
    * full near-dup dedup of a new snapshot against the old). Each
    * side's fingerprints partial-agg to per-side distinct sets; the
    * diff is ONE full outer join on (source, hash) — hash-partitioned,
    * corpus-linear, no pairwise anything.
    */
  val q133CorpusDiff = QueryDef(
    "q133_corpus_diff",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"source", hash64($"text", 11).as("h"))
      val old = docs.filter($"doc_id" % 3 =!= 0)
        .select($"source", $"h").distinct()
        .withColumn("_o", lit(1L))
      val neu = docs.filter($"doc_id" % 3 =!= 1)
        .select($"source", $"h").distinct()
        .withColumn("_n", lit(1L))
      old.join(neu, Seq("source", "h"), "full_outer")
        .groupBy($"source")
        .agg(
          sum(coalesce($"_o", lit(0L))).as("n_old"),
          sum(coalesce($"_n", lit(0L))).as("n_new"),
          sum(when($"_o".isNotNull && $"_n".isNotNull, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when($"_o".isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when($"_n".isNull, 1L).otherwise(0L)).as("n_removed"))
        .withColumn("churn",
          round(($"n_added" + $"n_removed").cast("double")
            / ($"n_old" + $"n_new"), 6))
        .orderBy($"source")
    },
    Some("""
      WITH fp AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5('11:' || text), 1, 15)) AS BIGINT) AS h
        FROM documents),
      o AS (SELECT DISTINCT source, h FROM fp WHERE doc_id % 3 != 0),
      n AS (SELECT DISTINCT source, h FROM fp WHERE doc_id % 3 != 1),
      j AS (
        SELECT COALESCE(o.source, n.source) AS source,
               o.h AS oh, n.h AS nh
        FROM o FULL OUTER JOIN n ON o.source = n.source AND o.h = n.h),
      g AS (
        SELECT source,
               SUM(CASE WHEN oh IS NOT NULL THEN 1 ELSE 0 END) AS n_old,
               SUM(CASE WHEN nh IS NOT NULL THEN 1 ELSE 0 END) AS n_new,
               SUM(CASE WHEN oh IS NOT NULL AND nh IS NOT NULL
                 THEN 1 ELSE 0 END) AS n_retained,
               SUM(CASE WHEN oh IS NULL THEN 1 ELSE 0 END) AS n_added,
               SUM(CASE WHEN nh IS NULL THEN 1 ELSE 0 END) AS n_removed
        FROM j GROUP BY 1)
      SELECT source, CAST(n_old AS BIGINT) AS n_old,
             CAST(n_new AS BIGINT) AS n_new,
             CAST(n_retained AS BIGINT) AS n_retained,
             CAST(n_added AS BIGINT) AS n_added,
             CAST(n_removed AS BIGINT) AS n_removed,
             round(CAST(n_added + n_removed AS DOUBLE) / (n_old + n_new), 6)
               AS churn
      FROM g ORDER BY source"""))

  // --------------------------------------------------------- q134_token_entropy
  /** Token-distribution entropy per source: `H = −Σ p ln p` over the
    * source's unigram distribution, plus the vocab-normalized
    * `H / ln(vocab)` — the information-theoretic health check that
    * separates template spam (low H: few tokens dominate) from natural
    * text, and the companion number to q111's distinct-n and q116's
    * Zipf slope. One tokenize pass → (source, term) partial-agg
    * counts; totals ride a window over the vocab-sized frame (the
    * q106 no-recompute shape); each `−p ln p` term rounds at 9 and
    * sums as exact decimals.
    */
  val q134TokenEntropy = QueryDef(
    "q134_token_entropy",
    (s, dir) => {
      import s.implicits._
      val tc = t(s, dir, "documents")
        .select($"source", explode(words($"text")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      val bySrc = Window.partitionBy($"source")
      tc.withColumn("_n", sum($"c").over(bySrc))
        .select($"source", $"_n",
          round($"c".cast("double") / $"_n", 9).as("p"))
        .select($"source", $"_n",
          round($"p" * round(log($"p"), 9), 9).as("_t"))
        .groupBy($"source")
        .agg(min($"_n").as("n_tokens"), count(lit(1)).as("vocab"),
          round(-sum($"_t".cast("decimal(27,12)")).cast("double"), 6)
            .as("entropy"))
        .withColumn("norm_entropy",
          // a one-term source divides by ln(1) = 0 — null, not NaN
          when($"vocab" > 1,
            round($"entropy" / round(log($"vocab".cast("double")), 9), 6)))
        .orderBy($"source")
    },
    Some("""
      WITH tc AS (
        SELECT source, w, COUNT(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2),
      p AS (
        SELECT source, SUM(c) OVER (PARTITION BY source) AS n,
               round(CAST(c AS DOUBLE)
                 / SUM(c) OVER (PARTITION BY source), 9) AS p
        FROM tc),
      tm AS (
        SELECT source, n, round(p * round(ln(p), 9), 9) AS t FROM p),
      g AS (
        SELECT source, CAST(MIN(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               round(-CAST(SUM(CAST(t AS DECIMAL(27,12))) AS DOUBLE), 6)
                 AS entropy
        FROM tm GROUP BY 1)
      SELECT source, n_tokens, vocab, entropy,
             CASE WHEN vocab > 1
               THEN round(entropy / round(ln(CAST(vocab AS DOUBLE)), 9), 6)
             END AS norm_entropy
      FROM g ORDER BY source"""))

  // -------------------------------------------------------- q135_source_overlap
  /** Cross-source content overlap matrix: for each source pair, the
    * Jaccard of their 3-gram shingle sets — the provenance audit that
    * catches one feed mirroring or templating another (pay for one of
    * them, or dedup at ingest). Shingle-level, not whole-document:
    * feeds rarely share byte-identical documents but template overlap
    * shows up immediately in the gram sets (document-hash overlap on
    * this corpus is empty — measured, which is exactly why the audit
    * works at gram granularity). The pair frame comes from an
    * EQUI-join on the shingle hash (only co-occurring grams meet, ≤
    * sources² rows per gram — never a sources² × corpus cross); set
    * sizes attach as a broadcast O(sources) aggregate.
    */
  val q135SourceOverlap = QueryDef(
    "q135_source_overlap",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Dedup
      val fp = t(s, dir, "documents")
        .select($"source", explode(
          Dedup.shingleHashes3(Dedup.wordHashes(words($"text")))).as("h"))
        .distinct()
      val sizes = fp.groupBy($"source").agg(count(lit(1)).as("sz"))
      val shared = fp.select($"source".as("src_a"), $"h")
        .join(fp.select($"source".as("src_b"), $"h"), "h")
        .filter($"src_a" < $"src_b")
        .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(sizes.select($"source".as("src_a"),
          $"sz".as("_sa"))), "src_a")
        .join(broadcast(sizes.select($"source".as("src_b"),
          $"sz".as("_sb"))), "src_b")
        .select($"src_a", $"src_b", $"n_shared",
          round($"n_shared".cast("double")
            / ($"_sa" + $"_sb" - $"n_shared"), 6).as("jaccard"))
        .orderBy($"src_a", $"src_b")
    },
    Some("""
      WITH toks AS (
        SELECT source, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      shf AS (
        SELECT source,
               list_transform(range(0, len(w) - 2), i ->
                 ((wh[i+1] % 1073741824) * 37 + (wh[i+2] % 1073741824)) % 1073741789
                   * 41 + (wh[i+3] % 1073741824)) AS sh0
        FROM toks WHERE len(w) >= 3),
      fp AS (
        SELECT DISTINCT source,
               unnest(list_transform(sh0, v -> v % 1073741789)) AS h
        FROM shf),
      sz AS (SELECT source, COUNT(*) AS sz FROM fp GROUP BY 1),
      sh AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
             round(CAST(n_shared AS DOUBLE)
               / (sa.sz + sb.sz - n_shared), 6) AS jaccard
      FROM sh
      JOIN sz sa ON sa.source = src_a
      JOIN sz sb ON sb.source = src_b
      ORDER BY src_a, src_b"""))

  def all: Seq[QueryDef] = Seq(q132LangidConfusion, q133CorpusDiff,
    q134TokenEntropy, q135SourceOverlap)
}
