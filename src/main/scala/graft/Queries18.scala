package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.words
import graft.operators.{Dedup, TextAnalysis}

/** Round-11 query surface, part 12: dedup observability and corpus
  * statistics closures — component-size histogram, vocabulary coverage
  * curve, boilerplate openers, feature correlation matrix.
  * Oracle-parity rules as in [[Queries]]/[[Queries2]].
  */
object Queries18 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------ q144_cluster_histogram
  /** Near-dup component-size histogram: how many duplicate clusters of
    * each size, and the dup-doc mass each size class removes — the
    * one-page summary that tells you whether dedup savings come from
    * many pairs or a few giant mirrors (which changes the keep-best
    * strategy, q81). Reuses the q36 component machinery (banded LSH →
    * threshold → O(log n) connected components); the histogram is two
    * tiny aggregations over the O(components) frame.
    */
  val q144ClusterHistogram = QueryDef(
    "q144_cluster_histogram",
    (s, dir) => {
      import s.implicits._
      Dedup.nearDupComponents(t(s, dir, "documents"), "doc_id", "text",
          seeds = 8, bands = 4, rowsPerBand = 2, minJaccard = 0.4)
        .groupBy($"component").agg(count(lit(1)).as("sz"))
        .groupBy($"sz").agg(count(lit(1)).as("n_components"))
        .select($"sz", $"n_components",
          (($"sz" - 1) * $"n_components").as("n_dup_docs"))
        .orderBy($"sz")
    },
    Some(s"""
      WITH RECURSIVE ${MinhashCcSql.ctes},
      sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY 1)
      SELECT CAST(sz AS BIGINT) AS sz,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST((sz - 1) * COUNT(*) AS BIGINT) AS n_dup_docs
      FROM sizes GROUP BY sz ORDER BY sz"""))

  // -------------------------------------------------------- q145_vocab_coverage
  /** Vocabulary coverage curve: the fraction of corpus token mass
    * covered by the top-100 / top-500 / top-2000 terms — the number
    * that sizes a tokenizer vocab (or a stopword list) before training
    * one, and the cumulative view of q116's Zipf fit. One tokenize
    * pass → term counts. Round-12: the coverage points only ever look
    * at the top-max(Ks) terms, so the rank comes from a distributed
    * `TakeOrdered` of max(Ks) rows (the ranks themselves fold as a
    * window over that LIMIT-bounded frame) instead of the previous
    * global `row_number` over the whole vocab — Heaps-bounded is still
    * ~10⁸–10⁹ unigrams at 100 TB, too many for one task. Vocab size
    * and total token mass attach as a broadcast one-row aggregate from
    * the same term-count pass (exchange-reused); exact integers until
    * the final share.
    */
  val q145VocabCoverage = {
    val Ks = Seq(100, 500, 2000)
    QueryDef(
      "q145_vocab_coverage",
      (s, dir) => {
        import s.implicits._
        val tc = t(s, dir, "documents")
          .select(explode(words($"text")).as("w"))
          .groupBy($"w").agg(count(lit(1)).as("c"))
        val tot = tc.agg(count(lit(1)).as("vocab"), sum($"c").as("total"))
        val rk = tc.orderBy($"c".desc, $"w").limit(Ks.max)
          .withColumn("rn", row_number().over(
            Window.orderBy($"c".desc, $"w")))
        val aggCols = Ks.map(k => sum(when($"rn" <= k, $"c")).as(s"cov$k"))
        val agg = rk.agg(aggCols.head, aggCols.tail: _*)
          .crossJoin(broadcast(tot))
        agg.select(explode(array(Ks.map(k =>
            struct(lit(k.toLong).as("k"), $"vocab", $"total",
              coalesce(col(s"cov$k"), lit(0L)).as("covered"))): _*)).as("x"))
          .select($"x.k", $"x.vocab", $"x.total", $"x.covered",
            round($"x.covered".cast("double") / $"x.total", 6)
              .as("coverage"))
          .orderBy($"k")
      },
      Some(s"""
        WITH tc AS (
          SELECT w, COUNT(*) AS c
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY 1),
        rk AS (
          SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM tc),
        a AS (
          SELECT COUNT(*) AS vocab, SUM(c) AS total,
                 ${Ks.map(k =>
                   s"COALESCE(SUM(CASE WHEN rn <= $k THEN c END), 0) AS cov$k")
                 .mkString(", ")}
          FROM rk)
        ${Ks.map(k => s"""
          SELECT CAST($k AS BIGINT) AS k, CAST(vocab AS BIGINT) AS vocab,
                 CAST(total AS BIGINT) AS total,
                 CAST(cov$k AS BIGINT) AS covered,
                 round(CAST(cov$k AS DOUBLE) / total, 6) AS coverage
          FROM a""").mkString(" UNION ALL ")}
        ORDER BY k"""))
  }

  // ----------------------------------------------------------- q146_prefix_dup
  /** Boilerplate openers: documents sharing an identical opening
    * 3-gram, the "article intro template" detector (license headers,
    * nav preambles, generated-page stems surface here before full
    * near-dup does). Hash-only — the opening shingle never
    * materializes as a string; one partial-agged pass over the first
    * gram per doc, top-10 openers by doc count with their source
    * spread.
    */
  val q146PrefixDup = QueryDef(
    "q146_prefix_dup",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter(size(words($"text")) >= 3)
        .select($"source",
          element_at(
            Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))), 1)
            .as("h"))
        .groupBy($"h")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"source").as("n_sources"))
        .filter($"n_docs" >= 2)
        .orderBy($"n_docs".desc, $"h")
        .limit(10)
    },
    Some("""
      WITH toks AS (
        SELECT source, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      op AS (
        SELECT source,
               (((wh[1] % 1073741824) * 37 + (wh[2] % 1073741824))
                 % 1073741789 * 41 + (wh[3] % 1073741824)) % 1073741789 AS h
        FROM toks WHERE len(w) >= 3),
      g AS (
        SELECT h, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
        FROM op GROUP BY 1)
      SELECT h, CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_sources AS BIGINT) AS n_sources
      FROM g WHERE n_docs >= 2
      ORDER BY n_docs DESC, h LIMIT 10"""))

  // ----------------------------------------------------------- q147_feature_corr
  /** Pearson correlation matrix over the quality-probe feature set
    * (token count, punctuation ratio, stopword ratio, avg token
    * length) — the multicollinearity audit run BEFORE trusting q87's
    * linear probe weights or q100's filter attributions (two filters
    * firing on correlated features double-count the same documents).
    * One corpus pass accumulates all 14 sufficient statistics (4 sums,
    * 4 squares, 6 cross-products) as exact decimals; every pairwise
    * correlation is closed-form algebra on the single summary row,
    * null when a feature is constant (both engines).
    */
  val q147FeatureCorr = {
    val sqlPunct = TextAnalysis.PunctClass.replace("'", "''")
    val sqlStop = Queries2.Vocab.stopwords.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    QueryDef(
      "q147_feature_corr",
      (s, dir) => {
        import s.implicits._
        val f = t(s, dir, "documents").select(
          least(TextAnalysis.tokenCount($"text").cast("double") / 100.0,
            lit(1.0)).as("f1"),
          TextAnalysis.punctRatio($"text").as("f2"),
          TextAnalysis.stopwordRatio($"text", Queries2.Vocab.stopwords)
            .as("f3"),
          (TextAnalysis.avgTokenLen($"text") / 10.0).as("f4"))
        def d9(c: Column) = round(sum(c.cast("decimal(27,12)"))
          .cast("double"), 9)
        val aggCols =
          count(lit(1)).as("n") +:
            ((1 to 4).map(i => d9(col(s"f$i")).as(s"s$i")) ++
              (1 to 4).map(i =>
                d9(round(col(s"f$i") * col(s"f$i"), 9)).as(s"q$i")) ++
              pairs.map { case (i, j) =>
                d9(round(col(s"f$i") * col(s"f$j"), 9)).as(s"p$i$j")
              })
        val a = f.agg(aggCols.head, aggCols.tail: _*)
        def den(i: Int) = col("n") * col(s"q$i") - col(s"s$i") * col(s"s$i")
        val rows = array(pairs.map { case (i, j) =>
          struct(lit(s"f$i").as("fa"), lit(s"f$j").as("fb"),
            when(den(i) > 0 && den(j) > 0,
              round((col("n") * col(s"p$i$j") - col(s"s$i") * col(s"s$j"))
                / sqrt(den(i) * den(j)), 6)).as("corr"))
        }: _*)
        a.select(explode(rows).as("x"))
          .select($"x.fa", $"x.fb", $"x.corr")
          .orderBy($"fa", $"fb")
      },
      Some(s"""
        WITH f AS (
          SELECT
            least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) AS f1,
            round(CAST(length(text) - length(regexp_replace(text, '$sqlPunct', '', 'g')) AS DOUBLE) / length(text), 6) AS f2,
            round(CAST(len(list_filter(string_split(lower(text), ' '),
              t -> list_contains($sqlStop, t))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 6) AS f3,
            round(CAST(list_sum(list_transform(string_split(text, ' '),
              t -> length(t))) AS DOUBLE)
              / len(string_split(text, ' ')), 6) / 10.0 AS f4
          FROM documents),
        a AS (
          SELECT COUNT(*) AS n,
                 ${(1 to 4).map(i =>
                   s"round(CAST(SUM(CAST(f$i AS DECIMAL(27,12))) AS DOUBLE), 9) AS s$i")
                 .mkString(", ")},
                 ${(1 to 4).map(i =>
                   s"round(CAST(SUM(CAST(round(f$i * f$i, 9) AS DECIMAL(27,12))) AS DOUBLE), 9) AS q$i")
                 .mkString(", ")},
                 ${pairs.map { case (i, j) =>
                   s"round(CAST(SUM(CAST(round(f$i * f$j, 9) AS DECIMAL(27,12))) AS DOUBLE), 9) AS p$i$j"
                 }.mkString(", ")}
          FROM f)
        ${pairs.map { case (i, j) => s"""
          SELECT 'f$i' AS fa, 'f$j' AS fb,
                 CASE WHEN (n * q$i - s$i * s$i) > 0
                       AND (n * q$j - s$j * s$j) > 0
                   THEN round((n * p$i$j - s$i * s$j)
                     / sqrt((n * q$i - s$i * s$i) * (n * q$j - s$j * s$j)), 6)
                 END AS corr
          FROM a"""}.mkString(" UNION ALL ")}
        ORDER BY fa, fb"""))
  }

  def all: Seq[QueryDef] = Seq(q144ClusterHistogram, q145VocabCoverage,
    q146PrefixDup, q147FeatureCorr)
}
