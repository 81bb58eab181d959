package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine, words}

/** Round-11 query surface, part 6: data attribution (leave-one-source-
  * out influence), cross-corpus pair mining (margin-based bitext),
  * robust outlier gating (median/MAD), and vocabulary-growth audit
  * (Heaps-law fit). Oracle-parity rules as in [[Queries]]/[[Queries2]].
  */
object Queries12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // -------------------------------------------------------- q120_loo_influence
  /** Leave-one-source-out data attribution: how much does each source
    * bend the corpus-wide lexical-diversity curve (OLS slope of
    * distinct-word ratio ~ ln doc length)? The cheap end of the
    * data-valuation spectrum — influence via sufficient statistics:
    * ONE corpus pass accumulates per-source regression sums
    * (n, Σx, Σy, Σxy, Σx²), totals fold via an unpartitioned window
    * over the O(sources) frame (the q115 shape), and every LOO slope
    * is closed-form algebra on (total − source) sums — no per-source
    * retraining, no second scan, source count never touches the
    * corpus again. Determinism: ln rounds to 9 (q37 discipline),
    * per-doc products round to 9, all sums fold as exact decimals and
    * subtract exactly before the final double algebra.
    */
  val q120LooInfluence = QueryDef(
    "q120_loo_influence",
    (s, dir) => {
      import s.implicits._
      val xy = t(s, dir, "documents")
        .select($"source", size(words($"text")).as("nw"),
          size(array_distinct(words($"text"))).as("ndw"))
        .filter($"nw" >= 1)
        .select($"source",
          round(log($"nw".cast("double")), 9).as("x"),
          round($"ndw".cast("double") / $"nw", 9).as("y"))
      val ps = xy.groupBy($"source").agg(
        count(lit(1)).as("n"),
        sum($"x".cast("decimal(27,12)")).as("sx"),
        sum($"y".cast("decimal(27,12)")).as("sy"),
        sum(round($"x" * $"y", 9).cast("decimal(27,12)")).as("sxy"),
        sum(round($"x" * $"x", 9).cast("decimal(27,12)")).as("sxx"))
      val all = Window.partitionBy(lit(0))
      // zero-variance guard (q116/q123 discipline): a single source (or
      // a LOO remainder with constant x) zeroes the denominator — emit
      // null, never 0/0 NaN
      def slope(n: Column, sx: Column, sy: Column, sxy: Column,
                sxx: Column): Column = {
        val den = n * sxx - sx * sx
        when(den > 0, (n * sxy - sx * sy) / den)
      }
      ps.select($"source", $"n", $"sx", $"sy", $"sxy", $"sxx",
          sum($"n").over(all).as("tn"), sum($"sx").over(all).as("tsx"),
          sum($"sy").over(all).as("tsy"), sum($"sxy").over(all).as("tsxy"),
          sum($"sxx").over(all).as("tsxx"))
        .select($"source", $"n".as("n_docs"),
          round(slope(($"tn" - $"n").cast("double"),
            ($"tsx" - $"sx").cast("double"), ($"tsy" - $"sy").cast("double"),
            ($"tsxy" - $"sxy").cast("double"),
            ($"tsxx" - $"sxx").cast("double")), 6).as("slope_loo"),
          round(round(slope(($"tn" - $"n").cast("double"),
              ($"tsx" - $"sx").cast("double"), ($"tsy" - $"sy").cast("double"),
              ($"tsxy" - $"sxy").cast("double"),
              ($"tsxx" - $"sxx").cast("double")), 6)
            - round(slope($"tn".cast("double"), $"tsx".cast("double"),
              $"tsy".cast("double"), $"tsxy".cast("double"),
              $"tsxx".cast("double")), 6), 6).as("influence"))
        .orderBy($"source")
    },
    Some("""
      WITH xy AS (
        SELECT source,
               round(ln(CAST(len(string_split(text, ' ')) AS DOUBLE)), 9) AS x,
               round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 9) AS y
        FROM documents WHERE len(string_split(text, ' ')) >= 1),
      ps AS (
        SELECT source, COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(27,12))) AS sx,
               SUM(CAST(y AS DECIMAL(27,12))) AS sy,
               SUM(CAST(round(x * y, 9) AS DECIMAL(27,12))) AS sxy,
               SUM(CAST(round(x * x, 9) AS DECIMAL(27,12))) AS sxx
        FROM xy GROUP BY source),
      tot AS (
        SELECT *, SUM(n) OVER () AS tn, SUM(sx) OVER () AS tsx,
               SUM(sy) OVER () AS tsy, SUM(sxy) OVER () AS tsxy,
               SUM(sxx) OVER () AS tsxx
        FROM ps),
      sl AS (
        SELECT source, n,
               (CAST(tn - n AS DOUBLE) * CAST(tsxy - sxy AS DOUBLE)
                - CAST(tsx - sx AS DOUBLE) * CAST(tsy - sy AS DOUBLE)) AS numl,
               (CAST(tn - n AS DOUBLE) * CAST(tsxx - sxx AS DOUBLE)
                - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)) AS denl,
               (CAST(tn AS DOUBLE) * CAST(tsxy AS DOUBLE)
                - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE)) AS numt,
               (CAST(tn AS DOUBLE) * CAST(tsxx AS DOUBLE)
                - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE)) AS dent
        FROM tot)
      SELECT source, CAST(n AS BIGINT) AS n_docs,
             CASE WHEN denl > 0 THEN round(numl / denl, 6) END AS slope_loo,
             round(CASE WHEN denl > 0 THEN round(numl / denl, 6) END
                 - CASE WHEN dent > 0 THEN round(numt / dent, 6) END, 6)
               AS influence
      FROM sl ORDER BY source"""))

  /** Shared margin-mining stage for [[q121BitextMargin]] /
    * [[q124BitextLshMargin]]: both rank directions, both neighborhood
    * means, the margin, and the per-A best pick fold as windows over
    * one `(aid, bid, cos)` frame. The neighborhood divisor is
    * `least(k, candidates)` so partitions smaller than k (tiny LSH
    * buckets, small probe batches) stay well-defined — ONE semantics
    * for both instantiations.
    */
  private val MarginK = 4

  private def marginPick(x: DataFrame): DataFrame = {
    import x.sparkSession.implicits._
    val byA = Window.partitionBy($"aid").orderBy($"cos".desc, $"bid")
    val byB = Window.partitionBy($"bid").orderBy($"cos".desc, $"aid")
    def nbrMean(rn: Column, part: org.apache.spark.sql.expressions.WindowSpec) =
      round(sum(when(rn <= MarginK, $"cos").cast("decimal(27,12)"))
        .over(part).cast("double")
        / least(lit(MarginK.toLong), count(lit(1)).over(part)), 9)
    x.withColumn("rna", row_number().over(byA))
      .withColumn("da", nbrMean($"rna", Window.partitionBy($"aid")))
      .withColumn("rnb", row_number().over(byB))
      .withColumn("db", nbrMean($"rnb", Window.partitionBy($"bid")))
      .withColumn("margin", round($"cos" / (($"da" + $"db") / 2.0), 6))
      .withColumn("pick", row_number().over(
        Window.partitionBy($"aid").orderBy($"margin".desc, $"bid")))
      .filter($"pick" === 1 && $"margin" > 1.0)
      .select($"aid", $"bid", $"cos", $"margin")
      .orderBy($"aid")
  }

  /** The SQL twin of [[marginPick]] — append after a CTE `x(aid, bid,
    * cos)` (starts with `r1 AS`, ends with the final SELECT).
    */
  private def marginSqlTail: String = s"""
        r1 AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY aid ORDER BY cos DESC, bid) AS rna,
                 ROW_NUMBER() OVER (PARTITION BY bid ORDER BY cos DESC, aid) AS rnb
          FROM x),
        d AS (
          SELECT *,
                 round(CAST(SUM(CASE WHEN rna <= $MarginK
                     THEN CAST(cos AS DECIMAL(27,12)) END)
                   OVER (PARTITION BY aid) AS DOUBLE)
                   / LEAST($MarginK, COUNT(*) OVER (PARTITION BY aid)), 9) AS da,
                 round(CAST(SUM(CASE WHEN rnb <= $MarginK
                     THEN CAST(cos AS DECIMAL(27,12)) END)
                   OVER (PARTITION BY bid) AS DOUBLE)
                   / LEAST($MarginK, COUNT(*) OVER (PARTITION BY bid)), 9) AS db
          FROM r1),
        m AS (
          SELECT aid, bid, cos,
                 round(cos / ((da + db) / 2.0), 6) AS margin
          FROM d),
        p AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY aid
                      ORDER BY margin DESC, bid) AS pick
          FROM m)
        SELECT aid, bid, cos, margin
        FROM p WHERE pick = 1 AND margin > 1.0 ORDER BY aid"""


  // --------------------------------------------------------- q121_bitext_margin
  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix criterion): align side A (label 0) to side B
    * (label 1) by RATIO margin — `cos(x,y)` divided by the mean of
    * each endpoint's k-NN neighborhood cosines — which cancels hubness
    * that raw cosine thresholds can't (a vector close to everything
    * mines nothing). Both rank directions and both neighborhood means
    * fold as windows over ONE broadcast-probe cosine frame. The probe
    * batch is BOUNDED by contract (`vec_id < 100` — the incremental
    * shape: align a new-crawl batch against the existing corpus), so
    * cost is linear in the corpus; the 100× rehearsal caught the
    * original both-sides-proportional instantiation at 340× (Σ|A|·|B|
    * quadratic) and this bound is the fix. Corpus×corpus mining is
    * [[q124BitextLshMargin]] (bucketed candidates, corpus-linear).
    * Keeps each A-vector's best-margin partner where margin > 1.
    */
  val q121BitextMargin = {
    import KmeansSql.sqlCos
    QueryDef(
      "q121_bitext_margin",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val a = e.filter($"label" === 0 && $"vec_id" < 100)
          .select($"vec_id".as("aid"), $"embedding".as("av"))
        val b = e.filter($"label" === 1)
          .select($"vec_id".as("bid"), $"embedding".as("bv"))
        val x = b.crossJoin(broadcast(a))
          .select($"aid", $"bid", round(cosine($"av", $"bv"), 6).as("cos"))
        marginPick(x)
      },
      Some(s"""
        WITH a AS (SELECT vec_id AS aid, embedding AS av
                   FROM embeddings WHERE label = 0 AND vec_id < 100),
        b AS (SELECT vec_id AS bid, embedding AS bv
              FROM embeddings WHERE label = 1),
        x AS (SELECT aid, bid, ${sqlCos("av", "bv")} AS cos FROM a, b),
        $marginSqlTail"""))
  }

  // ---------------------------------------------------------- q122_mad_outliers
  /** Robust length-outlier gate per language: median + MAD (median
    * absolute deviation) of document length, flagging docs whose
    * robust z-score `0.6745·|v − med| / mad` exceeds 3.5 — the
    * Iglewicz–Hoaglin rule every length filter should use instead of
    * mean±kσ (one 10 MB page drags a mean, not a median). Two
    * [[graft.operators.Percentiles.thresholds]] rank-selection passes
    * (median, then MAD over deviations), pinned to
    * [[graft.operators.Percentiles.ExactThresholds]] because med/mad
    * are the DELIVERABLE here (hash-matched against the oracle's
    * `quantile_cont`), not an internal cut-point — the
    * [[graft.operators.Percentiles.SketchThresholds]] swap is for
    * consumers whose thresholds only feed a bucketing (q161). Each
    * pass is a single range shuffle with partition-bounded memory, the
    * q35 100 TB property; the gate itself is a broadcast threshold
    * compare, one map pass.
    */
  val q122MadOutliers = QueryDef(
    "q122_mad_outliers",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Percentiles
      val v = t(s, dir, "documents")
        .select($"lang", $"n_chars".cast("double").as("v"))
      val med = Percentiles.thresholds(v, Seq("lang"), "v", Seq(0.5),
          Percentiles.ExactThresholds)
        .select($"lang", round($"value", 6).as("med"))
      val dev = v.join(broadcast(med), "lang")
        .select($"lang", $"med", abs($"v" - $"med").as("dev"))
      val mad = Percentiles.thresholds(dev, Seq("lang"), "dev", Seq(0.5),
          Percentiles.ExactThresholds)
        .select($"lang", round($"value", 6).as("mad"))
      dev.join(broadcast(mad), "lang")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), min($"med").as("med"),
          min($"mad").as("mad"),
          sum(when($"dev" > round(lit(3.5) * $"mad" / 0.6745, 6), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy($"lang")
    },
    Some("""
      WITH v AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents),
      med AS (SELECT lang, round(quantile_cont(v, 0.5), 6) AS med
              FROM v GROUP BY 1),
      dev AS (SELECT v.lang, med, abs(v.v - med) AS dev
              FROM v JOIN med USING (lang)),
      mad AS (SELECT lang, round(quantile_cont(dev, 0.5), 6) AS mad
              FROM dev GROUP BY 1)
      SELECT dev.lang, CAST(count(*) AS BIGINT) AS n_docs,
             MIN(dev.med) AS med, MIN(mad.mad) AS mad,
             CAST(SUM(CASE WHEN dev.dev > round(3.5 * mad.mad / 0.6745, 6)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev JOIN mad USING (lang)
      GROUP BY dev.lang ORDER BY dev.lang"""))

  // ------------------------------------------------------------ q123_heaps_fit
  /** Heaps'-law fit per language: OLS slope β of `ln vocab ~ ln
    * tokens` over the vocabulary-growth curve — the companion audit to
    * q116's Zipf fit (β ≈ 0.4–0.6 for natural text; β → 1 means the
    * corpus never stops minting types: OCR noise, ids, spam), and the
    * exponent [[graft.operators.BpeTrain]]'s vocab sizing leans on.
    * The growth curve needs no sequential scan: each word's FIRST
    * document (min doc_id — one partial-agg pass, vocab-sized) gives
    * new-types-per-doc, and both cumulative axes fold as one windowed
    * cumsum per language over the doc-count-sized frame. At 100 TB the
    * checkpoint grid subsamples docs; the fit math is unchanged.
    */
  val q123HeapsFit = QueryDef(
    "q123_heaps_fit",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .filter(size(words($"text")) >= 1)
      val base = d.select($"lang", $"doc_id", size(words($"text")).as("nw"))
      val nv = d.select($"lang", $"doc_id",
          explode(array_distinct(words($"text"))).as("w"))
        .groupBy($"lang", $"w").agg(min($"doc_id").as("fd"))
        .groupBy($"lang", $"fd").agg(count(lit(1)).as("nv"))
        .select($"lang".as("_l"), $"fd", $"nv")
      val cumW = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val xy = base
        .join(nv, $"lang" === $"_l" && $"doc_id" === $"fd", "left")
        .select($"lang", $"doc_id", $"nw", coalesce($"nv", lit(0L)).as("nv"))
        .select($"lang", sum($"nw").over(cumW).as("ct"),
          sum($"nv").over(cumW).as("cv"))
        .select($"lang", $"ct", $"cv",
          round(log($"ct".cast("double")), 9).as("x"),
          round(log($"cv".cast("double")), 9).as("y"))
      def csum(c: Column) =
        round(sum(c.cast("decimal(27,12)")).cast("double"), 9)
      xy.groupBy($"lang")
        .agg(count(lit(1)).as("n_points"), max($"ct").as("total_tokens"),
          max($"cv").as("vocab"),
          csum($"x").as("sx"), csum($"y").as("sy"),
          csum(round($"x" * $"y", 9)).as("sxy"),
          csum(round($"x" * $"x", 9)).as("sxx"))
        .select($"lang", $"n_points", $"total_tokens", $"vocab",
          // a one-doc language has zero x-variance — null, not 0/0 NaN
          when($"n_points" * $"sxx" - $"sx" * $"sx" > 0,
            round(($"n_points" * $"sxy" - $"sx" * $"sy")
              / ($"n_points" * $"sxx" - $"sx" * $"sx"), 6)).as("heaps_beta"))
        .orderBy($"lang")
    },
    Some("""
      WITH d AS (
        SELECT lang, doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 1),
      base AS (SELECT lang, doc_id, len(w) AS nw FROM d),
      fw AS (
        SELECT lang, wd, min(doc_id) AS fd
        FROM (SELECT lang, doc_id, unnest(list_distinct(w)) AS wd FROM d)
        GROUP BY 1, 2),
      nv AS (SELECT lang, fd, COUNT(*) AS nv FROM fw GROUP BY 1, 2),
      j AS (
        SELECT b.lang, b.doc_id, b.nw, COALESCE(nv.nv, 0) AS nv
        FROM base b LEFT JOIN nv ON nv.lang = b.lang AND nv.fd = b.doc_id),
      cum AS (
        SELECT lang,
               SUM(nw) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS ct,
               SUM(nv) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cv
        FROM j),
      xy AS (
        SELECT lang, ct, cv,
               round(ln(CAST(ct AS DOUBLE)), 9) AS x,
               round(ln(CAST(cv AS DOUBLE)), 9) AS y
        FROM cum),
      ag AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS np,
               CAST(MAX(ct) AS BIGINT) AS toks, CAST(MAX(cv) AS BIGINT) AS voc,
               round(CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE), 9) AS sx,
               round(CAST(SUM(CAST(y AS DECIMAL(27,12))) AS DOUBLE), 9) AS sy,
               round(CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(27,12)))
                 AS DOUBLE), 9) AS sxy,
               round(CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(27,12)))
                 AS DOUBLE), 9) AS sxx
        FROM xy GROUP BY lang)
      SELECT lang, np AS n_points, toks AS total_tokens, voc AS vocab,
             CASE WHEN np * sxx - sx * sx > 0
               THEN round((np * sxy - sx * sy) / (np * sxx - sx * sx), 6)
             END AS heaps_beta
      FROM ag ORDER BY lang"""))

  // ------------------------------------------------- q124_bitext_lsh_margin
  /** Corpus×corpus margin mining — the scale path q121's bounded-batch
    * contract defers to: BOTH sides are corpus-proportional, so
    * candidates come from a shared random-hyperplane LSH bucket join
    * ([[graft.operators.Similarity.hyperplaneBucket]], AUTO-SIZED by
    * [[graft.operators.Similarity.autoPlanes]] — the oracle derives the
    * identical plane count from its own `count(*)`), never the full
    * cross. Pair work is Σ|bucket_A|·|bucket_B| ≈ n·targetBucket —
    * corpus-linear, the same dial as q15. Neighborhood means divide by
    * `least(k, candidates)` since bucket-local candidate counts vary;
    * margins are bucket-local (the CCMatrix approximation: ANN
    * candidates, not exact k-NN — recall is the trade, measured the
    * q50 way if needed). Keeps each A-vector's best bucket-local
    * partner where margin > 1.
    */
  val q124BitextLshMargin = {
    import KmeansSql.sqlDot
    // the q15 oracle machinery: derive planes from the same
    // shift-compare (smallest p in [1,16] with 64·2^p >= count(*)),
    // then the md5-hyperplane sign code per vector
    val sqlPlanes =
      """(SELECT CAST(coalesce(min(p), 16) AS INT) FROM range(1, 17) t(p)
          WHERE 64 * (1 << p) >= (SELECT count(*) FROM embeddings))"""
    def sqlBucket(vec: String) =
      s"""list_sum(list_transform(range(0, $sqlPlanes), p ->
         CASE WHEN round(list_reduce(list_transform(range(0, 64),
           d -> $vec[d+1]::DOUBLE * (CAST(('0x' || substr(md5('0:' || p || ':' || d), 1, 15)) AS BIGINT) % 1000 / 1000.0 - 0.5)),
           (x, y) -> x + y), 6) > 0 THEN (1 << p) ELSE 0 END))"""
    QueryDef(
      "q124_bitext_lsh_margin",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val e = t(s, dir, "embeddings")
        val planes = Similarity.autoPlanes(e.count(), targetBucket = 64)
        def side(label: Int, id: String, v: String) =
          e.filter($"label" === label)
            .select($"vec_id".as(id), $"embedding".as(v),
              Similarity.hyperplaneBucket($"embedding", 64, planes)
                .as("bucket"))
        val x = side(0, "aid", "av").join(side(1, "bid", "bv"), "bucket")
          .select($"aid", $"bid", round(cosine($"av", $"bv"), 6).as("cos"))
        marginPick(x)
      },
      Some(s"""
        WITH a AS (
          SELECT vec_id AS aid, embedding AS av,
                 CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
          FROM embeddings WHERE label = 0),
        b AS (
          SELECT vec_id AS bid, embedding AS bv,
                 CAST(${sqlBucket("embedding")} AS BIGINT) AS bucket
          FROM embeddings WHERE label = 1),
        x AS (
          SELECT aid, bid,
                 round(${sqlDot("av", "bv")} /
                       (sqrt(${sqlDot("av", "av")}) * sqrt(${sqlDot("bv", "bv")})), 6) AS cos
          FROM a JOIN b USING (bucket)),
        $marginSqlTail"""))
  }

  def all: Seq[QueryDef] = Seq(q120LooInfluence, q121BitextMargin,
    q122MadOutliers, q123HeapsFit, q124BitextLshMargin)
}
