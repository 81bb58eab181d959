package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hash64, words}

/** Round-11 query surface, part 4: entity resolution, corpus
  * linguistics, and distribution-distance audits. Oracle-parity rules
  * as in [[Queries]]/[[Queries2]].
  */
object Queries10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // --------------------------------------------------------- q112_entity_match
  /** Entity resolution by blocking + edit-distance verify: a probe set
    * of corrupted customer names (one deterministic character
    * deletion each) re-linked to their canonical records — the
    * dirty-ingest reconciliation every curation pipeline runs on
    * entity tables. The scale shape is the whole point: candidates
    * come from an EQUI-join on the blocking key (nation), never
    * probe×corpus, and the quadratic edit-distance verify runs only
    * inside blocks (at 100 TB: block on several selective keys and
    * union — q162_entity_union_blocking in [[Queries21]] ships that
    * form and measures the fan-in drop). Best match per probe by
    * (distance, key) rank; `n_cand` reports the block's verify fan-in
    * — the dial blocking-key choice controls.
    */
  val q112EntityMatch = QueryDef(
    "q112_entity_match",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val probes = cust.filter($"c_custkey" % 150 === 7)
        .select($"c_custkey".as("probe_key"), $"c_nationkey".as("_nk"),
          expr("concat(substring(c_name, 1, CAST(10 + c_custkey % 8 AS INT) - 1), " +
            "substring(c_name, CAST(10 + c_custkey % 8 AS INT) + 1))").as("_pname"))
      val cand = probes
        .join(cust.select($"c_custkey".as("cand_key"), $"c_nationkey".as("_nk"),
          $"c_name".as("_cname")), "_nk")
        .select($"probe_key", $"cand_key",
          // full-DP on purpose: the thresholded builtin
          // `levenshtein(l, r, 2)` (banded early abort) was measured
          // round-12 at 0.49 → 1.03 s on this frame — on short
          // catalog names the banded path's per-call overhead beats
          // its asymptotic win; revisit only when verify strings are
          // long (documents, addresses), where O(k·n) vs O(n²) is real
          levenshtein($"_pname", $"_cname").as("dist"))
        .filter($"dist" <= 2)
      cand
        .withColumn("_rn", row_number().over(
          Window.partitionBy($"probe_key").orderBy($"dist", $"cand_key")))
        .withColumn("n_cand", count(lit(1)).over(Window.partitionBy($"probe_key")))
        .filter($"_rn" === 1)
        .select($"probe_key", $"cand_key".as("matched_key"),
          $"dist".cast("long").as("dist"), $"n_cand")
        .orderBy($"probe_key")
    },
    Some("""
      WITH pr AS (
        SELECT c_custkey AS probe_key, c_nationkey AS nk,
               substr(c_name, 1, CAST(10 + c_custkey % 8 AS INT) - 1)
                 || substr(c_name, CAST(10 + c_custkey % 8 AS INT) + 1) AS pname
        FROM customer WHERE c_custkey % 150 = 7),
      cand AS (
        SELECT probe_key, c.c_custkey AS cand_key,
               levenshtein(pname, c.c_name) AS d
        FROM pr JOIN customer c ON c.c_nationkey = pr.nk),
      hit AS (SELECT * FROM cand WHERE d <= 2),
      rk AS (
        SELECT probe_key, cand_key, d,
               ROW_NUMBER() OVER (PARTITION BY probe_key ORDER BY d, cand_key) AS rn,
               COUNT(*) OVER (PARTITION BY probe_key) AS n_cand
        FROM hit)
      SELECT probe_key, cand_key AS matched_key, CAST(d AS BIGINT) AS dist,
             CAST(n_cand AS BIGINT) AS n_cand
      FROM rk WHERE rn = 1 ORDER BY probe_key"""))

  // ---------------------------------------------------------- q113_burstiness
  /** Term burstiness (Church & Gale): variance-to-mean ratio of
    * per-document term counts over the whole corpus — separates topical
    * terms (bursty: absent mostly, dense where present) from function
    * words (Poisson-like VMR ≈ 1); the signal behind df-capping and
    * stopword induction. All sums are exact integers until the final
    * two divisions: zero-docs contribute zero to both Σc and Σc², so
    * the whole statistic folds map-side from one tokenize pass +
    * (term, doc) partial agg. Top-20 by VMR with a df ≥ 5 floor,
    * TakeOrdered — never a global sort.
    */
  val q113Burstiness = QueryDef(
    "q113_burstiness",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("_n"))
      docs.select($"doc_id", explode(words($"text")).as("_w"))
        .groupBy($"_w", $"doc_id").agg(count(lit(1)).as("_c"))
        .groupBy($"_w")
        .agg(count(lit(1)).as("df"), sum($"_c").as("n_occ"),
          sum($"_c" * $"_c").as("_sq"))
        .filter($"df" >= 5)
        .crossJoin(broadcast(n))
        .select($"_w".as("term"), $"df", $"n_occ",
          round($"n_occ".cast("double") / $"_n", 9).as("_mean"),
          round($"_sq".cast("double") / $"_n", 9).as("_m2"))
        .select($"term", $"df", $"n_occ",
          round(($"_m2" - $"_mean" * $"_mean") / $"_mean", 6).as("burstiness"))
        .orderBy($"burstiness".desc, $"term")
        .limit(20)
    },
    Some("""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      nx AS (SELECT COUNT(*) AS n FROM documents),
      tc AS (SELECT w, doc_id, COUNT(*) AS c FROM w GROUP BY 1, 2),
      st AS (
        SELECT w, COUNT(*) AS df, SUM(c) AS n_occ, SUM(c * c) AS sq
        FROM tc GROUP BY 1),
      m AS (
        SELECT w AS term, df, n_occ,
               round(CAST(n_occ AS DOUBLE) / n, 9) AS mean,
               round(CAST(sq AS DOUBLE) / n, 9) AS m2
        FROM st, nx WHERE df >= 5)
      SELECT term, CAST(df AS BIGINT) AS df, CAST(n_occ AS BIGINT) AS n_occ,
             round((m2 - mean * mean) / mean, 6) AS burstiness
      FROM m ORDER BY burstiness DESC, term LIMIT 20"""))

  // ------------------------------------------------------ q114_shard_wasserstein
  /** Shard distribution distance by exact 1-Wasserstein: for each
    * hash shard, the earth-mover distance between its document-length
    * CDF and the global one (`W₁ = Σ|F_s−F_g|·gap` over the global
    * value support) — the numeric twin of q110's categorical
    * chi-square, and the metric that catches a shard whose lengths
    * drifted even when its category mix is clean. One count pass over
    * the corpus, then everything runs on the O(shards × distinct
    * values) grid: windowed cumsums per shard, lead() for the support
    * gaps, exact integer counts until the two CDF divisions.
    */
  val q114ShardWasserstein = {
    val Shards = 4
    QueryDef(
      "q114_shard_wasserstein",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
          .select((hash64($"doc_id".cast("string"), 5) % Shards).cast("long")
            .as("shard"), $"n_chars".as("v"))
        val gc = d.groupBy($"v").agg(count(lit(1)).as("_gc"))
        val sc = d.groupBy($"shard", $"v").agg(count(lit(1)).as("_sc"))
        val byV = Window.partitionBy($"shard").orderBy($"v")
        val cumW = byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val byShard = Window.partitionBy($"shard")
        // shard space enumerated, not observed: covers empty shards, and
        // the global total N folds from the grid itself (Σ_gc within a
        // shard partition) — a separate total branch would re-scan the
        // corpus (the q106 lineage-recompute trap, plan-pinned)
        gc.crossJoin(broadcast(
            s.range(0, Shards).select($"id".as("shard"))))
          .join(sc, Seq("shard", "v"), "left").na.fill(0L, Seq("_sc"))
          .withColumn("_cs", sum($"_sc").over(cumW))
          .withColumn("_cg", sum($"_gc").over(cumW))
          .withColumn("_st", sum($"_sc").over(byShard))
          .withColumn("_n", sum($"_gc").over(byShard))
          .withColumn("_nx", lead($"v", 1).over(byV))
          .filter($"_nx".isNotNull)
          .select($"shard", $"_st",
            round(abs(round($"_cs".cast("double") / $"_st", 9)
              - round($"_cg".cast("double") / $"_n", 9))
              * ($"_nx" - $"v"), 9).as("_term"))
          .groupBy($"shard")
          .agg(max($"_st").as("n_docs"),
            round(sum($"_term".cast("decimal(27,12)")).cast("double"), 6)
              .as("w1"))
          .orderBy($"shard")
      },
      Some(s"""
        WITH d AS (
          SELECT CAST(('0x' || substr(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % $Shards AS shard,
                 n_chars AS v
          FROM documents),
        gc AS (SELECT v, COUNT(*) AS gc FROM d GROUP BY 1),
        sc AS (SELECT shard, v, COUNT(*) AS sc FROM d GROUP BY 1, 2),
        grid AS (
          SELECT s.shard, gc.v, gc.gc, COALESCE(sc.sc, 0) AS sc
          FROM (SELECT unnest(range(0, $Shards)) AS shard) s
          CROSS JOIN gc
          LEFT JOIN sc ON sc.shard = s.shard AND sc.v = gc.v),
        cum AS (
          SELECT shard, v, gc, sc,
                 SUM(sc) OVER (PARTITION BY shard ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cs,
                 SUM(gc) OVER (PARTITION BY shard ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cg,
                 SUM(sc) OVER (PARTITION BY shard) AS st,
                 SUM(gc) OVER (PARTITION BY shard) AS n,
                 LEAD(v) OVER (PARTITION BY shard ORDER BY v) AS nxv
          FROM grid),
        terms AS (
          SELECT shard, st,
                 round(abs(round(CAST(cs AS DOUBLE) / st, 9)
                   - round(CAST(cg AS DOUBLE) / n, 9)) * (nxv - v), 9) AS term
          FROM cum WHERE nxv IS NOT NULL)
        SELECT shard, CAST(MAX(st) AS BIGINT) AS n_docs,
               round(CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE), 6) AS w1
        FROM terms GROUP BY shard ORDER BY shard"""))
  }

  // ------------------------------------------------------- q115_time_decay_mix
  /** Recency-weighted category mix: each event weighted by
    * `0.5^(age_days / half_life)` from the newest event, then the
    * weighted share per category — the freshness-weighted sampling
    * prior for snapshot blending (new crawl counts full, year-old
    * residue fades). Age is exact integer-day arithmetic from the
    * integer-µs maximum; the one transcendental (`pow`) quantizes at
    * round-9 (the q60/q108 contract). One partial-agged pass after the
    * max; totals via an unpartitioned window over the O(categories)
    * frame (the q106 no-recompute shape).
    */
  val q115TimeDecayMix = {
    val HalfLifeDays = 7.0
    QueryDef(
      "q115_time_decay_mix",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select($"event_type", unix_micros($"ts").as("_us"))
        val mx = ev.agg(max($"_us").as("_mx"))
        val weighted = ev.crossJoin(broadcast(mx))
          .select($"event_type",
            expr("(_mx - _us) div 86400000000").as("_age"))
          .select($"event_type",
            round(pow(lit(0.5), $"_age".cast("double") / lit(HalfLifeDays)), 9)
              .as("_w"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum($"_w".cast("decimal(27,12)")).cast("double"), 9)
              .as("w_sum"))
        val all = Window.partitionBy(lit(0))
        weighted
          .withColumn("_tw",
            round(sum($"w_sum".cast("decimal(27,12)")).over(all)
              .cast("double"), 9))
          .select($"event_type", $"n_events", $"w_sum",
            round($"w_sum" / $"_tw", 6).as("share"))
          .orderBy($"event_type")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        mx AS (SELECT MAX(us) AS m FROM ev),
        wt AS (
          SELECT event_type,
                 round(pow(0.5, CAST((m - us) // 86400000000 AS DOUBLE)
                   / $HalfLifeDays), 9) AS w
          FROM ev, mx),
        agg AS (
          SELECT event_type, COUNT(*) AS n_events,
                 round(CAST(SUM(CAST(w AS DECIMAL(27,12))) AS DOUBLE), 9) AS w_sum
          FROM wt GROUP BY 1),
        tot AS (
          SELECT *, round(CAST(SUM(CAST(w_sum AS DECIMAL(27,12))) OVER ()
                   AS DOUBLE), 9) AS tw
          FROM agg)
        SELECT event_type, n_events, w_sum, round(w_sum / tw, 6) AS share
        FROM tot ORDER BY event_type"""))
  }

  def all: Seq[QueryDef] = Seq(q112EntityMatch, q113Burstiness,
    q114ShardWasserstein, q115TimeDecayMix)
}
