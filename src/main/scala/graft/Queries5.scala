package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Round-9 queries: corpus-hygiene depth for the LLM-pipeline north star —
  * boilerplate n-gram mining, benchmark decontamination (the cut, not just
  * the q47 detection), Bloom-prefiltered seen-key dedup, and
  * cluster-balanced diversity sampling over the q49 codebook. Same
  * oracle-parity rules as [[Queries]].
  */
object Queries5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------------ q63_ngram_topk
  /** Boilerplate mining ([[graft.operators.TextAnalysis.frequentNgrams]]):
    * the 20 word-3-grams appearing in the most documents (df ≥ 2) —
    * nav bars, license blurbs, and template text repeat verbatim across
    * a web corpus and surface here first. Per-doc distinct → explode →
    * one partial-agg count shuffle; the top-20 is a `TakeOrdered`, not
    * a global sort. Ordering is total (df desc, then the n-gram string),
    * so the LIMIT cut is deterministic in both engines.
    */
  val q63NgramTopk = QueryDef(
    "q63_ngram_topk",
    (s, dir) => {
      import s.implicits._
      graft.operators.TextAnalysis
        .frequentNgrams(t(s, dir, "documents"), "text", n = 3, minDf = 2L)
        .orderBy($"df_count".desc, $"ngram")
        .limit(20)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
      ng AS (
        SELECT DISTINCT doc_id, array_to_string(list_slice(w, i+1, i+3), ' ') AS ngram
        FROM toks, unnest(range(0, len(w) - 2)) AS t(i))
      SELECT ngram, CAST(count(*) AS BIGINT) AS df_count
      FROM ng GROUP BY ngram HAVING count(*) >= 2
      ORDER BY df_count DESC, ngram LIMIT 20"""))

  // --------------------------------------------------------- q64_decontaminate
  /** Benchmark decontamination ([[graft.operators.Contamination.cut]]):
    * q47 detects test-set overlap; this query SHIPS the cut — remove
    * every training document whose 3-gram shingle overlap with the
    * held-out set (doc_id % 97 = 0) reaches 4%, then report the
    * per-source funnel (docs kept/cut, surviving token mass). The
    * test-set index broadcasts, the corpus is probed map-side, and the
    * cut is a broadcast anti join against the tiny contaminated-id
    * list — the corpus never shuffles.
    */
  val q64Decontaminate = QueryDef(
    "q64_decontaminate",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Contamination
      val docs = t(s, dir, "documents")
      val test = docs.filter($"doc_id" % 97 === 0)
      val train = docs.filter($"doc_id" % 97 =!= 0)
      val kept = Contamination.cut(train, test, "doc_id", "text",
        minOverlapFrac = 0.04)
      val tot = train.groupBy($"source").agg(count(lit(1)).as("n_train"))
      val k = kept.groupBy($"source").agg(count(lit(1)).as("n_kept"),
        sum(size(words($"text")).cast("long")).as("n_tokens_kept"))
      tot.join(k, Seq("source"), "left")
        .select($"source", $"n_train",
          coalesce($"n_kept", lit(0L)).as("n_kept"),
          ($"n_train" - coalesce($"n_kept", lit(0L))).as("n_cut"),
          coalesce($"n_tokens_kept", lit(0L)).as("n_tokens_kept"))
        .orderBy($"source")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      shx AS (
        SELECT doc_id, source, len(w) AS n_tok,
               CASE WHEN len(w) >= 3 THEN
                 list_distinct(list_transform(
                   list_transform(range(0, len(w) - 2), i ->
                     ((wh[i+1] % 1073741824) * 37 + (wh[i+2] % 1073741824)) % 1073741789
                       * 41 + (wh[i+3] % 1073741824)),
                   v -> v % 1073741789))
               ELSE [] END AS sh
        FROM toks),
      ts AS (
        SELECT DISTINCT unnest(sh) AS h FROM shx WHERE doc_id % 97 = 0),
      tr AS (SELECT * FROM shx WHERE doc_id % 97 != 0),
      bad AS (
        SELECT doc_id FROM (
          SELECT t2.doc_id, len(t2.sh) AS n_sh, count(*) AS n_shared
          FROM (SELECT doc_id, sh, unnest(sh) AS h FROM tr WHERE len(sh) > 0) t2
          JOIN ts USING (h) GROUP BY t2.doc_id, n_sh)
        WHERE round(CAST(n_shared AS DOUBLE) / n_sh, 6) >= 0.04)
      SELECT source, CAST(count(*) AS BIGINT) AS n_train,
             CAST(count(*) FILTER (doc_id NOT IN (SELECT doc_id FROM bad)) AS BIGINT) AS n_kept,
             CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM bad)) AS BIGINT) AS n_cut,
             CAST(coalesce(sum(n_tok) FILTER (doc_id NOT IN (SELECT doc_id FROM bad)), 0) AS BIGINT)
               AS n_tokens_kept
      FROM tr GROUP BY source ORDER BY source"""))

  // ------------------------------------------------------------- q65_bloom_seen
  /** Bloom-prefiltered seen-key dedup ([[graft.operators.PortableBloom]]):
    * the reference's seen-URL anti-join (SURVEY §2 J1/F4) at 100 TB.
    * "Seen" store = every 5th document's 2-word prefix key; the other
    * docs probe a k=3, 8192-bit filter built from the store. The filter
    * is a relational bit-position table (md5 hashing), so the probe side
    * never shuffles (3 broadcast joins) AND the DuckDB oracle rebuilds
    * the identical filter — the verdicts hash-match, which an opaque
    * `bloom_filter_agg` sketch cannot do. Output: probe count, bloom
    * hits, exact seen count, false positives (the cost of skipping the
    * full anti-join), and the no-false-negative guarantee, verified
    * against the exact join over ALL probes (verification only — the
    * production path exact-joins just the bloom hits).
    */
  val q65BloomSeen = {
    val K = 3
    val MBits = 8192
    QueryDef(
      "q65_bloom_seen",
      (s, dir) => {
        import s.implicits._
        import graft.operators.PortableBloom
        val key = concat_ws(" ", slice(words($"text"), 1, 2))
        val docs = t(s, dir, "documents").select($"doc_id", key.as("key"))
        val seenKeys = docs.filter($"doc_id" % 5 === 0)
          .select($"key").distinct()
        val bits = PortableBloom.build(seenKeys, $"key", K, MBits)
        val probes = docs.filter($"doc_id" % 5 =!= 0)
        PortableBloom.probe(probes, $"key", bits, K, MBits, "bloom_hit")
          .join(broadcast(seenKeys.withColumn("_seen", lit(1L))),
            Seq("key"), "left")
          .select($"bloom_hit", $"_seen".isNotNull.as("seen"))
          .agg(count(lit(1)).as("n_probe"),
            sum(when($"bloom_hit", 1L).otherwise(0L)).as("n_bloom_hits"),
            sum(when($"seen", 1L).otherwise(0L)).as("n_true_seen"),
            sum(when($"bloom_hit" && !$"seen", 1L).otherwise(0L))
              .as("n_false_pos"),
            (sum(when($"seen" && !$"bloom_hit", 1L).otherwise(0L)) === 0)
              .as("no_false_neg"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 array_to_string(list_slice(string_split(text, ' '), 1, 2), ' ') AS key
          FROM documents),
        seen AS (SELECT DISTINCT key FROM d WHERE doc_id % 5 = 0),
        bits AS (
          SELECT DISTINCT unnest([
            CAST(('0x' || substr(md5('100:' || key), 1, 15)) AS BIGINT) % $MBits,
            CAST(('0x' || substr(md5('101:' || key), 1, 15)) AS BIGINT) % $MBits,
            CAST(('0x' || substr(md5('102:' || key), 1, 15)) AS BIGINT) % $MBits]) AS bit
          FROM seen),
        p AS (
          SELECT key,
                 CAST(('0x' || substr(md5('100:' || key), 1, 15)) AS BIGINT) % $MBits AS b0,
                 CAST(('0x' || substr(md5('101:' || key), 1, 15)) AS BIGINT) % $MBits AS b1,
                 CAST(('0x' || substr(md5('102:' || key), 1, 15)) AS BIGINT) % $MBits AS b2
          FROM d WHERE doc_id % 5 != 0),
        m AS (
          SELECT (b0 IN (SELECT bit FROM bits)
                  AND b1 IN (SELECT bit FROM bits)
                  AND b2 IN (SELECT bit FROM bits)) AS bloom_hit,
                 key IN (SELECT key FROM seen) AS seen
          FROM p)
        SELECT CAST(count(*) AS BIGINT) AS n_probe,
               CAST(coalesce(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bloom_hits,
               CAST(coalesce(sum(CASE WHEN seen THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true_seen,
               CAST(coalesce(sum(CASE WHEN bloom_hit AND NOT seen THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_false_pos,
               coalesce(sum(CASE WHEN seen AND NOT bloom_hit THEN 1 ELSE 0 END), 0) = 0
                 AS no_false_neg
        FROM m"""))
  }

  // ---------------------------------------------------------- q66_cluster_sample
  /** Cluster-balanced diversity sampling
    * ([[graft.operators.Sampling.perGroupCapByHash]] over the q49
    * codebook): train the spherical-k-means codebook, assign every
    * vector to its cell, then keep at most 40 vectors per cell in
    * deterministic hash order — the SemDeDup-shaped "sample the
    * embedding space evenly, not the skewed natural mix" primitive.
    * One shuffle on the cell id for the within-cell rank (output is
    * cells × cap — the small side by construction); the oracle replays
    * training, assignment, and the hash-order cut.
    */
  val q66ClusterSample = {
    import KmeansSql.trainAssignCtes
    QueryDef(
      "q66_cluster_sample",
      (s, dir) => {
        import s.implicits._
        import graft.operators.{Sampling, Similarity}
        val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
        // persisted across training + assignment, q49/q11 convention:
        // the returned frame reads it lazily, the session owner clears
        val ePinned =
          if (e.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
            e.persist() else e
        val cent = Similarity.kmeans(ePinned, "embedding", "vec_id",
          k = 8, iters = 2, seed = 31)
        val assigned = Similarity
          .ivfAssign(ePinned, "embedding", "vec_id", cent)
          .select($"vec_id", $"cell")
        Sampling.perGroupCapByHash(assigned, $"cell",
            $"vec_id".cast("string"), cap = 40, seed = 33)
          .select($"cell", $"vec_id", $"sample_rank")
          .orderBy($"cell", $"sample_rank")
      },
      Some(s"""
        WITH $trainAssignCtes,
        r AS (
          SELECT cid AS cell, vec_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cid
                   ORDER BY CAST(('0x' || substr(md5('33:' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
                            CAST(vec_id AS VARCHAR)) AS BIGINT) AS sample_rank
          FROM fin)
        SELECT cell, vec_id, sample_rank FROM r
        WHERE sample_rank <= 40 ORDER BY cell, sample_rank"""))
  }

  // --------------------------------------------------------------- q67_span_cut
  /** Substring-dedup removal ([[graft.operators.Dedup.cutRepeatedSpans]]):
    * q58 DETECTS 10-token spans repeated across documents; this query
    * ships the cut — every repeated span keeps one canonical copy
    * corpus-wide (the smallest doc_id owning it) and is removed from
    * every other document. Output: the affected documents with before/
    * after token counts and the rewritten text. The repeated-hash agg
    * carries (hash, id) pairs (never text), the cut offsets collect to
    * one small array per affected doc, and the token rewrite is a
    * narrow per-row array pass after an id join.
    */
  val q67SpanCut = QueryDef(
    "q67_span_cut",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Dedup
      Dedup.cutRepeatedSpans(t(s, dir, "documents"), "doc_id", "text", n = 10)
        .filter($"n_tokens_after" < $"n_tokens_before")
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)
                        % 1073741824) AS u
        FROM documents),
      ng AS (
        SELECT doc_id, i AS off,
               list_reduce(list_concat([CAST(0 AS BIGINT)], list_slice(u, i+1, i+10)),
                 (a, b) -> (a * 37 + b) % 1073741789) AS gh
        FROM toks, unnest(range(0, len(u) - 9)) AS t(i)
        WHERE len(u) >= 10),
      rep AS (
        SELECT gh, min(doc_id) AS canon FROM ng
        GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      cuts AS (
        SELECT ng.doc_id,
               list_distinct(flatten(list(range(ng.off, ng.off + 10)))) AS covered
        FROM ng JOIN rep USING (gh) WHERE ng.doc_id != rep.canon
        GROUP BY ng.doc_id)
      SELECT t.doc_id,
             CAST(len(t.w) AS BIGINT) AS n_tokens_before,
             CAST(len(t.w) - len(c.covered) AS BIGINT) AS n_tokens_after,
             coalesce(array_to_string(
               list_transform(
                 list_filter(range(0, len(t.w)), i -> NOT list_contains(c.covered, i)),
                 i -> t.w[i+1]), ' '), '') AS text_clean
      FROM toks t JOIN cuts c USING (doc_id)
      ORDER BY t.doc_id"""))

  // ------------------------------------------------------------------ q68_knn_pq
  /** Product-quantization ANN ([[graft.operators.Similarity.pqTrain]]):
    * split the 64-dim embedding into 4 subspaces of 16 dims, train an
    * independent 8-cell spherical-k-means codebook per subspace, code
    * every corpus vector (4×3 bits replaces 64 floats — PQ's storage
    * win), and answer top-3 by ASYMMETRIC distance: the exact probe
    * against the corpus vector's reconstruction from its codebook
    * entries. Training is m tiny k-means runs over the deterministic
    * 1/4 hash sample of [[KmeansSql.PqConfig]], paid ONCE per dataset:
    * the codebook is a train-once on-disk artifact
    * ([[KmeansSql.PqConfig.cents]] →
    * [[graft.operators.Similarity.pqCodebookOnce]]) shared with q50
    * and q71 — the 100 TB shape, where the codebook is a build-time
    * index artifact probed by every query batch (codebook quality
    * saturates long before corpus size, so it is priced off the sample
    * while encode/scan still cover every vector). Encode and
    * reconstruct are NARROW per-row expressions against the literal
    * codebook (no join, no shuffle — the corpus is coded in one map
    * pass); the scan itself is the q14 broadcast-probe shape. The
    * oracle replays all four trainings
    * ([[KmeansSql.trainCtesD]] over the same sample), the argmax
    * coding, the concat reconstruction, and the ranking.
    */
  val q68KnnPq = {
    import KmeansSql.{pqCtes, sqlDotD, PqConfig}
    import PqConfig.{M, SubDim, K, Seed}
    QueryDef(
      "q68_knn_pq",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
        // m·k rows — the literal-broadcast pattern (Sampling thresholds):
        // resolved from the train-once on-disk artifact shared with
        // q50/q71 (PqConfig.cents), then inlined into the narrow
        // encode/recon expressions
        val cents = PqConfig.cents(s, dir)
        val probes = e.filter($"vec_id" < 5)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        val corpus = e.select($"vec_id".as("cand_id"),
          $"embedding".as("cv"))
        Similarity.knnPq(probes, corpus, cents, SubDim, k = 3)
          .select($"probe_id", $"rn".cast("long").as("rn"), $"cand_id", $"cos")
          .orderBy($"probe_id", $"rn")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        ${pqCtes(M, SubDim, K, Seed, PqConfig.sampleWhere)},
        p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
        sx AS (
          SELECT probe_id, r.vec_id AS cand_id,
                 round(${sqlDotD("pv", "rv", 64)} /
                       (sqrt(${sqlDotD("pv", "pv", 64)}) * sqrt(${sqlDotD("rv", "rv", 64)})), 6) AS cos
          FROM p, recon r WHERE probe_id != r.vec_id),
        rk AS (
          SELECT probe_id, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
          FROM sx)
        SELECT probe_id, rn, cand_id, cos FROM rk
        WHERE rn <= 3 ORDER BY probe_id, rn"""))
  }

  // ----------------------------------------------------------- q69_cms_topk
  /** Count-min-sketch heavy hitters ([[graft.operators.CountMin]]):
    * the approximate companion to q63's exact aggregation — a 3×1024
    * sketch of every 3-gram occurrence (multiplicity, not df), probed
    * for the top-20 3-grams by true count. Output pins the sketch
    * behavior cross-engine: the estimate never undercounts
    * (`overcount ≥ 0` by construction), and `within_bound` is an
    * EXPECTED-CASE check — each row's collision mass averages N/width,
    * so 3·N/width is comfortable headroom on typical data, but
    * count-min's ε·N guarantee is probabilistic and an adversarially
    * skewed key set can legitimately exceed it (both engines compute
    * the flag identically, so parity holds either way). Checked in
    * exact BIGINT arithmetic. The sketch
    * build shuffles at most depth·width cells REGARDLESS of corpus
    * size; estimation is `depth` broadcast joins, map-only.
    */
  val q69CmsTopk = {
    val Depth = 3; val Width = 1024
    QueryDef(
      "q69_cms_topk",
      (s, dir) => {
        import s.implicits._
        import graft.operators.CountMin
        val ngr = t(s, dir, "documents")
          .select(explode(shingles(words($"text"), 3)).as("ngram"))
        // ONE corpus explode pass (round 19; guide §1.2): the n-gram
        // histogram — Heaps'-law-sized, bounded — feeds BOTH the sketch
        // (buildWeighted: identical cells, each distinct n-gram hashed
        // depth× once instead of once per occurrence) and the exact
        // truth top-20; the previous shape ran the corpus explode and
        // the per-occurrence md5s twice
        val hist = ngr.groupBy($"ngram").agg(count(lit(1)).as("n_true"))
          .persist()
        // ≤ depth·width cells by construction — pinning it is bounded at
        // ANY corpus size, and without it each of estimate's 3 broadcast
        // reads plus the N read would re-run the histogram
        val sketch = CountMin.buildWeighted(hist, $"ngram", $"n_true",
          Depth, Width).persist()
        val truth = hist.orderBy($"n_true".desc, $"ngram").limit(20)
        // N = total occurrence mass = the cell sum of any one sketch row
        // (every occurrence lands in exactly one bucket per row) — read
        // it from the sketch instead of a third pass over the explode
        val totalN = sketch.filter($"r" === 0).agg(sum($"cnt").as("_N"))
        CountMin.estimate(truth, $"ngram", sketch, Depth, Width, "n_est")
          .crossJoin(broadcast(totalN))
          .select($"ngram", $"n_true", $"n_est",
            ($"n_est" - $"n_true").as("overcount"),
            (($"n_est" - $"n_true") * Width <= $"_N" * 3).as("within_bound"))
          .orderBy($"n_true".desc, $"ngram")
      },
      Some(s"""
        WITH toks AS (
          SELECT string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        ng AS (
          SELECT array_to_string(list_slice(w, i+1, i+3), ' ') AS ngram
          FROM toks, unnest(range(0, len(w) - 2)) AS t(i)),
        cms AS (
          SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT t2.r,
                   CAST(('0x' || substr(md5((200 + t2.r) || ':' || ngram), 1, 15)) AS BIGINT) % $Width AS bucket
            FROM ng, (VALUES (0), (1), (2)) t2(r))
          GROUP BY r, bucket),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cms WHERE r = 0),
        tru AS (
          SELECT ngram, CAST(count(*) AS BIGINT) AS n_true FROM ng
          GROUP BY ngram ORDER BY n_true DESC, ngram LIMIT 20),
        est AS (
          SELECT ngram, n_true,
                 least(${(0 until Depth).map(r =>
                   s"""coalesce((SELECT cnt FROM cms WHERE r = $r AND bucket =
                      CAST(('0x' || substr(md5('${200 + r}:' || ngram), 1, 15)) AS BIGINT) % $Width), 0)""")
                   .mkString(", ")}) AS n_est
          FROM tru)
        SELECT ngram, n_true, n_est, n_est - n_true AS overcount,
               (n_est - n_true) * $Width <= (SELECT n * 3 FROM tot) AS within_bound
        FROM est ORDER BY n_true DESC, ngram"""))
  }

  // ----------------------------------------------------------- q70_bpe_train
  /** BPE merge-table induction ([[graft.operators.BpeTrain]]): train 8
    * merges from the corpus — the loop that produces the kind of table
    * [[graft.functions.BpeTokenCount]] ships fixed. The engine trains
    * on the word HISTOGRAM (one partial-agg shuffle; Heaps'-law-sized,
    * never corpus-sized), then each round is one tiny weighted pair
    * aggregation + one single-row driver collect + one narrow replace.
    * The oracle replays every round: same sliding-window pair counts,
    * same (count desc, a, b) tie-break, same leftmost-non-overlapping
    * replace over the delimiter-wrapped symbol strings — so a trained
    * table is guaranteed to tokenize identically in both engines.
    */
  val q70BpeTrain = {
    val R = 8
    val Sep = "\u001F" // BpeTokenCount.Sep symbol delimiter
    // every CTE is MATERIALIZED: the round chain references its
    // predecessor ~3x (pair agg + two scalar subqueries), so inlined
    // CTEs would re-evaluate the whole prefix ~3^rounds times
    def sqlRound(r: Int): String = s"""
        p$r AS MATERIALIZED (
          SELECT syms[i+1] AS a, syms[i+2] AS b, CAST(sum(n) AS BIGINT) AS cnt
          FROM (SELECT n, list_filter(string_split(symstr, '$Sep'), x -> x != '') AS syms
                FROM s${r - 1}),
               unnest(range(0, len(syms) - 1)) AS t$r(i)
          WHERE len(syms) >= 2
          GROUP BY 1, 2),
        m$r AS MATERIALIZED (
          SELECT CAST($r AS BIGINT) AS merge_rank, a, b, cnt AS pair_count
          FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
        s$r AS MATERIALIZED (
          SELECT replace(symstr,
                   (SELECT '$Sep' || a || '$Sep$Sep' || b || '$Sep' FROM m$r),
                   (SELECT '$Sep' || a || b || '$Sep' FROM m$r)) AS symstr, n
          FROM s${r - 1})"""
    QueryDef(
      "q70_bpe_train",
      (s, dir) => {
        import s.implicits._
        graft.operators.BpeTrain.train(t(s, dir, "documents"), "text", rounds = R)
          .select($"merge_rank".cast("long").as("merge_rank"),
            $"a", $"b", $"pair_count")
          .orderBy($"merge_rank")
      },
      Some(s"""
        WITH v0 AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          WHERE word != '' GROUP BY word),
        s0 AS MATERIALIZED (
          SELECT '$Sep' || array_to_string(
                   list_transform(range(1, length(word) + 1), i -> word[i]),
                   '$Sep$Sep') || '$Sep' AS symstr, n
          FROM v0),
        ${(1 to R).map(sqlRound).mkString(",")}
        ${(1 to R).map(r => s"SELECT merge_rank, a, b, pair_count FROM m$r")
          .mkString("\n        UNION ALL\n        ")}
        ORDER BY merge_rank"""))
  }

  // ------------------------------------------------------------ q71_knn_ivfpq
  /** IVF-PQ composite ANN — the industry-standard large-scale index
    * shape: a coarse IVF quantizer restricts candidates to the probe's
    * cell (the q25/q50 inverted-list path), and within the cell
    * candidates rank by PQ asymmetric distance against their
    * reconstruction (the q68 codes). The candidate join is an
    * EQUI-join on the cell id — candidates ∝ cell size, never the
    * corpus — and the PQ side stays the narrow literal-codebook
    * decode, so at 100 TB the scan reads cell-local code lists, not
    * vectors. The oracle composes the two existing replay generators
    * (coarse-assign CTEs + [[KmeansSql.pqCtes]]).
    */
  val q71KnnIvfPq = {
    import KmeansSql.{pqCtes, sqlCosD, sqlDotD, PqConfig}
    import PqConfig.{M, SubDim, K, Seed}
    QueryDef(
      "q71_knn_ivfpq",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
        val centroids = e.filter($"vec_id" % 37 === 0 && $"vec_id" >= 100)
          .orderBy($"vec_id").limit(8)
          .select($"vec_id".as("centroid_id"), $"embedding".as("centroid_vec"))
        // train-once on-disk codebook shared with q50/q68
        val cents = PqConfig.cents(s, dir)
        val probes = e.filter($"vec_id" < 10)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        val corpus = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        Similarity.knnIvfPq(probes, corpus, centroids, cents, SubDim, k = 3)
          .select($"probe_id", $"rn".cast("long").as("rn"),
            $"cell".cast("long").as("cell"), $"cand_id", $"cos")
          .orderBy($"probe_id", $"rn")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        ${pqCtes(M, SubDim, K, Seed, PqConfig.sampleWhere)},
        cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid_vec
          FROM embeddings WHERE vec_id % 37 = 0 AND vec_id >= 100
          ORDER BY vec_id LIMIT 8),
        xp AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 10),
        xc AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
        pa AS (
          SELECT probe_id, pv, centroid_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY ${sqlCosD("pv", "centroid_vec", 64)} DESC, centroid_id) AS crn
          FROM xp, cent),
        pc AS (SELECT probe_id, pv, cell FROM pa WHERE crn = 1),
        ca AS (
          SELECT cand_id, centroid_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY cand_id
                   ORDER BY ${sqlCosD("cv", "centroid_vec", 64)} DESC, centroid_id) AS crn
          FROM xc, cent),
        cc AS (SELECT cand_id, cell FROM ca WHERE crn = 1),
        s AS (
          SELECT pc.probe_id, pc.cell, cc.cand_id,
                 round(${sqlDotD("pc.pv", "r.rv", 64)} /
                       (sqrt(${sqlDotD("pc.pv", "pc.pv", 64)}) * sqrt(${sqlDotD("r.rv", "r.rv", 64)})), 6) AS cos
          FROM pc JOIN cc USING (cell) JOIN recon r ON r.vec_id = cc.cand_id
          WHERE pc.probe_id != cc.cand_id),
        rk AS (
          SELECT probe_id, cell, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
          FROM s)
        SELECT probe_id, rn, CAST(cell AS BIGINT) AS cell, cand_id, cos FROM rk
        WHERE rn <= 3 ORDER BY probe_id, rn"""))
  }

  def all: Seq[QueryDef] = Seq(
    q63NgramTopk, q64Decontaminate, q65BloomSeen, q66ClusterSample,
    q67SpanCut, q68KnnPq, q69CmsTopk, q70BpeTrain, q71KnnIvfPq)
}
