package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Round-10 queries: training-layout and overlap-detection depth for the
  * LLM-pipeline north star — context-window chunking, epoch-weighted
  * mixture oversampling, SemDeDup-style semantic dedup over the k-means
  * cells, and winnowing (MOSS) fingerprint matching. Same oracle-parity
  * rules as [[Queries]].
  */
object Queries6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // -------------------------------------------------------- q72_context_chunks
  /** Context-window chunking ([[graft.operators.Packing.chunkTokens]]):
    * split every document into ≤32-token windows starting every 24
    * tokens (8-token overlap) — the prep for a trainer whose context is
    * shorter than the documents, where q55 packs SHORT documents INTO
    * windows. Narrow per-row explode: no shuffle before the final
    * ORDER BY; output rows are bounded by `maxLen` tokens each, so a
    * pathological 1 GB document becomes ordinary rows downstream.
    */
  val q72ContextChunks = {
    val MaxLen = 32; val Stride = 24
    QueryDef(
      "q72_context_chunks",
      (s, dir) => {
        import s.implicits._
        graft.operators.Packing
          .chunkTokens(t(s, dir, "documents"), "doc_id", "text",
            maxLen = MaxLen, stride = Stride)
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, w, len(w) AS n, unnest(range(0, len(w), $Stride)) AS s
          FROM toks WHERE len(w) >= 1)
        SELECT doc_id, CAST(s // $Stride AS BIGINT) AS chunk_idx,
               CAST(s AS BIGINT) AS chunk_start,
               CAST(least($MaxLen, n - s) AS BIGINT) AS n_tokens,
               array_to_string(list_slice(w, s + 1, least(s + $MaxLen, n)), ' ')
                 AS chunk_text
        FROM st ORDER BY doc_id, chunk_idx"""))
  }

  // ------------------------------------------------------------- q73_semdedup
  /** Semantic dedup (SemDeDup — Abbas et al. 2023), FLAT-cell view:
    * every vector is assigned to one quantizer cell (~`TargetCell`
    * occupancy, cell count ∝ n — the published method's dial: ~50k
    * clusters for billions of points), and within each cell every
    * vector whose cosine to a lower-id cell-mate reaches 0.35 drops,
    * reporting its smallest duplicate partner (`dup_of` — under a
    * transitive chain the partner may itself be dropped; the chain's
    * minimum always survives). Output is one flat `cell` id per row —
    * the original "one codebook" SemDeDup view.
    *
    * Round 14 — the assignment quadratic is RETIRED: the previous form
    * trained ONE flat codebook of `autoCells(n)` ≈ n/64 centroids and
    * brute-force-argmaxed every vector against it — n²/64 dot products
    * that measured 1059 s at the 100× soak, 45% of the whole 162-query
    * session (round-13 verdict; fine at sf0.1, a 100×-only killer).
    * Assignment now routes through the TWO-LEVEL quantizer
    * ([[graft.operators.Similarity.semDedupHier]], q86's machinery:
    * coarse ⌈√(n/64)⌉-cell codebook, per-coarse-cell fine codebooks —
    * both levels n·√(n/64) work), and the flat cell id is the
    * collision-free encoding `coarse · 2³² + fine` (fine cids are
    * < ⌈|coarse cell|/64⌉ ≪ 2³², and the stride preserves the
    * (coarse, fine) lexicographic order, so the flat ORDER BY is
    * stable). Same keep-smallest-id / transitive-chain contract; cells
    * stay ~`TargetCell` at any n, so the Σ|cell|² pair pass stays
    * corpus-linear AND no step evaluates n·(n/64) distances. The
    * oracle replays both training levels (the q86 CTE chain) and the
    * same encoding — the builder controls both sides of the hash, so
    * re-pinning the oracle to the scale-safe training is the honest
    * form of "keep the semantics, retire the assignment". q86 remains
    * the two-level-keyed view of the same dedup (its output carries
    * (coarse, cell) separately).
    */
  val q73SemDedup = {
    import KmeansSql.{trainAssignCtesHier, sqlCos}
    val Tau = "0.35"
    val TargetCell = 64L
    val CellStride = 1L << 32
    QueryDef(
      "q73_semdedup",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
        val ePinned =
          if (e.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
            e.persist() else e
        Similarity.semDedupHier(ePinned, "embedding", "vec_id",
            targetCell = TargetCell, tau = Tau.toDouble)
          .select(($"coarse" * CellStride + $"cell").as("cell"),
            $"vec_id", $"dup_of", $"cos")
          .orderBy($"cell", $"vec_id")
      },
      Some(s"""
        WITH ${trainAssignCtesHier(TargetCell)},
        p AS (
          SELECT a.gid * $CellStride + a.cid AS cell,
                 a.vec_id AS id_a, b.vec_id AS id_b,
                 ${sqlCos("ea.embedding", "eb.embedding")} AS cos
          FROM hfin a JOIN hfin b
            ON a.gid = b.gid AND a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id),
        d AS (
          SELECT cell, id_b AS vec_id, id_a AS dup_of, cos,
                 ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
          FROM p WHERE cos >= $Tau)
        SELECT CAST(cell AS BIGINT) AS cell, vec_id, dup_of, cos FROM d
        WHERE rn = 1 ORDER BY cell, vec_id"""),
      notes = "round 14: flat derived-k assignment (n²/64 at scale) " +
        "retired for the two-level quantizer; oracle re-pinned to the " +
        "two-level training replay")
  }

  // ------------------------------------------------------------ q74_epoch_mix
  /** Epoch-weighted mixture oversampling
    * ([[graft.operators.Sampling.epochMix]]): q53 rebalances by
    * DOWN-sampling to a target histogram; this realizes weights above 1
    * — 2.5 epochs of src0, 1.75 of src3, 0.3 of src1 — by deterministic
    * replication, the "high-quality sources repeat, low-quality sources
    * thin" mixture every LLM run trains on. Output: per (source, epoch)
    * document and token mass — epoch 0 carries every surviving doc,
    * the last fractional epoch carries the hash-selected subset.
    * Narrow explode, one tiny agg shuffle.
    */
  val q74EpochMix = {
    val Seed = 7; val Gran = 10000
    // (source → weight); everything else trains for exactly one epoch
    val Weights = Seq("src0" -> 2.5, "src1" -> 0.3, "src3" -> 1.75)
    QueryDef(
      "q74_epoch_mix",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Sampling
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"source", size(words($"text")).cast("long").as("n_tok"))
        Sampling.epochMix(docs, $"doc_id".cast("string"), $"source",
            Weights.toMap, default = 1.0, seed = Seed, granularity = Gran)
          .groupBy($"source", $"epoch")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
          .orderBy($"source", $"epoch")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
                 CAST(('0x' || substr(md5('$Seed:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % $Gran AS h
          FROM documents),
        wt AS (SELECT * FROM (VALUES
          ${Weights.map { case (src, w) =>
            val full = math.floor(w).toInt
            val cut = math.round((w - full) * Gran)
            s"('$src', $full, $cut)" }.mkString(", ")}) t(source, fl, cut)),
        x AS (
          SELECT d.doc_id, d.source, d.n_tok,
                 coalesce(wt.fl, 1) + CASE WHEN d.h < coalesce(wt.cut, 0)
                   THEN 1 ELSE 0 END AS nc
          FROM d LEFT JOIN wt USING (source)),
        r AS (
          SELECT source, n_tok, unnest(range(0, nc)) AS epoch FROM x)
        SELECT source, CAST(epoch AS BIGINT) AS epoch,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM r GROUP BY source, epoch ORDER BY source, epoch"""))
  }

  // -------------------------------------------------------- q75_winnow_match
  /** Winnowing fingerprint matching
    * ([[graft.operators.Dedup.winnowPairs]], MOSS — Schleimer et al.
    * SIGMOD'03): 4-token shingle hashes, window 5, so any ≥8-token run
    * shared verbatim by two documents surfaces at least one common
    * fingerprint; pairs sharing ≥2 fingerprints are reported with the
    * shared count. Fingerprints in more than 50 documents are dropped
    * as boilerplate (q63's territory) — the cap that keeps the
    * postings-join bucketed, never all-pairs. The position-robust
    * member of the fingerprint family next to q10's prefix hash and
    * q58's fixed-offset spans.
    */
  val q75WinnowMatch = {
    val K = 4; val W = 5; val Seed = 11
    val MinShared = 2L; val MaxDf = 50L
    QueryDef(
      "q75_winnow_match",
      (s, dir) => {
        import s.implicits._
        graft.operators.Dedup
          .winnowPairs(t(s, dir, "documents"), "doc_id", "text",
            k = K, w = W, seed = Seed, minShared = MinShared, maxDf = MaxDf)
          .select($"id_a", $"id_b", $"n_shared")
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        gh AS (
          SELECT doc_id,
                 list_transform(
                   list_transform(range(0, len(w) - ${K - 1}), i ->
                     array_to_string(list_slice(w, i + 1, i + $K), ' ')),
                   x -> CAST(('0x' || substr(md5('$Seed:' || x), 1, 15)) AS BIGINT)) AS g
          FROM toks WHERE len(w) >= $K),
        fp AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(0, len(g) - ${W - 1}), i ->
                   list_min(list_slice(g, i + 1, i + $W)))) AS fps
          FROM gh WHERE len(g) >= $W),
        ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        kept AS (
          SELECT fp FROM ex GROUP BY fp HAVING count(*) <= $MaxDf),
        ke AS (SELECT ex.doc_id, ex.fp FROM ex JOIN kept USING (fp))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM ke a JOIN ke b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY id_a, id_b HAVING count(*) >= $MinShared
        ORDER BY id_a, id_b"""))
  }

  // ------------------------------------------------------------ q76_chunk_pack
  /** Chunk-then-pack — the composed training layout: long documents are
    * tiled into ≤48-token chunks ([[graft.operators.Packing.chunkTokens]],
    * stride = maxLen so no token repeats), then the CHUNKS are laid into
    * 1024-token packs by the q55 cumulative-offset contract
    * ([[graft.operators.Packing.sequencePack]] keyed on `doc:idx`).
    * This is the real pipeline path for corpora whose documents exceed
    * the context window: q55 packs whole short documents, q72 windows
    * one document, this runs the two operators end to end. Narrow
    * explode → two-phase prefix sum; per-pack stats shuffle on the tiny
    * pack key.
    */
  val q76ChunkPack = {
    val MaxLen = 48; val PackSize = 1024L
    QueryDef(
      "q76_chunk_pack",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Packing
        val chunks = Packing
          .chunkTokens(t(s, dir, "documents"), "doc_id", "text",
            maxLen = MaxLen, stride = MaxLen)
          .select($"doc_id", $"chunk_idx", $"n_tokens",
            concat_ws(":", $"doc_id", $"chunk_idx").as("chunk_key"))
        Packing.sequencePack(chunks, "chunk_key", "n_tokens",
            packSize = PackSize)
          .groupBy($"pack_id")
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct($"doc_id").as("n_docs"),
            sum($"n_tokens").cast("long").as("pack_tokens"))
          .orderBy($"pack_id")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, len(w) AS n, unnest(range(0, len(w), $MaxLen)) AS s
          FROM toks WHERE len(w) >= 1),
        ch AS (
          SELECT doc_id, least($MaxLen, n - s) AS n_tok,
                 doc_id || ':' || CAST(s // $MaxLen AS VARCHAR) AS ck
          FROM st),
        d AS (
          SELECT doc_id, n_tok, ck,
                 CAST(('0x' || substr(md5('17:' || ck), 1, 15)) AS BIGINT) AS h
          FROM ch),
        c AS (
          SELECT doc_id, n_tok,
                 SUM(n_tok) OVER (ORDER BY h, ck
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d)
        SELECT CAST((cum - n_tok) // $PackSize AS BIGINT) AS pack_id,
               count(*) AS n_chunks,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS pack_tokens
        FROM c GROUP BY 1 ORDER BY pack_id"""))
  }

  // -------------------------------------------------------- q77_split_leakage
  /** Dup-cluster-aware train/val/test split: assigning splits by
    * per-DOCUMENT hash leaks — two copies of the same text can land in
    * train and test, and the eval is contaminated by construction. The
    * leakage-safe rule: group exact duplicates (text hash), elect the
    * canonical min doc_id, and hash the CANONICAL id for the whole
    * group's 80/10/10 assignment, so a duplicate set moves as one unit.
    * Output: per-split doc/group/token mass plus `spanning_groups` —
    * the number of dup groups split across assignments, 0 by
    * construction and COMPUTED from the data in both engines, so the
    * no-leakage invariant itself is oracle-checked. One hash-groupBy
    * on the text hash (the q9 exact-dedup shuffle) + a tiny split agg;
    * generalizing canon to a near-dup component id (q36) makes the
    * same rule near-dup-safe.
    */
  val q77SplitLeakage = {
    val Seed = 19
    QueryDef(
      "q77_split_leakage",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Sampling
        val docs = t(s, dir, "documents")
          .select($"doc_id", size(words($"text")).cast("long").as("n_tok"),
            hash64($"text", 5).as("th"))
        val assigned = Sampling.splitByGroupHash(docs, $"th", $"doc_id",
          Seq("train" -> 80, "val" -> 90, "test" -> 100), seed = Seed)
        val spanning = assigned.groupBy($"th")
          .agg(countDistinct($"split").as("_ns"))
          .agg(count(when($"_ns" > 1, 1)).as("spanning_groups"))
        assigned.groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"th").as("n_groups"),
            sum($"n_tok").as("n_tokens"))
          .crossJoin(broadcast(spanning))
          .orderBy($"split")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
                 CAST(('0x' || substr(md5('5:' || text), 1, 15)) AS BIGINT) AS th
          FROM documents),
        canon AS (SELECT th, min(doc_id) AS canon_id FROM d GROUP BY th),
        a AS (
          SELECT d.doc_id, d.n_tok, d.th,
                 CASE
                   WHEN CAST(('0x' || substr(md5('$Seed:' || CAST(canon_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
                   WHEN CAST(('0x' || substr(md5('$Seed:' || CAST(canon_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split
          FROM d JOIN canon USING (th)),
        sp AS (
          SELECT CAST(count(*) FILTER (ns > 1) AS BIGINT) AS spanning_groups
          FROM (SELECT th, count(DISTINCT split) AS ns FROM a GROUP BY th))
        SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT th) AS BIGINT) AS n_groups,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               (SELECT spanning_groups FROM sp) AS spanning_groups
        FROM a GROUP BY split ORDER BY split"""))
  }

  // ------------------------------------------------------ q78_neardup_split
  /** Near-dup-cluster-aware split — q77 generalized from exact copies
    * to NEAR duplicates: the q36 minhash-LSH components
    * ([[graft.operators.Dedup.nearDupComponents]]) become the split
    * groups (singletons group as themselves), so two documents that
    * merely PARAPHRASE each other cannot straddle train and test
    * either. The `spanning_groups` invariant is again computed from
    * the data and oracle-checked. Cost over q77: the banded-LSH
    * candidate join + O(log n) component rounds — never all-pairs
    * (PlanAuditSpec pins the q36 chain's shape).
    */
  val q78NearDupSplit = {
    val Seed = 19
    QueryDef(
      "q78_neardup_split",
      (s, dir) => {
        import s.implicits._
        import graft.operators.{Dedup, Sampling}
        val docs = t(s, dir, "documents")
          .select($"doc_id", size(words($"text")).cast("long").as("n_tok"))
        val comp = Dedup.nearDupComponents(t(s, dir, "documents"),
          "doc_id", "text", seeds = 8, bands = 4, rowsPerBand = 2,
          minJaccard = 0.4)
        val grouped = docs
          .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("grp", coalesce($"component", $"doc_id"))
        val assigned = Sampling.splitByGroupHash(grouped, $"grp", $"doc_id",
          Seq("train" -> 80, "val" -> 90, "test" -> 100), seed = Seed)
        val spanning = assigned.groupBy($"grp")
          .agg(countDistinct($"split").as("_ns"))
          .agg(count(when($"_ns" > 1, 1)).as("spanning_groups"))
        assigned.groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"grp").as("n_groups"),
            sum($"n_tok").as("n_tokens"))
          .crossJoin(broadcast(spanning))
          .orderBy($"split")
      },
      Some(s"""
        WITH RECURSIVE ${MinhashCcSql.ctes},
        d AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        g AS (
          SELECT d.doc_id, d.n_tok, coalesce(c.component, d.doc_id) AS grp
          FROM d LEFT JOIN comp c ON c.id = d.doc_id),
        canon AS (SELECT grp, min(doc_id) AS canon_id FROM g GROUP BY grp),
        a AS (
          SELECT g.doc_id, g.n_tok, g.grp,
                 CASE
                   WHEN CAST(('0x' || substr(md5('$Seed:' || CAST(canon_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
                   WHEN CAST(('0x' || substr(md5('$Seed:' || CAST(canon_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split
          FROM g JOIN canon USING (grp)),
        sp AS (
          SELECT CAST(count(*) FILTER (ns > 1) AS BIGINT) AS spanning_groups
          FROM (SELECT grp, count(DISTINCT split) AS ns FROM a GROUP BY grp))
        SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               (SELECT spanning_groups FROM sp) AS spanning_groups
        FROM a GROUP BY split ORDER BY split"""))
  }

  // ------------------------------------------------------- q79_dataset_card
  /** Dataset card: the per-source corpus summary every released
    * training set ships — document and duplicate counts, whitespace
    * AND subword token mass (the number that actually prices a
    * training run, via the q42/q55 tokenizer), average document
    * length, short-document fraction, and the modal language. One
    * narrow scoring pass + the q9 exact-dup hash agg + two tiny
    * (source[, lang]) aggregations; every metric is exact arithmetic
    * (integer sums, round-at-the-end), so the card is reproducible
    * and oracle-checked like any query.
    */
  val q79DatasetCard = {
    val ShortTok = graft.operators.TextAnalysis.ShortDocTokens
    QueryDef(
      "q79_dataset_card",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"source", $"lang",
            size(words($"text")).cast("long").as("n_tok"),
            bpe_token_count($"text").cast("long").as("n_sub"),
            hash64($"text", 5).as("th"))
        val dupCnt = docs.groupBy($"th").agg(count(lit(1)).as("_thn"))
        val base = docs.join(dupCnt, Seq("th"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            count(when($"_thn" >= 2, 1)).as("n_docs_dup"),
            sum($"n_tok").as("n_tokens_ws"),
            sum($"n_sub").as("n_tokens_subword"),
            round(sum($"n_tok").cast("double") / count(lit(1)), 2)
              .as("avg_doc_tokens"),
            round(count(when($"n_tok" < ShortTok, 1)).cast("double")
              / count(lit(1)), 4).as("pct_short"))
        val wl = org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"_ln".desc, $"lang")
        val top = docs.groupBy($"source", $"lang")
          .agg(count(lit(1)).as("_ln"))
          .withColumn("_rn", row_number().over(wl))
          .filter($"_rn" === 1)
          .select($"source", $"lang".as("top_lang"))
        base.join(top, Seq("source")).orderBy($"source")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, lang,
                 len(string_split(text, ' ')) AS n_tok,
                 ${graft.functions.BpeTokenCount.duckdbSql("text")} AS n_sub,
                 CAST(('0x' || substr(md5('5:' || text), 1, 15)) AS BIGINT) AS th
          FROM documents),
        dup AS (SELECT th, count(*) AS thn FROM d GROUP BY th),
        base AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(*) FILTER (thn >= 2) AS BIGINT) AS n_docs_dup,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens_ws,
                 CAST(sum(n_sub) AS BIGINT) AS n_tokens_subword,
                 round(CAST(sum(n_tok) AS DOUBLE) / count(*), 2) AS avg_doc_tokens,
                 round(CAST(count(*) FILTER (n_tok < $ShortTok) AS DOUBLE)
                       / count(*), 4) AS pct_short
          FROM d JOIN dup USING (th) GROUP BY source),
        tl AS (
          SELECT source, lang AS top_lang,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY count(*) DESC, lang) AS rn
          FROM d GROUP BY source, lang)
        SELECT b.source, n_docs, n_docs_dup, n_tokens_ws, n_tokens_subword,
               avg_doc_tokens, pct_short, top_lang
        FROM base b JOIN tl ON tl.source = b.source AND tl.rn = 1
        ORDER BY b.source"""))
  }

  // ------------------------------------------------------ q80_containment
  /** Directional containment pairs
    * ([[graft.operators.Dedup.containmentPairs]]): the
    * doc-inside-doc case jaccard structurally misses — a short text
    * quoted whole inside a long one has tiny |∩|/|∪| (so q11's
    * minhash-LSH, whose recall tracks jaccard, skips it) but
    * containment |∩|/|A| = 1. Candidates come from df-capped shingle
    * POSTINGS (≥2 shared hashes, boilerplate hashes >50 docs dropped),
    * verified exactly on the full shingle sets; both directions
    * reported, pairs kept when the larger reaches 0.6.
    */
  val q80Containment = {
    val MinShared = 2L; val MaxDf = 50L; val Tau = "0.6"
    QueryDef(
      "q80_containment",
      (s, dir) => {
        import s.implicits._
        graft.operators.Dedup
          .containmentPairs(t(s, dir, "documents"), "doc_id", "text",
            minShared = MinShared, maxDf = MaxDf,
            minContainment = Tau.toDouble)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH ${MinhashCcSql.shingleCtes},
        sd AS (
          SELECT doc_id, list_distinct(sh) AS sh FROM shx WHERE len(sh) > 0),
        post AS (SELECT doc_id, unnest(sh) AS h FROM sd),
        kept AS (SELECT h FROM post GROUP BY h HAVING count(*) <= $MaxDf),
        kp AS (SELECT post.doc_id, post.h FROM post JOIN kept USING (h)),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM kp a JOIN kp b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= $MinShared),
        v AS (
          SELECT id_a, id_b,
                 round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                       / len(sa.sh), 6) AS cont_a,
                 round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                       / len(sb.sh), 6) AS cont_b
          FROM cand
          JOIN sd sa ON sa.doc_id = id_a
          JOIN sd sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, cont_a, cont_b FROM v
        WHERE greatest(cont_a, cont_b) >= $Tau ORDER BY id_a, id_b"""))
  }

  // --------------------------------------------------- q81_cluster_keep_best
  /** Cluster-curation cut — dedup that keeps the BEST member, not the
    * first: for every q36 near-dup component, keep the longest member
    * (ties → smallest doc_id; "keep the longest version" is the
    * standard web-dedup heuristic — truncated mirrors lose to the
    * full text) and report what the cut saves. Per-component argmax is
    * one rank window over members — never all-pairs (the components
    * already exist), and the output is one row per CLUSTER, the
    * curation ledger a pipeline audits.
    */
  val q81ClusterKeepBest = QueryDef(
    "q81_cluster_keep_best",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Dedup
      val docs = t(s, dir, "documents")
        .select($"doc_id", size(words($"text")).cast("long").as("n_tok"))
      val comp = Dedup.nearDupComponents(t(s, dir, "documents"),
        "doc_id", "text", seeds = 8, bands = 4, rowsPerBand = 2,
        minJaccard = 0.4)
      val members = docs
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"component").orderBy($"n_tok".desc, $"doc_id")
      members
        .withColumn("_rn", row_number().over(w))
        .groupBy($"component")
        .agg(count(lit(1)).as("n_members"),
          max(when($"_rn" === 1, $"doc_id")).as("kept_id"),
          max(when($"_rn" === 1, $"n_tok")).as("kept_tokens"),
          sum(when($"_rn" =!= 1, $"n_tok").otherwise(0L)).as("dropped_tokens"))
        .orderBy($"component")
    },
    Some(s"""
      WITH RECURSIVE ${MinhashCcSql.ctes},
      d AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      m AS (
        SELECT c.component, d.doc_id, d.n_tok,
               ROW_NUMBER() OVER (PARTITION BY c.component
                 ORDER BY d.n_tok DESC, d.doc_id) AS rn
        FROM comp c JOIN d ON d.doc_id = c.id)
      SELECT component, CAST(count(*) AS BIGINT) AS n_members,
             max(CASE WHEN rn = 1 THEN doc_id END) AS kept_id,
             max(CASE WHEN rn = 1 THEN n_tok END) AS kept_tokens,
             CAST(sum(CASE WHEN rn != 1 THEN n_tok ELSE 0 END) AS BIGINT)
               AS dropped_tokens
      FROM m GROUP BY component ORDER BY component"""))

  // -------------------------------------------------------- q82_cdc_dedup
  /** Content-defined chunk dedup ([[graft.operators.Dedup.cdcChunks]]):
    * chunk boundaries fall where the token HASH says (≡0 mod 16), not
    * at fixed offsets, so a partial edit shifts only the chunks it
    * touches — the storage-dedup CDC idea that makes chunk-hash dedup
    * robust where q72's fixed stride would misalign every window
    * (CdcChunksSpec pins the shift-invariance). This query reports the
    * duplicated chunk mass across the corpus: every chunk content
    * appearing in ≥2 places, with its occurrence count, spread over
    * distinct documents, token length, and first owner.
    */
  val q82CdcDedup = {
    val AvgLen = 16; val Seed = 23
    QueryDef(
      "q82_cdc_dedup",
      (s, dir) => {
        import s.implicits._
        graft.operators.Dedup
          .cdcChunks(t(s, dir, "documents"), "doc_id", "text",
            avgLen = AvgLen, seed = Seed)
          .groupBy($"chunk_hash")
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct($"doc_id").as("n_docs"),
            max($"n_tokens").as("n_tokens"),
            min($"doc_id").as("first_doc"))
          .filter($"n_occurrences" >= 2)
          .orderBy($"chunk_hash")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        tk AS (
          SELECT doc_id, i, w[i+1] AS word,
                 CASE WHEN CAST(('0x' || substr(md5('0:' || w[i+1]), 1, 15)) AS BIGINT)
                      % $AvgLen = 0 THEN 1 ELSE 0 END AS flag
          FROM toks, unnest(range(0, len(w))) t(i)),
        cid AS (
          SELECT doc_id, i, word,
                 coalesce(SUM(flag) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
          FROM tk),
        ch AS (
          SELECT doc_id, chunk_id,
                 CAST(count(*) AS BIGINT) AS n_tok,
                 string_agg(word, ' ' ORDER BY i) AS ctext
          FROM cid GROUP BY doc_id, chunk_id),
        h AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5('$Seed:' || ctext), 1, 15)) AS BIGINT) AS chunk_hash,
                 n_tok
          FROM ch)
        SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               max(n_tok) AS n_tokens, min(doc_id) AS first_doc
        FROM h GROUP BY chunk_hash HAVING count(*) >= 2
        ORDER BY chunk_hash"""))
  }

  // ----------------------------------------------------------- q83_cdc_cut
  /** CDC duplicate-chunk removal
    * ([[graft.operators.Dedup.cutDuplicateChunks]]): q82 DETECTS the
    * duplicated chunk mass, this ships the cut (the q58→q67 pattern) —
    * every chunk content keeps its first occurrence corpus-wide and
    * affected documents rebuild from their surviving chunks, with
    * before/after token counts. Content-defined boundaries mean the
    * same boilerplate block is cut wherever it sits in a document.
    */
  val q83CdcCut = {
    val AvgLen = 16; val Seed = 23
    QueryDef(
      "q83_cdc_cut",
      (s, dir) => {
        import s.implicits._
        graft.operators.Dedup
          .cutDuplicateChunks(t(s, dir, "documents"), "doc_id", "text",
            avgLen = AvgLen, seed = Seed)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        tk AS (
          SELECT doc_id, i, w[i+1] AS word,
                 CASE WHEN CAST(('0x' || substr(md5('0:' || w[i+1]), 1, 15)) AS BIGINT)
                      % $AvgLen = 0 THEN 1 ELSE 0 END AS flag
          FROM toks, unnest(range(0, len(w))) t(i)),
        cid AS (
          SELECT doc_id, i, word,
                 coalesce(SUM(flag) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
          FROM tk),
        ch AS (
          SELECT doc_id, chunk_id,
                 CAST(count(*) AS BIGINT) AS n_tok,
                 string_agg(word, ' ' ORDER BY i) AS ctext
          FROM cid GROUP BY doc_id, chunk_id),
        rk AS (
          SELECT doc_id, chunk_id, n_tok, ctext,
                 ROW_NUMBER() OVER (
                   PARTITION BY CAST(('0x' || substr(md5('$Seed:' || ctext), 1, 15)) AS BIGINT)
                   ORDER BY doc_id, chunk_id) AS rn
          FROM ch),
        agg AS (
          SELECT doc_id,
                 CAST(sum(n_tok) AS BIGINT) AS n_tok_before,
                 CAST(sum(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT)
                   AS n_tok_after,
                 coalesce(string_agg(CASE WHEN rn = 1 THEN ctext END, ' '
                   ORDER BY chunk_id), '') AS text_clean
          FROM rk GROUP BY doc_id)
        SELECT doc_id, n_tok_before, n_tok_after, text_clean FROM agg
        WHERE n_tok_after < n_tok_before ORDER BY doc_id"""))
  }

  // -------------------------------------------------------- q84_winnow_index
  /** Incremental winnow matching — q75's MOSS fingerprints in q54's
    * daily-ingest shape: the corpus half (every doc except the
    * `% 10 = 7` batch) is fingerprinted, df-capped and written ONCE as
    * the bucketed postings index
    * ([[graft.operators.Dedup.writeWinnowIndex]] — the on-disk
    * production form winnowPairs' cache-lifetime note documents); the
    * new batch probes INTO the bucketed scan
    * ([[graft.operators.Dedup.probeWinnowIndex]]) with no corpus-side
    * shuffle and no corpus-side recompute. Output: per batch doc with
    * ≥1 fingerprint, how many corpus docs share ≥2 fingerprints with
    * it (≈ a verbatim run of `w + k − 1 = 8` tokens, twice) and the
    * keep verdict. The df cap is corpus-side only — an index-build
    * property, deliberately NOT recomputed per batch (a batch must not
    * resurrect boilerplate the build excluded).
    */
  val q84WinnowIndex = {
    val K = 4; val W = 5; val Seed = 11
    val MinShared = 2L; val MaxDf = 50L
    QueryDef(
      "q84_winnow_index",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Dedup
        val docs = t(s, dir, "documents")
        // one-time index build over the corpus half (at 100 TB: a
        // nightly job, not part of the probe path)
        Dedup.writeWinnowIndex(docs.filter($"doc_id" % 10 =!= 7),
          "doc_id", "text", k = K, w = W, seed = Seed, maxDf = MaxDf,
          prefix = "graft_q84_corpus", buckets = 8)
        // batch half: fingerprint once, keep the per-doc sets for the
        // probe universe (docs with no complete window emit no rows)
        val batch = docs.filter($"doc_id" % 10 === 7)
          .select($"doc_id",
            Dedup.winnowFingerprints(words($"text"), K, W, Seed).as("fps"))
          .filter(size($"fps") > 0)
          .persist()
        val matches = Dedup.probeWinnowIndex(s, "graft_q84_corpus",
            batch.select($"doc_id", explode($"fps").as("fp")),
            "doc_id", minShared = MinShared)
          .groupBy($"id_new").agg(count(lit(1)).as("n_partners"))
        batch.select($"doc_id")
          .join(matches, $"doc_id" === $"id_new", "left")
          .select($"doc_id",
            coalesce($"n_partners", lit(0L)).as("n_partners"),
            (coalesce($"n_partners", lit(0L)) === 0).as("kept"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        gh AS (
          SELECT doc_id,
                 list_transform(
                   list_transform(range(0, len(w) - ${K - 1}), i ->
                     array_to_string(list_slice(w, i + 1, i + $K), ' ')),
                   x -> CAST(('0x' || substr(md5('$Seed:' || x), 1, 15)) AS BIGINT)) AS g
          FROM toks WHERE len(w) >= $K),
        fp AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(0, len(g) - ${W - 1}), i ->
                   list_min(list_slice(g, i + 1, i + $W)))) AS fps
          FROM gh WHERE len(g) >= $W),
        ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        cex AS (SELECT doc_id, fp FROM ex WHERE doc_id % 10 != 7),
        bex AS (SELECT doc_id, fp FROM ex WHERE doc_id % 10 = 7),
        kept AS (
          SELECT fp FROM cex GROUP BY fp HAVING count(*) <= $MaxDf),
        ke AS (SELECT cex.doc_id, cex.fp FROM cex JOIN kept USING (fp)),
        m AS (
          SELECT b.doc_id AS id_new, ke.doc_id AS id_old
          FROM bex b JOIN ke ON b.fp = ke.fp
          GROUP BY 1, 2 HAVING count(*) >= $MinShared),
        agg AS (
          SELECT id_new, count(*) AS n_partners FROM m GROUP BY 1)
        SELECT f.doc_id,
               CAST(coalesce(n_partners, 0) AS BIGINT) AS n_partners,
               coalesce(n_partners, 0) = 0 AS kept
        FROM fp f LEFT JOIN agg ON agg.id_new = f.doc_id
        WHERE f.doc_id % 10 = 7
        ORDER BY f.doc_id"""))
  }

  // ---------------------------------------------------- q85_token_compression
  /** Tokenizer compression ratio — chars per SUBWORD token
    * ([[graft.operators.TextAnalysis.subwordCount]], the same shipped
    * merge table q42's budget and q55's packing count with) per
    * (lang, source) slice, plus how many documents fall under 3.0
    * chars/token. The classic tokenizer-fit curation signal: natural
    * text compresses to several chars per token, while gibberish,
    * wrong-script, or tokenizer-hostile text fragments toward 1 — a
    * slice whose ratio sags (or whose fragmented count spikes) is
    * either junk or a language the tokenizer under-serves. The slice
    * ratio is a RATIO OF INTEGER SUMS (sum_chars / sum_tokens), exact
    * and order-free cross-engine; only the per-doc flag divides
    * per-row (one double op, deterministic both sides). Map-only scan
    * + one tiny-key agg: partial-combined, no corpus shuffle beyond
    * the (lang, source) hash.
    */
  val q85TokenCompression = QueryDef(
    "q85_token_compression",
    (s, dir) => {
      import s.implicits._
      import graft.operators.TextAnalysis
      t(s, dir, "documents")
        .select($"lang", $"source",
          length($"text").cast("long").as("n_chars"),
          TextAnalysis.subwordCount($"text").cast("long").as("n_tok"))
        .groupBy($"lang", $"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          sum($"n_tok").as("sum_tokens"),
          round(sum($"n_chars").cast("double") / sum($"n_tok"), 6)
            .as("chars_per_token"),
          sum(when($"n_chars".cast("double") / $"n_tok" < 3.0, 1L)
            .otherwise(0L)).as("n_fragmented"))
        .orderBy($"lang", $"source")
    },
    Some(s"""
      WITH d AS (
        SELECT lang, source,
               CAST(length(text) AS BIGINT) AS n_chars,
               ${graft.functions.BpeTokenCount.duckdbSql("text")} AS n_tok
        FROM documents)
      SELECT lang, source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
             round(CAST(sum(n_chars) AS DOUBLE) / sum(n_tok), 6)
               AS chars_per_token,
             CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) / n_tok < 3.0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_fragmented
      FROM d GROUP BY lang, source ORDER BY lang, source"""))

  // ------------------------------------------------------- q86_semdedup_hier
  /** Hierarchical SemDeDup ([[graft.operators.Similarity.semDedupHier]])
    * — q73's semantics with the residual quadratic removed, the 100 TB
    * instantiation: the round-11 100× soak measured q73's flat derived-k
    * assignment at 212× for 100× data (n·(n/64) brute-force argmin —
    * BASELINE.md), so here a coarse ⌈√(n/64)⌉-cell codebook partitions
    * the corpus first and every coarse cell trains its OWN
    * ⌈|cell|/64⌉-centroid fine codebook
    * ([[graft.operators.Similarity.kmeansGrouped]] — one batched frame,
    * the pqTrain trick on data-dependent groups). Both assignment
    * levels are n·√(n/64); expected fine-cell occupancy stays ~64 at
    * any n, so the within-cell pair pass stays corpus-linear. Same
    * keep-smallest-id / transitive-chain contract as q73. The oracle
    * replays BOTH training levels — the integer-exact coarse-count
    * scan, the coarse Lloyd rounds, the per-group fine init by hash
    * rank, the grouped Lloyd rounds, and both argmax assignments.
    */
  val q86SemDedupHier = {
    import KmeansSql.{trainAssignCtesHier, sqlCos}
    val Tau = "0.35"
    val TargetCell = 64L
    QueryDef(
      "q86_semdedup_hier",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
        val ePinned =
          if (e.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
            e.persist() else e
        Similarity.semDedupHier(ePinned, "embedding", "vec_id",
            targetCell = TargetCell, tau = Tau.toDouble)
          .select($"coarse", $"cell", $"vec_id", $"dup_of", $"cos")
          .orderBy($"coarse", $"cell", $"vec_id")
      },
      Some(s"""
        WITH ${trainAssignCtesHier(TargetCell)},
        p AS (
          SELECT a.gid AS coarse, a.cid AS cell,
                 a.vec_id AS id_a, b.vec_id AS id_b,
                 ${sqlCos("ea.embedding", "eb.embedding")} AS cos
          FROM hfin a JOIN hfin b
            ON a.gid = b.gid AND a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id),
        d AS (
          SELECT coarse, cell, id_b AS vec_id, id_a AS dup_of, cos,
                 ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
          FROM p WHERE cos >= $Tau)
        SELECT coarse, cell, vec_id, dup_of, cos FROM d
        WHERE rn = 1 ORDER BY coarse, cell, vec_id"""))
  }

  // -------------------------------------------------------- q87_quality_probe
  /** Trained linear quality probe
    * ([[graft.operators.QualityProbe]]): fit a least-squares scorer by
    * 3 fixed-step GD rounds on weakly-labeled seeds (src0 documents
    * → 1.0, src1 → 0.0 — the trusted/untrusted-source workflow), then
    * score EVERY document with the frozen weights in one narrow map
    * pass and threshold at 0.5. Features are the q13 heuristic columns
    * scaled to ~[0,1]: bias, capped length score, punctuation ratio,
    * stopword ratio, scaled mean token length. The oracle replays all
    * three GD rounds — sequential-dot predictions, exact decimal
    * gradient sums rounded to 9, fixed-step updates rounded to 9 —
    * then the scoring pass.
    */
  val q87QualityProbe = {
    import ProbeSql.{Iters, scoreSql}
    QueryDef(
      "q87_quality_probe",
      (s, dir) => {
        import s.implicits._
        probeScored(s, dir)
          .withColumn("keep", $"score" >= 0.5)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH ${ProbeSql.ctes}
        SELECT doc_id,
               $scoreSql AS score,
               $scoreSql >= 0.5 AS keep
        FROM f, w$Iters ORDER BY doc_id"""))
  }

  /** The q87 probe, trained and applied — `(doc_id, score)` for every
    * document, shared with the q92 margin-selection view of the same
    * model (train once per QueryDef invocation; the SQL side shares
    * [[ProbeSql]] the same way).
    */
  private[graft] def probeScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{QualityProbe, TextAnalysis}
    import ProbeSql.{Dims, Iters, Lr}
    val x = array(
      lit(1.0),
      least(TextAnalysis.tokenCount($"text").cast("double") / 100.0,
        lit(1.0)),
      TextAnalysis.punctRatio($"text"),
      TextAnalysis.stopwordRatio($"text", Queries2.Vocab.stopwords),
      TextAnalysis.avgTokenLen($"text") / 10.0)
    val docs = t(s, dir, "documents")
      .select($"doc_id", $"source", x.as("x"))
    val seed = docs.filter($"source".isin("src0", "src1"))
      .select($"x", when($"source" === "src0", 1.0).otherwise(0.0).as("y"))
    val w = QualityProbe.trainLinear(seed, "x", "y",
      dims = Dims, iters = Iters, lr = Lr.toDouble)
    docs.select($"doc_id", QualityProbe.scoreCol($"x", w.toSeq).as("score"))
  }

  /** The q87 oracle chain, shared with q92: feature CTEs (`base`/`f`),
    * the weak-label training set (`ft`), and the `Iters` GD rounds
    * ending in weights CTE `w`[[Iters]]. Consumers select against
    * `f, w`[[Iters]] with [[scoreSql]] as the frozen-weight score.
    */
  private[graft] object ProbeSql {
    import KmeansSql.sqlDotD
    val Dims = 5; val Iters = 3; val Lr = "0.5"
    private val sqlPunct =
      graft.operators.TextAnalysis.PunctClass.replace("'", "''")
    private val sqlStop =
      Queries2.Vocab.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    private def iterCtes(i: Int): String = s"""
        e$i AS (
          SELECT x, y, ${sqlDotD("x", "w", Dims)} - y AS err
          FROM ft, w${i - 1}),
        g$i AS (
          SELECT d,
                 round(CAST(SUM(CAST(x[d] * err AS DECIMAL(27,12))) AS DOUBLE)
                       / (SELECT count(*) FROM ft), 9) AS g
          FROM e$i, unnest(range(1, ${Dims + 1})) AS t$i(d) GROUP BY d),
        w$i AS (
          SELECT list(round(wv - $Lr * g, 9) ORDER BY d) AS w
          FROM (SELECT d, g, w[d] AS wv FROM g$i, w${i - 1}))"""
    def scoreSql: String = s"round(${sqlDotD("x", "w", Dims)}, 6)"
    def ctes: String = s"""base AS (
          SELECT doc_id, source, text,
                 string_split(text, ' ') AS tw,
                 string_split(lower(text), ' ') AS lw
          FROM documents),
        f AS (
          SELECT doc_id, source,
                 [1.0,
                  least(CAST(len(tw) AS DOUBLE) / 100.0, 1.0),
                  round(CAST(length(text) - length(regexp_replace(text, '$sqlPunct', '', 'g')) AS DOUBLE) / length(text), 6),
                  round(CAST(len(list_filter(lw, t -> list_contains($sqlStop, t))) AS DOUBLE) / len(lw), 6),
                  round(CAST(list_sum(list_transform(tw, t -> length(t))) AS DOUBLE) / len(tw), 6) / 10.0] AS x
          FROM base),
        ft AS (
          SELECT x, CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
          FROM f WHERE source IN ('src0', 'src1')),
        w0 AS (SELECT ${Seq.fill(Dims)("0.0").mkString("[", ", ", "]")} AS w),
        ${(1 to Iters).map(iterCtes).mkString(",")}"""
  }

  def all: Seq[QueryDef] = Seq(
    q72ContextChunks, q73SemDedup, q74EpochMix, q75WinnowMatch,
    q76ChunkPack, q77SplitLeakage, q78NearDupSplit, q79DatasetCard,
    q80Containment, q81ClusterKeepBest, q82CdcDedup, q83CdcCut,
    q84WinnowIndex, q85TokenCompression, q86SemDedupHier, q87QualityProbe)
}
