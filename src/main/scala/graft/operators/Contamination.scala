package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Benchmark-decontamination for training corpora — the full leakage
  * ladder, each rung a detect ([[scores]]/[[fuzzyScores]]/
  * [[semanticScores]]) and a cut ([[cut]]/[[fuzzyCut]]/[[semanticCut]]):
  *
  *  1. VERBATIM — exact shingle overlap (q47 detects, q64 cuts): the
  *     test set's shingle pool broadcasts, the corpus is probed
  *     map-side;
  *  2. LIGHTLY EDITED — MinHash-LSH near-dup across the two relations
  *     (q163): banded-signature agreement generates candidates, exact
  *     Jaccard verifies them;
  *  3. FULLY REPHRASED — embedding-cosine hyperplane-bucket near-dup
  *     across the two relations (q164): no shingle survives a rewrite,
  *     the embedding neighborhood does.
  *  4. EMBEDDED (span) — the test item quoted verbatim INSIDE a longer
  *     host document (q166): rung 1's corpus-side fraction dilutes to
  *     t/|host|, so [[spanScores]] measures test-side coverage instead,
  *     which is host-length-invariant.
  *
  * (Reference N/A — north-star LLM-pipeline depth.)
  *
  * Scale shape, every rung: the test set is small by construction
  * (benchmarks are), so its probe structures broadcast; the corpus is
  * touched only in narrow map passes, and each cut is a broadcast ANTI
  * join against the (tiny) matched-id list — the 100 TB side never
  * shuffles anywhere in this object.
  *
  * THE TEST SIDE MUST BE BOUNDED BY THE CALLER: every probe structure
  * here (shingle pool, band table, exploded bucket table) grows with
  * the test relation and broadcasts unconditionally — that is the
  * whole design (it is what keeps the corpus shuffle-free), and it is
  * only sound because benchmarks are orders of magnitude smaller than
  * training corpora. A caller that passes a corpus-proportional slice
  * as `testSet` would broadcast a corpus-sized structure; the
  * [[boundTestSide]] guard fails fast at [[DefaultMaxTestRows]] rows
  * (session-overridable via `graft.contamination.maxTestRows`) instead
  * of letting that OOM an executor at scale. The check is a
  * `limit(max+1).count()` — O(max) at any corpus size, never a full
  * scan of an oversized side.
  */
object Contamination {

  /** Test relations above this many rows are refused by the probe
    * builders. 100k rows is an order of magnitude above the large
    * public eval suites and keeps every broadcast structure (≈50–100
    * shingles or one 64-dim vector per row) in the tens of MB;
    * genuinely larger test sets should be split and the cuts composed,
    * or the within-corpus dedup operators used instead.
    */
  val DefaultMaxTestRows = 100000L

  private def maxTestRows(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.contamination.maxTestRows")
      .map(_.toLong).getOrElse(DefaultMaxTestRows)

  /** Fail fast when `testSet` is not benchmark-sized (see the object
    * scaladoc); returns `testSet` unchanged when it is.
    */
  private def boundTestSide(testSet: DataFrame, rung: String): DataFrame = {
    val max = maxTestRows(testSet)
    val capped = math.min(max, Int.MaxValue - 1L).toInt
    require(testSet.limit(capped + 1).count() <= capped,
      s"$rung: testSet exceeds $max rows — its probe structures " +
        "broadcast, so the test side must be benchmark-sized; split the " +
        "test relation and compose the cuts, or raise " +
        "graft.contamination.maxTestRows if the broadcast budget allows")
    testSet
  }

  /** Distinct 3-gram shingle hashes of `textCol` (the q47 portable
    * formula — md5 word hashes folded mod-2³⁰/mod-p, replayable in
    * DuckDB).
    */
  def shingleSet(textCol: Column): Column =
    array_distinct(Dedup.shingleHashes3(Dedup.wordHashes(words(textCol))))

  /** Per-document contamination scores of `corpus` against `testSet`
    * (both carrying `idCol` + `textCol`): returns
    * `(idCol, n_shared, n_shingles, overlap_frac)` for documents
    * sharing at least one shingle — identical output contract to q47,
    * reusable against any test-set relation.
    */
  def scores(corpus: DataFrame, testSet: DataFrame, idCol: String,
             textCol: String): DataFrame = {
    val id = col(idCol)
    boundTestSide(testSet, "scores")
    val testShingles = testSet
      .select(explode(shingleSet(col(textCol))).as("h")).distinct()
    corpus
      .select(id, shingleSet(col(textCol)).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(id, size(col("_sh")).cast("long").as("n_shingles"),
        explode(col("_sh")).as("h"))
      .join(broadcast(testShingles), "h")
      .groupBy(id, col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(id, col("n_shared"), col("n_shingles"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("overlap_frac"))
  }

  /** Remove from `corpus` every document whose shingle overlap with
    * `testSet` reaches `minOverlapFrac` — the decontamination cut.
    * Documents too short to shingle (< 3 tokens) cannot overlap and
    * are kept. Returns the surviving rows of `corpus` unchanged in
    * schema; the contaminated-id list is tiny (actual contamination,
    * not corpus size), so the anti join broadcasts.
    */
  def cut(corpus: DataFrame, testSet: DataFrame, idCol: String,
          textCol: String, minOverlapFrac: Double): DataFrame = {
    require(minOverlapFrac > 0.0 && minOverlapFrac <= 1.0,
      "minOverlapFrac must be in (0, 1]")
    val bad = scores(corpus, testSet, idCol, textCol)
      .filter(col("overlap_frac") >= minOverlapFrac)
      .select(col(idCol))
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** FUZZY contamination: near-duplicate matches between `corpus` and
    * `testSet` — the case [[scores]]' exact-shingle overlap undercounts.
    * A test document that reached the corpus lightly edited (re-crawled
    * with different boilerplate, re-punctuated, template-paraphrased)
    * shares a high Jaccard of shingles but a LOW per-doc overlap_frac
    * against the whole test set's shingle pool once the corpus copy has
    * drifted; what decontamination actually needs there is the
    * MinHash-LSH near-dup test applied ACROSS the two relations. This is
    * [[Dedup.lshCrossPairs]]'s shape pointed at a benchmark: candidates
    * come from banded-signature agreement, verification is exact Jaccard
    * on the candidates only.
    *
    * Returns `(idCol, test_id, jaccard)` — one row per verified
    * (corpus doc, test doc) pair with Jaccard ≥ `minJaccard`. Pairs,
    * not a per-doc best: a doc near-dup to several test items is
    * evidence per item (and the cut dedups ids anyway).
    *
    * Scale shape: the test set is small by construction, so BOTH probe
    * structures broadcast — its band table into the candidate join and
    * its shingle table into the verify join. The corpus is touched in
    * exactly two narrow map passes (shingle+sign, then verify on
    * candidates); it never shuffles, and nothing is ever corpus ×
    * corpus. Same (seeds, bands, rowsPerBand) = (8, 4, 2) defaults as
    * q11's within-corpus form; both engines replay the identical
    * hash/signature arithmetic, so the pair list is deterministic.
    */
  def fuzzyScores(corpus: DataFrame, testSet: DataFrame, idCol: String,
                  textCol: String, minJaccard: Double, seeds: Int = 8,
                  bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "minJaccard must be in (0, 1]")
    require(seeds >= bands * rowsPerBand,
      "signature must cover bands * rowsPerBand entries")
    boundTestSide(testSet, "fuzzyScores")
    val id = col(idCol)
    def shingled(df: DataFrame, as: String): DataFrame = df
      .select(col(idCol).as(as),
        Dedup.shingleHashes3(Dedup.wordHashes(words(col(textCol)))).as(s"_sh_$as"))
      .filter(size(col(s"_sh_$as")) > 0)
    val cSh = shingled(corpus, idCol)
    val tSh = shingled(testSet, "test_id")
    def banded(sh: DataFrame, as: String): DataFrame = Dedup.lshBands(
      sh.select(col(as), Dedup.minhashSig(col(s"_sh_$as"), seeds).as("sig")),
      as, "sig", bands, rowsPerBand)
    val cand = banded(cSh, idCol).select(col("band_key"), id)
      .join(broadcast(banded(tSh, "test_id")
        .select(col("band_key"), col("test_id"))), Seq("band_key"))
      .select(id, col("test_id")).distinct()
    // verify pass: the candidate list is contamination-sized, so it
    // broadcasts back onto the corpus — the corpus-side attach is
    // map-side too, never a corpus shuffle on the id
    cSh
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(tSh), Seq("test_id"))
      .select(id, col("test_id"),
        round(Dedup.jaccard(col(s"_sh_$idCol"), col("_sh_test_id")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Remove from `corpus` every document with a [[fuzzyScores]] match —
    * the fuzzy decontamination cut. Composes with [[cut]]: run the exact
    * cut for verbatim leakage, this one for near-duplicate leakage. The
    * matched-id list is tiny (actual contamination), so the anti join
    * broadcasts and the corpus still never shuffles.
    */
  def fuzzyCut(corpus: DataFrame, testSet: DataFrame, idCol: String,
               textCol: String, minJaccard: Double): DataFrame = {
    val bad = fuzzyScores(corpus, testSet, idCol, textCol, minJaccard)
      .select(col(idCol)).distinct()
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** SEMANTIC contamination — the third rung of the leakage ladder
    * (verbatim → [[scores]]; lightly edited → [[fuzzyScores]]; fully
    * rephrased → here). A test item rewritten heavily enough breaks
    * every shingle, but its embedding still sits next to the leaked
    * copy's: this is the embedding-cosine near-dup test
    * ([[Similarity.embeddingNearDupPairs]]'s hyperplane-bucket family)
    * run ACROSS the corpus/test relations over a `vecCol`
    * (`Array` of floats/doubles) both sides carry.
    *
    * Returns `(idCol, test_id, cos)` — one row per same-bucket pair
    * with cosine ≥ `minCos`.
    *
    * Scale shape: ONE broadcast hash join and nothing else — each side
    * computes its bucket in a narrow map pass, the benchmark-sized test
    * side broadcasts, and the cosine verify runs inside the join
    * projection. The corpus never shuffles at all. `planes` must grow
    * with the corpus ([[Similarity.autoPlanes]]) to keep buckets
    * bounded; bucket agreement is the recall dial — `nprobe` > 1 makes
    * the TEST side also search the buckets reached by flipping its
    * nprobe−1 least-confident plane bits
    * ([[Similarity.explodeProbeBuckets]], the multi-probe kNN's
    * machinery): a rephrased leak whose vector drifted across one
    * hyperplane is recovered at test-side-fan-out cost only (the
    * corpus keeps one bucket per vector, so a pair can still match in
    * at most one probed bucket and the output carries no duplicates —
    * at nprobe = planes+1 every Hamming-1 bucket neighbor is reached).
    */
  def semanticScores(corpus: DataFrame, testSet: DataFrame, idCol: String,
                     vecCol: String, dims: Int, planes: Int,
                     minCos: Double, nprobe: Int = 1): DataFrame = {
    // cosine ranges over [-1, 1]; only positive thresholds are
    // meaningful for decontamination (a leak's embedding sits NEAR its
    // source), but the full range is accepted — minCos = -1 turns the
    // verify filter off, which is exactly how a recall harness counts
    // the raw bucket-agreement candidates (the cost side of the dial)
    require(minCos >= -1.0 && minCos <= 1.0, "minCos must be in [-1, 1]")
    boundTestSide(testSet, "semanticScores")
    val id = col(idCol)
    val c = corpus.select(id, col(vecCol).as("_v"),
      Similarity.hyperplaneBucket(col(vecCol), dims, planes).as("_bkt"))
    val probe = Similarity.explodeProbeBuckets(
      testSet.select(col(idCol).as("test_id"), col(vecCol).as("_tv")),
      "_tv", dims, planes, nprobe, "_bkt")
    c.join(broadcast(probe), Seq("_bkt"))
      .select(id, col("test_id"),
        round(dot(col("_v"), col("_tv")) /
          (l2norm(col("_v")) * l2norm(col("_tv"))), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Remove from `corpus` every row with a [[semanticScores]] match —
    * the semantic decontamination cut. Same broadcast-anti-join shape
    * as [[cut]]/[[fuzzyCut]]; the three compose into the full
    * decontamination pass (verbatim + near-dup + rephrased).
    */
  def semanticCut(corpus: DataFrame, testSet: DataFrame, idCol: String,
                  vecCol: String, dims: Int, planes: Int,
                  minCos: Double, nprobe: Int = 1): DataFrame = {
    val bad = semanticScores(corpus, testSet, idCol, vecCol, dims, planes,
      minCos, nprobe).select(col(idCol)).distinct()
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** MULTI-TABLE semantic contamination — the at-scale form of
    * [[semanticScores]], fixing the recall erosion its own harness
    * measured (q165 round-15: single-code recall on rephrased plants
    * falls from 0.77 at sf0.1 to 0.36 at 100× even with complete
    * Hamming-1 probing). Root cause is structural: a single code's
    * plane count must GROW with the corpus ([[Similarity.autoPlanes]])
    * to keep buckets bounded, so a FIXED rephrase perturbation crosses
    * ever more planes as n grows. Here the rung-2 banding discipline is
    * applied to bit codes instead ([[Similarity.multiTableBuckets]]):
    * `tables` independent codes of `planesPerTable` bits each, a pair
    * is a candidate on agreement in ANY table, and recall
    * 1−(1−p^planesPerTable)^tables is INDEPENDENT of corpus size —
    * raised by adding tables, never eroded by corpus growth.
    *
    * Returns `(idCol, test_id, n_tables, cos)` — one row per candidate
    * pair with cosine ≥ `minCos`; `n_tables` is the number of agreeing
    * tables (Σ n_tables over the relation is the raw candidate cost a
    * recall harness charges the dial with, which is why the duplicate
    * agreements are counted rather than silently dropped).
    *
    * Scale shape: the corpus side is ONE narrow map pass fanned out to
    * `tables` (table, bucket) rows per vector — never a corpus shuffle;
    * the benchmark-sized probe side broadcasts with its fan-out baked
    * in; the only exchange is the match-sized pair-dedup aggregate.
    * The cost dial: expected verify work per corpus row ≈
    * tables · |testSet| / 2^planesPerTable at uniform occupancy — a
    * CONSTANT per row at any corpus size, which is exactly what the
    * single-code form cannot offer once autoPlanes ties its geometry
    * to n. nprobe composes (Hamming fan-out within each table) but is
    * rarely needed — add a table instead.
    */
  def semanticScoresMulti(corpus: DataFrame, testSet: DataFrame,
                          idCol: String, vecCol: String, dims: Int,
                          planesPerTable: Int, tables: Int, minCos: Double,
                          nprobe: Int = 1): DataFrame = {
    require(minCos >= -1.0 && minCos <= 1.0, "minCos must be in [-1, 1]")
    boundTestSide(testSet, "semanticScoresMulti")
    val id = col(idCol)
    val c = Similarity.multiTableBuckets(
      corpus.select(id, col(vecCol).as("_v")), "_v", dims, planesPerTable,
      tables, "_tbl", "_bkt")
    val probe = Similarity.explodeMultiTableProbes(
      testSet.select(col(idCol).as("test_id"), col(vecCol).as("_tv")),
      "_tv", dims, planesPerTable, tables, nprobe, "_tbl", "_bkt")
    c.join(broadcast(probe), Seq("_tbl", "_bkt"))
      .select(id, col("test_id"),
        round(dot(col("_v"), col("_tv")) /
          (l2norm(col("_v")) * l2norm(col("_tv"))), 6).as("cos"))
      .groupBy(id, col("test_id"), col("cos"))
      .agg(count(lit(1)).as("n_tables"))
      .filter(col("cos") >= minCos)
      .select(id, col("test_id"), col("n_tables"), col("cos"))
  }

  /** Remove from `corpus` every row with a [[semanticScoresMulti]]
    * match — the multi-table semantic cut, the configuration that
    * holds its recall at 100 TB.
    */
  def semanticCutMulti(corpus: DataFrame, testSet: DataFrame, idCol: String,
                       vecCol: String, dims: Int, planesPerTable: Int,
                       tables: Int, minCos: Double): DataFrame = {
    val bad = semanticScoresMulti(corpus, testSet, idCol, vecCol, dims,
      planesPerTable, tables, minCos).select(col(idCol)).distinct()
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** SPAN contamination — the leakage mode the per-corpus-doc fraction
    * DILUTES away: a benchmark item quoted verbatim inside a long host
    * document (the dominant real-world form — answer keys embedded in
    * web pages, test passages inside aggregator dumps) shares ALL of
    * its shingles with the host, but the host's [[scores]] overlap_frac
    * is t/|host| — arbitrarily small as the host grows, so rung 1
    * never fires. What decontamination actually needs is the fraction
    * measured from the TEST side: coverage = |shared| / |test item's
    * shingles| — 1.0 for an embedded verbatim copy regardless of host
    * length. Returns `(idCol, test_id, n_shared, t_shingles, coverage,
    * dilution)` per shingle-sharing pair, where `dilution` is the
    * corpus-side fraction rung 1 would have seen (emitted so the gap
    * between the two numbers is visible in the relation itself).
    *
    * Scale shape: the test side explodes to (test_id, t_n, h) and
    * broadcasts (benchmark-sized × shingles-per-item — still
    * broadcast-bounded, and [[boundTestSide]] guards the relation);
    * the corpus is one narrow explode-probe pass, and only MATCHES
    * reach the pair-grouped count — contamination-sized, never corpus-
    * sized.
    */
  def spanScores(corpus: DataFrame, testSet: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val id = col(idCol)
    boundTestSide(testSet, "spanScores")
    val tex = testSet
      .select(col(idCol).as("test_id"), shingleSet(col(textCol)).as("_tsh"))
      .filter(size(col("_tsh")) > 0)
      .select(col("test_id"), size(col("_tsh")).cast("long").as("t_shingles"),
        explode(col("_tsh")).as("h"))
    corpus
      .select(id, shingleSet(col(textCol)).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(id, size(col("_sh")).cast("long").as("_cn"),
        explode(col("_sh")).as("h"))
      .join(broadcast(tex), "h")
      .groupBy(id, col("test_id"), col("_cn"), col("t_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(id, col("test_id"), col("n_shared"), col("t_shingles"),
        round(col("n_shared").cast("double") / col("t_shingles"), 6)
          .as("coverage"),
        round(col("n_shared").cast("double") / col("_cn"), 6)
          .as("dilution"))
  }

  /** Remove from `corpus` every document that CONTAINS a test item at
    * `minCoverage` of its shingles ([[spanScores]]) — the embedded-leak
    * cut. Composes with the other three: [[cut]] catches the verbatim
    * whole-doc copy, this one the verbatim copy hiding inside a longer
    * host.
    */
  def spanCut(corpus: DataFrame, testSet: DataFrame, idCol: String,
              textCol: String, minCoverage: Double): DataFrame = {
    require(minCoverage > 0.0 && minCoverage <= 1.0,
      "minCoverage must be in (0, 1]")
    val bad = spanScores(corpus, testSet, idCol, textCol)
      .filter(col("coverage") >= minCoverage)
      .select(col(idCol)).distinct()
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** EXCISE benchmark spans instead of dropping the host — the
    * surgical alternative to [[spanCut]] for the embedded-leak mode:
    * a long, otherwise-good document that quotes a test item loses
    * only the quoted tokens, not its training value. A token position
    * is excised when ANY 3-shingle covering it (start j ∈ {p-2, p-1,
    * p}, j valid) appears in the test set's shingle pool; surviving
    * tokens are re-joined on single spaces. Documents sharing NO
    * shingle with the pool pass through byte-identical with
    * `n_excised = 0`; documents whose surviving token count falls
    * below `minKeepTokens` are dropped outright (a residue of filler
    * fragments is not a document). Returns `corpus` with `textCol`
    * rewritten plus an `n_excised` long column.
    *
    * On re-application: shingles straddling an excision cut mix tokens
    * from both sides of the cut, which in practice (junk/unrelated
    * neighbors) cannot re-enter the benchmark pool, so a second pass
    * excises nothing (spec-pinned on embedded-copy fixtures). Strict
    * idempotence is NOT guaranteed in the adversarial case where a cut
    * splices two fragments into a NEW pool shingle — callers needing a
    * fixed point use [[exciseToFixpoint]] (each pass strictly shrinks
    * token count, so it terminates).
    *
    * Scale shape: the pool broadcasts (benchmark-sized); the corpus is
    * one narrow posexplode probe pass whose join output — and hence
    * the per-doc matched-position aggregate and both rewrite joins
    * (broadcast) — is contamination-sized, never corpus-sized, so the
    * corpus itself never shuffles here. CAVEAT on that sizing: "shares
    * ≥ 1 shingle" is a weaker bound than the other rungs' thresholds —
    * a benchmark containing high-document-frequency trigrams pulls a
    * corpus fraction into the matched set and with it the broadcasts.
    * `maxDf` is that caveat's dial (the df-cap discipline the winnowing
    * postings use): with it set, pool shingles whose CORPUS document
    * frequency exceeds `maxDf` are dropped from the probe before any
    * matching — one extra narrow corpus pass producing a pool-sized
    * df relation, so the matched set stays bounded by genuinely
    * distinctive benchmark content. Default: uncapped (curated-prose
    * benchmarks need no screen).
    */
  def spanExcise(corpus: DataFrame, testSet: DataFrame, idCol: String,
                 textCol: String, minKeepTokens: Int = 1,
                 maxDf: Long = Long.MaxValue,
                 broadcastLimit: Long = DefaultBroadcastLimit,
                 broadcastBytes: Long = DefaultBroadcastBytes): DataFrame = {
    boundTestSide(testSet, "spanExcise")
    val pool = testSet
      .select(explode(shingleSet(col(textCol))).as("h")).distinct()
    exciseWithPool(corpus, dfCapPool(pool, corpus, textCol, maxDf),
      idCol, textCol, minKeepTokens, broadcastLimit, broadcastBytes)
  }

  /** Row-count ceiling under which the excision operators broadcast
    * their matched/touched sets (the "contamination-sized" assumption
    * made checkable): a set verified ≤ this broadcasts as before; a
    * larger one — a boilerplate-heavy pool without [[spanExcise]]'s
    * `maxDf` screen can make the touched set a corpus FRACTION —
    * degrades to a plain id-keyed shuffle join instead of OOMing the
    * driver. 4M rows ≈ low hundreds of MB for an IDS-ONLY set (the
    * [[exciseToFixpoint]] touched split); the excision's matched and
    * rewritten relations carry per-doc PAYLOADS (a position array, the
    * full rewritten text), so those joins are additionally gated on
    * [[DefaultBroadcastBytes]] — a few rows of 16k-token hosts and
    * 4M rows of them are different broadcasts, and the row count alone
    * cannot tell.
    */
  val DefaultBroadcastLimit: Long = 4000000L

  /** Estimated-PAYLOAD ceiling for the excision broadcasts, measured
    * in what is actually shipped: the matched relation's bytes are
    * estimated as `rows · 16 + Σ size(_mj) · 4` (ids plus one int per
    * matched shingle position) and the rewritten relation's as
    * `rows · 24 + Σ size(_w) · 8` (ids/counts plus the rewritten text,
    * upper-bounded by the ORIGINAL token count at ~8 bytes per token —
    * computable in the same count pass, before any rewrite runs).
    * Either estimate past this ceiling degrades its join to the keyed
    * shuffle path even when the row count looks small — the
    * heavily-quoted-long-host regime where a 4M-row gate would wave
    * multiple GB of text through. 256 MB sits inside any executor
    * broadcast budget with room for the exchange's copies.
    *
    * Pricing caveats, explicit: the ~8 B/token estimate assumes
    * ASCII-dominant tokens (average English token ≈ 5 chars + space +
    * array overhead) and under-prices multi-byte UTF-8 text by up to
    * ~1.5× — a CJK-heavy corpus should scale this ceiling down (or
    * the caller its `broadcastBytes`) by its measured bytes-per-token
    * factor. String ids add their summed length to both estimates in
    * the same aggregate pass; other non-fixed-width id types are
    * priced at the 16/24 B/row constants (a numeric id assumption).
    */
  val DefaultBroadcastBytes: Long = 256L << 20

  /** `df` with a broadcast hint iff `small` — the size-gated fallback
    * shared by the excision operators. The caller passes a verdict it
    * obtained by COUNTING A PINNED frame (counting an unpinned one
    * would re-run its whole lineage a second time at the join).
    */
  private def hintIf(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df

  /** Drop from `pool` the shingles whose document frequency in
    * `corpus` exceeds `maxDf` — the high-df pre-screen [[spanExcise]]
    * and [[buildProbes]] expose as a parameter. One narrow corpus
    * explode probed against the broadcast pool; the df aggregate's
    * output (and its exchange) is pool-sized.
    */
  private def dfCapPool(pool: DataFrame, corpus: DataFrame,
                        textCol: String, maxDf: Long): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    if (maxDf == Long.MaxValue) pool
    else {
      val df = corpus
        .select(explode(shingleSet(col(textCol))).as("h"))
        .join(broadcast(pool), "h")
        .groupBy(col("h")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxDf)
        .select(col("h"))
      pool.join(broadcast(df), Seq("h"), "left_anti")
    }
  }

  /** [[spanExcise]] against a PRE-BUILT shingle pool carrying a single
    * `h` column — the frozen-gate form ([[BenchmarkProbes.shinglePool]]
    * is exactly this relation, pinned once at stream start), also the
    * shape for reusing one pool across many corpus shards without
    * re-deriving it.
    */
  def exciseWithPool(corpus: DataFrame, pool: DataFrame, idCol: String,
                     textCol: String, minKeepTokens: Int = 1,
                     broadcastLimit: Long = DefaultBroadcastLimit,
                     broadcastBytes: Long = DefaultBroadcastBytes): DataFrame =
    exciseWithPoolPinned(corpus, pool, idCol, textCol, minKeepTokens,
      broadcastLimit, broadcastBytes)._1

  /** [[exciseWithPool]] that also returns the pinned matched relation
    * so an iterating caller can [[Checkpoints.release]] it once the
    * RESULT frame is materialized downstream ([[exciseToFixpoint]]
    * does — without the release each pass would leave one pinned
    * match-set reclaimed only by GC-driven cleanup). The public form
    * discards the handle: its returned frame reads the pin lazily, the
    * documented final-pin contract.
    */
  private def exciseWithPoolPinned(corpus: DataFrame, pool: DataFrame,
      idCol: String, textCol: String, minKeepTokens: Int,
      broadcastLimit: Long,
      broadcastBytes: Long): (DataFrame, DataFrame) = {
    require(minKeepTokens >= 0, "minKeepTokens must be >= 0")
    val id = col(idCol)
    val toks = corpus.select(id, words(col(textCol)).as("_w"))
    val matched = Checkpoints.pin(matchedPositions(toks, pool, idCol))
    // the broadcast gate: matched is contamination-sized under the
    // operator's design assumption, but nothing ENFORCES that — ONE
    // aggregate pass over the pinned frame prices both relations
    // (rewritten carries exactly matched's id set) and each join falls
    // back to the keyed shuffle when its rows OR its estimated payload
    // blow past the limits. Bytes are estimated from what each side
    // ships: matched carries the per-doc matched-position ARRAY,
    // rewritten the full rewritten TEXT (bounded by the original token
    // count, `_wn`, priced at ~8 bytes/token) — a row count alone
    // cannot see a few million 16k-token hosts.
    // string ids ship their payload too — a wide string id's bytes are
    // exactly the regime the gate exists to catch, so sum(length(id))
    // joins the estimate; fixed-width ids stay priced by the 16/24 B
    // per-row constants (the documented numeric-id assumption)
    val idBytes = matched.schema(idCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        coalesce(sum(length(id)), lit(0L))
      case _ => coalesce(sum(lit(0L)), lit(0L))
    }
    val st = matched.agg(count(lit(1)),
      coalesce(sum(size(col("_mj"))), lit(0L)),
      coalesce(sum(col("_wn")), lit(0L)), idBytes).head()
    val (rows, positions, toksTotal, idB) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val smallM = rows <= broadcastLimit &&
      rows * 16L + positions * 4L + idB <= broadcastBytes
    val smallR = rows <= broadcastLimit &&
      rows * 24L + toksTotal * 8L + idB <= broadcastBytes
    // LINEAR rewrite: a matched shingle starting at j covers tokens
    // {j, j+1, j+2} (every start position is <= n-3, so the covered
    // positions are always in range); the kept positions come from ONE
    // array_except — a hash-set difference, O(tokens + matches) — so a
    // heavily-quoted long host rewrites in O(tokens), not the
    // O(tokens × matches) a per-token membership scan would pay.
    val excised = flatten(transform(col("_mj"), j => array(j, j + 1, j + 2)))
    val kept = transform(
      array_except(sequence(lit(0), size(col("_w")) - 1), excised),
      p => element_at(col("_w"), p + 1))
    // matched is contamination-sized (docs sharing >= 1 pool shingle)
    // under the maxDf-screened assumption, so the rewrite probe
    // broadcasts it and the corpus side never shuffles — unless the
    // gate above found either side oversized in rows or bytes, in
    // which case that join degrades to an id-keyed shuffle (a slow
    // pass, never an OOM)
    val rewritten = toks.join(hintIf(matched, smallM), Seq(idCol))
      .select(id, kept.as("_kept"), size(col("_w")).as("_n"))
      .select(id, array_join(col("_kept"), " ").as("_newtext"),
        (col("_n") - size(col("_kept"))).cast("long").as("_nex"),
        size(col("_kept")).as("_keptn"))
    val out = corpus.join(hintIf(rewritten, smallR), Seq(idCol), "left")
      .filter(col("_keptn").isNull || col("_keptn") >= minKeepTokens)
      .withColumn(textCol, coalesce(col("_newtext"), col(textCol)))
      .withColumn("n_excised", coalesce(col("_nex"), lit(0L)))
      .drop("_newtext", "_nex", "_keptn")
    (out, matched)
  }

  /** The per-doc matched-position aggregate the excision rewrites
    * from: one narrow positional-shingle probe of `toks` (`idCol` +
    * `_w`, the token array) against the broadcast pool, collapsed to
    * `(id, _mj, _wn)` — the matched start-position set and the doc's
    * token count (which prices the rewritten-text broadcast before any
    * rewrite runs). Package-visible so the plan audit can pin its
    * map-side combine on the PRE-pin plan — inside [[exciseWithPool]]
    * the aggregate executes during the size gate's pin job and the
    * query plan only shows the pinned relation.
    */
  private[graft] def matchedPositions(toks: DataFrame, pool: DataFrame,
                                      idCol: String): DataFrame =
    // positional (NOT distinct) shingles: element j starts at token j
    toks
      .select(col(idCol), size(col("_w")).as("_wn"), posexplode(
        Dedup.shingleHashes3(Dedup.wordHashes(col("_w")))))
      .withColumnRenamed("pos", "_j").withColumnRenamed("col", "h")
      .join(broadcast(pool), "h")
      .groupBy(col(idCol))
      .agg(collect_set(col("_j")).as("_mj"), first(col("_wn")).as("_wn"))

  /** [[exciseWithPool]] iterated to the FIXED POINT — the adversarial-
    * splice closure the single pass cannot promise: a cut can join two
    * fragments into a NEW pool shingle ("p q [a b c] r" with both
    * "a b c" AND "p q r" in the pool — one pass removes the quote and
    * thereby ASSEMBLES a verbatim test item), so decontamination that
    * must guarantee zero residual coverage re-excises until a pass
    * removes nothing. Termination is structural — every pass strictly
    * shrinks the total token count — and `maxPasses` is a safety valve
    * only (returns the current state if hit; real corpora converge in
    * 1–2 passes because splice shingles need exact token adjacency).
    *
    * Scale shape, and why this is NOT maxPasses × the single-pass
    * cost: one narrow pre-screen pass splits the corpus into UNTOUCHED
    * documents (share no pool shingle — they exit immediately with
    * `n_excised = 0`, no rewrite work, and by the same token can never
    * need a second pass) and the TOUCHED set, which is
    * contamination-sized; every iteration — including the first actual
    * excision — runs over that small set only, pinned per pass so the
    * loop's lineage stays flat. The corpus is scanned a bounded number
    * of times (pre-screen probe + the two split anti/semi joins, all
    * narrow broadcast probes); passes 2+ never see it at all.
    */
  def exciseToFixpoint(corpus: DataFrame, pool: DataFrame, idCol: String,
                       textCol: String, minKeepTokens: Int = 1,
                       maxPasses: Int = 8,
                       broadcastLimit: Long = DefaultBroadcastLimit,
                       broadcastBytes: Long = DefaultBroadcastBytes): DataFrame =
    exciseToFixpointPinned(corpus, pool, idCol, textCol, minKeepTokens,
      maxPasses, broadcastLimit, broadcastBytes)._1

  /** [[exciseToFixpoint]] that also returns the FINAL pins its result
    * frame reads lazily (`touched` + the last pass's rewrite) so a
    * caller that materializes the result can release them — the
    * per-batch lifecycle the streaming gate needs; the public form
    * discards the handles (reference-tracking cleanup reclaims them,
    * the documented final-pin contract). Per-pass matched pins are
    * already released inside the loop.
    */
  private def exciseToFixpointPinned(corpus: DataFrame, pool: DataFrame,
      idCol: String, textCol: String, minKeepTokens: Int,
      maxPasses: Int, broadcastLimit: Long,
      broadcastBytes: Long): (DataFrame, Seq[DataFrame]) = {
    require(maxPasses >= 1, "maxPasses must be >= 1")
    val id = col(idCol)
    val touched = Checkpoints.pin(corpus
      .select(id, explode(shingleSet(col(textCol))).as("h"))
      .join(broadcast(pool), "h")
      .select(id).distinct())
    // size-gate the touched broadcasts: "contamination-sized" is the
    // design assumption, not a guarantee — a boilerplate-heavy pool
    // without maxDf can touch a corpus fraction, and the split must
    // then shuffle on id instead of OOMing the driver. touched is
    // already pinned, so the count is one cheap scan of the checkpoint.
    val small = touched.count() <= broadcastLimit
    val clean = corpus.join(hintIf(touched, small), Seq(idCol), "left_anti")
      .withColumn("n_excised", lit(0L))
    var dirty = Checkpoints.pin(
      corpus.join(hintIf(touched, small), Seq(idCol), "left_semi")
        .withColumn("_acc", lit(0L)))
    var pass = 0
    var excised = 1L
    while (excised > 0L && pass < maxPasses) {
      // exciseWithPool preserves extra columns, so the running total
      // rides through as _acc
      val (ex, matchedPin) = exciseWithPoolPinned(dirty, pool, idCol,
        textCol, minKeepTokens, broadcastLimit, broadcastBytes)
      val next = Checkpoints.pin(
        ex.withColumn("_acc", col("_acc") + col("n_excised")))
      excised = next.agg(coalesce(sum(col("n_excised")), lit(0L)))
        .head().getLong(0)
      // next is materialized, so nothing reads this pass's matched pin
      // again — release it here instead of leaving one pinned match
      // set per pass to GC-driven cleanup
      Checkpoints.release(matchedPin)
      Checkpoints.release(dirty)
      dirty = next
      pass += 1
    }
    // `touched` and the final `dirty` pin are read lazily by the
    // returned frame — they cannot be released HERE; they are the
    // returned handles (a caller releases them once the result is
    // materialized, or reference-tracking cleanup reclaims them)
    (clean.unionByName(
      dirty.drop("n_excised").withColumnRenamed("_acc", "n_excised")),
      Seq(touched, dirty))
  }

  // ---- frozen-benchmark gate (streaming entry / repeated batch cuts) ------

  /** The benchmark's probe structures, built ONCE and pinned
    * (materialized): the shingle pool (rung 1), the banded-signature
    * and shingle tables (rung 2), the hyperplane bucket table — one
    * row per (table, probed bucket, test item), with the `tables` ×
    * `nprobe` fan-out baked in (rung 3) — and the per-test-item
    * shingle table with counts (rung 4's span probe). All five are
    * benchmark-sized, so [[gateBatch]] broadcasts them against every
    * micro-batch with zero per-batch benchmark work — the frozen
    * contract [[graft.streaming.StreamingVectorIndex]] set for its
    * quantizer, applied to decontamination: the structures never move
    * under a replayed batch, so gating is replay-deterministic.
    * Release with [[releaseProbes]] when the stream stops.
    */
  final case class BenchmarkProbes(
      shinglePool: DataFrame, bandTable: DataFrame, shingleTable: DataFrame,
      bucketTable: DataFrame, spanTable: DataFrame, dims: Int, planes: Int,
      seeds: Int, bands: Int, rowsPerBand: Int, tables: Int = 1)

  /** Gate thresholds + the batch-side embedding expression, bundled so
    * the streaming chain can thread one optional value. With
    * `excise = true` the gate runs GATE-THEN-EXCISE: rungs 1–3 refuse
    * whole-document leaks first (an edited or rephrased copy must die,
    * not shrink into a junk residue — the ordering a naive
    * excise-first composition gets wrong), then survivors have
    * embedded benchmark quotes removed against the frozen pool
    * ([[exciseWithPool]]) in place of rung 4's whole-host drop — so
    * `minCoverage` is INERT in excise mode (there is no rung-4 drop
    * to threshold; post-excision coverage is zero by construction). A
    * host that merely QUOTES a test item is admitted cleaned rather
    * than refused — still deterministic against the frozen probes,
    * hence replay-safe. `exciseFixpoint` upgrades the excision to
    * [[exciseToFixpoint]] (the adversarial-splice closure — a cut that
    * assembles a new benchmark shingle is re-excised).
    */
  final case class BenchmarkGate(probes: BenchmarkProbes, vec: Column,
      minOverlapFrac: Double = 0.8, minJaccard: Double = 0.5,
      minCos: Double = 0.9, minCoverage: Double = 0.9,
      excise: Boolean = false, minKeepTokens: Int = 1,
      exciseFixpoint: Boolean = false)

  /** Build [[BenchmarkProbes]] from a benchmark relation carrying
    * `idCol` + `textCol`; `vec` is the embedding EXPRESSION over the
    * benchmark's columns (a real embedding column, or a deterministic
    * stand-in like [[graft.streaming.StreamingCurationChain.textEmbedding]]
    * — the gate only needs batch and benchmark to agree on it). The
    * test side is bounded exactly like the one-shot operators;
    * `planes` is the caller's FROZEN plane count (never derived per
    * batch — a growing corpus must not re-bucket the benchmark under a
    * replay), and `tables > 1` freezes a MULTI-TABLE rung-3 code
    * instead ([[semanticScoresMulti]]'s structure: `tables` independent
    * `planes`-bit codes, agreement in ANY table is a candidate — the
    * configuration whose recall does not erode with corpus growth;
    * `tables = 1` is the single-code gate, bit-identical to before).
    * `maxDf` (with `dfCorpus`, a reference corpus or a sample of it)
    * drops pool shingles whose corpus document frequency exceeds the
    * cap — the [[spanExcise]] pre-screen frozen into the gate's pool,
    * for benchmarks carrying boilerplate trigrams that would otherwise
    * pull a corpus fraction into every batch's matched set. The capped
    * pool feeds rung 1 AND the excise path (deliberately: a shingle
    * thousands of documents contain is not leak evidence).
    */
  def buildProbes(testSet: DataFrame, idCol: String, textCol: String,
                  vec: Column, dims: Int, planes: Int, nprobe: Int = 1,
                  seeds: Int = 8, bands: Int = 4,
                  rowsPerBand: Int = 2, tables: Int = 1,
                  maxDf: Long = Long.MaxValue,
                  dfCorpus: Option[DataFrame] = None): BenchmarkProbes = {
    require(seeds >= bands * rowsPerBand,
      "signature must cover bands * rowsPerBand entries")
    require(maxDf == Long.MaxValue || dfCorpus.nonEmpty,
      "maxDf needs a dfCorpus to measure document frequency against")
    boundTestSide(testSet, "buildProbes")
    val base = testSet.select(col(idCol).as("test_id"),
      Dedup.shingleHashes3(Dedup.wordHashes(words(col(textCol)))).as("_tsh"),
      vec.as("_tv"))
    val sh = base.filter(size(col("_tsh")) > 0)
    val rawPool =
      sh.select(explode(array_distinct(col("_tsh"))).as("h")).distinct()
    val pool = dfCorpus match {
      case Some(c) if maxDf != Long.MaxValue =>
        dfCapPool(rawPool, c, textCol, maxDf)
      case _ => rawPool
    }
    BenchmarkProbes(
      shinglePool = Checkpoints.pin(pool),
      bandTable = Checkpoints.pin(Dedup.lshBands(
          sh.select(col("test_id"), Dedup.minhashSig(col("_tsh"), seeds).as("sig")),
          "test_id", "sig", bands, rowsPerBand)
        .select(col("band_key"), col("test_id"))),
      shingleTable = Checkpoints.pin(sh.select(col("test_id"), col("_tsh"))),
      bucketTable = Checkpoints.pin(Similarity.explodeMultiTableProbes(
          base.select(col("test_id"), col("_tv")), "_tv", dims, planes,
          tables, nprobe, "_tbl", "_bkt")
        .select(col("_tbl"), col("_bkt"), col("test_id"), col("_tv"))),
      spanTable = Checkpoints.pin(sh
        .select(col("test_id"), array_distinct(col("_tsh")).as("_d"))
        .select(col("test_id"), size(col("_d")).cast("long").as("t_n"),
          explode(col("_d")).as("h"))),
      dims = dims, planes = planes, seeds = seeds, bands = bands,
      rowsPerBand = rowsPerBand, tables = tables)
  }

  /** Release the pinned probe structures (stream shutdown). */
  def releaseProbes(p: BenchmarkProbes): Unit =
    Seq(p.shinglePool, p.bandTable, p.shingleTable, p.bucketTable,
        p.spanTable)
      .foreach(Checkpoints.release)

  /** Remove from `batch` every document any rung of the leakage ladder
    * matches against the frozen benchmark — the per-micro-batch form of
    * `cut ∘ fuzzyCut ∘ semanticCut ∘ spanCut` (survivor-identical: each
    * rung's bad set is per-document, so the union of bads equals the
    * composition of cuts — spec-pinned). The batch side is touched in
    * narrow map passes plus broadcast joins against the five pinned
    * probe tables; only matches (contamination-sized) reach the rung-1
    * count shuffle, and the benchmark side costs nothing per batch.
    * `vec` is the batch-side embedding expression and must agree with
    * the one [[buildProbes]] froze.
    */
  def gateBatch(batch: DataFrame, probes: BenchmarkProbes, idCol: String,
                textCol: String, vec: Column, minOverlapFrac: Double = 0.8,
                minJaccard: Double = 0.5, minCos: Double = 0.9,
                minCoverage: Double = 0.9, excise: Boolean = false,
                minKeepTokens: Int = 1,
                exciseFixpoint: Boolean = false): DataFrame =
    gateBatchReleasable(batch, probes, idCol, textCol, vec,
      minOverlapFrac, minJaccard, minCos, minCoverage, excise,
      minKeepTokens, exciseFixpoint)._1

  /** [[gateBatch]] that also returns a RELEASE thunk for the
    * batch-sized pins its excise mode creates (the matched set, or the
    * fixpoint's touched + final rewrite): a long-lived stream calling
    * the gate per micro-batch would otherwise accumulate one pinned
    * match set per batch until GC-driven cleanup ran — the
    * [[graft.streaming.StreamingCurationChain]] calls this form and
    * releases in its per-batch finally, after the chain's own pin of
    * the gated output has materialized everything downstream reads.
    * Call the thunk ONLY once nothing will read the returned frame's
    * un-pinned lineage again. No-op in non-excise mode (the rung
    * verdicts are lazy broadcast probes, nothing is pinned).
    */
  def gateBatchReleasable(batch: DataFrame, probes: BenchmarkProbes,
                idCol: String, textCol: String, vec: Column,
                minOverlapFrac: Double = 0.8,
                minJaccard: Double = 0.5, minCos: Double = 0.9,
                minCoverage: Double = 0.9, excise: Boolean = false,
                minKeepTokens: Int = 1,
                exciseFixpoint: Boolean = false): (DataFrame, () => Unit) = {
    require(minOverlapFrac > 0.0 && minOverlapFrac <= 1.0,
      "minOverlapFrac must be in (0, 1]")
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "minJaccard must be in (0, 1]")
    require(minCos >= -1.0 && minCos <= 1.0, "minCos must be in [-1, 1]")
    require(minCoverage > 0.0 && minCoverage <= 1.0,
      "minCoverage must be in (0, 1]")
    val id = col(idCol)
    val sh = batch.select(id,
      Dedup.shingleHashes3(Dedup.wordHashes(words(col(textCol)))).as("_sh"),
      vec.as("_v"))
    val shNonEmpty = sh.filter(size(col("_sh")) > 0)
    // one distinct-shingle explode feeds BOTH direction-of-measurement
    // rungs (1 and 4)
    val exploded = shNonEmpty
      .select(id, array_distinct(col("_sh")).as("_dsh"))
      .select(id, size(col("_dsh")).cast("long").as("_n"),
        explode(col("_dsh")).as("h"))
    // rung 1: exact shingle-pool overlap (the scores()/cut() arithmetic)
    val r1 = exploded
      .join(broadcast(probes.shinglePool), "h")
      .groupBy(id, col("_n"))
      .agg(count(lit(1)).as("_shared"))
      .filter(round(col("_shared").cast("double") / col("_n"), 6)
        >= minOverlapFrac)
      .select(id)
    // rung 2: banded-signature candidates, exact-Jaccard verify (the
    // fuzzyScores() arithmetic against the frozen band/shingle tables)
    val cand = Dedup.lshBands(
        shNonEmpty.select(id, Dedup.minhashSig(col("_sh"), probes.seeds).as("sig")),
        idCol, "sig", probes.bands, probes.rowsPerBand)
      .select(col("band_key"), id)
      .join(broadcast(probes.bandTable), Seq("band_key"))
      .select(id, col("test_id")).distinct()
    val r2 = shNonEmpty
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(probes.shingleTable), Seq("test_id"))
      .filter(round(Dedup.jaccard(col("_sh"), col("_tsh")), 6) >= minJaccard)
      .select(id)
    // rung 3: `tables` bucket codes per batch doc (one narrow map
    // pass) against the frozen (table, bucket) probe rows — the
    // semanticScoresMulti() arithmetic; with probes.tables = 1 this is
    // bit-identical to the single-code semanticScores() gate
    val r3 = Similarity.multiTableBuckets(
        sh.select(id, col("_v")), "_v", probes.dims, probes.planes,
        probes.tables, "_tbl", "_bkt")
      .join(broadcast(probes.bucketTable), Seq("_tbl", "_bkt"))
      .filter(round(dot(col("_v"), col("_tv")) /
        (l2norm(col("_v")) * l2norm(col("_tv"))), 6) >= minCos)
      .select(id)
    if (!excise) {
      // rung 4: test-side coverage (the spanScores()/spanCut()
      // arithmetic) — catches the benchmark embedded inside a long
      // streamed host that rung 1's batch-side fraction dilutes away.
      // Built ONLY here: in excise mode the rung-4 drop is replaced
      // wholesale by the excision, so minCoverage is inert there and
      // the probe pass would be dead work.
      val r4 = exploded
        .join(broadcast(probes.spanTable), "h")
        .groupBy(id, col("test_id"), col("t_n"))
        .agg(count(lit(1)).as("_shared"))
        .filter(round(col("_shared").cast("double") / col("t_n"), 6)
          >= minCoverage)
        .select(id)
      val bad = r1.unionByName(r2).unionByName(r3).unionByName(r4)
        .distinct()
      (batch.join(broadcast(bad), Seq(idCol), "left_anti"), () => ())
    } else {
      // EXCISE mode: rungs 1-3 refuse whole-document leaks FIRST (an
      // edited or rephrased copy must die, not shrink into a residue),
      // then survivors have embedded benchmark quotes surgically
      // removed against the same frozen pool — rung 4's drop is
      // replaced by the excision (post-excision coverage is zero by
      // construction; minCoverage has NO effect in this mode), and a
      // host that merely quotes a test item is admitted cleaned.
      // minKeepTokens kills residues too short to be documents.
      // exciseFixpoint closes the adversarial-splice case (a cut that
      // assembles a new pool shingle is re-excised to the fixed
      // point). Schema is preserved (n_excised is not emitted).
      val bad = r1.unionByName(r2).unionByName(r3).distinct()
      val survivors = batch.join(broadcast(bad), Seq(idCol), "left_anti")
      val (cleaned, pins) =
        if (exciseFixpoint)
          exciseToFixpointPinned(survivors, probes.shinglePool, idCol,
            textCol, minKeepTokens, maxPasses = 8,
            DefaultBroadcastLimit, DefaultBroadcastBytes)
        else {
          val (out, matched) = exciseWithPoolPinned(survivors,
            probes.shinglePool, idCol, textCol, minKeepTokens,
            DefaultBroadcastLimit, DefaultBroadcastBytes)
          (out, Seq(matched))
        }
      (cleaned.drop("n_excised"), () => pins.foreach(Checkpoints.release))
    }
  }
}
