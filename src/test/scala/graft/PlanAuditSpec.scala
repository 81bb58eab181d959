package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audits: these assertions pin the plan properties the
  * 100 TB design depends on — filter/projection pushdown to the scan,
  * broadcast only for fixed-size dims, map-side partial aggregation,
  * top-k without a global sort, bucket joins instead of cross products.
  * A regression here is a scale bug even while results stay correct.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q2_filter: predicate and projection reach the parquet scan") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned ReadSchema: payload columns only, not the 11-column table
    assert(!p.contains("l_returnflag"), "scan reads columns the query never uses")
  }

  test("q1_agg: partial (map-side) aggregation before the shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("partial_"), p) // partial_sum/partial_count before Exchange
    assert(p.contains("Exchange hashpartitioning(l_returnflag"), p)
  }

  test("q3_join_agg: fixed-size dims broadcast; customer NOT hint-broadcast") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), p) // nation/region
    // the fact-side join keys shuffle (or AQE decides) — but no cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q6_topk: TakeOrderedAndProject, no global sort of the table") {
    val p = plan("q6_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q14_knn_exact: probe side broadcast, corpus streams once") {
    val p = plan("q14_knn_exact")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q11_dedup_near: candidate pairs come from an equi-join on the band key") {
    val p = plan("q11_dedup_near")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup must never be all-pairs:\n$p")
    assert(p.contains("band_key"), p)
  }

  test("q15_knn_lsh: bucket equi-join, not a cross join") {
    val p = plan("q15_knn_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("bucket"), p)
  }

  test("q19_merge_upsert: single full-outer join on the key") {
    val p = plan("q19_merge_upsert")
    assert(p.contains("FullOuter"), p)
  }

  test("q28_asof_join: union + ONE window shuffle, no range join blowup") {
    val p = plan("q28_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not be a theta join:\n$p")
    assert(p.contains("Union"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q29_interval_join: bucketized equi-join, no per-key cross product") {
    val p = plan("q29_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay an equi-join on (key, bucket):\n$p")
    assert(p.contains("__range_bucket"), p)
  }

  test("q32_salted_join: two-phase salting — right side is NOT fully replicated") {
    val p = plan("q32_salted_join")
    assert(p.contains("_salt"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the skew-aware shape: a hot/cold split (anti + semi against the
    // broadcast hot-key table) instead of exploding the whole right side
    assert(p.contains("LeftAnti"), s"cold branch must plain-join:\n$p")
    assert(p.contains("LeftSemi"), s"explode must be guarded by the hot-key semi-join:\n$p")
  }

  test("q35_percentiles: rank selection, not the per-group value-map aggregate") {
    val p = plan("q35_percentiles")
    // the built-in exact percentile() buffers a whole group's values on
    // one reducer — the plan must use rank joins instead. (The range
    // shuffle itself hides behind the eager checkpoint, so asserting on
    // "rangepartitioning" here would only ever match the final ORDER BY
    // — PercentilesSpec's property tests carry the rank-math contract.)
    assert(!p.toLowerCase.contains("percentile("),
      s"q35 must not use the value-map percentile aggregate:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"target-rank join must broadcast:\n$p")
  }

  test("q47_contamination: map-side broadcast probe; only matches shuffle") {
    val p = plan("q47_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark shingle index must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the probe (corpus) side sees exactly ONE hash exchange — the
    // post-join per-doc count (rows ∝ matches). A corpus-wide distinct
    // or pre-aggregation would add more. Exchanges BELOW the
    // BroadcastExchange belong to the benchmark-sized build side (its
    // distinct) and are fine — split the plan text there.
    val probeSide = p.split("BroadcastExchange", 2)(0)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(probeSide).size
    assert(hashExchanges <= 1,
      s"corpus-scale shuffle crept in ($hashExchanges hash exchanges):\n$p")
  }

  test("q52_redaction: the email+IP replace subtree is evaluated once") {
    // the phone count and the final redaction both consume the staged
    // _eir column; an inlined/collapsed plan would carry the email
    // regexp_replace TWICE (round-8 finding: ~30% of q52's cost)
    val p = plan("q52_redaction")
    val emailReplaces = java.util.regex.Pattern.quote(
      graft.operators.Redaction.EmailPattern).r
      .findAllIn(p).size
    // exactly 2 mentions: one regexp_count (n_email), one regexp_replace
    assert(emailReplaces == 2,
      s"email pattern appears $emailReplaces times (want 2: count + one replace):\n$p")
  }

  test("q58_substring_dedup: span hits attach by hash equi-join, never all-pairs") {
    val p = plan("q58_substring_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"substring dedup must never be all-pairs:\n$p")
    // map-side combine on the (hash, doc) distinct-count aggregation —
    // the shuffle carries combined (gh, id) pairs, not raw windows
    assert(p.contains("partial_"), p)
  }

  test("q59_simhash_neardup: chunk-bucket equi-join, never all-pairs") {
    val p = plan("q59_simhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Hamming retrieval must never be all-pairs:\n$p")
    assert(p.contains("chunk"), p)
  }

  test("q31_pivot: pinned pivot values — no extra distinct-collect job") {
    // an unpinned pivot runs a separate collect() of distinct event_type
    // before planning; with pinned values the plan is a single aggregate
    val p = plan("q31_pivot")
    assert(p.contains("partial_"), p) // map-side combine survives the pivot
  }

  test("q63_ngram_topk: map-side combine + TakeOrdered, no global sort") {
    val p = plan("q63_ngram_topk")
    assert(p.contains("partial_count"), p) // df combine before the wire
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a TakeOrdered, not a full sort:\n$p")
  }

  test("q64_decontaminate: broadcast probe + broadcast anti join — corpus never shuffles on doc_id") {
    val p = plan("q64_decontaminate")
    // test-set shingle probe AND the contaminated-id cut both broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the cut may shuffle both sides:\n$p")
  }

  test("q65_bloom_seen: probe side is broadcast joins only — no shuffle before the 1-row agg") {
    val p = plan("q65_bloom_seen")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"bloom probe must stay map-side:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q67_span_cut: repeated-hash attach is an equi-join, never all-pairs") {
    val p = plan("q67_span_cut")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p) // (gh, id) combine before the wire
  }

  test("q68_knn_pq: encode/reconstruct are literal lookups — only the probe join is non-equi") {
    val p = plan("q68_knn_pq")
    // probes broadcast against the reconstructed corpus; codebook is
    // inlined (no join for encode/recon at all)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      s"PQ scan must not shuffle the corpus:\n$p")
  }

  test("q71_knn_ivfpq: candidates come from a cell equi-join, never all-pairs") {
    val p = plan("q71_knn_ivfpq")
    assert(!p.contains("CartesianProduct"),
      s"IVF-PQ must restrict candidates to the probe's cell:\n$p")
    assert(p.contains("cell"), p)
  }

  test("q72_context_chunks: narrow explode — no shuffle before the final sort") {
    val df = SparkEntry.queries("q72_context_chunks")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // exactly the ORDER BY's range exchange; chunking itself adds none
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"chunking must stay narrow:\n$p")
    assert(p.contains("Generate posexplode"), p)
  }

  test("q73_semdedup: pairs are cell-local equi-joins, never corpus all-pairs") {
    val p = plan("q73_semdedup")
    assert(!p.contains("CartesianProduct"),
      s"semdedup must join within cells only:\n$p")
    // the only nested-loop is the bounded broadcast centroid assign;
    // the vector-pair join must hash on the cell key
    assert(p.contains("cell"), p)
  }

  test("q86_semdedup_hier: fine training and pairs join on the coarse/fine " +
    "keys — the only nested-loop is the bounded coarse-centroid assign") {
    val p = plan("q86_semdedup_hier")
    assert(!p.contains("CartesianProduct"),
      s"hierarchical semdedup must never cross-join the corpus:\n$p")
    // the pair join consumes the assignment twice (a/b sides, each
    // recomputed — caching was measured ~20% slower, see the
    // semDedupHier scaladoc), so the bounded coarse-centroid assign
    // (g ≈ √(n/t) broadcast rows) appears once per side; anything MORE
    // would mean an unbounded nested-loop crept into the Lloyd rounds
    // or the pair pass itself
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 2, s"only the per-side coarse assigns may nested-loop, got $bnl:\n$p")
    // and the pair pass — the plan ABOVE the first window filter —
    // must hash on the cell keys
    assert(p.contains("Exchange hashpartitioning(_coarse"),
      s"pair pass must shuffle on the (coarse, fine) cell keys:\n$p")
  }

  test("q75_winnow_match: postings join on the fingerprint, never all-pairs") {
    val p = plan("q75_winnow_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"winnow match must equi-join per-fingerprint postings:\n$p")
    assert(p.contains("partial_count"), p) // df cap + pair counts combine map-side
  }

  test("q84_winnow_index: probe reads the postings index bucketed — " +
    "no corpus-side fp exchange") {
    // plan() evaluates the query, which builds the index as a side
    // effect; the returned probe plan must then read it co-partitioned
    val p = plan("q84_winnow_index")
    assert(p.contains("Bucketed: true"),
      s"probe must read the winnow postings as a bucketed scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"probe must equi-join the postings:\n$p")
    val fpExchanges = "Exchange hashpartitioning\\(fp".r.findAllIn(p).size
    assert(fpExchanges <= 1,
      s"corpus postings must not re-shuffle on fp (batch side only):\n$p")
  }

  test("q80_containment: candidates from the postings equi-join, never all-pairs") {
    val p = plan("q80_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment must equi-join df-capped postings:\n$p")
    assert(p.contains("partial_count"), p)
  }

  test("q77/q78 splits: one group shuffle + broadcast spanning check, no cartesian blowup") {
    for (name <- Seq("q77_split_leakage", "q78_neardup_split")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // the 1-row spanning aggregate attaches via broadcast
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$name must broadcast the invariant row:\n$p")
    }
  }

  test("q88_bm25: postings cut is a broadcast join on the query terms — " +
    "the corpus never cross-joins and never shuffles past the tf exchange " +
    "except on (query, doc) keys") {
    val p = plan("q88_bm25")
    assert(!p.contains("CartesianProduct"), s"no corpus cross join:\n$p")
    // the term joins (query set + vocab-bounded idf) broadcast
    assert(p.contains("BroadcastHashJoin"), s"query/idf term joins broadcast:\n$p")
    // the only nested-loops are the 1-row stats attaches
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 2, s"only 1-row stats rows may nested-loop, got $bnl:\n$p")
  }

  test("q89_dsir: ratio table broadcasts, top-N is a distributed " +
    "TakeOrdered — never an unpartitioned window over the corpus") {
    val p = plan("q89_dsir")
    assert(!p.contains("CartesianProduct"), s"no corpus cross join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the resample cut must be a distributed top-k merge:\n$p")
    // the buckets-row ratio table attaches by broadcast; the corpus
    // gram stream must not exchange on the bucket key for the join
    assert(p.contains("BroadcastHashJoin"), s"ratio join broadcasts:\n$p")
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"only the 1-row totals may nested-loop, got $bnl:\n$p")
  }

  test("q87_quality_probe: frozen-weight scoring is one map pass — " +
    "no join, no hash shuffle before the final sort") {
    // plan() runs trainLinear as a side effect (O(dims) collects over
    // the seed set); the RETURNED corpus-scoring plan must then carry
    // the learned weights as literals
    val p = plan("q87_quality_probe")
    assert(!p.contains("Join"),
      s"scoring must attach weights as literals, not a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring is narrow — only the final sort may range-exchange:\n$p")
  }

  test("q90_hybrid_rrf: both retrieval sides broadcast the probes; " +
    "no cartesian anywhere in the fused plan") {
    val p = plan("q90_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), s"no corpus cross join:\n$p")
    // dense side: broadcast probes against the corpus stream; lexical
    // side: broadcast query terms + idf — the corpus itself is never
    // on the build side of anything
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), s"probe joins broadcast:\n$p")
  }

  test("q91_weighted_sample: the race cut is a distributed TakeOrdered — " +
    "never a global sort or an unpartitioned window over the corpus") {
    val p = plan("q91_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"the n-smallest-keys cut must be a per-partition top-n merge:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the key is a narrow per-row expression — no shuffle before the cut:\n$p")
  }

  test("q93_bm25_indexed: the probe reads the postings scan with query " +
    "terms broadcast — the only exchange is the candidate score sum") {
    val p = plan("q93_bm25_indexed")
    assert(!p.contains("CartesianProduct"), s"no corpus cross join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query-term cut broadcasts:\n$p")
    assert(p.contains("Bucketed: true"),
      s"postings must read from the bucketed index files:\n$p")
    // q88 pays a corpus-keyed tf exchange every call; the index probe
    // must not — every hash exchange here keys on query_id, i.e. is
    // candidate-sized (the score sum and the rank window), never the
    // corpus tokenize
    val corpusKeyed = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).filterNot(_.group(1).contains("query_id")).toSeq
    assert(corpusKeyed.isEmpty,
      s"corpus-keyed exchange in the probe: $corpusKeyed\n$p")
  }

  test("q94_curriculum: thresholds broadcast onto the corpus — bucket " +
    "assignment is narrow, aggregation has map-side partials") {
    val p = plan("q94_curriculum")
    assert(!p.contains("CartesianProduct"), s"no corpus cross join:\n$p")
    // the 1-row threshold frame attaches by broadcast nested loop —
    // the corpus itself is never the build side and never re-shuffles
    // to learn its bucket
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"threshold attach must broadcast the 1-row frame:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bucket aggregation must partial-aggregate map-side:\n$p")
  }

  test("q96_temperature_mix: derived cuts are a scan-adjacent literal " +
    "CASE — no join between the scan and the keep filter") {
    // plan() runs the O(langs) histogram collect as a side effect; the
    // RETURNED plan must carry the thresholds as literals
    val p = plan("q96_temperature_mix")
    assert(!p.contains("CartesianProduct"), s"no cross join:\n$p")
    assert(p.contains("CASE WHEN"),
      s"thresholds must be a literal CASE chain:\n$p")
  }

  test("q97_collocations: vocab joins are equi-joins, the cut is " +
    "TakeOrdered — no cartesian, no global sort") {
    val p = plan("q97_collocations")
    assert(!p.contains("CartesianProduct"), s"no cross join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be a distributed top-k merge:\n$p")
  }

  test("q98_pagerank: ranks come from the materialized checkpoint (no " +
    "iteration replay per action) and join nation without a cartesian") {
    // the iteration plans run eagerly inside pageRank (pin-per-round);
    // the RETURNED plan must only read the final pinned rank frame —
    // a downstream consumer re-running five iterations per action
    // would be the scale bug
    val p = plan("q98_pagerank")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"ranks must be served from the pinned frame:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
      s"the fact-join edge build must not replay in the returned plan:\n$p")
  }

  test("q99_dict_tagger: one fused dictionary pass, map-side partial " +
    "agg, names attach by broadcast — no cartesian, no per-pattern scan") {
    val p = plan("q99_dict_tagger")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.toLowerCase.contains("multipatterncounts"),
      s"the dictionary must match in ONE expression, not K scans:\n$p")
    assert(p.contains("partial_sum"),
      s"per-pattern totals must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"pattern names must attach by broadcast:\n$p")
  }

  test("q100_filter_attribution: pair matrix from a double explode with " +
    "map-side partial agg — no self-join of the failed-rule rows") {
    val p = plan("q100_filter_attribution")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"pair counting must partial-aggregate map-side:\n$p")
    // the ≤25-per-doc pair expansion happens row-local (Generate);
    // a SortMergeJoin/ShuffledHashJoin here would be the failed×failed
    // self-join shuffle the scale shape forbids
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffled self-join of failed rules:\n$p")
    assert(p.contains("Generate explode"),
      s"pair expansion must be a row-local explode:\n$p")
  }

  test("q101_hard_negatives: dense-set subtraction is an anti-join on " +
    "candidate-sized frames — no cartesian anywhere") {
    val p = plan("q101_hard_negatives")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("LeftAnti"),
      s"the dense set must subtract via anti-join, not a filter scan:\n$p")
  }

  test("q102_canonical_by_rank: components and ranks both read " +
    "materialized frames — no LSH replay, no cartesian") {
    val p = plan("q102_canonical_by_rank")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // both the component side and the rank side must serve from pinned
    // frames (nearDupEdges pin + per-round pins) — the returned plan
    // re-running the LSH candidate chain per action is the scale bug
    assert(p.contains("Scan ExistingRDD"),
      s"must serve from pinned frames:\n$p")
    assert(!p.contains("band_key"),
      s"the LSH chain must not replay in the returned plan:\n$p")
  }

  test("q103_pca_power: the returned frame is the O(dims) driver " +
    "result — no corpus replay per downstream action") {
    // the 3 power-iteration passes + trace pass run eagerly with the
    // centered frame persisted; the returned loadings are literal rows
    val p = plan("q103_pca_power")
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      s"loadings must be materialized driver-side, not a lazy corpus plan:\n$p")
    assert(!p.contains("parquet"),
      s"no corpus scan may remain in the returned plan:\n$p")
  }

  test("q104_anisotropy: the returned frame is the O(1) driver result " +
    "— per-element lambdas must not appear in the stage plans") {
    val p = plan("q104_anisotropy")
    assert(p.contains("LocalTableScan"),
      s"the two-row audit must be materialized driver-side:\n$p")
    assert(!p.contains("parquet"),
      s"no corpus scan may remain in the returned plan:\n$p")
  }

  test("q105_skew_profile: per-key counts partial-aggregate map-side; " +
    "no join anywhere in the profile") {
    val p = plan("q105_skew_profile")
    assert(!p.contains("Join"), s"the profile is pure aggregation:\n$p")
    assert(p.contains("partial_count"),
      s"per-key counting must partial-aggregate:\n$p")
  }

  test("q92_probe_margin: margin cut is TakeOrdered over the narrow " +
    "scoring pass — no join, no corpus-wide window") {
    val p = plan("q92_probe_margin")
    assert(!p.contains("Join"),
      s"scoring must attach weights as literals, not a join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the uncertainty cut must be a distributed top-n merge:\n$p")
  }

  test("q106_js_drift: both halves counted in ONE partial-agged pass; " +
    "scalars attach by broadcast only") {
    val p = plan("q106_js_drift")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_sum"),
      s"half-counting must partial-aggregate map-side:\n$p")
    // exactly one scan of events: the midpoint + the counts reuse it
    assert("FileScan parquet|Scan parquet".r.findAllIn(p).size <= 2,
      s"the timeline must not be scanned per half:\n$p")
  }

  test("q109_embed_outliers: per-dim stats broadcast back; top-20 is " +
    "TakeOrdered, never a global sort") {
    val p = plan("q109_embed_outliers")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 64-row stats frame must attach by broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the outlier cut must be a distributed top-n merge:\n$p")
  }

  test("q110_shard_audit: expected-count grid is broadcast crosses of " +
    "O(shards)/O(langs) aggregates — the corpus shuffles once") {
    val p = plan("q110_shard_audit")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"cell counting must partial-aggregate map-side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"grid joins are tiny-side broadcasts, never shuffled:\n$p")
  }

  test("q111_distinct_ngrams: count-distinct partial-aggregates on " +
    "(source, gram) — no corpus-wide distinct, no cartesian") {
    val p = plan("q111_distinct_ngrams")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"gram counting must partial-aggregate map-side:\n$p")
    assert(p.contains("Generate explode"),
      s"tokenization must be a row-local explode:\n$p")
  }

  test("q112_entity_match: candidates from an EQUI-join on the blocking " +
    "key — never probe×corpus") {
    val p = plan("q112_entity_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"entity matching must block, not cross:\n$p")
    assert(p.contains("_nk"), s"the blocking key must drive the join:\n$p")
  }

  test("q113_burstiness: integer sums partial-aggregate; top-20 is " +
    "TakeOrdered, never a global sort") {
    val p = plan("q113_burstiness")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"term stats must partial-aggregate map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the bursty-term cut must be a distributed top-n merge:\n$p")
  }

  test("q114_shard_wasserstein: one corpus count pass; everything else " +
    "runs on the O(shards × values) grid") {
    val p = plan("q114_shard_wasserstein")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"value counting must partial-aggregate map-side:\n$p")
    // exactly the two corpus aggregations (global + per-shard counts);
    // shard space is enumerated (range), N folds from the grid — the
    // windowed CDF math must NOT re-scan the corpus
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 2,
      s"the corpus must not be re-scanned for the grid math:\n$p")
  }

  test("q115_time_decay_mix: one weighted pass after the max; totals " +
    "via window over the O(categories) frame") {
    val p = plan("q115_time_decay_mix")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_sum"),
      s"weighted counting must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 2,
      s"the timeline must not be scanned per stage:\n$p")
  }

  test("q116_zipf_fit: term counts partial-aggregate; rank window " +
    "partitions by language over the vocab frame; fit sums ride the " +
    "same grouped pass") {
    val p = plan("q116_zipf_fit")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"term counting must partial-aggregate map-side:\n$p")
    // one tokenize scan: vocab and the conditional fit sums come from
    // the SAME grouped pass, not a second corpus read
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"fit sums must reuse the term-count pass:\n$p")
  }

  test("q117_ingest_novelty: first-seen attaches by equi-join on the " +
    "gram hash — never pairwise, never a cross") {
    val p = plan("q117_ingest_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"novelty must not be a theta join:\n$p")
    assert(p.contains("partial_min"),
      s"first-seen must partial-aggregate map-side:\n$p")
  }

  test("q118_minhash_calibration: candidate pairs from the band-key " +
    "equi-join (the q11 shape), never all-pairs") {
    val p = plan("q118_minhash_calibration")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"calibration must never be all-pairs:\n$p")
    assert(p.contains("band_key"), p)
  }

  test("q119_mmr_rerank: candidate generation is a broadcast cosine " +
    "scan + TakeOrdered — the corpus never self-joins") {
    val df = SparkEntry.queries("q119_mmr_rerank")(spark, dir)
    // the returned frame is the O(k) driver rerank result; the plan to
    // audit is the pool query feeding it — rebuild it here exactly
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.cosine
    val e = Tables(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val pool = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(30)
    val p = pool.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"pool cut must be TakeOrdered, not a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"probe vector must broadcast:\n$p")
    assert(df.count() == 10)
  }

  test("q120_loo_influence: one corpus pass — LOO slopes are algebra on " +
    "the O(sources) sums frame, never a per-source rescan") {
    val p = plan("q120_loo_influence")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"regression sums must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"LOO must not rescan the corpus per source:\n$p")
  }

  test("q121_bitext_margin: probe side broadcasts (the q14 contract); " +
    "both rank directions fold as windows over ONE cosine frame") {
    val p = plan("q121_bitext_margin")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"side A must broadcast against side B:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-corpus shuffle join in the pair stage:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 2,
      s"one scan per side — margin math must reuse the cosine frame:\n$p")
  }

  test("q124_bitext_lsh_margin: corpus-corpus candidates from the " +
    "bucket equi-join — never the full cross (the q121 100x lesson)") {
    val p = plan("q124_bitext_lsh_margin")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus-corpus mining must never be all-pairs:\n$p")
    assert(p.contains("bucket"), p)
  }

  test("q122_mad_outliers: both quantile passes are range shuffles " +
    "(partition-bounded memory, the q35 property)") {
    val p = plan("q122_mad_outliers")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("rangepartitioning"),
      s"exactCont must rank-select via a range exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"median/MAD thresholds must broadcast back onto the corpus:\n$p")
  }

  test("q123_heaps_fit: first-seen is a partial-agged min, growth curve " +
    "is a windowed cumsum — no sequential scan, no cross") {
    val p = plan("q123_heaps_fit")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_min"),
      s"word first-seen must partial-aggregate map-side:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"cumulative axes must fold as windows:\n$p")
  }

  test("q125_event_funnel: each step is a pushed-down type filter + " +
    "per-user partial min; steps chain on user_id equi-joins") {
    val p = plan("q125_event_funnel")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_min"),
      s"step timestamps must partial-aggregate map-side:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("event_type"),
      s"the step's type filter must reach the event scan:\n$p")
  }

  test("q126_retention_cohorts: one distinct (user, week) pass; cohort " +
    "sizes attach via window over the matrix, not a rescan") {
    val p = plan("q126_retention_cohorts")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the event log feeds the distinct pass and the first-week agg —
    // both branches of one scan subtree; no third read for cohort sizes
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 2,
      s"cohort sizes must come from the matrix window:\n$p")
  }

  test("q128_event_transitions: one lead() window per user, then " +
    "partial-agged (from, to) counts; row sums via the matrix window") {
    val p = plan("q128_event_transitions")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"transition counts must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"the event log must be scanned once:\n$p")
  }

  test("q129_survival_km: per-user firsts partial-aggregate; the KM " +
    "table is windows over the O(durations) frame, horizon broadcasts") {
    val p = plan("q129_survival_km")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_min"),
      s"per-user firsts must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row horizon must broadcast:\n$p")
  }

  test("q130_ab_ztest: one per-user pass, one O(1) summary row — no " +
    "per-arm rescan of the event log") {
    val p = plan("q130_ab_ztest")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      s"per-user derivation must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"first-view and purchase list fold in ONE event-log pass:\n$p")
  }

  test("q131_error_spike: one partial-agged count pass; trailing stats " +
    "are windows over the O(days) frame") {
    val p = plan("q131_error_spike")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"day counting must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"the event log must be scanned once:\n$p")
  }

  test("q133_corpus_diff: the diff is ONE full outer join on " +
    "(source, hash) over per-side distinct sets") {
    val p = plan("q133_corpus_diff")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"snapshot diff must be an equi-join:\n$p")
    assert(p.contains("FullOuter"), s"full outer on (source, hash):\n$p")
  }

  test("q134_token_entropy: term counts partial-aggregate; totals ride " +
    "a window over the vocab frame, never a second corpus scan") {
    val p = plan("q134_token_entropy")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"term counting must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"entropy sums must reuse the term-count pass:\n$p")
  }

  test("q135_source_overlap: pairs from an equi-join on the shingle " +
    "hash; sizes broadcast — never a sources² × corpus cross") {
    val p = plan("q135_source_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"overlap must be hash-equi-joined:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the O(sources) size frames must broadcast:\n$p")
  }

  test("q136_local_supplier_volume: 6-table join — dims broadcast, " +
    "facts equi-join, date filter reaches the orders scan") {
    val p = plan("q136_local_supplier_volume")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"nation/region must broadcast:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderdate"),
      s"the year filter must reach the orders scan:\n$p")
  }

  test("q137_market_share: numerator and denominator in ONE grouped " +
    "pass — each table scanned once") {
    val p = plan("q137_market_share")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 5,
      s"conditional sum must not fork the join into two branches:\n$p")
  }

  test("q139_part_value_share: per-part sums partial-aggregate; totals " +
    "attach as a broadcast one-row aggregate, part names broadcast") {
    val p = plan("q139_part_value_share")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_sum"),
      s"per-part sums must partial-aggregate map-side:\n$p")
    // the per-part frame feeds the rows AND the 1-row total — the two
    // branches canonicalize identically, so ReuseExchange computes the
    // fact shuffle once at runtime (2 scans in the pre-AQE text)
    assert("Scan parquet.*lineitem|FileScan parquet.*lineitem".r
      .findAllIn(p).size <= 2,
      s"the fact table feeds at most the rows + totals branches:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"part names must broadcast:\n$p")
  }

  test("q140_rfm_segments: one fact pass; quartiles are broadcast " +
    "thresholds, never a global rank window over the customer frame") {
    val p = plan("q140_rfm_segments")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"per-customer summary must partial-aggregate map-side:\n$p")
    // orders feeds the summary AND the 1-row horizon max — 2 scans max
    // in the returned plan (the exactCont threshold pass pinned its
    // input eagerly and serves from the checkpoint)
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 2,
      s"the threshold cut must not rescan the fact table:\n$p")
    assert(!p.contains("ntile"),
      s"quartiles must be threshold cuts, not global ntile windows:\n$p")
    // the 1-row threshold frame attaches by broadcast
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"thresholds must broadcast onto the customer frame:\n$p")
  }

  test("q141_basket_affinity: pairs explode WITHIN an order (equi-join " +
    "on the order key); marginals and order count broadcast") {
    val p = plan("q141_basket_affinity")
    assert(!p.contains("CartesianProduct"),
      s"basket pairs must never be a catalog cross:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"brand marginals must broadcast:\n$p")
  }

  test("q143_seasonality: one partial-agged fact pass; chi-square folds " +
    "over the O(12) frame") {
    val p = plan("q143_seasonality")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"month counting must partial-aggregate map-side:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"the fact table must be scanned once:\n$p")
  }

  test("q145_vocab_coverage: one tokenize pass; the rank frame is a " +
    "distributed TakeOrdered of max(Ks) rows, never a global vocab window") {
    val p = plan("q145_vocab_coverage")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count"),
      s"term counting must partial-aggregate map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-max(Ks) cut must be a distributed top-k merge:\n$p")
    // the term-count frame feeds the TakeOrdered AND the 1-row
    // vocab/total aggregate — identical canonical subtrees, so
    // ReuseExchange computes the tokenize shuffle once at runtime
    // (2 scans in the pre-AQE text)
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 2,
      s"coverage points must reuse the term-count pass:\n$p")
  }

  test("q146_prefix_dup: hash-only opener groups, top-10 is TakeOrdered") {
    val p = plan("q146_prefix_dup")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be TakeOrdered, not a global sort:\n$p")
  }

  test("q147_feature_corr: all 14 sufficient statistics in ONE corpus " +
    "pass; correlations are algebra on the single summary row") {
    val p = plan("q147_feature_corr")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"the correlation matrix must not rescan the corpus per pair:\n$p")
  }

  test("q148_priority_late: the EXISTS is a LEFT SEMI join — no order " +
    "duplication, date filter at the orders scan") {
    val p = plan("q148_priority_late")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderdate"),
      s"the quarter filter must reach the orders scan:\n$p")
  }

  test("q149_revenue_concentration: one fact pass; ranks from the " +
    "range-partitioned row number (pinned), totals broadcast") {
    val p = plan("q149_revenue_concentration")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_sum"),
      s"per-customer revenue must partial-aggregate map-side:\n$p")
    // the totals branch is the only parquet read in the returned plan;
    // the ranked frame serves from the eager range-partition checkpoint
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size <= 1,
      s"the cut points must not rescan the fact table:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"ranks must serve from the pinned range partitioning:\n$p")
    // per-partition rank windows only — the offsets attach by broadcast
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"partition offsets must broadcast:\n$p")
  }

  test("q151_shipping_priority: top-10 is TakeOrdered; both date " +
    "filters reach their scans; no cartesian") {
    val p = plan("q151_shipping_priority")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the revenue cut must be a distributed top-k merge:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderdate") &&
      p.contains("l_shipdate"),
      s"both date predicates must reach their parquet scans:\n$p")
  }

  test("q154_returned_items: aggregate-then-attach — the 20-row cut " +
    "broadcasts INTO the customer dim, wide attributes never ride the " +
    "fact aggregation") {
    val p = plan("q154_returned_items")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the revenue cut must be a distributed top-k merge:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the cut must broadcast into customer/nation:\n$p")
    // exactly one corpus-keyed aggregation exchange (the per-customer
    // revenue); the attach joins add none
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"attach joins must not re-shuffle ($hashEx):\n$p")
  }

  test("q157_large_orders: qualifying set joins by key with NO broadcast " +
    "hint — fact-proportional, AQE decides; top-20 is TakeOrdered") {
    val p = plan("q157_large_orders")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the attach joins must stay equi-joins:\n$p")
    assert(p.contains("partial_sum"),
      s"per-order quantity must partial-aggregate map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a distributed top-k merge:\n$p")
  }

  test("q159_idle_wealthy: derived scalars broadcast; the recency cut " +
    "is an anti-join, never a NOT-IN cross") {
    val p = plan("q159_idle_wealthy")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("LeftAnti"),
      s"the no-recent-order cut must be an anti-join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"the one-row threshold/cutoff scalars must broadcast:\n$p")
  }

  test("q160_partition_prune: the day predicate resolves at planning " +
    "time — PartitionFilters on the scan, not a row filter") {
    // plan() builds the day-partitioned table as a side effect; the
    // RETURNED rollup must then prune directories, not filter rows
    val p = plan("q160_partition_prune")
    assert(p.contains("PartitionFilters: ["),
      s"the day bounds must be partition filters:\n$p")
    assert(p.contains("PartitionFilters: [isnotnull(day") ||
      "PartitionFilters: \\[[^\\]]*day".r.findFirstIn(p).isDefined,
      s"the day column must drive the pruning:\n$p")
    // the data filter list must NOT re-check the day bounds row-wise
    assert(!"PushedFilters: \\[[^\\]]*day".r.findFirstIn(p).isDefined,
      s"day must prune at planning time, not push down as a row filter:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"the rollup must partial-aggregate map-side:\n$p")
  }

  // ------------------------------------------------------ single-reducer sweep
  /** The automated guard the q140 episode called for (round-11 verdict
    * §"What's wrong"): the global-window anti-pattern shipped one round
    * AFTER it was documented, because per-query audits rely on the
    * author remembering. This sweep walks EVERY `SparkEntry.queries`
    * physical plan and fails on any window whose partition spec is
    * empty or all-foldable (every row lands on ONE reducer) unless the
    * frame is provably bounded — a LIMIT / TakeOrdered sits below it —
    * or the site is whitelisted here with its boundedness argument.
    * Whitelist entries are claims subject to review, not exemptions:
    * each names the O(small) frame the window runs over.
    */
  test("single-reducer sweep: no unpartitioned window over an unbounded frame") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExecBase
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
      LocalTableScanExec, TakeOrderedAndProjectExec}

    val whitelist: Map[String, String] = Map(
      "q106_js_drift" ->
        "totals window over the O(event-type categories) counts frame",
      "q115_time_decay_mix" ->
        "totals window over the O(event-type categories) weighted frame",
      "q120_loo_influence" ->
        "totals window over the O(sources) regression-sums frame",
      "q125_event_funnel" ->
        "lag window over the 3-row funnel-steps frame",
      "q129_survival_km" ->
        "KM product windows over the O(horizon-days) durations frame",
      "q131_error_spike" ->
        "trailing-stats windows over the O(days) daily frame",
      "q143_seasonality" ->
        "totals window over the O(12) month frame",
      "q149_revenue_concentration" ->
        "offset cumsum over the O(spark.sql.shuffle.partitions) frame")

    def boundedBelow(p: SparkPlan): Boolean =
      p.find {
        case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
             _: CollectLimitExec | _: LocalTableScanExec => true
        case _ => false
      }.isDefined

    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // sparkPlan (pre-AQE, pre-preparation): window nodes carry their
        // real partition expressions and no adaptive wrapper hides them
        val sp = fn(spark, dir).queryExecution.sparkPlan
        val bad = sp.collect {
          case w: WindowExecBase
              if w.partitionSpec.forall(_.foldable) &&
                !boundedBelow(w.child) &&
                !whitelist.contains(name) =>
            w.nodeName
        }
        spark.sharedState.cacheManager.clearCache()
        bad.map(n => s"$name: $n")
    }
    assert(violations.isEmpty,
      s"single-partition window exchanges over unbounded frames:\n" +
        violations.mkString("\n") +
        "\nEither re-shape (exactCont thresholds / range-partitioned " +
        "rank / broadcast one-row totals) or whitelist with a " +
        "boundedness argument.")
    // the whitelist must not rot: every entry still names a real query
    val stale = whitelist.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"whitelisted queries no longer exist: $stale")
  }

  test("q161_curriculum_sketch: sketch thresholds shed the range " +
    "exchange q94's exactCont pays; one corpus pass per stage, " +
    "map-side combined") {
    val p = plan("q161_curriculum_sketch")
    // the ONLY rangepartitioning allowed is the final 4-row ORDER BY;
    // a second one means the exactCont machinery crept back in
    assert("rangepartitioning".r.findAllIn(p).size <= 1,
      s"the GK-sketch form must not range-exchange the corpus:\n$p")
    assert(p.contains("percentile_approx"), p)
    assert(p.contains("partial_"),
      s"sketch and rank sums must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row threshold frame must broadcast onto the rank pass:\n$p")
  }

  test("q162_entity_union_blocking: all four blockings are equi-joins " +
    "on the variant key — never probe x corpus") {
    val p = plan("q162_entity_union_blocking")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("SortMergeJoin") || p.contains("_bk"),
      s"candidates must come from the _bk equi-join:\n$p")
    assert(p.contains("_bk"), s"blocking key missing from the plan:\n$p")
    // the verify (levenshtein) runs AFTER the blocking join, inside
    // blocks only — it must not appear in any join condition
    assert(!"join.*levenshtein".r.findFirstIn(p.toLowerCase).isDefined,
      s"edit distance must be a post-join filter, not a join predicate:\n$p")
  }

  test("q163_fuzzy_decontaminate: test set broadcasts into band AND " +
    "verify joins; the corpus never hash-shuffles") {
    val p = plan("q163_fuzzy_decontaminate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy decontamination must never be all-pairs:\n$p")
    // three broadcasts: test bands, the candidate list back onto the
    // corpus, and test shingles into the verify join
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"test-side structures and the candidate list must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no join may shuffle the corpus side:\n$p")
    // the only hash exchange is the candidate-pair distinct (rows ∝
    // band agreements, contamination-sized) — a corpus-wide shuffle
    // would add more
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"corpus-scale shuffle crept in:\n$p")
  }

  test("q164_semantic_decontaminate: broadcast (table, bucket) join; " +
    "the corpus never shuffles — the one hash exchange is the " +
    "match-sized pair dedup") {
    val p = plan("q164_semantic_decontaminate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"semantic decontamination must never be all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the test side must broadcast into the bucket join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffled join:\n$p")
    // the 8-table codes and the cosine are map work and the test side
    // broadcasts; the ONLY hash exchange is the (vec, test) pair-dedup
    // aggregate, whose rows are table-agreement matches — candidate-
    // sized, never corpus-sized (plus the final ORDER BY range
    // exchange). A second hash exchange would be the corpus shuffling.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"the corpus side must not shuffle:\n$p")
    assert(p.contains("partial_count"),
      s"the pair-dedup aggregate must combine map-side:\n$p")
  }

  test("q166_span_contamination: broadcast-only probe; the single hash " +
    "exchange is the match-sized pair aggregate") {
    val p = plan("q166_span_contamination")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"span contamination must never be all-pairs:\n$p")
    // two broadcasts: the test slice into the host build, the exploded
    // test shingles into the probe join
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"test-side structures must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no join may shuffle the corpus side:\n$p")
    // exactly one hash exchange — the (doc, test) pair count, which is
    // match-sized (only shingle agreements reach it) and map-side
    // combined; a corpus-wide shuffle would add more
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"corpus-scale shuffle crept in:\n$p")
    assert(p.contains("partial_count"),
      s"the pair count must combine map-side before the exchange:\n$p")
  }

  test("q167_span_excision: corpus never shuffles; probe and rewrite " +
    "are broadcast joins") {
    val p = plan("q167_span_excision")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"excision must never be all-pairs:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no join may shuffle the corpus side:\n$p")
    // pool into the probe, matched positions into the rewrite, rewritten
    // rows back onto the corpus: all broadcast
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"probe/rewrite sides must broadcast:\n$p")
    // exactly two hash exchanges, both bounded: the test pool's
    // distinct (benchmark-sized) and the matched-position collect_set
    // (match-sized, partially aggregated) — a third would be the
    // corpus shuffling
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"corpus-scale shuffle crept in:\n$p")
    // the matched-position aggregate executes inside the size gate's
    // pin job (round 17: exciseWithPool counts the pinned matched set
    // before choosing broadcast vs keyed join), so the returned plan
    // reads the pinned relation instead of showing the collect_set —
    // assert the pin is what the rewrite consumes…
    assert(p.contains("ExistingRDD"),
      s"the rewrite must consume the pinned matched relation:\n$p")
    // …and pin the aggregate's own shape on the PRE-pin plan of the
    // matched frame itself (the round-17 audit only checked for SOME
    // pinned relation): the collect_set combines map-side before its
    // one match-sized exchange, and the pool probe broadcasts
    import spark.implicits._
    val toks = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.GraftFunctions.words($"text").as("_w"))
    val pool = Seq(Tuple1(7L)).toDF("h")
    val mp = graft.operators.Contamination
      .matchedPositions(toks, pool, "doc_id")
      .queryExecution.executedPlan.toString
    assert(mp.contains("partial_collect_set"),
      s"the matched-position aggregate must combine map-side:\n$mp")
    assert("Exchange hashpartitioning".r.findAllIn(mp).size == 1,
      s"exactly one (match-sized) exchange feeds the aggregate:\n$mp")
    assert(mp.contains("BroadcastExchange"),
      s"the pool probe must broadcast:\n$mp")
  }

  test("q170_line_dedup: pure per-row map — no hash exchange, no join") {
    val p = plan("q170_line_dedup")
    assert(!p.contains("Exchange hashpartitioning"),
      s"within-doc line dedup must not shuffle:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a per-row rewrite:\n$p")
  }

  test("q171_boilerplate_scrub: line-df aggregate combines map-side; " +
    "never all-pairs") {
    val p = plan("q171_boilerplate_scrub")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the scrub must never be all-pairs:\n$p")
    // the document-frequency count combines before its exchange — at
    // 100 TB this is what keeps the line-hash shuffle boilerplate-thin
    assert(p.contains("partial_count"),
      s"the df aggregate must combine map-side:\n$p")
    // the > maxDf bad set is explicitly broadcast into the probe
    assert(p.contains("BroadcastExchange"),
      s"the boilerplate-sized bad set must broadcast:\n$p")
  }

  test("q173_curation_savings: the per-source ledger combines map-side " +
    "before its exchange; never all-pairs") {
    val p = plan("q173_curation_savings")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the savings ledger must never be all-pairs:\n$p")
    // both the line-df count and the final per-source sums partial-agg
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"aggregates must combine map-side:\n$p")
  }

  /** Companion sweep: no query may plan a CartesianProduct, ever — the
    * per-query pins assert this for the shapes where an all-pairs bug
    * is plausible, but a new query with a missed join key (or a typo
    * that turns an equi-join condition non-equi) ships a cartesian
    * silently until its data grows. Empty whitelist by design: a
    * genuine cross of two >1-row frames has no place in this engine
    * (1-row attaches plan as BroadcastNestedLoopJoin, which is
    * allowed).
    */
  test("cartesian sweep: no CartesianProduct in any query plan") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val sp = fn(spark, dir).queryExecution.sparkPlan
        val bad = sp.collect { case c: CartesianProductExec => c.nodeName }
        spark.sharedState.cacheManager.clearCache()
        bad.map(n => s"$name: $n")
    }
    assert(violations.isEmpty,
      s"cartesian products planned:\n${violations.mkString("\n")}")
  }
}
