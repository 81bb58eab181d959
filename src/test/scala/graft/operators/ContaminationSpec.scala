package graft.operators

import org.apache.spark.sql.functions.{coalesce, col, lit, max, sum}

import graft.SparkSpec

/** [[Contamination.cut]]: contaminated documents removed at the
  * threshold, clean and unshingleable (short) documents kept, schema
  * preserved, and the threshold boundary exact.
  */
class ContaminationSpec extends SparkSpec {

  import spark.implicits._

  // test set: one benchmark doc; corpus: a verbatim copy (100% overlap),
  // a doc sharing exactly one of its 8 shingles, a clean doc, a 2-token
  // doc (unshingleable)
  private val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    .toDF("doc_id", "text")
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy
    (2L, "one two three alpha beta gamma four five six seven"),       // 1 shared shingle
    (3L, "totally unrelated words nothing shared here at all now"),   // clean
    (4L, "too short")                                                 // < 3 tokens
  ).toDF("doc_id", "text")

  test("cut removes overlap >= threshold, keeps clean and short docs") {
    val kept = Contamination.cut(corpus, bench, "doc_id", "text",
      minOverlapFrac = 0.5).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L),
      s"only the verbatim copy crosses 50% overlap, got $kept")

    // doc 2: 1 shared of 8 shingles = 0.125 — a 0.1 threshold cuts it too
    val strict = Contamination.cut(corpus, bench, "doc_id", "text",
      minOverlapFrac = 0.1).collect().map(_.getLong(0)).toSet
    assert(strict == Set(3L, 4L), strict)
  }

  test("scores reports the exact overlap fractions") {
    val s = Contamination.scores(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s(1L) == ((8L, 8L)), "verbatim copy shares all 8 shingles")
    assert(s(2L) == ((1L, 8L)), "one 3-gram window matches")
    assert(!s.contains(3L) && !s.contains(4L),
      "clean/short docs produce no score row at all")
  }

  test("cut preserves the corpus schema") {
    val kept = Contamination.cut(corpus, bench, "doc_id", "text", 0.5)
    assert(kept.schema == corpus.schema)
  }

  // ---- fuzzy (MinHash-LSH cross-relation) form ------------------------

  // the benchmark doc, verbatim in the corpus (jaccard 1.0) and lightly
  // edited (last token changed: most shingles shared — the paraphrased-
  // leak case the exact probe misses once thresholds tighten)
  private val longText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val fuzzyBench = Seq((100L, longText)).toDF("doc_id", "text")
  private val fuzzyCorpus = Seq(
    (1L, longText),                                                   // copy
    (2L, longText.replace("upsilon", "phi")),                         // near-dup
    (3L, "totally unrelated words nothing shared here at all now"),   // clean
    (4L, "too short")                                                 // < 3 tokens
  ).toDF("doc_id", "text")

  test("fuzzyScores finds verbatim AND near-dup cross-relation leaks") {
    val s = Contamination.fuzzyScores(fuzzyCorpus, fuzzyBench, "doc_id",
        "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(s.get((1L, 100L)).contains(1.0), s"verbatim copy at 1.0: $s")
    // near-dup: 18 tokens of 20 unchanged -> 15 of 18 shingles shared,
    // jaccard 15/21 ~ 0.714 — found by banding, verified above 0.5
    assert(s.get((2L, 100L)).exists(j => j > 0.5 && j < 1.0),
      s"edited copy must verify between 0.5 and 1.0: $s")
    assert(!s.keySet.exists { case (c, _) => c == 3L || c == 4L },
      s"clean/short docs must not match: $s")
  }

  test("fuzzyScores honors the jaccard threshold boundary") {
    val strict = Contamination.fuzzyScores(fuzzyCorpus, fuzzyBench,
        "doc_id", "text", minJaccard = 0.99)
      .collect().map(r => r.getLong(0)).toSet
    assert(strict == Set(1L),
      s"at 0.99 only the verbatim copy survives the filter: $strict")
  }

  test("fuzzyCut removes matched docs, keeps clean and short, schema intact") {
    val kept = Contamination.fuzzyCut(fuzzyCorpus, fuzzyBench, "doc_id",
      "text", minJaccard = 0.5)
    assert(kept.schema == fuzzyCorpus.schema)
    assert(kept.collect().map(_.getLong(0)).toSet == Set(3L, 4L))
  }

  // ---- semantic (embedding hyperplane-bucket) form ---------------------

  // 4-dim toy space: the benchmark vector, its exact copy, a tiny
  // perturbation (same bucket at any plane count, cosine ~1), and an
  // antipodal vector (opposite side of every hyperplane when the copy
  // is on one — cosine -1, bucket differs unless all projections flip
  // to the same side, which the exact-negation rules out)
  private val semBench = Seq((100L, Seq(1.0, 2.0, 3.0, 4.0)))
    .toDF("vec_id", "embedding")
  private val semCorpus = Seq(
    (1L, Seq(1.0, 2.0, 3.0, 4.0)),      // copy
    (2L, Seq(1.01, 2.0, 3.0, 4.0)),     // near-identical
    (3L, Seq(-1.0, -2.0, -3.0, -4.0))   // antipodal
  ).toDF("vec_id", "embedding")

  test("semanticScores finds the copy and the perturbed copy, not the antipode") {
    val s = Contamination.semanticScores(semCorpus, semBench, "vec_id",
        "embedding", dims = 4, planes = 4, minCos = 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s.get(1L).contains(1.0), s"exact copy at cos 1.0: $s")
    assert(s.get(2L).exists(c => c > 0.9 && c <= 1.0), s"perturbed copy: $s")
    assert(!s.contains(3L), s"antipodal vector must not match: $s")
  }

  test("semanticCut removes matched vectors, schema intact") {
    val kept = Contamination.semanticCut(semCorpus, semBench, "vec_id",
      "embedding", dims = 4, planes = 4, minCos = 0.9)
    assert(kept.schema == semCorpus.schema)
    assert(kept.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("semanticScores nprobe recovers a leak one hyperplane away") {
    import org.apache.spark.sql.functions.col
    // fixture verified against the md5 hyperplane arithmetic: the
    // benchmark vector buckets to 11 at (dims=4, planes=4); the
    // corpus vector (a drifted copy, cos ~0.9726) buckets to 10 —
    // Hamming distance exactly 1, so single-bucket agreement misses it
    val drifted = Seq((5L, Seq(1.108, 1.597, 1.674, 4.022)))
      .toDF("vec_id", "embedding")
    // the premise itself, pinned: buckets differ (guards fixture rot
    // against any future change to the hyperplane family)
    val b = drifted.unionAll(semBench)
      .select(Similarity.hyperplaneBucket(col("embedding"), 4, 4))
      .collect().map(_.getInt(0))
    assert(b(0) != b(1), s"fixture rotted: buckets now agree (${b.toSeq})")

    val single = Contamination.semanticScores(drifted, semBench, "vec_id",
      "embedding", dims = 4, planes = 4, minCos = 0.9).collect()
    assert(single.isEmpty,
      s"nprobe=1 must miss the cross-boundary leak: ${single.toSeq}")

    // nprobe = planes+1 probes every Hamming-1 bucket neighbor — the
    // leak is found by construction, at test-side fan-out cost only
    val probed = Contamination.semanticScores(drifted, semBench, "vec_id",
        "embedding", dims = 4, planes = 4, minCos = 0.9, nprobe = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(probed.length == 1 && probed.head._1 == 5L &&
      probed.head._2 > 0.97,
      s"nprobe=5 must recover the leak exactly once: ${probed.toSeq}")
  }

  test("minCos accepts the full cosine range; -1 disables the verify filter") {
    // minCos = -1 keeps every bucket-agreement pair — the raw candidate
    // set a recall harness counts as the cost side of the dial
    val cand = Contamination.semanticScores(semCorpus, semBench, "vec_id",
        "embedding", dims = 4, planes = 4, minCos = -1.0)
      .collect().map(_.getLong(0)).toSet
    assert(cand.contains(1L) && cand.contains(2L),
      s"same-bucket pairs must survive an always-true threshold: $cand")
    intercept[IllegalArgumentException] {
      Contamination.semanticScores(semCorpus, semBench, "vec_id",
        "embedding", dims = 4, planes = 4, minCos = -1.5)
    }
  }

  // ---- span (benchmark-embedded-in-host) form --------------------------

  // the benchmark item (10 tokens -> 8 shingles), quoted verbatim inside
  // a 22-token host (20 shingles): every test shingle appears in the
  // host, so test-side coverage is 1.0 while the corpus-side fraction
  // rung 1 measures is 8/20 = 0.4 — the dilution gap spanScores exists
  // to close
  private val spanBench =
    Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
  private val spanCorpus = Seq(
    (1L, "one two three four five six alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa seven eight nine ten eleven twelve"), // host
    (2L, "one two three alpha beta gamma four five six seven"), // 1 shingle
    (3L, "totally unrelated words nothing shared here at all now"),
    (4L, "too short")
  ).toDF("doc_id", "text")

  test("spanScores measures coverage from the test side") {
    val s = Contamination.spanScores(spanCorpus, spanBench, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    assert(s(1L) == ((1.0, 0.4)),
      s"embedded copy: coverage 1.0, dilution 8/20: $s")
    assert(s(2L) == ((0.125, 0.125)), s"one shared shingle of 8: $s")
    assert(!s.contains(3L) && !s.contains(4L),
      s"clean/short docs produce no row: $s")
  }

  test("spanScores catches the embedded leak rung 1 dilutes away") {
    // the premise, pinned on rung 1 itself: the host's corpus-side
    // fraction reads 0.4 — below any sane decontamination threshold —
    // while the test-side coverage is exactly 1.0
    val rung1 = Contamination.scores(spanCorpus, spanBench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rung1(1L) == 0.4, s"rung 1 sees the diluted fraction: $rung1")
    val span = Contamination.spanScores(spanCorpus, spanBench,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(span(1L) == 1.0, s"span coverage is host-length-invariant: $span")
  }

  test("spanCut removes embedding hosts, keeps the rest, schema intact") {
    val kept = Contamination.spanCut(spanCorpus, spanBench, "doc_id",
      "text", minCoverage = 0.9)
    assert(kept.schema == spanCorpus.schema)
    assert(kept.collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    // a 0.1 threshold cuts the single-shingle doc (0.125) too
    val strict = Contamination.spanCut(spanCorpus, spanBench, "doc_id",
      "text", minCoverage = 0.1).collect().map(_.getLong(0)).toSet
    assert(strict == Set(3L, 4L), strict)
  }

  test("spanExcise removes exactly the quoted span, keeps the host") {
    val out = Contamination.spanExcise(spanCorpus, spanBench,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // host: the 10 embedded benchmark tokens excised, filler intact
    assert(out(1L) == (("one two three four five six seven eight nine " +
      "ten eleven twelve", 10L)), out(1L))
    // doc 2 shares ONE shingle ("alpha beta gamma"): its 3 covered
    // tokens go, the rest stay
    assert(out(2L) == (("one two three four five six seven", 3L)), out(2L))
    // clean and unshingleable docs pass through byte-identical
    assert(out(3L)._1.startsWith("totally unrelated") && out(3L)._2 == 0L)
    assert(out(4L) == (("too short", 0L)), out(4L))
  }

  test("spanExcise drops residues below minKeepTokens; second pass " +
    "excises nothing on embedded-copy fixtures") {
    // a verbatim whole-doc copy is fully covered -> empty residue ->
    // dropped at the default minKeepTokens = 1
    val withCopy = spanCorpus.unionByName(
      Seq((5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text"))
    val once = Contamination.spanExcise(withCopy, spanBench,
      "doc_id", "text")
    assert(!once.collect().map(_.getLong(0)).contains(5L),
      "fully-excised doc must be dropped")
    // re-applying to the cleaned corpus excises nothing more
    val again = Contamination.spanExcise(once.drop("n_excised"),
        spanBench, "doc_id", "text")
      .agg(sum(col("n_excised"))).collect()(0).getLong(0)
    assert(again == 0L, s"second pass excised $again tokens")
    // post-excision coverage: no surviving doc reaches the cut bar
    val resid = Contamination.spanScores(once.drop("n_excised"),
        spanBench, "doc_id", "text")
      .agg(coalesce(max(col("coverage")), lit(0.0))).collect()(0).getDouble(0)
    assert(resid == 0.0, s"residual coverage $resid")
  }

  // ---- multi-table semantic form ---------------------------------------

  test("semanticScoresMulti finds the copy and the perturbed copy in " +
    "every table, never the antipode") {
    val s = Contamination.semanticScoresMulti(semCorpus, semBench, "vec_id",
        "embedding", dims = 4, planesPerTable = 2, tables = 3, minCos = -1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // the exact copy agrees in ALL tables (identical vector, identical
    // codes) at cos 1.0
    assert(s.get(1L).contains((3L, 1.0)), s"copy in all 3 tables: $s")
    assert(s.contains(2L), s"perturbed copy must be a candidate: $s")
    // the antipode flips every nonzero projection, so no table agrees —
    // it is not even a CANDIDATE (minCos = -1 keeps all candidates)
    assert(!s.contains(3L), s"antipodal vector must not match: $s")
  }

  test("semanticScoresMulti with one table == semanticScores at the " +
    "same planes (plane family offset 0 is the single code)") {
    val single = Contamination.semanticScores(semCorpus, semBench, "vec_id",
        "embedding", dims = 4, planes = 3, minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val multi = Contamination.semanticScoresMulti(semCorpus, semBench,
        "vec_id", "embedding", dims = 4, planesPerTable = 3, tables = 1,
        minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(multi == single, s"multi(1 table) $multi != single $single")
  }

  test("adding tables only adds candidates — the OR-composition is " +
    "monotone in recall and cost") {
    def run(t: Int) = Contamination.semanticScoresMulti(semCorpus, semBench,
        "vec_id", "embedding", dims = 4, planesPerTable = 2, tables = t,
        minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val t1 = run(1); val t4 = run(4)
    assert(t1.keySet.subsetOf(t4.keySet),
      s"tables=1 pairs ${t1.keySet} must survive at tables=4 ${t4.keySet}")
    t1.foreach { case (pair, n) =>
      assert(t4(pair) >= n, s"$pair: n_tables must not shrink with tables")
    }
  }

  test("semanticCutMulti removes matched vectors, schema intact") {
    val kept = Contamination.semanticCutMulti(semCorpus, semBench, "vec_id",
      "embedding", dims = 4, planesPerTable = 2, tables = 3, minCos = 0.9)
    assert(kept.schema == semCorpus.schema)
    assert(kept.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  // ---- excise fixpoint + df-cap ----------------------------------------

  test("exciseToFixpoint closes the adversarial splice a single pass " +
    "leaves behind") {
    // pool carries "a b c" AND "p q r"; the corpus doc interleaves
    // them: excising the quoted "a b c" SPLICES the leftover fragments
    // into a verbatim "p q r" — a benchmark item assembled BY the cut
    val spliceBench = Seq(
      (100L, "a b c"), (101L, "p q r")).toDF("doc_id", "text")
    val spliceCorpus = Seq(
      (1L, "p q a b c r"),
      (2L, "x y z a b c w v u"), // plain embedded quote: 1 pass converges
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val pool = spliceBench
      .select(org.apache.spark.sql.functions.explode(
        Contamination.shingleSet(col("text"))).as("h")).distinct()
    // the premise, pinned: ONE pass leaves doc 1 as exactly the
    // assembled benchmark item
    val once = Contamination.exciseWithPool(spliceCorpus, pool,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(once(1L) == (("p q r", 3L)), s"single pass: ${once(1L)}")
    // the fixpoint re-excises the splice: doc 1 empties and is dropped;
    // doc 2 converges in one pass with its quote gone; doc 3 untouched
    val fix = Contamination.exciseToFixpoint(spliceCorpus, pool,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(!fix.contains(1L),
      s"fixpoint must remove the assembled benchmark item: $fix")
    assert(fix(2L) == (("x y z w v u", 3L)), s"doc 2: ${fix(2L)}")
    assert(fix(3L) == (("totally unrelated words here", 0L)), s"doc 3: ${fix(3L)}")
    // and the result really is a fixed point: a further pass is a no-op
    val again = Contamination.exciseWithPool(
        fix.keys.toSeq.map(k => (k, fix(k)._1)).toDF("doc_id", "text"),
        pool, "doc_id", "text")
      .agg(sum(col("n_excised"))).collect()(0).getLong(0)
    assert(again == 0L, s"fixpoint output re-excised $again tokens")
  }

  test("excision broadcast gate: an over-threshold matched/touched set " +
    "takes the keyed-join path, outputs identical") {
    // every doc quotes the pool shingle — the matched/touched sets are
    // the WHOLE corpus, the boilerplate-heavy shape the size gate
    // exists for; broadcastLimit = 1 forces the fallback while the
    // default limit broadcasts as before
    val wideCorpus = (0 until 12).map { i =>
      (i.toLong, s"u$i v$i quoted span here w$i x$i")
    }.toDF("doc_id", "text")
    val bench = Seq((100L, "quoted span here")).toDF("doc_id", "text")
    val pool = bench
      .select(org.apache.spark.sql.functions.explode(
        Contamination.shingleSet(col("text"))).as("h")).distinct()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val bcast = Contamination.exciseWithPool(wideCorpus, pool,
      "doc_id", "text")
    val keyed = Contamination.exciseWithPool(wideCorpus, pool,
      "doc_id", "text", broadcastLimit = 1L)
    assert(rows(keyed) == rows(bcast),
      "the degraded path must rewrite identically")
    // the gate is real: under the default limit the matched AND
    // rewritten joins carry explicit broadcast hints; past the limit
    // only the (bounded-by-contract) pool broadcast remains. The tiny
    // fixture may still AUTO-broadcast physically — the gate removes
    // the unconditional HINT, which is what would force a broadcast
    // regardless of size at scale.
    def nHints(d: org.apache.spark.sql.DataFrame) =
      "ResolvedHint".r.findAllIn(d.queryExecution.analyzed.toString).length
    assert(nHints(bcast) == nHints(keyed) + 2,
      s"the gate must strip exactly the matched+rewritten hints: " +
        s"${nHints(bcast)} vs ${nHints(keyed)}")
    val fixB = Contamination.exciseToFixpoint(wideCorpus, pool,
      "doc_id", "text")
    val fixK = Contamination.exciseToFixpoint(wideCorpus, pool,
      "doc_id", "text", broadcastLimit = 1L)
    assert(rows(fixK) == rows(fixB),
      "fixpoint's degraded path must rewrite identically")
  }

  test("excision BYTE gate: few rows with huge per-doc payloads take " +
    "the keyed path even under the row limit, outputs identical") {
    // 3 long hosts, each quoting the pool shingle once — the row count
    // is trivially small, but `rewritten` would broadcast each host's
    // FULL text: the regime the round-17 row gate waved through
    val longCorpus = (0 until 3).map { i =>
      val filler = (0 until 50).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$filler quoted span here")
    }.toDF("doc_id", "text")
    val bench = Seq((100L, "quoted span here")).toDF("doc_id", "text")
    val pool = bench
      .select(org.apache.spark.sql.functions.explode(
        Contamination.shingleSet(col("text"))).as("h")).distinct()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    def nHints(d: org.apache.spark.sql.DataFrame) =
      "ResolvedHint".r.findAllIn(d.queryExecution.analyzed.toString).length
    val bcast = Contamination.exciseWithPool(longCorpus, pool,
      "doc_id", "text")
    // rewritten's estimate (3·24 + 159 tokens · 8 ≈ 1.3 KB) trips a
    // 500-byte ceiling; matched's (3·16 + 3 positions · 4 = 60 B) does
    // not — exactly one hint (the text-carrying join) must strip
    val keyedText = Contamination.exciseWithPool(longCorpus, pool,
      "doc_id", "text", broadcastBytes = 500L)
    assert(rows(keyedText) == rows(bcast),
      "the byte-degraded path must rewrite identically")
    assert(nHints(bcast) == nHints(keyedText) + 1,
      s"only the rewritten hint strips at 500 B: ${nHints(bcast)} vs " +
        s"${nHints(keyedText)}")
    // a 50-byte ceiling trips both estimates
    val keyedBoth = Contamination.exciseWithPool(longCorpus, pool,
      "doc_id", "text", broadcastBytes = 50L)
    assert(rows(keyedBoth) == rows(bcast),
      "the fully-degraded path must rewrite identically")
    assert(nHints(bcast) == nHints(keyedBoth) + 2,
      s"both hints strip at 50 B: ${nHints(bcast)} vs ${nHints(keyedBoth)}")
  }

  test("excision byte gate prices STRING id payloads: wide ids tip the " +
    "estimate over the ceiling the fixed-width constants would miss") {
    // 3 short hosts, but each id is a 200-char string — the 16/24 B
    // per-row constants see ~200 B total, the real broadcast ships
    // 600 B of ids
    val wideIds = (0 until 3).map { i =>
      (s"doc-${"x" * 196}$i", s"some words around quoted span here $i")
    }.toDF("doc_id", "text")
    val bench = Seq((100L, "quoted span here")).toDF("doc_id", "text")
    val pool = bench
      .select(org.apache.spark.sql.functions.explode(
        Contamination.shingleSet(col("text"))).as("h")).distinct()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    def nHints(d: org.apache.spark.sql.DataFrame) =
      "ResolvedHint".r.findAllIn(d.queryExecution.analyzed.toString).length
    val bcast = Contamination.exciseWithPool(wideIds, pool,
      "doc_id", "text")
    // without the id term: matched ≈ 3·16 + 3·4 = 60 B, rewritten ≈
    // 3·24 + 21·8 = 240 B — both under 450; the 600 B of string ids
    // push both estimates over, so both hints must strip
    val keyed = Contamination.exciseWithPool(wideIds, pool,
      "doc_id", "text", broadcastBytes = 450L)
    assert(rows(keyed) == rows(bcast),
      "the id-priced degraded path must rewrite identically")
    assert(nHints(bcast) == nHints(keyed) + 2,
      s"both hints strip once id bytes are priced: ${nHints(bcast)} vs " +
        s"${nHints(keyed)}")
  }

  test("spanExcise maxDf drops high-document-frequency pool shingles " +
    "from the probe") {
    // the benchmark's first shingle ("a b c") is boilerplate — it
    // appears in 3 corpus docs; its second ("b c d") is distinctive
    val dfBench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val dfCorpus = Seq(
      (1L, "a b c x1 y1 z1"),
      (2L, "a b c x2 y2 z2"),
      (3L, "a b c x3 y3 z3"),
      (4L, "rr b c d w2 w3")).toDF("doc_id", "text")
    // uncapped: every doc sharing a shingle is rewritten
    val free = Contamination.spanExcise(dfCorpus, dfBench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(free == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$free")
    // maxDf = 2: the df-3 boilerplate shingle leaves the pool, so only
    // the distinctive quote is excised
    val capped = Contamination.spanExcise(dfCorpus, dfBench, "doc_id",
        "text", maxDf = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 3L),
      s"only the df<=2 shingle may excise: $capped")
  }

  test("gateBatch excise fixpoint: the splice a single-pass gate ships " +
    "is re-excised at the door") {
    import org.apache.spark.sql.functions.{element_at, split}
    val spliceBench = Seq(
      (100L, "a b c"), (101L, "p q r")).toDF("doc_id", "text")
    // keyVec stand-in: first token — plants below dodge rungs 1-3 (the
    // interleaved doc shares no complete WHOLE-doc identity: overlap
    // 2/4 < 0.8, jaccard 2/4 < 0.5... actually verify via behavior)
    val vec = graft.streaming.StreamingCurationChain.textEmbedding(
      element_at(split(col("text"), " "), 1), dims = 8)
    val probes = Contamination.buildProbes(spliceBench, "doc_id", "text",
      vec, dims = 8, planes = 4)
    try {
      val batch = Seq(
        (1L, "x p q a b c r y"), // splice case: one pass leaves "x p q r y"
        (3L, "totally unrelated words here")).toDF("doc_id", "text")
      val single = Contamination.gateBatch(batch, probes, "doc_id", "text",
          vec, excise = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(single(1L) == "x p q r y",
        s"premise: the single-pass gate ships the assembled quote: $single")
      val fixed = Contamination.gateBatch(batch, probes, "doc_id", "text",
          vec, excise = true, exciseFixpoint = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fixed(1L) == "x y",
        s"fixpoint gate must remove the assembled benchmark item: $fixed")
      assert(fixed(3L) == "totally unrelated words here", s"$fixed")
    } finally Contamination.releaseProbes(probes)
  }

  test("gateBatchReleasable: verdicts identical to gateBatch, and the " +
    "release thunk frees the excise pins a per-batch stream would " +
    "otherwise accumulate") {
    import org.apache.spark.sql.functions.{element_at, split}
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val vec = graft.streaming.StreamingCurationChain.textEmbedding(
      element_at(split(col("text"), " "), 1), dims = 8)
    val probes = Contamination.buildProbes(bench, "doc_id", "text",
      vec, dims = 8, planes = 4)
    try {
      val batch = Seq(
        (1L, "host quotes a b c inside other words"),
        (3L, "totally unrelated words here")).toDF("doc_id", "text")
      def run(fix: Boolean): Unit = {
        val (out, release) = Contamination.gateBatchReleasable(batch,
          probes, "doc_id", "text", vec, excise = true,
          exciseFixpoint = fix)
        val rows = out.collect().map(r =>
          r.getLong(0) -> r.getString(1)).toMap
        val plain = Contamination.gateBatch(batch, probes, "doc_id",
            "text", vec, excise = true, exciseFixpoint = fix)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(rows == plain, s"releasable form must equal gateBatch " +
          s"(fixpoint=$fix): $rows vs $plain")
        release()
        // the release is REAL, observed deterministically: the pins
        // are localCheckpoints (truncated lineage), so once their
        // blocks are unpersisted a FRESH plan over the returned frame
        // cannot recompute them and must fail. Fresh plan each probe
        // (`where(lit(true))` makes a new Dataset): re-collecting the
        // SAME Dataset instance would reuse its already-built
        // broadcast of the matched set and never touch the blocks.
        // unpersist is async — poll until the failure lands (bounded),
        // ignoring interim successes while blocks drain. No global RDD
        // counting here: concurrent suites pin/release their own.
        val deadline = System.nanoTime() + 30000000000L
        var freed = false
        while (!freed && System.nanoTime() < deadline) {
          try { out.where(lit(true)).collect(); Thread.sleep(100) }
          catch { case _: org.apache.spark.SparkException => freed = true }
        }
        assert(freed,
          s"release must actually free the pinned blocks (fixpoint=$fix)")
      }
      run(fix = false)
      run(fix = true)
    } finally Contamination.releaseProbes(probes)
  }

  test("buildProbes maxDf: the frozen pool drops boilerplate shingles " +
    "measured against the reference corpus") {
    import org.apache.spark.sql.functions.{element_at, split}
    val dfBench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    // first tokens differ from the benchmark's, so the rung-3 first-
    // token embedding stand-in cannot refuse the boilerplate docs
    val refCorpus = Seq(
      (1L, "f1 a b c x1 y1 z1"), (2L, "f2 a b c x2 y2 z2"),
      (3L, "f3 a b c x3 y3 z3"), (4L, "rr b c d w2 w3")).toDF("doc_id", "text")
    val vec = graft.streaming.StreamingCurationChain.textEmbedding(
      element_at(split(col("text"), " "), 1), dims = 8)
    val free = Contamination.buildProbes(dfBench, "doc_id", "text", vec,
      dims = 8, planes = 4)
    val capped = Contamination.buildProbes(dfBench, "doc_id", "text", vec,
      dims = 8, planes = 4, maxDf = 2L, dfCorpus = Some(refCorpus))
    try {
      // "a b c" (df 3) leaves the pool; "b c d" (df 1) stays
      assert(free.shinglePool.count() == 2L && capped.shinglePool.count() == 1L,
        s"pool: ${free.shinglePool.count()} -> ${capped.shinglePool.count()}")
      // and the capped gate excises only the distinctive quote
      val out = Contamination.gateBatch(refCorpus, capped, "doc_id", "text",
          vec, excise = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out(1L) == "f1 a b c x1 y1 z1", s"boilerplate kept: $out")
      assert(out(4L) == "rr w2 w3", s"distinctive quote excised: $out")
      // maxDf without a corpus to measure against is refused
      intercept[IllegalArgumentException] {
        Contamination.buildProbes(dfBench, "doc_id", "text", vec,
          dims = 8, planes = 4, maxDf = 2L)
      }
    } finally {
      Contamination.releaseProbes(free)
      Contamination.releaseProbes(capped)
    }
  }

  test("every rung refuses a test side past the broadcast budget") {
    spark.conf.set("graft.contamination.maxTestRows", "2")
    try {
      val bigBench = Seq(
        (101L, "alpha beta gamma delta epsilon zeta"),
        (102L, "eta theta iota kappa lambda mu"),
        (103L, "nu xi omicron pi rho sigma")).toDF("doc_id", "text")
      val bigSem = Seq(
        (101L, Seq(1.0, 0.0, 0.0, 0.0)), (102L, Seq(0.0, 1.0, 0.0, 0.0)),
        (103L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
      val e1 = intercept[IllegalArgumentException] {
        Contamination.scores(corpus, bigBench, "doc_id", "text")
      }
      assert(e1.getMessage.contains("benchmark-sized"), e1.getMessage)
      intercept[IllegalArgumentException] {
        Contamination.fuzzyScores(corpus, bigBench, "doc_id", "text", 0.5)
      }
      intercept[IllegalArgumentException] {
        Contamination.spanScores(corpus, bigBench, "doc_id", "text")
      }
      intercept[IllegalArgumentException] {
        Contamination.semanticScores(semCorpus, bigSem, "vec_id",
          "embedding", dims = 4, planes = 4, minCos = 0.9)
      }
      intercept[IllegalArgumentException] {
        Contamination.semanticScoresMulti(semCorpus, bigSem, "vec_id",
          "embedding", dims = 4, planesPerTable = 2, tables = 2, minCos = 0.9)
      }
      // at the threshold itself the guard admits: exactly max rows pass
      spark.conf.set("graft.contamination.maxTestRows", "3")
      assert(Contamination.scores(corpus, bigBench, "doc_id", "text")
        .columns.nonEmpty)
    } finally spark.conf.unset("graft.contamination.maxTestRows")
  }
}
