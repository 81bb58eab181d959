package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Unit tests for the dedup operator family — in particular the LSH
  * banding edge cases that the oracle queries don't exercise (they filter
  * short docs out before banding).
  */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("lshBands: null signature entries propagate to a NULL band_key") {
    // doc 1: normal; docs 2,3: <3 tokens → empty shingle array → array_min
    // null → every signature entry null. With concat_ws the two empty docs
    // would share one bucket and emit a bogus candidate pair; with
    // null-propagating concat they must not pair at all.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "tiny doc"),
      (3L, "small one")).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
    val sig = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
    val bands = Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)

    val nullKeys = bands.filter($"band_key".isNull)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(nullKeys == Set(2L, 3L), "short docs must get null band keys")
    assert(bands.filter($"doc_id" === 1L && $"band_key".isNull).count() == 0)

    val pairs = Dedup.lshCandidatePairs(bands, "doc_id").collect()
    assert(pairs.isEmpty, "null-band docs must never become candidates")
  }

  test("writeBandIndex: the batch probe joins the corpus from disk with " +
    "no corpus-side shuffle") {
    def bandsOf(docs: org.apache.spark.sql.DataFrame) = {
      val sig = docs.select($"doc_id",
        Dedup.minhashSig(
          Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))), 8).as("sig"))
      Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)
    }
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "lorem ipsum dolor sit amet")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon"), // dup of 1
      (11L, "totally novel content right here")).toDF("doc_id", "text")
    Dedup.writeBandIndex(bandsOf(corpus),
      corpus.select($"doc_id",
        Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh")),
      "doc_id", "graft_spec_bandindex", buckets = 4)
    val (bandsDisk, _) = Dedup.readBandIndex(spark, "graft_spec_bandindex")

    // force the shuffled-join path (a broadcast would trivially have no
    // corpus exchange without demonstrating the bucketed co-location)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pairs = Dedup.lshCrossPairs(bandsOf(batch), bandsDisk, "doc_id")
      val plan = pairs.queryExecution.executedPlan.toString

      // the corpus scan must carry its bucket spec …
      assert(plan.contains("Bucketed: true"),
        s"corpus side must be read as a bucketed scan:\n$plan")
      // … and the ONLY band_key exchange is the batch side hashing into
      // the buckets; a corpus-side exchange would mean the index's
      // co-location was thrown away (re-shuffling the corpus per batch)
      val bandKeyExchanges =
        "Exchange hashpartitioning\\(band_key".r.findAllIn(plan).size
      assert(bandKeyExchanges == 1,
        s"want exactly 1 band_key exchange (batch side), got $bandKeyExchanges:\n$plan")

      // and the probe still finds the planted duplicate
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((10L, 1L)), s"planted dup must surface: $got")
      assert(!got.exists(_._1 == 11L), s"novel doc must not pair: $got")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("writeWinnowIndex/probeWinnowIndex: probe matches winnowPairs on the " +
    "union, reads the corpus bucketed, and the build cap excludes boilerplate") {
    // 8+ shared tokens (k=4, w=5 → guarantee window = 8) between corpus
    // doc 1 and batch doc 10; doc 11 shares nothing
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "totally novel content right here nothing shared at all today"))
      .toDF("doc_id", "text")
    Dedup.writeWinnowIndex(corpus, "doc_id", "text",
      k = 4, w = 5, seed = 11, maxDf = 50, prefix = "graft_spec_winnow",
      buckets = 4)
    val batchFps = batch.select($"doc_id",
      explode(Dedup.winnowFingerprints(words($"text"), 4, 5, 11)).as("fp"))

    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val m = Dedup.probeWinnowIndex(spark, "graft_spec_winnow", batchFps,
        "doc_id", minShared = 2)
      val plan = m.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"corpus postings must be read as a bucketed scan:\n$plan")
      val fpExchanges = "Exchange hashpartitioning\\(fp".r.findAllIn(plan).size
      assert(fpExchanges == 1,
        s"want exactly 1 fp exchange (batch side), got $fpExchanges:\n$plan")

      val got = m.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got.keySet == Set((10L, 1L)), s"probe matches = $got")
      // the probe agrees with the one-shot pair operator on the union
      val oneShot = Dedup.winnowPairs(corpus.union(batch), "doc_id", "text",
          k = 4, w = 5, seed = 11, minShared = 2, maxDf = 50)
        .filter($"id_b" >= 10L && $"id_a" < 10L)
        .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(2)).toMap
      assert(got == oneShot, s"probe $got != one-shot cross pairs $oneShot")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)

    // boilerplate exclusion is a BUILD property: with maxDf = 1 the
    // shared fingerprints (df ≥ 2 across corpus docs 1 and 3's planted
    // copy below) never enter the index, so the probe finds nothing
    val boiler = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    Dedup.writeWinnowIndex(boiler, "doc_id", "text",
      k = 4, w = 5, seed = 11, maxDf = 1, prefix = "graft_spec_winnow_b",
      buckets = 2)
    val none = Dedup.probeWinnowIndex(spark, "graft_spec_winnow_b", batchFps,
      "doc_id", minShared = 1)
    assert(none.count() == 0, "capped fingerprints must not be probeable")
  }

  test("repeatedSpans: cross-doc spans merge; internal-only repetition excluded") {
    val span = (1 to 12).map(i => s"s$i").mkString(" ")      // 12 shared tokens
    val innerRep = (1 to 10).map(i => s"r$i").mkString(" ")  // intra-doc only
    val docs = Seq(
      (1L, s"$span unique one tail follows here"),
      (2L, s"lead in $span"),
      (3L, s"$innerRep $innerRep"), // repeated inside ONE doc: not cross-doc
      (4L, "completely different content with no overlaps at all beyond")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, "doc_id", "text", n = 10)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 12 shared tokens -> 3 shared 10-gram windows (offsets k, k+1, k+2),
    // merging to ONE span covering 12 tokens, in both docs
    assert(got.toSeq == Seq((1L, 3L, 1L, 12L), (2L, 3L, 1L, 12L)), got.toSeq)
  }

  test("simhashNearDup: pigeonhole recall within maxHamming; beyond-k filtered") {
    val base = 0x0000123456789ABCL // 48-bit fingerprint
    val df = Seq(
      (1L, base),
      (2L, base ^ 0x7L),   // 3 bits differ -> MUST surface (guaranteed recall)
      (3L, base ^ 0xFL),   // 4 bits differ, chunks 1-3 still equal -> candidate, filtered
      (4L, base ^ ((1L << 0) | (1L << 12) | (1L << 24) | (1L << 36)))
      // one bit differs in EVERY 12-bit chunk -> not even a candidate
    ).toDF("doc_id", "simhash")
    val got = Dedup.simhashNearDup(df, "doc_id", "simhash", maxHamming = 3, bits = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,2) ham 3; (2,3) ham 1 (0x7^0xF = 0x8); everything else > 3
    assert(got == Set((1L, 2L, 3L), (2L, 3L, 1L)), got)
  }

  test("lshBands: identical docs still collide per band") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
    val sig = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
    val bands = Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("cutRepeatedSpans: canonical doc keeps its copy, later docs lose it, " +
    "unaffected docs pass through") {
    val boiler = "t1 t2 t3 t4"            // shared 4-token span
    val docs = Seq(
      (1L, s"$boiler a b c"),             // canonical owner (min id)
      (2L, s"x y $boiler"),               // loses the span, keeps x y
      (3L, s"$boiler"),                   // nothing but the span → empty
      (4L, "p q r s t u v")               // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(docs, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 7L, s"$boiler a b c")), out(1L))
    assert(out(2L) == ((6L, 2L, "x y")), out(2L))
    assert(out(3L) == ((4L, 0L, "")), out(3L))
    assert(out(4L) == ((7L, 7L, "p q r s t u v")), out(4L))
  }

  test("cutRepeatedSpans: overlapping repeated windows cut their union once") {
    // docs 1/2 share a 6-token run → three overlapping 4-token windows in
    // doc 2; the covered positions must union, not double-cut
    val run = "a b c d e f"
    val docs = Seq(
      (1L, s"$run tail1 tail2"),
      (2L, s"head $run")
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(docs, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((8L, s"$run tail1 tail2")), out(1L))
    assert(out(2L) == ((1L, "head")), out(2L))
  }
}
