package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Contamination

/** The frozen-benchmark decontamination gate: all four rungs fire,
  * union-of-bads parity with the composed one-shot cuts, and the
  * streaming chain refuses planted leaks at the door (replay-safe —
  * the admitted set is identical after a checkpoint replay).
  */
class StreamingBenchmarkGateSpec extends SparkSpec {

  import spark.implicits._

  // the embedding expression both sides agree on: embed the FIRST token
  // only, so a fully-rephrased doc that keeps its key token is
  // embedding-identical to the benchmark while sharing no shingle
  private def keyVec = StreamingCurationChain.textEmbedding(
    element_at(split(col("text"), " "), 1), dims = 8)

  private val benchText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private def bench = Seq((100L, benchText)).toDF("doc_id", "text")

  // P1 verbatim; P2 lightly edited (tokens 1 and 11 swapped — token 1
  // dodges rung 3, and the swaps kill shingles {1, 9, 10} of 10:
  // overlap 7/10 < 0.8 dodges rung 1, Jaccard 7/13 >= 0.5 trips
  // rung 2); P3 rephrased (same first token, all other vocab disjoint —
  // only rung 3 can see it); P4 clean
  private val p1 = (1L, benchText)
  private val p2 = (2L,
    "omega beta gamma delta epsilon zeta eta theta iota kappa nu mu")
  private val p3 = (3L,
    "alpha completely different words that share nothing with the benchmark text")
  private val p4 = (4L,
    "clean unrelated document with its very own fresh vocabulary here")
  // P5 embedded (span): the benchmark quoted verbatim inside a 60-token
  // host. Coverage is 1.0 (every benchmark shingle appears), but the
  // host-side fraction is 10/58 — far under rung 1's 0.8; Jaccard is
  // the same 10/58 < 0.5 so rung 2's verify rejects any band hit; and
  // the host's FIRST token is filler, so keyVec dodges rung 3. Only
  // the span rung can see it.
  private val p5 = (9L,
    (0 until 24).map(i => s"f$i").mkString(" ") + " " + benchText + " " +
      (0 until 24).map(i => s"g$i").mkString(" "))

  private def probes(nprobe: Int = 1) = Contamination.buildProbes(
    bench, "doc_id", "text", keyVec, dims = 8, planes = 4, nprobe = nprobe)

  test("each rung catches its own plant; the clean doc survives") {
    val p = probes()
    try {
      val batch = Seq(p1, p2, p3, p4).toDF("doc_id", "text")
      val kept = Contamination.gateBatch(batch, p, "doc_id", "text", keyVec)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(4L), s"operational thresholds: $kept")
      // strict thresholds disable rung 2's near-dup tolerance: P2 is the
      // only plant that needed it (P1 exact at every rung, P3 cos = 1.0)
      val strict = Contamination.gateBatch(batch, p, "doc_id", "text",
          keyVec, minOverlapFrac = 1.0, minJaccard = 1.0, minCos = 1.0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(strict == Set(2L, 4L), s"strict thresholds: $strict")
    } finally Contamination.releaseProbes(p)
  }

  test("gateBatch is survivor-identical to cut . fuzzyCut . semanticCut " +
    ". spanCut") {
    val p = probes()
    try {
      val batch = Seq(p1, p2, p3, p4, p5,
        (5L, "more clean words sharing beta gamma delta with the benchmark"),
        (6L, "alpha zz")). // 2 tokens: unshingleable, rung 3 still applies
        toDF("doc_id", "text")
      val viaGate = Contamination.gateBatch(batch, p, "doc_id", "text",
          keyVec).select("doc_id").collect().map(_.getLong(0)).toSet
      val benchV = bench.withColumn("v", keyVec)
      val batchV = batch.withColumn("v", keyVec)
      val composed = Contamination.spanCut(
          Contamination.semanticCut(
            Contamination.fuzzyCut(
              Contamination.cut(batchV, benchV, "doc_id", "text", 0.8),
              benchV, "doc_id", "text", 0.5),
            benchV, "doc_id", "v", dims = 8, planes = 4, minCos = 0.9),
          benchV, "doc_id", "text", minCoverage = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaGate == composed, s"gate $viaGate != composed $composed")
    } finally Contamination.releaseProbes(p)
  }

  test("the span rung alone sees the embedded leak; the first three " +
    "rungs dilute it away") {
    val p = probes()
    try {
      val batch = Seq(p4, p5).toDF("doc_id", "text")
      // premise, pinned on the one-shot rungs themselves: without the
      // span rung, P5 survives every cut
      val benchV = bench.withColumn("v", keyVec)
      val batchV = batch.withColumn("v", keyVec)
      val threeRungs = Contamination.semanticCut(
          Contamination.fuzzyCut(
            Contamination.cut(batchV, benchV, "doc_id", "text", 0.8),
            benchV, "doc_id", "text", 0.5),
          benchV, "doc_id", "v", dims = 8, planes = 4, minCos = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(threeRungs == Set(4L, 9L),
        s"the embedded leak must dodge rungs 1-3: $threeRungs")
      // the gate (with rung 4) refuses it
      val kept = Contamination.gateBatch(batch, p, "doc_id", "text", keyVec)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(4L), s"rung 4 must gate the embedded leak: $kept")
    } finally Contamination.releaseProbes(p)
  }

  test("nprobe fan-out widens only the bucket table, never duplicates") {
    val p1probe = probes(nprobe = 1)
    val p5probe = probes(nprobe = 5) // planes + 1: all Hamming-1 buckets
    try {
      assert(p5probe.bucketTable.count() == 5 * p1probe.bucketTable.count())
      val batch = Seq(p1, p3, p4).toDF("doc_id", "text")
      // wider probing may only shrink the admitted set — and each bad id
      // is emitted once (the anti join dedups; no duplicate survivors)
      val k1 = Contamination.gateBatch(batch, p1probe, "doc_id", "text", keyVec)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val k5 = Contamination.gateBatch(batch, p5probe, "doc_id", "text", keyVec)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(k1.distinct == k1 && k5.distinct == k5, "duplicated survivors")
      assert(k5.toSet.subsetOf(k1.toSet), s"nprobe=5 $k5 vs nprobe=1 $k1")
    } finally {
      Contamination.releaseProbes(p1probe)
      Contamination.releaseProbes(p5probe)
    }
  }

  test("gate-then-excise: the quoting host is admitted CLEANED, " +
    "rungs 1-3 still refuse whole-document leaks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("excisechain").toString
    val prefix = "graft_spec_excisechain"
    val p = probes()
    val centroids = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    ).toDF("centroid_id", "centroid_vec")
    val gate = Contamination.BenchmarkGate(p, keyVec, excise = true)
    try {
      lazy val in = MemoryStream[ChainDoc]
      def chain(onStage: (Long, Int) => Unit) = StreamingCurationChain.start(
        in.toDF(), prefix, keptDir = s"$dir/kept", cardDir = s"$dir/card",
        indexDir = s"$dir/ivf", postingsDir = s"$dir/post",
        centroids = centroids, checkpoint = s"$dir/ckpt",
        gate = Some(gate), onStage = onStage)
      in.addData(
        ChainDoc(p1._1, p1._2, "en", "web"),   // verbatim -> rung 1 refuses
        ChainDoc(p2._1, p2._2, "en", "web"),   // edited -> rung 2 refuses
        ChainDoc(p3._1, p3._2, "en", "web"),   // rephrased -> rung 3 refuses
        ChainDoc(p4._1, p4._2, "en", "books"), // clean -> untouched
        ChainDoc(p5._1, p5._2, "en", "web"))   // quoting host -> cleaned
      // crash AFTER stage 3: the replay must re-excise identically
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      val q1 = chain((id, st) =>
        if (id == 0L && st == 3 && armed.getAndSet(false))
          throw new RuntimeException("injected crash after index append"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      val q2 = chain((_, _) => ())
      q2.processAllAvailable()
      q2.stop()
      val kept = spark.read.parquet(s"$dir/kept")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(kept.keySet == Set(4L, 9L), s"admitted: ${kept.keySet}")
      // the clean doc byte-identical; the host reduced to EXACTLY its
      // filler — the benchmark quote is gone from the stored text
      assert(kept(4L) == p4._2, kept(4L))
      val filler = (0 until 24).map(i => s"f$i").mkString(" ") + " " +
        (0 until 24).map(i => s"g$i").mkString(" ")
      assert(kept(9L) == filler, s"host not cleaned: ${kept(9L)}")
      // and no leak reached the downstream artifacts
      val indexed = spark.read.parquet(s"$dir/ivf")
        .select("cand_id").collect().map(_.getLong(0)).toSet
      assert(indexed == Set(4L, 9L), s"indexed: $indexed")
    } finally Contamination.releaseProbes(p)
  }

  test("in-stream catch-rate: plants at all four rungs, per-rung recall " +
    "parity with the batch operators, multi-table rung-3 probes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("gaterecall").toString
    val prefix = "graft_spec_gaterecall"
    // two benchmark items; the gate freezes a TWO-table rung-3 code
    // (the round-16 at-scale form) — batch parity below runs
    // semanticScoresMulti with the same geometry
    val bench2text =
      "uno duo tres quattro cinque sei sette otto nove dieci undici dodici"
    val bench2 = Seq((100L, benchText), (200L, bench2text))
      .toDF("doc_id", "text")
    val p = Contamination.buildProbes(bench2, "doc_id", "text", keyVec,
      dims = 8, planes = 4, tables = 2)
    // two plants per rung, each engineered to be caught by exactly its
    // own rung (the p1/p2/p3/p5 constructions, one per benchmark item),
    // plus two clean docs
    val v1 = (1L, benchText); val v2 = (11L, bench2text)
    val e1 = (2L,
      "omega beta gamma delta epsilon zeta eta theta iota kappa nu mu")
    val e2 = (12L,
      "ys duo tres quattro cinque sei sette otto nove dieci zs dodici")
    val r1p = (3L,
      "alpha completely different words that share nothing with the benchmark text")
    val r2p = (13L,
      "uno altro testo completamente diverso senza parole in comune qui dentro")
    val s1 = (9L, p5._2)
    val s2 = (19L, (0 until 24).map(i => s"h$i").mkString(" ") + " " +
      bench2text + " " + (0 until 24).map(i => s"k$i").mkString(" "))
    val c1 = (4L, p4._2)
    val c2 = (14L, "another spotless document holding nothing but novel vocabulary")
    val plants = Seq(v1, v2, e1, e2, r1p, r2p, s1, s2, c1, c2)
    val batch = plants.toDF("doc_id", "text")
    try {
      // ground truth from the BATCH operators at the gate's thresholds
      val benchV = bench2.withColumn("v", keyVec)
      val batchV = batch.withColumn("v", keyVec)
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      val r1ids = ids(Contamination.scores(batchV, benchV, "doc_id", "text")
        .filter(col("overlap_frac") >= 0.8))
      val r2ids = ids(Contamination.fuzzyScores(batchV, benchV, "doc_id",
        "text", minJaccard = 0.5))
      val r3ids = ids(Contamination.semanticScoresMulti(batchV, benchV,
        "doc_id", "v", dims = 8, planesPerTable = 4, tables = 2,
        minCos = 0.9))
      val r4ids = ids(Contamination.spanScores(batchV, benchV, "doc_id",
        "text").filter(col("coverage") >= 0.9))
      // per-rung recall on its own plants is 1.0 — the q165 truth
      // arithmetic, asserted on the operators the gate's probes freeze
      assert(Set(1L, 11L).subsetOf(r1ids), s"rung 1 recall: $r1ids")
      assert(Set(2L, 12L).subsetOf(r2ids), s"rung 2 recall: $r2ids")
      assert(Set(3L, 13L).subsetOf(r3ids), s"rung 3 recall: $r3ids")
      assert(Set(9L, 19L).subsetOf(r4ids), s"rung 4 recall: $r4ids")
      val expectedKept =
        plants.map(_._1).toSet -- r1ids -- r2ids -- r3ids -- r4ids
      assert(expectedKept == Set(4L, 14L),
        s"fixture: only the clean docs may survive: $expectedKept")
      // the STREAM: one batch through the curation chain's gate — the
      // admitted set must equal the batch-operator union exactly
      val centroids = Seq(
        (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
        (1L, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      ).toDF("centroid_id", "centroid_vec")
      lazy val in = MemoryStream[ChainDoc]
      val q = StreamingCurationChain.start(
        in.toDF(), prefix, keptDir = s"$dir/kept", cardDir = s"$dir/card",
        indexDir = s"$dir/ivf", postingsDir = s"$dir/post",
        centroids = centroids, checkpoint = s"$dir/ckpt",
        gate = Some(Contamination.BenchmarkGate(p, keyVec)))
      in.addData(plants.map { case (id, tx) => ChainDoc(id, tx, "en", "web") }: _*)
      q.processAllAvailable()
      q.stop()
      val kept = spark.read.parquet(s"$dir/kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == expectedKept,
        s"in-stream admitted $kept != batch-operator survivors $expectedKept")
    } finally Contamination.releaseProbes(p)
  }

  test("chain refuses planted leaks at the door; replay admits the same set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("gatechain").toString
    val prefix = "graft_spec_gatechain"
    val p = probes()
    val centroids = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    ).toDF("centroid_id", "centroid_vec")
    val gate = Contamination.BenchmarkGate(p, keyVec)
    try {
      lazy val in = MemoryStream[ChainDoc]
      def chain(onStage: (Long, Int) => Unit) = StreamingCurationChain.start(
        in.toDF(), prefix, keptDir = s"$dir/kept", cardDir = s"$dir/card",
        indexDir = s"$dir/ivf", postingsDir = s"$dir/post",
        centroids = centroids, checkpoint = s"$dir/ckpt",
        gate = Some(gate), onStage = onStage)
      in.addData(
        ChainDoc(p1._1, p1._2, "en", "web"),   // verbatim leak
        ChainDoc(p2._1, p2._2, "en", "web"),   // edited leak
        ChainDoc(p3._1, p3._2, "en", "web"),   // rephrased leak
        ChainDoc(p4._1, p4._2, "en", "books")) // clean
      // crash AFTER stage 3 of batch 0: the replay must re-gate
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      val q1 = chain((id, st) =>
        if (id == 0L && st == 3 && armed.getAndSet(false))
          throw new RuntimeException("injected crash after index append"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      val q2 = chain((_, _) => ())
      q2.processAllAvailable()
      in.addData(ChainDoc(7L, "a later batch with novel admissible words",
        "de", "web"))
      q2.processAllAvailable()
      q2.stop()
      val kept = spark.read.parquet(s"$dir/kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(4L, 7L), s"kept after replay: $kept")
      // the leaks never reached the downstream artifacts either
      val indexed = spark.read.parquet(s"$dir/ivf")
        .select("cand_id").collect().map(_.getLong(0)).toSet
      assert(indexed == Set(4L, 7L), s"indexed: $indexed")
    } finally Contamination.releaseProbes(p)
  }
}
