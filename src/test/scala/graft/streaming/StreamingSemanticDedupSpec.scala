package graft.streaming

import graft.SparkSpec

/** [[StreamingSemanticDedup]]: cross-corpus refusal against the
  * streaming vector index, intra-batch keep-smallest through the same
  * probe geometry, replay consistency against the crashed attempt's
  * own partition, the nprobe dial, and tombstone unblocking.
  */
class StreamingSemanticDedupSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def cents = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
  ).toDF("centroid_id", "centroid_vec")

  private def batchDf(rows: (Long, Seq[Double])*) =
    rows.toDF("doc_id", "cv")

  private def gate(batch: org.apache.spark.sql.DataFrame, path: String,
                   tau: Double = 0.99, nprobe: Int = 1,
                   tomb: Option[org.apache.spark.sql.DataFrame] = None) =
    StreamingSemanticDedup.gateBatch(spark, batch, "doc_id", "cv",
        cents, path, tau, nprobe, tomb)
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("cross-corpus match drops; orthogonal admits; intra-batch pair " +
    "keeps the smaller id") {
    val dir = java.nio.file.Files.createTempDirectory("ssd1").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.01)))
        .select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    val admitted = gate(batchDf(
      (5L, Seq(0.99, 0.0)),   // ~doc 1 in the index -> refused
      (6L, Seq(0.0, 1.0)),    // orthogonal -> admitted
      (7L, Seq(0.2, 1.0)),    // intra pair with 8 (cos ~1) -> kept (smaller)
      (8L, Seq(0.2, 0.999))), s"$dir/ivf")
    assert(admitted == Seq(6L, 7L),
      s"expected 5 refused vs index, 8 refused vs 7: $admitted")
  }

  test("empty index (before any batch commits): only intra-batch " +
    "verdicts fire") {
    val dir = java.nio.file.Files.createTempDirectory("ssd2").toString
    val admitted = gate(batchDf(
      (5L, Seq(0.99, 0.0)),
      (6L, Seq(1.0, 0.01))), s"$dir/ivf")
    assert(admitted == Seq(5L), s"smaller id survives an empty index: $admitted")
  }

  test("replay consistency: re-gating the same batch AFTER its kept " +
    "docs were appended (the crash-after-stage-3 state) admits the " +
    "identical set") {
    val dir = java.nio.file.Files.createTempDirectory("ssd3").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.0))).select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    // a batch with an intra pair (10 < 11) and a novel doc straddling
    // nothing; nprobe = 2 so the probe geometry is the wide one
    val b = batchDf(
      (10L, Seq(0.3, 1.0)),
      (11L, Seq(0.3, 0.999)),
      (12L, Seq(0.7, 0.7)))
    val first = gate(b, s"$dir/ivf", nprobe = 2)
    // simulate stage 3 of the crashed attempt: the ADMITTED docs'
    // vectors land under this batch's partition
    StreamingVectorIndex.writeBatch(
      b.join(first.toDF("doc_id"), Seq("doc_id"))
        .select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 1L)
    val replay = gate(b, s"$dir/ivf", nprobe = 2)
    assert(replay == first,
      s"replay must admit the same set: first=$first replay=$replay")
  }

  test("nprobe dial: a boundary-straddling near-dup is missed at " +
    "nprobe = 1, caught at nprobe = 2") {
    val dir = java.nio.file.Files.createTempDirectory("ssd4").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.999))).select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    val probe = batchDf((9L, Seq(0.999, 1.0)))   // other side of 45 deg
    assert(gate(probe, s"$dir/ivf", tau = 0.99, nprobe = 1) == Seq(9L),
      "cell-local probe cannot see across the boundary")
    assert(gate(probe, s"$dir/ivf", tau = 0.99, nprobe = 2) == Seq(),
      "the second-nearest cell recovers the match")
  }

  test("in-stream catch-rate on amplitude-spread plants: no false " +
    "drops, the nprobe dial is monotone and real, and nprobe = 1 is " +
    "verdict-identical to batch semDedup on the union") {
    import graft.operators.Similarity
    val dims = 8
    val tau = 0.9
    // 96 deterministic pseudo-random corpus vectors (the hpComponent
    // hash recipe — NOT the trig family, whose common phase slope
    // makes cos(i,j) ≈ cos(c·(i−j)) and floods the fixture with
    // organic near-dups), a TRAINED quantizer (data-adapted cells, so
    // plants can straddle real boundaries), all 96 admitted as batch 0
    def h(tag: String, i: Int, d: Int): Double =
      graft.functions.Hash64Array.hashString(s"$tag:$i:$d", 3) % 1000 /
        1000.0 - 0.5
    def vec(i: Int): Seq[Double] = Seq.tabulate(dims)(d => h("v", i, d))
    val corpus = (0 until 96).map(i => (i.toLong, vec(i)))
    val corpusDf = corpus.toDF("doc_id", "cv")
    val trained = Similarity.kmeans(corpusDf, "cv", "doc_id", k = 12,
      iters = 2).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("ssd6").toString
    StreamingVectorIndex.writeBatch(
      corpusDf.select($"doc_id".as("cand_id"), $"cv"),
      trained, s"$dir/ivf", 0L)
    // the streamed batch: 32 plants at the q169 amplitude spread
    // (near-dups of corpus rows, amp in {0.05 .. 0.55} — the heavy
    // ones fall below tau, so truth is a strict subset) + 8 clean
    // docs drawn fresh from the hash family
    def plant(i: Int): Seq[Double] = {
      val amp = (5 + (i % 6) * 10) / 100.0
      vec(i).zipWithIndex.map { case (x, d) => x + amp * h("n", i, d) }
    }
    val plants = (0 until 32).map(i => (1000L + i, plant(i)))
    val clean = (0 until 8).map(i =>
      (2000L + i, Seq.tabulate(dims)(d => h("c", i, d))))
    val batch = (plants ++ clean).toDF("doc_id", "cv")
    // ground truth, brute force on the driver: a batch doc drops iff
    // some CORPUS doc clears tau, or some batch-mate with SMALLER id
    // clears tau (the gate's keep-smallest intra contract)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val all = plants ++ clean
    val truth = all.filter { case (id, v) =>
      corpus.exists(c => cos(v, c._2) >= tau) ||
        all.exists(b => b._1 < id && cos(v, b._2) >= tau)
    }.map(_._1).toSet
    assert(truth.nonEmpty && truth.size < 32,
      s"fixture must mix catchable and uncatchable plants: ${truth.size}")
    def drops(nprobe: Int): Set[Long] = {
      val admitted = StreamingSemanticDedup.gateBatch(spark, batch,
          "doc_id", "cv", trained, s"$dir/ivf", tau, nprobe)
        .select("doc_id").as[Long].collect().toSet
      all.map(_._1).toSet -- admitted
    }
    val d1 = drops(1); val d2 = drops(2); val d4 = drops(4)
    // every drop is verified (cos >= tau) — never a false positive
    assert(d4.subsetOf(truth), s"false drops: ${d4 -- truth}")
    // the dial only widens the probe
    assert(d1.subsetOf(d2) && d2.subsetOf(d4),
      s"nprobe must be monotone: $d1 / $d2 / $d4")
    // and it is a REAL dial on boundary-straddling plants
    assert(d4.size > d1.size,
      s"fixture must exercise a straddler: np1=${d1.size} np4=${d4.size}")
    // verdict parity with the batch operator at the same geometry:
    // nprobe = 1 gate drops == batch semDedup's batch-side drops on
    // corpus ∪ batch (plant ids are all larger than corpus ids, so
    // keep-smallest always drops the batch side of a cross pair)
    val union = corpusDf.unionByName(batch)
    val batchSideDrops = Similarity.semDedup(union, "cv", "doc_id",
        trained, tau)
      .select("doc_id").as[Long].collect().toSet.filter(_ >= 1000L)
    assert(d1 == batchSideDrops,
      s"gate must equal the batch operator: gate-only=${d1 -- batchSideDrops} " +
        s"batch-only=${batchSideDrops -- d1}")
  }

  // the rotated second quantizer family: cells aligned to the 45°
  // diagonals, so a pair that straddles the axis-aligned family's
  // boundary sits DEEP inside one of these cells
  private def cents2 = Seq(
    (0L, Seq(1.0, 1.0)), (1L, Seq(-1.0, 1.0))
  ).toDF("centroid_id", "centroid_vec")

  private def fam(path: String) =
    StreamingSemanticDedup.QuantizerFamily(cents, path)
  private def fam2(path: String) =
    StreamingSemanticDedup.QuantizerFamily(cents2, path)

  private def gateMulti(batch: org.apache.spark.sql.DataFrame,
                        fams: Seq[StreamingSemanticDedup.QuantizerFamily],
                        tau: Double = 0.99, nprobe: Int = 1) =
    StreamingSemanticDedup.gateBatchMulti(spark, batch, "doc_id", "cv",
        fams, tau, nprobe)
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("families dial: one family IS gateBatch; a straddler of family " +
    "0's cells is caught by the rotated family 1; families only add " +
    "drops") {
    val dir = java.nio.file.Files.createTempDirectory("ssd7").toString
    // the ssd4 straddle pair: indexed (1.0, 0.999) and probe
    // (0.999, 1.0) land on opposite sides of the axis-aligned 45°
    // boundary, invisible at nprobe = 1 — but both sit in cents2's
    // (1, 1) cell
    val idxDoc = batchDf((1L, Seq(1.0, 0.999)))
      .select($"doc_id".as("cand_id"), $"cv")
    StreamingVectorIndex.writeBatch(idxDoc, cents, s"$dir/ivf", 0L)
    StreamingVectorIndex.writeBatch(idxDoc, cents2, s"$dir/ivf_f1", 0L)
    val probe = batchDf((9L, Seq(0.999, 1.0)))
    assert(gateMulti(probe, Seq(fam(s"$dir/ivf"))) ==
      gate(probe, s"$dir/ivf"),
      "a single family must be gateBatch exactly")
    assert(gate(probe, s"$dir/ivf") == Seq(9L),
      "premise: family 0 alone misses the straddler at nprobe = 1")
    assert(gateMulti(probe,
        Seq(fam(s"$dir/ivf"), fam2(s"$dir/ivf_f1"))) == Seq(),
      "the rotated family must catch the straddler")
    // only-add-drops on a batch of clean admits (below tau everywhere)
    val mixed = batchDf(
      (5L, Seq(0.99, 0.0)),   // same family-0 cell as doc 1, cos < tau
      (6L, Seq(-1.0, 0.2)))   // far from everything -> admitted
    val adm1 = gateMulti(mixed, Seq(fam(s"$dir/ivf"))).toSet
    val adm2 = gateMulti(mixed,
      Seq(fam(s"$dir/ivf"), fam2(s"$dir/ivf_f1"))).toSet
    assert(adm2.subsetOf(adm1),
      s"extra families can only add drops: $adm1 -> $adm2")
  }

  test("families replay consistency: a crash that appended the batch " +
    "to only SOME family trees re-gates to the identical verdict") {
    val dir = java.nio.file.Files.createTempDirectory("ssd8").toString
    val idxDoc = batchDf((1L, Seq(1.0, 0.0)))
      .select($"doc_id".as("cand_id"), $"cv")
    StreamingVectorIndex.writeBatch(idxDoc, cents, s"$dir/ivf", 0L)
    StreamingVectorIndex.writeBatch(idxDoc, cents2, s"$dir/ivf_f1", 0L)
    val fams = Seq(fam(s"$dir/ivf"), fam2(s"$dir/ivf_f1"))
    // intra pair (10 < 11), a near-match of the indexed doc, a novel doc
    val b = batchDf(
      (10L, Seq(0.3, 1.0)),
      (11L, Seq(0.3, 0.999)),
      (12L, Seq(0.99, 0.02)),
      (13L, Seq(-0.7, 0.7)))
    val first = gateMulti(b, fams, nprobe = 2)
    val keptVecs = b.join(first.toDF("doc_id"), Seq("doc_id"))
      .select($"doc_id".as("cand_id"), $"cv")
    // crash state: stage 3 reached family 0's tree only
    StreamingVectorIndex.writeBatch(keptVecs, cents, s"$dir/ivf", 1L)
    assert(gateMulti(b, fams, nprobe = 2) == first,
      "partial-append replay must admit the same set")
    // …then the replay completes every family's append
    StreamingVectorIndex.writeBatch(keptVecs, cents2, s"$dir/ivf_f1", 1L)
    assert(gateMulti(b, fams, nprobe = 2) == first,
      "full-append replay must admit the same set")
  }

  test("a tombstoned index entry is invisible: the takedown un-blocks " +
    "future equivalents immediately") {
    val dir = java.nio.file.Files.createTempDirectory("ssd5").toString
    StreamingVectorIndex.writeBatch(
      batchDf((1L, Seq(1.0, 0.01))).select($"doc_id".as("cand_id"), $"cv"),
      cents, s"$dir/ivf", 0L)
    val probe = batchDf((5L, Seq(0.99, 0.0)))
    assert(gate(probe, s"$dir/ivf") == Seq(),
      "premise: the live entry blocks")
    val snap = Seq(1L).toDF("id")
    assert(gate(probe, s"$dir/ivf", tomb = Some(snap)) == Seq(5L),
      "under the marker the same probe admits")
  }
}
