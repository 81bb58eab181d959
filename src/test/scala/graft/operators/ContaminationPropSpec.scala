package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.PropHelper.samples
import graft.SparkSpec

/** Property tests for the span (embedded-benchmark) contamination rung
  * and the four-rung gate: host-length invariance of coverage (the
  * contract the rung exists for), exact set-arithmetic agreement of
  * the join/aggregate plumbing, cut commutativity, and gate parity
  * with the composed one-shot cuts on random relations (the fixed
  * fixtures in ContaminationSpec/StreamingBenchmarkGateSpec pin the
  * interesting shapes; these pin the algebra).
  */
class ContaminationPropSpec extends SparkSpec {

  import spark.implicits._

  // small shared vocab so random docs overlap organically; doc lengths
  // 0..12 exercise the unshingleable (<3 tokens) path
  private val word = Gen.choose(0, 11).map(i => s"w$i")
  private val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def shingleSets(rows: Seq[(Long, String)]): Map[Long, Set[Long]] =
    df(rows).select($"doc_id", Contamination.shingleSet($"text").as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("coverage of an embedded copy is 1.0 at ANY filler length — " +
    "host-length invariance is the rung's contract") {
    val gen = for {
      t <- Gen.listOfN(6, word).map(_.mkString(" ")) // >= 3 tokens
      a <- Gen.choose(0, 40)
      b <- Gen.choose(0, 40)
    } yield (t, a, b)
    samples(gen, 10).zipWithIndex.foreach { case ((t, a, b), i) =>
      // filler tokens are outside the vocab, unique per side+position
      val host = ((0 until a).map(j => s"f$j") ++ t.split(" ") ++
        (0 until b).map(j => s"g$j")).mkString(" ")
      val out = Contamination.spanScores(
          df(Seq((1L, host))), df(Seq((100L, t))), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
      assert(out.get(1L).contains(1.0),
        s"sample $i: filler ($a,$b) test='$t' -> $out")
    }
  }

  test("spanScores equals exact set arithmetic on random relations") {
    val rel = Gen.listOfN(5, doc)
    val pair = Gen.zip(rel, Gen.listOfN(2, doc))
    samples(pair, 8).foreach { case (cs, ts) =>
      val corpus = cs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      val test = ts.zipWithIndex.map { case (d, i) => (100L + i, d) }
      val cSets = shingleSets(corpus).filter(_._2.nonEmpty)
      val tSets = shingleSets(test).filter(_._2.nonEmpty)
      val expected = (for {
        (cid, cs2) <- cSets; (tid, ts2) <- tSets
        shared = (cs2 & ts2).size if shared > 0
      } yield (cid, tid) -> (shared.toLong, ts2.size.toLong,
        round6(shared.toDouble / ts2.size),
        round6(shared.toDouble / cs2.size))).toMap
      val got = Contamination.spanScores(df(corpus), df(test),
          "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      assert(got == expected, s"corpus=$corpus test=$test")
    }
  }

  test("spanCut and cut commute: anti-join cuts are order-independent") {
    val pair = Gen.zip(Gen.listOfN(6, doc), Gen.listOfN(2, doc))
    samples(pair, 6).foreach { case (cs, ts) =>
      val corpus = df(cs.zipWithIndex.map { case (d, i) => (i.toLong, d) })
      val test = df(ts.zipWithIndex.map { case (d, i) => (100L + i, d) })
      def ids(d: DataFrame) = d.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val ab = Contamination.spanCut(
        Contamination.cut(corpus, test, "doc_id", "text", 0.5),
        test, "doc_id", "text", 0.5)
      val ba = Contamination.cut(
        Contamination.spanCut(corpus, test, "doc_id", "text", 0.5),
        test, "doc_id", "text", 0.5)
      assert(ids(ab) == ids(ba), s"corpus=$cs test=$ts")
    }
  }

  test("gateBatch equals the composed four cuts on random relations") {
    val vec = graft.streaming.StreamingCurationChain.textEmbedding(
      col("text"), dims = 8)
    val pair = Gen.zip(Gen.listOfN(6, doc), Gen.listOfN(2, doc))
    samples(pair, 6).zipWithIndex.foreach { case ((cs, ts), i) =>
      val batch = df(cs.zipWithIndex.map { case (d, n) => (n.toLong, d) })
      // benchmark docs must be shingleable for buildProbes' text rungs;
      // pad short draws to 3 tokens with vocab words
      val bench = df(ts.zipWithIndex.map { case (d, n) =>
        val w = d.split(" ").filter(_.nonEmpty)
        val padded = if (w.length >= 3) w else (w ++ Seq("w0", "w1", "w2")).take(3)
        (100L + n, padded.mkString(" "))
      })
      val p = Contamination.buildProbes(bench, "doc_id", "text", vec,
        dims = 8, planes = 4)
      try {
        val viaGate = Contamination.gateBatch(batch, p, "doc_id", "text",
            vec).select("doc_id").collect().map(_.getLong(0)).toSet
        val benchV = bench.withColumn("v", vec)
        val batchV = batch.withColumn("v", vec)
        val composed = Contamination.spanCut(
            Contamination.semanticCut(
              Contamination.fuzzyCut(
                Contamination.cut(batchV, benchV, "doc_id", "text", 0.8),
                benchV, "doc_id", "text", 0.5),
              benchV, "doc_id", "v", dims = 8, planes = 4, minCos = 0.9),
            benchV, "doc_id", "text", minCoverage = 0.9)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(viaGate == composed,
          s"sample $i: gate $viaGate != composed $composed (batch=$cs bench=$ts)")
      } finally Contamination.releaseProbes(p)
    }
  }
}
