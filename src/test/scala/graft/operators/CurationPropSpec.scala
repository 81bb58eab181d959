package graft.operators

import graft.PropHelper.samples
import graft.SparkSpec
import org.scalacheck.Gen

/** Property tests for the round-10 curation family: winnowing's
  * shared-run guarantee on random placements, epochMix's exact mass
  * accounting against an in-memory reference, and cdcChunks' partition
  * invariants on random texts.
  */
class CurationPropSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val K = 4; private val W = 5

  private val wordGen = Gen.choose(0, 500).map(i => s"t$i")
  private val textGen = Gen.choose(8, 60)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("winnowing guarantee holds for random docs and run placements") {
    // plant one shared (W+K-1)-token run at a random offset in each of
    // two otherwise-random docs: at least one shared fingerprint, always
    val runGen = Gen.listOfN(W + K - 1, Gen.choose(0, 500).map(i => s"run$i"))
    val caseGen = Gen.zip(textGen, textGen, runGen,
      Gen.choose(0, 40), Gen.choose(0, 40))
    samples(caseGen, 20).zipWithIndex.foreach {
      case ((ta, tb, run, offA, offB), i) =>
        val wa = ta.split(" ").toSeq
        val wb = tb.split(" ").toSeq
        val a = (wa.take(offA min wa.size) ++ run ++ wa.drop(offA min wa.size)).mkString(" ")
        val b = (wb.take(offB min wb.size) ++ run ++ wb.drop(offB min wb.size)).mkString(" ")
        val pairs = Dedup.winnowPairs(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
          "doc_id", "text", K, W, seed = 11,
          minShared = 1L, maxDf = 10L).count()
        assert(pairs >= 1L,
          s"case $i: shared ${W + K - 1}-token run must yield a match\nA=$a\nB=$b")
    }
  }

  test("epochMix masses match the in-memory reference exactly") {
    val weightGen = Gen.oneOf(0.0, 0.3, 1.0, 1.5, 2.0, 2.75)
    val caseGen = Gen.zip(weightGen, weightGen, Gen.choose(1, 1000))
    samples(caseGen, 10).foreach { case (wEn, wFr, seed) =>
      val rows = (0 until 300).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr"))
      val got = Sampling.epochMix(rows.toDF("id", "lang"),
          $"id".cast("string"), $"lang",
          Map("en" -> wEn), default = wFr, seed = seed)
        .groupBy($"lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reference: floor(w) copies + 1 iff hash64(id) % g < frac cut
      def expect(lang: String, w: Double): Long = {
        val full = math.floor(w).toLong
        val cut = math.round((w - math.floor(w)) * 10000)
        rows.filter(_._2 == lang).map { case (id, _) =>
          val h = graft.functions.Hash64Array.hashString(id.toString, seed) % 10000
          full + (if (h < cut) 1L else 0L)
        }.sum
      }
      assert(got.getOrElse("en", 0L) == expect("en", wEn), s"en@$wEn seed=$seed: $got")
      assert(got.getOrElse("fr", 0L) == expect("fr", wFr), s"fr@$wFr seed=$seed: $got")
    }
  }

  test("cdcChunks partitions any text: mass conserved, ids dense, text reassembles") {
    samples(textGen, 15).zipWithIndex.foreach { case (text, i) =>
      val n = text.split(" ").length.toLong
      val ch = Dedup.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", avgLen = 8, seed = 23)
      val rows = ch.orderBy($"chunk_id")
        .select($"chunk_id", $"n_tokens").collect()
      assert(rows.map(_.getLong(1)).sum == n, s"case $i: token mass")
      assert(rows.map(_.getLong(0)).toSeq == rows.indices.map(_.toLong),
        s"case $i: chunk ids must be dense from 0")
    }
  }
}
