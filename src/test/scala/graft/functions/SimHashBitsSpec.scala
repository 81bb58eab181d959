package graft.functions

import org.scalacheck.Gen

import graft.{PropHelper, SparkSpec}

/** [[SimHashBits]] must be value-identical to the composed builtin
  * vote-fold it replaced — including the null-element votes-against-
  * every-bit quirk and the empty-array → 0 case.
  */
class SimHashBitsSpec extends SparkSpec {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.functions.GraftFunctions._

  /** The original composition (the oracle-shaped reference). */
  private def composed(hs: Column, bits: Int): Column = {
    val masks = array((0 until bits).map(b => lit(1L << b)): _*)
    val votes = aggregate(hs, array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, masks,
        (v, m) => v + when(h.bitwiseAND(m) === m, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  test("property: native == composed vote fold (incl. null elements, empty, null)") {
    val elemGen = Gen.frequency(
      9 -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val arrGen = Gen.frequency(
      9 -> Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, elemGen).map(Option(_))),
      1 -> Gen.const(Option.empty[List[Option[Long]]]))
    val rows = PropHelper.samples(arrGen, 200)
    for (bits <- Seq(16, 48)) {
      val df = rows.toDF("hs")
      val got = df.select(
        simhash_bits($"hs", bits).as("native"),
        composed($"hs", bits).as("ref")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1),
          s"null disagreement: $r")
        if (!r.isNullAt(0))
          assert(r.getLong(0) == r.getLong(1), s"value mismatch: $r")
      }
    }
  }

  test("tokens path: Dedup.simhash stays pinned to the q12 oracle formula") {
    import graft.operators.Dedup
    val df = Seq("alpha beta beta gamma", "", "one").toDF("text")
    val got = df.select(Dedup.simhash(words($"text"), 16, 7)).as[Long].collect()
    val ref = df.select(composed(hash64_array(words($"text"), 7), 16))
      .as[Long].collect()
    assert(got.toSeq == ref.toSeq)
  }
}
