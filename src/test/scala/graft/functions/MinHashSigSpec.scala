package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native one-pass minhash signature must be value-identical to the
  * composed per-seed `array_min(transform(...))` form it replaces
  * (which is also what the DuckDB oracle computes), including the null
  * edges: null array, null elements, empty array.
  */
class MinHashSigSpec extends SparkSpec {

  import spark.implicits._
  import GraftFunctions._

  private def composed(hashes: org.apache.spark.sql.Column, seeds: Int) =
    array(MinHashSig.A.take(seeds).map { a =>
      array_min(transform(hashes,
        h => (lit(a) * (h % MinHashSig.M) + lit(a * 7L + 3L)) % MinHashSig.P))
    }: _*)

  test("native signature == composed signature on random hash arrays") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(math.abs(rnd.nextLong()) % (1L << 60)))
    }
    val df = rows.toDF("id", "hs")
    val cmp = df.select(
      minhash_sig($"hs", 8).as("fast"), composed($"hs", 8).as("slow"))
    assert(cmp.filter(not($"fast" <=> $"slow")).count() == 0)
  }

  test("null array, null elements, empty array match the composed form") {
    val df = Seq(
      (1L, null: Seq[java.lang.Long]),
      (2L, Seq.empty[java.lang.Long]),
      (3L, Seq[java.lang.Long](null, 42L, null)),
      (4L, Seq[java.lang.Long](null, null))).toDF("id", "hs")
    val cmp = df.select($"id",
      minhash_sig($"hs", 4).as("fast"), composed($"hs", 4).as("slow"))
    assert(cmp.filter(not($"fast" <=> $"slow")).count() == 0)
    // spot-pin the semantics: null/empty/all-null input → an array of
    // null ENTRIES (the outer array() constructor never returns null)
    val r = cmp.orderBy("id").collect()
    assert(!r(0).isNullAt(1) && r(0).getSeq[Any](1) == Seq(null, null, null, null))
    assert(!r(1).isNullAt(1) && r(1).getSeq[Any](1) == Seq(null, null, null, null))
  }

  test("seeds bounds are type-checked") {
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "hs")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(minhash_sig($"hs", 17)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(minhash_sig($"id", 4)).collect() // not an array
    }
  }
}
