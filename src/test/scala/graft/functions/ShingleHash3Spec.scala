package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native one-pass shingle hash must be value-identical to the
  * composed slice/zip_with form it replaces (what the DuckDB oracle
  * computes), including null elements, short arrays, and null input.
  */
class ShingleHash3Spec extends SparkSpec {

  import spark.implicits._
  import GraftFunctions._

  private def composed(wh: org.apache.spark.sql.Column) = {
    val M = MinHashSig.M; val P = MinHashSig.P
    val n = size(wh)
    val s1 = slice(wh, lit(1), n - 2)
    val s2 = slice(wh, lit(2), n - 2)
    val s3 = slice(wh, lit(3), n - 2)
    val pair = zip_with(s1, s2, (a, b) => ((a % M) * 37L + (b % M)) % P)
    when(n >= 3, zip_with(pair, s3, (t, c) => (t * 41L + (c % M)) % P))
      .otherwise(array().cast("array<bigint>"))
  }

  test("native == composed on random word-hash arrays") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(math.abs(rnd.nextLong()) % (1L << 60)))
    }
    val df = rows.toDF("id", "wh")
    val cmp = df.select(shingle_hash3($"wh").as("fast"), composed($"wh").as("slow"))
    assert(cmp.filter(not($"fast" <=> $"slow")).count() == 0)
  }

  test("null elements, short arrays, and null input match the composed form") {
    val df = Seq(
      (1L, null: Seq[java.lang.Long]),
      (2L, Seq.empty[java.lang.Long]),
      (3L, Seq[java.lang.Long](1L, 2L)),
      (4L, Seq[java.lang.Long](1L, null, 3L, 4L)),
      (5L, Seq[java.lang.Long](10L, 20L, 30L, 40L))).toDF("id", "wh")
    val cmp = df.select($"id",
      shingle_hash3($"wh").as("fast"), composed($"wh").as("slow"))
    assert(cmp.filter(not($"fast" <=> $"slow")).count() == 0)
    val r = cmp.orderBy("id").collect()
    assert(r(0).getSeq[Any](1) == Seq()) // null in → EMPTY out (otherwise branch)
    assert(r(2).getSeq[Any](1) == Seq()) // < 3 tokens → empty
    // a null anywhere in the 3-window nulls that shingle only
    assert(r(3).getSeq[Any](1).count(_ == null) == 2)
    assert(r(4).getSeq[Any](1).forall(_ != null))
  }
}
