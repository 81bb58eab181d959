package graft.functions

import org.apache.spark.sql.graftcolumn
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

import graft.{PropHelper, SparkSpec}

/** [[MultiPatternCounts]] / [[AhoCorasick]]: the classic textbook
  * cases (suffix outputs, self-overlap), a property sweep against a
  * naive positional counter, and the Spark codegen path end-to-end.
  */
class MultiPatternCountsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  private def acCounts(text: String, pats: Seq[String]): Seq[Long] = {
    val arr = AhoCorasick.build(pats).counts(UTF8String.fromString(text))
    (0 until pats.size).map(arr.getLong)
  }

  test("suffix patterns all fire (he/she/his/hers)") {
    val pats = Seq("he", "she", "his", "hers")
    // "ushers": she at 1, he at 2, hers at 2
    assert(acCounts("ushers", pats) === Seq(1L, 1L, 0L, 1L))
  }

  test("self-overlapping occurrences are all counted") {
    assert(acCounts("aaaa", Seq("aa")) === Seq(3L))
    assert(acCounts("ababab", Seq("abab")) === Seq(2L))
  }

  test("phrase and sub-phrase both count at shared positions") {
    val pats = Seq("merge join", "join")
    assert(acCounts("a merge join b join c", pats) === Seq(1L, 2L))
  }

  test("property: matches the naive positional counter") {
    val gen = for {
      text <- Gen.stringOfN(60, Gen.oneOf('a', 'b', 'c', ' '))
      nPat <- Gen.choose(1, 6)
      pats <- Gen.listOfN(nPat,
        Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', ' '))))
    } yield (text, pats.distinct)
    PropHelper.samples(gen, 200).foreach { case (text, pats) =>
      assert(acCounts(text, pats) === pats.map(naive(text, _)),
        s"text=$text pats=$pats")
    }
  }

  test("Spark codegen path: counts match and null text stays null") {
    val pats = Seq("batch", "merge join", "a")
    val df = Seq(Some("a batch merge join a"), None).toDF("text")
      .select(graftcolumn(
        MultiPatternCounts(graftcolumn.expr($"text"), pats)).as("c"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0) === Seq(1L, 1L, 3L))
    assert(rows(1).isNullAt(0))
  }
}
