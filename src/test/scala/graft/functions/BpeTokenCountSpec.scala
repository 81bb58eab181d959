package graft.functions

import org.scalacheck.Gen

import graft.{PropHelper, SparkSpec}

/** [[BpeTokenCount]]: the string-replace implementation must agree with
  * an INDEPENDENT list-of-symbols reference (the boundary cases a
  * delimiter-string encoding can get wrong: runs of mergeable pairs,
  * symbols that are prefixes/suffixes of other symbols, cascaded
  * merges), plus the column-level contract (null, empties, multi-space
  * pre-tokenization).
  */
class BpeTokenCountSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.functions.GraftFunctions._

  /** Reference: symbols as a list; each merge in table order rewrites
    * all leftmost non-overlapping adjacent (a, b) pairs.
    */
  private def refCountWord(word: String): Int = {
    if (word.isEmpty) return 0
    var syms: Vector[String] =
      word.codePoints().toArray.toVector.map(Character.toString)
    for ((a, b) <- BpeTokenCount.merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  private def refCountText(text: String): Int =
    text.split(" ", -1).map(refCountWord).sum

  test("examples: cascaded merges and merge-run pairing") {
    // "the" -> t+h, then th+e -> 1 token; "thethe" -> 2
    assert(BpeTokenCount.countWord("the") == 1)
    assert(BpeTokenCount.countWord("thethe") == 2)
    // run of mergeable pairs merges pairwise left-to-right:
    // "aaaa" with no (a,a) merge stays 4 chars
    assert(BpeTokenCount.countWord("xyzzy") == 5)
    // "international": in, t, er(e+r), n, a, ti+on ... exact value is
    // pinned by the reference equivalence below; here just sanity-check
    // subword compression happened
    assert(BpeTokenCount.countWord("international") < "international".length)
    assert(BpeTokenCount.countText("the cat") ==
      BpeTokenCount.countWord("the") + BpeTokenCount.countWord("cat"))
    assert(BpeTokenCount.countText("") == 0)
    assert(BpeTokenCount.countText("  a  ") == 1) // empty words count 0
  }

  test("property: string-replace impl == list-of-symbols reference") {
    // alphabet biased toward merge-table letters so merges actually fire
    val wordGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("thein gandrsoualm".toSeq)).map(_.mkString))
    val textGen = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    for (text <- PropHelper.samples(textGen, 300)) {
      assert(BpeTokenCount.countText(text) == refCountText(text),
        s"mismatch on ${text.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("column contract: null -> null; agrees with the static impl") {
    val df = Seq(
      Some("the running internationalization effort"),
      Some("a"), Some(""), None).toDF("t")
    val got = df.select(bpe_token_count($"t")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val want = Seq(
      Some(BpeTokenCount.countText("the running internationalization effort")),
      Some(1), Some(0), None)
    assert(got.toSeq == want)
  }
}
