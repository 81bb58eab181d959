package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import GraftFunctions._

/** DataFrame-level tests for every §2.7 helper Column. */
class GraftFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def one[T](df: DataFrame): T = col1[T](df).head

  private def strOf(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    one[String](Seq(in).toDF("s").select(f(col("s"))))
  }

  test("normTitle lowercases and dash-normalizes (en/em dashes too)") {
    assert(strOf("Acme Raises $5M — Series A", normTitle) == "acme raises $5m   series a")
    assert(strOf("Big–Deal", normTitle) == "big deal")
  }

  test("kwAny: any-of containment, case-insensitive") {
    import spark.implicits._
    val kws = Seq("raises", "funding")
    val got = col1[java.lang.Boolean](
      Seq("Acme RAISES $5M", "Acme hires CTO").toDF("t")
        .select(kwAny(col("t"), kws)))
    assert(got == Seq(true, false))
  }

  test("kwCount counts keyword hits") {
    import spark.implicits._
    val kws = Seq("series", "round", "funding")
    val got = col1[Int](
      Seq("Series A funding round closes").toDF("t")
        .select(kwCount(col("t"), kws)))
    assert(got == Seq(3))
  }

  test("stripLegalSuffix drops trailing legal forms") {
    assert(strOf("Acme Inc.", stripLegalSuffix) == "acme")
    assert(strOf("Acme GmbH", stripLegalSuffix) == "acme")
    assert(strOf("Coca Cola", stripLegalSuffix) == "coca cola")
  }

  test("slugify lowers and strips spaces/dots/commas") {
    assert(strOf("Acme Labs, Inc.", slugify) == "acmelabsinc")
  }

  test("hostOf strips scheme and www") {
    assert(strOf("https://www.acme.com/about?x=1", hostOf) == "acme.com")
    assert(strOf("http://acme.io/careers", hostOf) == "acme.io")
  }

  test("domainNormalize yields canonical https://host") {
    assert(strOf("http://www.acme.com/x/y", domainNormalize) == "https://acme.com")
  }

  test("pathSlug extracts the first path segment (ATS board slug)") {
    assert(strOf("https://boards.greenhouse.io/acme/jobs/1", pathSlug) == "acme")
    assert(strOf("https://jobs.lever.co/acme", pathSlug) == "acme")
  }

  test("uddgUnwrap decodes the DuckDuckGo redirect param") {
    assert(strOf(
      "https://duckduckgo.com/l/?uddg=https%3A%2F%2Facme.com%2F&rut=abc",
      uddgUnwrap) == "https://acme.com/")
  }

  test("urlCanon strips query and trailing slash") {
    assert(strOf("https://linkedin.com/company/acme/?trk=x", urlCanon) ==
      "https://linkedin.com/company/acme")
    assert(strOf("https://acme.com/jobs", urlCanon) == "https://acme.com/jobs")
  }

  test("hash64 is stable and DuckDB-reproducible") {
    import spark.implicits._
    // Oracle value computed with DuckDB 1.0:
    //   SELECT CAST(('0x' || substr(md5('1:hello'),1,15)) AS BIGINT)
    val got = col1[Long](Seq("hello").toDF("s").select(hash64(col("s"), 1)))
    assert(got == Seq(155683129569975224L))
    // different seeds decorrelate
    val h2 = col1[Long](Seq("hello").toDF("s").select(hash64(col("s"), 2)))
    assert(h2.head != got.head)
  }

  test("hash64_array is bit-identical to per-element hash64 (both eval paths)") {
    import spark.implicits._
    val strs = Seq("hello", "", "spark scan", "héllo ünïcode", "0:1")
    val df = Seq((strs, 0)).toDF("arr", "ignore")
    for (seed <- Seq(0, 1, 7)) {
      val native = col1[collection.Seq[Long]](df.select(hash64_array(col("arr"), seed))).head
      val composed = col1[collection.Seq[Long]](
        df.select(transform(col("arr"), x => hash64(x, seed)))).head
      assert(native.toList == composed.toList, s"seed=$seed")
    }
    // driver-side twin matches too
    assert(graft.functions.Hash64Array.hashString("hello", 1) == 155683129569975224L)
  }

  test("token_set_counts matches the composed filter/array_contains form") {
    import spark.implicits._
    val sets = Seq(Seq("a", "b"), Seq("b", "c", "zz"), Seq.empty[String])
    val df = Seq(Seq("a", "b", "b", "c", "d"), Seq.empty[String]).toDF("toks")
    val native = df.select(token_set_counts(col("toks"), sets)).collect()
      .map(_.getSeq[Int](0).toList)
    val composed = df.select(array(sets.map(s =>
      size(filter(col("toks"), t => array_contains(typedlit(s), t)))): _*)).collect()
      .map(_.getSeq[Int](0).toList)
    assert(native.toList == composed.toList)
    assert(native.head == List(3, 3, 0))
    assert(native(1) == List(0, 0, 0))
  }

  test("words splits on whitespace") {
    import spark.implicits._
    val got = col1[collection.Seq[String]](Seq("a b c").toDF("s").select(words(col("s"))))
      .map(_.toList)
    assert(got == Seq(Seq("a", "b", "c")))
  }

  test("shingles emits n-grams; undersized inputs yield empty") {
    import spark.implicits._
    def sh(s: String, n: Int): Seq[String] =
      col1[collection.Seq[String]](Seq(s).toDF("s").select(shingles(words(col("s")), n)))
        .head.toList
    assert(sh("a b c d", 3) == Seq("a b c", "b c d"))
    assert(sh("a b c", 3) == Seq("a b c"))
    assert(sh("a b", 3) == Seq.empty)
    assert(sh("", 3) == Seq.empty)
  }

  test("dot / l2norm / cosine") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 0.0f), Seq(2.0f, 4.0f, 0.0f))).toDF("a", "b")
    assert(one[Double](df.select(dot(col("a"), col("b")))) == 10.0)
    assert(one[Double](df.select(l2norm(col("a")))) === math.sqrt(5.0))
    assert(math.abs(one[Double](df.select(cosine(col("a"), col("b")))) - 1.0) < 1e-12)
    val orth = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    assert(one[Double](orth.select(cosine(col("a"), col("b")))) == 0.0)
  }
}
