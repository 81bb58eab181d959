package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import GraftFunctions.url_join

/** RFC 3986 href resolution (reference leans on Python urljoin at
  * app/hiring/detect_ats.py:98,108,114).
  */
class UrlJoinSpec extends SparkSpec {

  private def r(base: String, href: String): String = {
    val u = UrlJoin.resolve(base, href)
    if (u == null) null else u.toString
  }

  test("absolute href replaces the base") {
    assert(r("https://acme.com/", "https://boards.greenhouse.io/acme") ==
      "https://boards.greenhouse.io/acme")
  }

  test("relative href resolves against the base directory") {
    assert(r("https://acme.com/dir/page.html", "jobs.html") ==
      "https://acme.com/dir/jobs.html")
    assert(r("https://acme.com/dir/", "a/b") == "https://acme.com/dir/a/b")
  }

  test("root-relative href") {
    assert(r("https://acme.com/deep/path", "/careers") ==
      "https://acme.com/careers")
  }

  test("protocol-relative href keeps the base scheme") {
    assert(r("https://acme.com/x", "//cdn.example.com/app.js") ==
      "https://cdn.example.com/app.js")
  }

  test("fragment and query handling") {
    assert(r("https://acme.com/page", "#team") == "https://acme.com/page#team")
    assert(r("https://acme.com/page", "?q=1") == "https://acme.com/page?q=1")
  }

  test("dot segments normalize") {
    assert(r("https://acme.com/a/b/c", "../d") == "https://acme.com/a/d")
  }

  test("unparseable base yields null") {
    assert(r("ht tp://broken", "/x") == null)
    assert(r("http://[", "/x") == null)
  }

  test("DataFrame evaluation (codegen path) incl. null propagation") {
    import spark.implicits._
    val df = Seq(
      ("https://acme.com/", "careers"),
      ("https://acme.com/a/", "/jobs"),
      (null.asInstanceOf[String], "x"),
      ("https://acme.com/", null.asInstanceOf[String])
    ).toDF("base", "href")
    val got = col1[String](df.select(url_join(col("base"), col("href"))))
    assert(got == Seq("https://acme.com/careers", "https://acme.com/jobs", null, null))
  }
}
