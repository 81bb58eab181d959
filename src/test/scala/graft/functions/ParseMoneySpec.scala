package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import GraftFunctions.parse_money

/** Pins the engine-side money-normalization contract
  * (reference: app/extract/llm_parse.py:44-48).
  */
class ParseMoneySpec extends SparkSpec {

  private def p(s: String): java.lang.Long = ParseMoney.parse(s)

  test("plain dollar magnitudes") {
    assert(p("$5M") == 5000000L)
    assert(p("$5.5M") == 5500000L)
    assert(p("$750k") == 750000L)
    assert(p("$1.2B") == 1200000000L)
    assert(p("$40 million") == 40000000L)
    assert(p("3 Bn") == 3000000000L)
  }

  test("bare numbers and thousands grouping") {
    assert(p("1200000") == 1200000L)
    assert(p("1,200,000") == 1200000L)
    assert(p("12,34") == null)       // malformed grouping rejected
    assert(p("1,2345") == null)
  }

  test("currency conversion per the reference contract") {
    assert(p("€10M") == 11000000L)   // EUR x 1.1
    assert(p("£2M") == 2500000L)     // GBP x 1.25
    assert(p("₹20 Cr") == 2400000L)  // 20e7 INR x 0.012
    assert(p("₹5 lakh") == 6000L)
  }

  test("crore/lakh imply INR even without an explicit symbol") {
    assert(p("20 Cr") == 2400000L)
    assert(p("2 crore") == 240000L)
    assert(p("5 Lakh") == 6000L)
    // ...but an explicit non-INR symbol wins over the magnitude word
    assert(p("$1 Cr") == 10000000L)
  }

  test("unparseable inputs return null") {
    assert(p("Undisclosed") == null)
    assert(p("") == null)
    assert(p("about five million") == null)
    assert(p("$") == null)
  }

  test("DataFrame evaluation (codegen path) matches the static parser") {
    val inputs = Seq("$5M", "₹20 Cr", "20 Cr", "Undisclosed", "1,200,000", null)
    import spark.implicits._
    val got = col1[java.lang.Long](
      inputs.toDF("s").select(parse_money(col("s"))))
    assert(got == Seq(5000000L, 2400000L, 2400000L, null, 1200000L, null))
  }

  test("SQL registration works") {
    GraftFunctions.registerAll(spark)
    val got = col1[java.lang.Long](spark.sql("SELECT parse_money('$7M')"))
    assert(got == Seq(7000000L))
  }

  test("non-string input is an analysis-time error, not a runtime crash") {
    import spark.implicits._
    val err = intercept[AnalysisException] {
      Seq(5).toDF("n").select(parse_money(col("n"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }
}
