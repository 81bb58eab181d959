package graft.functions

import graft.PropHelper.samples
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning ParseMoney's arithmetic (no Spark session —
  * the static parser is the single implementation both eval paths call).
  */
class ParseMoneyPropSpec extends AnyFunSuite {

  test("dollar magnitudes scale exactly") {
    samples(Gen.choose(1, 999), 50).foreach { n =>
      assert(ParseMoney.parse(s"$$${n}M") == n * 1000000L)
      assert(ParseMoney.parse(s"$$${n}k") == n * 1000L)
      assert(ParseMoney.parse(s"$$${n}B") == n * 1000000000L)
      assert(ParseMoney.parse(s"$n") == n.toLong)
    }
  }

  test("thousands-grouped rendering parses to the same value") {
    samples(Gen.choose(1000L, 999999999L), 50).foreach { n =>
      assert(ParseMoney.parse(f"$n%,d") == n)
    }
  }

  test("magnitude casing never matters") {
    val cases = for {
      n <- Gen.choose(1, 500)
      mag <- Gen.oneOf("m", "M", "mn", "Mn", "MILLION")
    } yield (n, mag)
    samples(cases, 30).foreach { case (n, mag) =>
      assert(ParseMoney.parse(s"$$$n$mag") == n * 1000000L)
    }
  }

  test("arbitrary garbage never throws (null or a value)") {
    samples(Gen.asciiPrintableStr, 300).foreach { s =>
      ParseMoney.parse(s) // must not throw
    }
  }

  test("INR crore conversion matches the reference rate at any scale") {
    samples(Gen.choose(1, 999), 30).foreach { n =>
      // 1 Cr = 1e7 INR × 0.012 USD/INR (llm_parse.py:44-48 contract)
      assert(ParseMoney.parse(s"₹$n Cr") == math.round(n * 1e7 * 0.012))
      assert(ParseMoney.parse(s"$n crore") == math.round(n * 1e7 * 0.012))
    }
  }
}
